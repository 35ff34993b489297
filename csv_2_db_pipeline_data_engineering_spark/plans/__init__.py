from .catalog import CATALOG, Query, get_catalog

__all__ = ["CATALOG", "Query", "get_catalog"]
