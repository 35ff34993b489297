from .jdbc import JdbcConfig, create_tables, load_clean_jdbc, load_rejected_jdbc
from .parquet_upsert import upsert_parquet

__all__ = [
    "JdbcConfig",
    "create_tables",
    "load_clean_jdbc",
    "load_rejected_jdbc",
    "upsert_parquet",
]
