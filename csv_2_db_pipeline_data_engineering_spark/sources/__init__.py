from .csv_source import ingest_csv
from .tables import TABLE_NAMES, load_table, load_tables, register_views

__all__ = ["ingest_csv", "TABLE_NAMES", "load_table", "load_tables", "register_views"]
