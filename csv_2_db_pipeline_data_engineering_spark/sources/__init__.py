from .csv_source import ingest_csv
from .json_source import ingest_jsonl, split_corrupt
from .tables import TABLE_NAMES, load_table, load_tables, register_views

__all__ = [
    "ingest_csv",
    "ingest_jsonl",
    "split_corrupt",
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
]
