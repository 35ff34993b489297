from .jdbc import JdbcConfig, create_tables, load_clean_jdbc, load_rejected_jdbc
from .parquet_upsert import upsert_parquet
from .scd2 import scd2_asof, scd2_current, scd2_init, scd2_merge

__all__ = [
    "JdbcConfig",
    "create_tables",
    "load_clean_jdbc",
    "load_rejected_jdbc",
    "upsert_parquet",
    "scd2_asof",
    "scd2_current",
    "scd2_init",
    "scd2_merge",
]
