"""PostgreSQL JDBC sinks: DDL bootstrap, idempotent upsert, dead-letter append.

Parity surface S4-S7 (SURVEY.md §2.1; reference ``src/load.py``).

Spark has no native JDBC upsert, so ``load_clean_jdbc`` uses the
staging-table + single-statement ``INSERT ... ON CONFLICT DO UPDATE``
pattern: the DataFrame is written distributed (all executors, batched
inserts) into a staging table, then ONE driver-side SQL statement merges
staging into the target — preserving the reference's atomic-statement
idempotency contract ("running 100 times ... identical to running once",
``docs/documentation.md:158``) while keeping the data path distributed.

At 100 TB the merge statement itself runs inside Postgres; for a truly
huge sink you'd switch the target to a lakehouse table (Delta/Iceberg
``MERGE INTO``) — ``parquet_upsert.upsert_parquet`` is that path's
engine-side equivalent and shares the last-write-wins semantics.

No Postgres is available in the test container; these functions are
exercised by unit tests only up to SQL-text generation, and integration
is gated behind an env var (``SPARK_GRAFT_PG_URL``).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import REJECTED_DDL, REJECTED_TABLE, SALES_DDL, SALES_TABLE

logger = logging.getLogger(__name__)

UPSERT_COLUMNS = (
    "transaction_id",
    "customer_id",
    "product_name",
    "quantity",
    "unit_price",
    "transaction_date",
    "region",
    "status",
    "total_sale",
)


@dataclass
class JdbcConfig:
    """Connection settings from env (reference ``src/load.py:11-22``)."""

    host: str = field(default_factory=lambda: os.environ.get("DB_HOST", "localhost"))
    port: str = field(default_factory=lambda: os.environ.get("DB_PORT", "5432"))
    database: str = field(default_factory=lambda: os.environ.get("DB_NAME", "postgres"))
    user: str = field(default_factory=lambda: os.environ.get("DB_USER", "postgres"))
    password: str = field(default_factory=lambda: os.environ.get("DB_PASSWORD", ""))

    @property
    def url(self) -> str:
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.database}"

    @property
    def properties(self) -> dict[str, str]:
        return {
            "user": self.user,
            "password": self.password,
            "driver": "org.postgresql.Driver",
        }


def upsert_sql(staging: str = "sales_transactions_staging") -> str:
    """The single-statement merge (reference SQL at ``src/load.py:77-96``).

    ``loaded_at`` is intentionally absent from the column list so the
    DB default applies (``src/load.py:78-86``).
    """
    cols = ", ".join(UPSERT_COLUMNS)
    updates = ",\n        ".join(
        f"{c} = EXCLUDED.{c}" for c in UPSERT_COLUMNS if c != "transaction_id"
    )
    return f"""
    INSERT INTO {SALES_TABLE} ({cols})
    SELECT {cols} FROM {staging}
    ON CONFLICT (transaction_id) DO UPDATE SET
        {updates}
    """


def _execute_driver_sql(cfg: JdbcConfig, *statements: str) -> None:
    """Run DDL/merge statements over a raw JDBC connection from the driver.

    Uses the JVM's DriverManager via the Spark gateway — Spark's
    DataFrameWriter cannot execute arbitrary DDL, and the merge must be
    one statement for atomicity.
    """
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    jvm = spark._jvm  # noqa: SLF001
    conn = jvm.java.sql.DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try:
        stmt = conn.createStatement()
        for sql in statements:
            stmt.execute(sql)
        conn.commit()
    finally:
        conn.close()


def create_tables(cfg: JdbcConfig) -> None:
    """DDL bootstrap, CREATE TABLE IF NOT EXISTS ×2 (S4, src/load.py:24-58)."""
    _execute_driver_sql(cfg, SALES_DDL, REJECTED_DDL)


def load_clean_jdbc(df: DataFrame, cfg: JdbcConfig, batchsize: int = 10_000) -> None:
    """Idempotent upsert of clean rows (S5).

    1. Distributed write into a staging table (overwrite = rerun-safe).
    2. One atomic ``INSERT ... ON CONFLICT DO UPDATE`` merge statement.
    """
    staging = f"{SALES_TABLE}_staging"
    (
        df.select(*UPSERT_COLUMNS)
        .write.mode("overwrite")
        .option("batchsize", batchsize)
        .option("truncate", True)
        .jdbc(cfg.url, staging, properties=cfg.properties)
    )
    _execute_driver_sql(cfg, upsert_sql(staging))
    logger.info("Upsert merge committed into %s", SALES_TABLE)


def rejected_payload(df: DataFrame) -> DataFrame:
    """Shape the dead-letter frame (S6, reference ``src/load.py:122-134``).

    raw_data keeps the WHOLE original row (as JSON rather than a Python
    dict repr); missing ids become 'UNKNOWN' (``src/load.py:129``).
    """
    return df.select(
        F.coalesce(F.col("transaction_id").cast("string"), F.lit("UNKNOWN")).alias(
            "transaction_id"
        ),
        F.to_json(F.struct(*[c for c in df.columns if c != "rejection_reason"])).alias(
            "raw_data"
        ),
        F.col("rejection_reason"),
    )


def load_rejected_jdbc(df: DataFrame, cfg: JdbcConfig, batchsize: int = 10_000) -> None:
    """Append dead-letter rows (S6). Faithfully non-idempotent, like the
    reference's SERIAL-keyed plain INSERT (SURVEY.md §4.2)."""
    (
        rejected_payload(df)
        .write.mode("append")
        .option("batchsize", batchsize)
        .jdbc(cfg.url, REJECTED_TABLE, properties=cfg.properties)
    )
