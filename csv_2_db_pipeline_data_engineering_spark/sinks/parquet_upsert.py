"""Keyed idempotent upsert into a parquet table (lakehouse-style MERGE).

The engine-side equivalent of the reference's Postgres ``ON CONFLICT DO
UPDATE`` (``src/load.py:87-95``): last-write-wins per key, rerun-safe.
This is the sink used by tests (no Postgres in the container) and the
pattern that scales past what a single Postgres can hold — at 100 TB the
same logic is one ``MERGE INTO`` on Delta/Iceberg; here we express the
merge with DataFrame ops:

    existing ∪ incoming → row_number() over (partition by key
                          order by priority) = 1

Incoming beats existing on key collision (priority column), matching
``EXCLUDED.*`` update semantics. The window shuffles by key once; with a
bucketed target table the shuffle disappears entirely.
"""

from __future__ import annotations

import logging
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

_PRIORITY = "__src_priority"
_RANK = "__rn"


def merge_last_write_wins(existing: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """Pure merge plan: incoming rows replace existing rows per key."""
    cols = incoming.columns
    unioned = existing.select(*cols).withColumn(_PRIORITY, F.lit(1)).unionByName(
        incoming.withColumn(_PRIORITY, F.lit(0))
    )
    w = Window.partitionBy(key).orderBy(F.col(_PRIORITY))
    return (
        unioned.withColumn(_RANK, F.row_number().over(w))
        .filter(F.col(_RANK) == 1)
        .drop(_PRIORITY, _RANK)
    )


def upsert_parquet(df: DataFrame, path: str, key: str) -> int:
    """Merge ``df`` into the parquet table at ``path`` keyed on ``key``.

    Returns the post-merge row count. Running this N times with the same
    input is identical to running it once (the idempotency contract,
    reference ``docs/documentation.md:150-163``).

    Within one batch, duplicate keys collapse to a single arbitrary-but-
    deterministic winner (the reference's executemany upsert applied rows
    in order — last row won; Spark has no row order, so we take the max
    over all columns' struct for determinism).
    """
    spark: SparkSession = df.sparkSession
    # Collapse in-batch duplicate keys deterministically first.
    w = Window.partitionBy(key).orderBy(F.struct(*df.columns).desc())
    incoming = (
        df.withColumn(_RANK, F.row_number().over(w)).filter(F.col(_RANK) == 1).drop(_RANK)
    )

    if os.path.exists(path):
        existing = spark.read.parquet(path)
        merged = merge_last_write_wins(existing, incoming, key)
    else:
        merged = incoming

    # Parquet can't overwrite a path that's an input of the same plan:
    # stage to a sibling temp dir, then atomically swap.
    staging = tempfile.mkdtemp(
        prefix=".upsert_staging_", dir=os.path.dirname(os.path.abspath(path)) or "."
    )
    merged.write.mode("overwrite").parquet(staging)
    final = spark.read.parquet(staging)
    count = final.count()
    final.write.mode("overwrite").parquet(path)
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    # drop the session's cached file listing for the rewritten path: a
    # reader that scanned it before this upsert would otherwise fail on
    # the replaced part files (FAILED_READ_FILE.FILE_NOT_EXIST)
    spark.catalog.refreshByPath(path)
    logger.info("Upserted into %s: %d total rows", path, count)
    return count
