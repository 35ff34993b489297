"""Parquet analytics-table loader for the driver's TPC-H-ish testdata.

At 100 TB these tables would live partitioned/bucketed on an object
store; ``spark.read.parquet`` on a directory scales the same way —
column pruning and filter pushdown reach the parquet scan via Catalyst,
which is why every query in this engine is expressed declaratively.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    # events.ts is TIMESTAMP(NANOS) — illegal for Spark 4's vectorized
    # reader. Read it as a raw nanos long (legacy flag, runtime-settable),
    # then expose BOTH a micros timestamp `ts` (truncated exactly like
    # DuckDB's parquet reader does) and the exact micros long `ts_us`
    # for precision-sensitive arithmetic (matches DuckDB epoch_us()).
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 - conf may be locked; fall through to read
        pass
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(df.schema["ts"].dataType, T.LongType):
        us = F.floor(F.col("ts") / 1000).cast("long")
        df = df.withColumn("ts_us", us).withColumn("ts", F.timestamp_micros(us))
    else:
        # Parquet timestamp[us] without timezone metadata arrives as
        # TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ; unix_micros
        # requires TIMESTAMP. The session timezone is pinned to UTC
        # (session.py), so the NTZ->LTZ cast is exactly naive-as-UTC —
        # bit-identical to DuckDB's epoch_us() on the same file.
        df = df.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def load_embeddings_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table spread to defaultParallelism.

    Every embeddings consumer is vector-compute-heavy (k-means, LSH
    hashing, cosine verifies), and a single-file corpus scans into at
    most its row-group count of splits — at the 100x probe that
    serialized the whole vector pipeline onto a couple of cores
    (``ann_ivf_neighbors`` measured 59.2s as-is vs 7.7s spread; the
    ``_spread`` lesson from the media kernels). The id+vector rows are
    tiny relative to the per-row compute, so the exchange is cheap at
    any scale; at production layout (many files) the scan parallelizes
    itself and AQE coalesces the no-op-sized shuffle.
    """
    return load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
