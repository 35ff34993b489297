"""Parquet analytics-table loader for the driver's TPC-H-ish testdata.

At 100 TB these tables would live partitioned/bucketed on an object
store; ``spark.read.parquet`` on a directory scales the same way —
column pruning and filter pushdown reach the parquet scan via Catalyst,
which is why every query in this engine is expressed declaratively.
"""

from __future__ import annotations

import math
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


# Compressed-parquet bytes a single spread slice should carry. Sized so
# the 100x probe corpora (tens of MB) always hit the defaultParallelism
# cap — identical behavior to an unconditional spread — while sf0.1-toy
# frames (hundreds of KB) get a handful of partitions instead of 32,
# which matters because iterative consumers (k-means, GD probes, CMS
# extends) pay per-stage task-scheduling overhead ONCE PER ITERATION.
_SPREAD_SLICE_BYTES = 128 * 1024


def table_bytes(sf_dir: str, name: str) -> int:
    """On-disk bytes of a testdata table; 0 when not locally statable
    (e.g. an object-store URI) — callers treat 0 as "unknown, spread
    fully"."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if not f.startswith((".", "_"))
            )
        return os.path.getsize(path)
    except OSError:
        return 0


def spread_scan(
    df: DataFrame, nbytes: int | None = None, slice_bytes: int = _SPREAD_SLICE_BYTES
) -> DataFrame:
    """Fan a narrow scan across the cluster before compute-heavy work —
    but only when the planned scan parallelism actually needs it.

    A single-file corpus scans into at most its row-group count of
    splits, which serialized every heavy kernel onto a fraction of the
    box at the 100x probes (``ann_ivf_neighbors`` measured 59.2s as-is
    vs 7.7s spread). The unconditional fix cost ~7s of pure shuffle /
    task-scheduling overhead at sf0.1, so the spread is now gated:

    * planned partitions >= defaultParallelism (production many-file
      layout): return ``df`` unchanged. An explicit ``repartition(N)``
      always materializes a full exchange — AQE does NOT coalesce a
      user-specified partition count — so skipping is the only way to
      avoid a redundant whole-corpus shuffle there.
    * ``nbytes`` given (byte-proportional kernels — embeddings math,
      shingling, gram scans): spread to ``ceil(nbytes/slice_bytes)``
      capped at defaultParallelism. Probe-scale corpora hit the cap
      (identical to the unconditional spread); toy frames get a
      partition count their size justifies.
    * ``nbytes`` None or 0 (per-row cost dwarfs bytes — media decode —
      or size unknowable): spread fully to defaultParallelism.

    The planned-partition probe (``df.rdd.getNumPartitions()``) plans
    the scan but launches no job; its driver cost is milliseconds.
    """
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    cur = df.rdd.getNumPartitions()
    if cur >= n:
        return df
    want = n if not nbytes else min(n, max(cur, math.ceil(nbytes / slice_bytes)))
    if want <= cur:
        return df
    return df.repartition(want)


def load_table_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load_table`` + size-aware :func:`spread_scan` in one step."""
    return spread_scan(load_table(spark, sf_dir, name), table_bytes(sf_dir, name))


def load_embeddings_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table, spread for its vector-compute consumers
    (k-means, LSH hashing, cosine verifies) via :func:`spread_scan` —
    fully at probe/production data sizes, proportionally at toy sizes,
    not at all when the scan already parallelizes itself."""
    return load_table_spread(spark, sf_dir, "embeddings")
