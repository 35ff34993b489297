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
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
