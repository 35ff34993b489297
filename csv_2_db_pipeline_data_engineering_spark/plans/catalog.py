"""Central registry of named queries with DuckDB oracles.

Every operator the engine claims (SURVEY.md §2 + driver-mandated
extensions) is registered here as a ``Query``: a Spark builder taking
``(spark, sf_dir)`` plus an equivalent ANSI-SQL oracle string runnable
by DuckDB over the same parquet tables. The driver's correctness gate
compares the two (row count + schema + order-insensitive value hash),
so builders and oracles alias every computed column identically and
round floating aggregates to fixed decimals on BOTH sides.

Queries without a SQL-expressible twin (LSH internals, streaming state,
Pandas-UDF plumbing) carry ``oracle=None`` -> rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    description: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None


def get_catalog() -> dict[str, Query]:
    """All registered queries, keyed by name (import-light, lazy)."""
    from ..operators import dedup, multimodal, rollup, similarity, text
    from . import advanced, analytics, etl_queries, quality, stats_windows, subqueries

    out: dict[str, Query] = {}
    for module in (
        analytics, advanced, stats_windows, subqueries, quality, etl_queries,
        dedup, similarity, text, multimodal, rollup,
    ):
        for q in module.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name: {q.name}")
            out[q.name] = q
    return out


CATALOG = get_catalog
