"""Continuous-aggregate algebra: rollup(base ∪ delta) == merge of rollups."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.operators.rollup import (
    build_rollup,
    merge_rollup,
    serve_rollup,
)
from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _events(spark):
    return load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )


def _served(df):
    out = serve_rollup(df).select(
        "bucket_start",
        "key",
        "n_rows",
        F.round("sum_value", 4).alias("sum_value"),
        F.round("avg_value", 4).alias("avg_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
        "approx_distinct",
    )
    return {tuple(r) for r in out.collect()}


def test_merge_equals_rebuild(spark):
    """The load-bearing property: incremental == full recompute, even when
    the delta lands inside old buckets (out-of-order arrival)."""
    ev = _events(spark)
    # split interleaved by id so both halves hit the SAME time buckets
    base, delta = ev.filter("event_id % 3 != 0"), ev.filter("event_id % 3 = 0")

    incremental = merge_rollup(build_rollup(base), build_rollup(delta))
    full = build_rollup(ev)

    assert _served(incremental) == _served(full)


def test_merge_is_associative_over_many_deltas(spark):
    ev = _events(spark)
    parts = [ev.filter(f"event_id % 4 = {i}") for i in range(4)]
    acc = build_rollup(parts[0])
    for p in parts[1:]:
        acc = merge_rollup(acc, build_rollup(p))
    assert _served(acc) == _served(build_rollup(ev))


def test_serve_semantics(spark):
    """Served rollup matches a direct aggregate of the raw events
    (exact columns exactly; the sketch within HLL error)."""
    ev = _events(spark)
    served = serve_rollup(build_rollup(ev))
    direct = (
        ev.groupBy(F.window("ts", "1 hour")["start"].alias("bucket_start"),
                   F.col("event_type").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n_rows_direct"),
            F.countDistinct("user_id").alias("exact_distinct"),
        )
    )
    j = served.join(direct, ["bucket_start", "key"]).cache()
    assert j.count() == served.count() == direct.count()
    assert j.filter("n_rows != n_rows_direct").isEmpty()
    # HLL estimate within 10% of exact for every bucket
    bad = j.filter(
        F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
        > F.greatest(F.col("exact_distinct") * 0.1, F.lit(2.0))
    )
    assert bad.isEmpty()
