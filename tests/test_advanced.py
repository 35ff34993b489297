"""Advanced-operator tests not covered by the DuckDB oracle gate."""

from __future__ import annotations

from csv_2_db_pipeline_data_engineering_spark.plans.advanced import (
    approx_aggregates,
    asof_last_order_per_event,
)
from tests.conftest import SF_DIR


def test_approx_aggregates_error_bounds(spark):
    rows = approx_aggregates(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # The sketches run inside the query; the output carries the
        # exact values plus in-query tolerance booleans (the hash-stable
        # oracle contract). Both must certify.
        assert r.exact_parts > 0 and r.exact_p50 is not None
        assert r.hll_within_15pct and r.tdigest_within_1pct


def test_asof_join_is_at_or_before_and_total(spark):
    out = asof_last_order_per_event(spark, SF_DIR)
    n_events = out.count()
    # one output row per event, and every matched order-date <= event date
    from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    assert n_events == load_table(spark, SF_DIR, "events").count()
    bad = out.join(
        load_table(spark, SF_DIR, "events").select(
            "event_id", F.to_date("ts").alias("ed")
        ),
        "event_id",
    ).filter(F.col("asof_order_date") > F.col("ed"))
    assert bad.isEmpty()
