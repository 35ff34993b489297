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


def test_hourly_interpolate_hand_case(spark):
    """Observed at hours 0 and 4 -> hours 1..3 linearly interpolated."""
    from csv_2_db_pipeline_data_engineering_spark.plans.stats_windows import (
        hourly_interpolate_frame,
    )

    H = 3_600_000_000
    ev = spark.createDataFrame(
        [(1, 0 * H, 10.0), (1, 4 * H, 20.0)],
        "user_id long, ts_us long, value double",
    )
    rows = {r["h"]: r for r in hourly_interpolate_frame(ev).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    assert [rows[h]["value_q4"] for h in range(5)] == [
        100000, 125000, 150000, 175000, 200000
    ]
    assert [rows[h]["observed"] for h in range(5)] == [
        True, False, False, False, True
    ]


def test_triangle_count_on_known_graph(spark):
    from csv_2_db_pipeline_data_engineering_spark.plans.graph import (
        graph_triangle_count,
    )
    from tests.conftest import SF_DIR

    r = graph_triangle_count(spark, SF_DIR).collect()[0]
    assert r["n_nodes"] == 25  # dense trade graph touches every nation
    # every triangle is a 3-subset of nodes; count bounded by C(n,3)
    assert 0 < r["n_triangles"] <= 25 * 24 * 23 // 6
    assert r["n_edges"] <= 25 * 24 // 2
