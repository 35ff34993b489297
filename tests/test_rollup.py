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


def test_exact_avg_matches_duckdb_on_negative_and_huge_sums(spark):
    """The served avg's integer half-away-from-zero arithmetic must be
    engine-identical even where the r4 formula broke: negative sums
    (Spark DIV truncates toward zero, DuckDB // floors) and |sum| beyond
    the old BIGINT micro-unit ceiling (~9.2e12)."""
    import duckdb

    from csv_2_db_pipeline_data_engineering_spark.operators.rollup import (
        EXACT_AVG_4DP_DUCKDB,
        EXACT_AVG_4DP_SPARK,
    )

    cases = [
        ("-1.00005", 2),   # -0.500025: floor-vs-truncate would differ here
        ("1.00005", 2),
        ("-0.00015", 3),   # -0.00005: exact 4-dp tie, rounds away from zero
        ("0.00015", 3),
        ("-7.5", 4),
        ("9300000000000.5", 3),   # overflows the old BIGINT*1e6 path
        ("-9300000000000.5", 3),
        ("0", 5),
    ]
    sdf = spark.createDataFrame(cases, "s string, n_rows long").withColumn(
        "sum_value", F.col("s").cast("decimal(28,6)")
    )
    got = {
        r["s"]: r["avg"]
        for r in sdf.selectExpr("s", f"{EXACT_AVG_4DP_SPARK} AS avg").collect()
    }
    con = duckdb.connect()
    rows = ", ".join(f"(CAST({s} AS DECIMAL(28,6)), CAST({n} AS BIGINT), '{s}')"
                     for s, n in cases)
    want = {
        s: v
        for s, v in con.execute(
            f"SELECT s, {EXACT_AVG_4DP_DUCKDB} AS avg"
            f" FROM (VALUES {rows}) t(sum_value, n_rows, s)"
        ).fetchall()
    }
    assert got == want
    # sign symmetry: f(-x) == -f(x) for every mirrored case
    assert got["-1.00005"] == -got["1.00005"]
    assert got["-0.00015"] == -got["0.00015"]
    assert got["-9300000000000.5"] == -got["9300000000000.5"]


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
