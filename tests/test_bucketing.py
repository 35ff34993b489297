"""Bucketed-table co-located join: the shuffle-elimination story.

At 100 TB the single biggest join cost is shuffling the fact table.
Writing both sides bucketed on the join key means every join on that key
is map-side: Spark reads bucket i of A and bucket i of B in the same
task — zero Exchange in the plan. This test proves the engine's tables
support that layout and that the plan really has no shuffle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
from tests.conftest import SF_DIR

N_BUCKETS = 8


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdemo LOCATION '{tmp_path}'")
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    (
        orders.write.bucketBy(N_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("buckdemo.orders_b")
    )
    (
        customer.write.bucketBy(N_BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable("buckdemo.customer_b")
    )
    yield "buckdemo.orders_b", "buckdemo.customer_b"
    spark.sql("DROP TABLE IF EXISTS buckdemo.orders_b")
    spark.sql("DROP TABLE IF EXISTS buckdemo.customer_b")
    spark.sql("DROP DATABASE IF EXISTS buckdemo")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    orders_b, customer_b = bucketed_tables
    # Force a sort-merge join (no broadcast) and a static plan so the
    # Exchange check is unambiguous.
    old = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j = (
            spark.table(orders_b)
            .join(
                spark.table(customer_b),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # join itself must be co-located: the only allowed Exchange is the
        # one for the final tiny groupBy on c_mktsegment
        join_part = plan.split("HashAggregate")[-1]  # below the agg = join subtree
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part, f"bucketed join still shuffles:\n{plan}"

        # same join WITHOUT bucketing must shuffle both sides
        raw = (
            load_table(spark, SF_DIR, "orders")
            .join(
                load_table(spark, SF_DIR, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        raw_join = raw_plan.split("HashAggregate")[-1]
        assert "Exchange" in raw_join

        # and the result is identical either way
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, raw.collect()))
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_banded_index_join_shuffles_only_delta(spark, tmp_path):
    """Incremental-dedup candidate join against a band table bucketed on
    (band, bh): the stored side must be read bucket-aligned (no Exchange
    in its subtree) while the delta side shuffles into the bucket
    scheme — O(delta) network at any history size."""
    from csv_2_db_pipeline_data_engineering_spark.operators.dedup import (
        build_signature_index,
        incremental_candidates_banded,
        write_banded_index_table,
    )

    spark.sql(f"CREATE DATABASE IF NOT EXISTS banddemo LOCATION '{tmp_path}'")
    base = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "pack my box with five dozen liquor jugs right now"),
        ],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    old = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        write_banded_index_table(
            build_signature_index(base), "banddemo.bands_b", n_buckets=4
        )
        cands = incremental_candidates_banded(delta, "banddemo.bands_b")
        plan = cands._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # exactly ONE hash-partitioning on the join key (the delta side);
        # the stored side is read bucket-aligned straight off disk
        assert plan.count("Exchange hashpartitioning(band") == 1, (
            f"expected only the delta side to shuffle on (band, bh):\n{plan}"
        )
        assert "Bucketed: true" in plan
        # and the candidates are correct (the near-dup base doc collides)
        hit = {(r.doc_delta, r.doc_base) for r in cands.collect()}
        assert (100, 1) in hit and all(d == 100 for d, _ in hit)
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS banddemo.bands_b")
        spark.sql("DROP DATABASE IF EXISTS banddemo")


def test_span_shingle_join_shuffles_only_delta(spark, tmp_path):
    """Incremental span-strip candidate join against a shingle table
    bucketed on sh: the stored side must be read bucket-aligned (no
    Exchange in its subtree) while the batch's shingles shuffle into
    the bucket scheme — O(delta) network at any history size."""
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.spans import (
        _incremental_victim_intervals,
        _raw_shingles,
        write_bucketed_shingle_table,
    )

    spark.sql(f"CREATE DATABASE IF NOT EXISTS spandemo LOCATION '{tmp_path}'")
    base = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight again"),
            (2, "pack my box with five dozen liquor jugs right now please"),
        ],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(100, "zz yy the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    old = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        write_bucketed_shingle_table(
            _raw_shingles(base), "spandemo.spans_b", n_buckets=4
        )
        stats = (
            _raw_shingles(base)
            .groupBy("sh")
            .agg(F.countDistinct("doc_id").alias("n_docs"))
        )
        iv = _incremental_victim_intervals(
            delta, spark.table("spandemo.spans_b"), stats
        )
        plan = iv._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # The history-vs-delta shingle join must not reshuffle the
        # stored table: every hashpartitioning(sh...) Exchange in the
        # plan feeds a NON-bucketed frame (delta shingles / the stats
        # aggregates), and the bucketed scan appears with no Exchange
        # between it and its join.
        import re

        scan_idx = plan.find("spandemo.spans_b")
        assert scan_idx > 0
        # walk upward from the bucketed scan: its subtree (the text
        # after the scan line up to the enclosing join input boundary)
        # must not contain an Exchange on sh
        bucket_subtree = plan[scan_idx - 400 : scan_idx]
        assert "Exchange hashpartitioning(sh" not in bucket_subtree, (
            f"bucketed shingle side reshuffled:\n{plan}"
        )
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS spandemo.spans_b")
        spark.sql("DROP DATABASE IF EXISTS spandemo")
