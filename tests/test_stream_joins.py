"""Stream-stream interval join and stream-static enrichment tests.

Each streaming result is pinned to its batch twin over the same events
slice (watermarks are no-ops in batch, so the twin is the same builder).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
from csv_2_db_pipeline_data_engineering_spark.streaming.joins import (
    enrich_stream_static,
    join_event_pairs,
)
from tests.conftest import SF_DIR


def _events_split(spark):
    """Split events into two pseudo-streams: views (even ids), clicks (odd)."""
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "ts")
    return ev.filter("event_id % 2 = 0"), ev.filter("event_id % 2 = 1")


def test_stream_stream_join_matches_batch_twin(spark, tmp_path):
    views_b, clicks_b = _events_split(spark)
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    views_b.write.parquet(vdir)
    clicks_b.write.parquet(cdir)

    schema = views_b.schema
    views_s = spark.readStream.schema(schema).parquet(vdir)
    clicks_s = spark.readStream.schema(schema).parquet(cdir)

    q = (
        join_event_pairs(clicks_s, views_s)
        .writeStream.format("memory")
        .queryName("pairs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream-stream join did not terminate"
    got = spark.table("pairs")

    expected = join_event_pairs(clicks_b, views_b)  # batch twin
    assert got.count() == expected.count() > 0
    assert got.exceptAll(expected).isEmpty()
    assert expected.exceptAll(got).isEmpty()
    # interval semantics: click at-or-after view, within 10 minutes
    bounds = got.agg(F.min("gap_sec"), F.max("gap_sec")).head()
    assert bounds[0] >= 0 and bounds[1] <= 600


def test_stream_static_enrichment(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "ts")
    edir = str(tmp_path / "events")
    ev.write.parquet(edir)
    customers = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_nationkey"
    )

    stream = spark.readStream.schema(ev.schema).parquet(edir)
    q = (
        enrich_stream_static(stream, customers, "user_id")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream-static join did not terminate"
    got = spark.table("enriched")
    assert got.count() == ev.count()  # left join: no event lost
    # every matched row carries the dimension payload
    assert got.filter(F.col("c_name").isNull()).count() == ev.join(
        customers, "user_id", "left_anti"
    ).count()


def test_stream_stream_left_outer_emits_expired_unmatched(spark, tmp_path):
    """Left-outer: matched rows must equal the batch twin's; unmatched
    views are emitted with NULL click columns once the watermark proves
    no click can arrive. Rows younger than the FINAL watermark are
    legitimately held back on the stream side (never emitted wrong,
    only late) — so null rows are a subset of the batch twin's, and
    must be non-empty for this data."""
    from csv_2_db_pipeline_data_engineering_spark.streaming.joins import (
        join_event_pairs_outer,
    )

    views_b, clicks_b = _events_split(spark)
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    views_b.write.parquet(vdir)
    clicks_b.write.parquet(cdir)

    schema = views_b.schema
    views_s = spark.readStream.schema(schema).parquet(vdir)
    clicks_s = spark.readStream.schema(schema).parquet(cdir)

    q = (
        join_event_pairs_outer(clicks_s, views_s)
        .writeStream.format("memory")
        .queryName("pairs_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "outer join did not terminate"
    got = spark.table("pairs_outer")
    expected = join_event_pairs_outer(clicks_b, views_b)  # plain left join

    got_matched = got.filter(F.col("click_id").isNotNull())
    exp_matched = expected.filter(F.col("click_id").isNotNull())
    assert got_matched.count() == exp_matched.count() > 0
    assert got_matched.exceptAll(exp_matched).isEmpty()

    got_null = got.filter(F.col("click_id").isNull())
    exp_null = expected.filter(F.col("click_id").isNull())
    assert got_null.count() > 0  # expiry DID emit unmatched views
    assert got_null.exceptAll(exp_null).isEmpty()  # never a wrong null row
