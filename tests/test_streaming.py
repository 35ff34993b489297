"""Structured Streaming tests: file-arrival ETL, windowed aggs, stateful sessions.

The streaming surface is an extension beyond the reference (it explicitly
rejects streaming, reference docs/documentation.md:35-39, but names "No file
delivery detection" as a limitation at docs/documentation.md:208). Each
streaming operator is checked against its batch twin so the semantics are
pinned by the same oracle-checked logic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
from csv_2_db_pipeline_data_engineering_spark.streaming.dedup_stream import (
    dedup_stream_exact,
)
from csv_2_db_pipeline_data_engineering_spark.streaming.etl_stream import run_stream_pipeline
from csv_2_db_pipeline_data_engineering_spark.streaming.windows import (
    sessionize,
    windowed_event_counts,
)
from tests.conftest import GOLDEN_CSV, SF_DIR

UPDATE_CSV = (
    "transaction_id,customer_id,product_name,quantity,unit_price,transaction_date,region,status\n"
    "T001,101,Widget Pro,7,19.99,2024-01-15,North,Completed\n"
    "T011,111,Doohickey,2,4.25,2024-01-20,East,pending\n"
)


def test_stream_etl_end_to_end(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "batch1.csv").write_text(GOLDEN_CSV, encoding="utf-8")
    clean_path = str(tmp_path / "clean")
    rejected_path = str(tmp_path / "rejected")
    ckpt = str(tmp_path / "ckpt")

    run_stream_pipeline(spark, str(landing), clean_path, rejected_path, ckpt).awaitTermination()

    clean = spark.read.parquet(clean_path)
    assert clean.count() == 9  # golden trace: 10 in -> 9 clean
    assert spark.read.parquet(rejected_path).count() == 1  # T006 invalid status

    # Second file arrival: checkpoint means only the new file is processed;
    # the upsert updates T001 in place and appends T011 (no duplicates).
    (landing / "batch2.csv").write_text(UPDATE_CSV, encoding="utf-8")
    run_stream_pipeline(spark, str(landing), clean_path, rejected_path, ckpt).awaitTermination()

    clean = spark.read.parquet(clean_path)
    assert clean.count() == 10
    assert clean.filter(F.col("transaction_id") == "T001").head()["quantity"] == 7
    # rejected sink untouched by the clean second batch
    assert spark.read.parquet(rejected_path).count() == 1


def test_windowed_event_counts_matches_batch_twin(spark):
    events = load_table(spark, SF_DIR, "events")
    got = windowed_event_counts(events)  # watermark is a no-op in batch mode
    expected = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    assert got.count() == expected.count()
    assert got.agg(F.sum("n")).head()[0] == events.count()
    diff = got.select("window_start", "event_type", "n", "total_value").exceptAll(
        expected.select("window_start", "event_type", "n", "total_value")
    )
    assert diff.isEmpty()


@pytest.fixture()
def event_stream_dir(spark, tmp_path):
    """Events as a parquet landing dir with the columns sessionize needs."""
    path = str(tmp_path / "events_stream")
    load_table(spark, SF_DIR, "events").select("user_id", "ts", "ts_us").write.parquet(path)
    return path


def _run_sessionize_stream(spark, event_stream_dir, ckpt, name, **kwargs):
    batch_events = spark.read.parquet(event_stream_dir)
    stream = spark.readStream.schema(batch_events.schema).parquet(event_stream_dir)
    q = (
        sessionize(stream, **kwargs)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "sessionize stream did not terminate"
    return spark.table(name)


def _batch_sessions(batch_events):
    """Batch twin: gap>30min sessionization via lag + conditional cumsum."""
    w = Window.partitionBy("user_id").orderBy("ts_us")
    new_session = F.when(
        F.lag("ts_us").over(w).isNull() | ((F.col("ts_us") - F.lag("ts_us").over(w)) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    sid = F.sum("new_session").over(
        Window.partitionBy("user_id").orderBy("ts_us").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        batch_events.withColumn("new_session", new_session)
        .withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
    )


def test_sessionize_stream_emits_closed_sessions(spark, event_stream_dir, tmp_path):
    # Huge watermark delay -> the watermark never passes any session's
    # last_event+gap, so NO event-time timeout fires during the drain and
    # the emitted set is exactly the mid-stream-closed sessions (every
    # session except each user's last, which stays open in state).
    got = _run_sessionize_stream(
        spark,
        event_stream_dir,
        str(tmp_path / "ckpt"),
        "sessions_no_timeout",
        watermark_delay="3650 days",
    )
    sessions = _batch_sessions(spark.read.parquet(event_stream_dir))
    last_sid = sessions.groupBy("user_id").agg(F.max("sid").alias("last_sid"))
    closed = (
        sessions.join(last_sid, "user_id")
        .filter(F.col("sid") < F.col("last_sid"))
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )
    assert got.count() == closed.count()
    assert got.exceptAll(closed.select(*got.columns)).isEmpty()


def test_sessionize_stream_event_time_timeout_closes_sessions(
    spark, event_stream_dir, tmp_path
):
    # Default 30-min watermark: the post-drain timeout batch closes final
    # sessions whose last_event+gap fell behind the watermark. Every
    # emitted row must be a genuine batch-twin session (no invented or
    # split sessions), and at least the mid-stream-closed ones appear.
    got = _run_sessionize_stream(
        spark, event_stream_dir, str(tmp_path / "ckpt"), "sessions_timeout"
    )
    sessions = _batch_sessions(spark.read.parquet(event_stream_dir)).select(
        "user_id", "session_start_us", "session_end_us", "n_events"
    )
    n_users = sessions.select("user_id").distinct().count()
    assert got.exceptAll(sessions.select(*got.columns)).isEmpty()
    assert got.count() >= sessions.count() - n_users  # >= all mid-stream closed


def test_dedup_stream_exactly_once(spark, tmp_path):
    # Redelivered events (two files sharing half their event_ids) must
    # reduce to exactly-once within the watermark horizon.
    events = load_table(spark, SF_DIR, "events").select("event_id", "ts", "event_type")
    in_dir = tmp_path / "dedup_in"
    events.filter(F.col("event_id") < 200).write.parquet(str(in_dir / "f1"))
    events.filter((F.col("event_id") >= 100) & (F.col("event_id") < 300)).write.parquet(
        str(in_dir / "f2")
    )
    batch = spark.read.option("recursiveFileLookup", "true").parquet(str(in_dir))
    assert batch.count() == 400  # 100..199 delivered twice
    stream = (
        spark.readStream.schema(batch.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    q = (
        dedup_stream_exact(stream, watermark_delay="3650 days")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.table("dedup_out")
    assert got.count() == 300
    assert got.select("event_id").distinct().count() == 300


def test_session_window_counts_batch_matches_lag_cumsum_twin(spark):
    from csv_2_db_pipeline_data_engineering_spark.streaming.windows import (
        session_window_counts,
    )

    events = load_table(spark, SF_DIR, "events")
    got = session_window_counts(events).select("user_id", "n_events")
    sessions = _batch_sessions(events).select("user_id", "n_events")
    # same multiset of (user, session-size) pairs as the oracle-style
    # lag+cumsum twin (session_window merges by the same 30-min gap)
    assert got.count() == sessions.count()
    assert got.exceptAll(sessions).isEmpty() and sessions.exceptAll(got).isEmpty()


def test_session_window_stream_emits_watermark_closed_sessions(spark, tmp_path):
    from csv_2_db_pipeline_data_engineering_spark.streaming.windows import (
        session_window_counts,
    )

    import pyspark.sql.functions as SF

    all_events = load_table(spark, SF_DIR, "events")
    landing = tmp_path / "sw_landing"
    # time-ordered files: each micro-batch only carries data newer than
    # the watermark, so nothing is late-dropped and emission is exact
    a, b, c = all_events.approxQuantile("ts_us", [0.25, 0.5, 0.75], 0.0)
    events = all_events.select("user_id", "ts", "ts_us")
    parts = [
        events.filter(SF.col("ts_us") <= a),
        events.filter((SF.col("ts_us") > a) & (SF.col("ts_us") <= b)),
        events.filter((SF.col("ts_us") > b) & (SF.col("ts_us") <= c)),
        events.filter(SF.col("ts_us") > c),
    ]
    for i, p in enumerate(parts):
        p.select("user_id", "ts").coalesce(1).write.parquet(str(landing / f"f{i}"))
    events = events.select("user_id", "ts")

    stream = (
        spark.readStream.schema(events.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(landing))
    )
    q = (
        session_window_counts(stream)
        .writeStream.format("memory")
        .queryName("sw_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sw_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "session_window stream did not terminate"
    got = spark.table("sw_sessions")
    batch = session_window_counts(events)
    # every emitted session is a genuine batch-twin session
    assert got.exceptAll(batch.select(*got.columns)).isEmpty()
    # every session that fell fully behind the final watermark was emitted
    max_ts = events.agg(SF.max("ts")).first()[0]
    import datetime as _dt

    horizon = max_ts - _dt.timedelta(minutes=31)
    must_emit = batch.filter(SF.col("session_end") < SF.lit(horizon))
    assert must_emit.exceptAll(got.select(*got.columns)).isEmpty()
    assert got.count() >= must_emit.count() > 0
