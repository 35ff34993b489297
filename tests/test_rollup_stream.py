"""Streaming continuous aggregate == batch rebuild over the same events.

Two waves of event files land; after each drain the stored rollup must
equal a from-scratch rollup of everything seen so far — the streaming
wiring of the merge algebra that ``test_rollup.py`` proves in batch.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.operators.rollup import (
    build_rollup,
    serve_rollup,
)
from csv_2_db_pipeline_data_engineering_spark.streaming.rollup_stream import (
    EVENT_SCHEMA,
    run_rollup_stream,
)


def _events(spark, rows):
    data = [
        (i, dt.datetime(2024, 1, 1, h, m), uid, et, v, "{}")
        for i, (h, m, uid, et, v) in enumerate(rows)
    ]
    return spark.createDataFrame(data, EVENT_SCHEMA)


def _served(df):
    out = serve_rollup(df).select(
        "bucket_start",
        "key",
        "n_rows",
        F.round("sum_value", 4).alias("s"),
        F.round("min_value", 4).alias("mn"),
        F.round("max_value", 4).alias("mx"),
        "approx_distinct",
    )
    return sorted(tuple(r) for r in out.collect())


WAVE1 = [(9, 0, 1, "click", 1.5), (9, 30, 2, "click", 2.5), (10, 0, 1, "view", 4.0)]
WAVE2 = [(9, 45, 3, "click", 3.0), (11, 15, 2, "view", 7.25), (10, 5, 2, "view", 1.0)]


def test_stream_maintained_rollup_equals_batch_rebuild(spark, tmp_path):
    landing = tmp_path / "landing"
    rollup_path = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    landing.mkdir()

    _events(spark, WAVE1).write.parquet(str(landing / "wave1.parquet"))
    q = run_rollup_stream(spark, str(landing), rollup_path, ckpt)
    q.awaitTermination(120)
    got1 = _served(spark.read.parquet(rollup_path))
    assert got1 == _served(build_rollup(_events(spark, WAVE1)))
    assert len(got1) == 2  # (9h, click) and (10h, view) buckets

    # second wave, same checkpoint: only the new file is processed and
    # folds into the existing table (incl. a late event into the 10h
    # bucket — late data just re-merges its bucket)
    _events(spark, WAVE2).write.parquet(str(landing / "wave2.parquet"))
    q = run_rollup_stream(spark, str(landing), rollup_path, ckpt)
    q.awaitTermination(120)
    got2 = _served(spark.read.parquet(rollup_path))
    assert got2 == _served(build_rollup(_events(spark, WAVE1 + WAVE2)))
    by_key = {(r[0], r[1]): r[2] for r in got2}
    assert by_key[(dt.datetime(2024, 1, 1, 9, 0), "click")] == 3  # late-merged
