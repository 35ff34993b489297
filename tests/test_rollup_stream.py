"""Streaming continuous aggregate == batch rebuild over the same events,
plus the storage contract: partition-pruned rewrites (untouched
bucket-date partitions are byte-identical after a fold) and exactly-once
crash-replay (re-folding an applied batch_id is a no-op).
"""

from __future__ import annotations

import datetime as dt
import hashlib
from pathlib import Path

from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.operators.rollup import (
    build_rollup,
    serve_rollup,
)
from csv_2_db_pipeline_data_engineering_spark.streaming.rollup_stream import (
    EVENT_SCHEMA,
    fold_rollup_batch,
    read_rollup,
    run_rollup_stream,
)


def _events(spark, rows):
    data = [
        (i, dt.datetime(2024, 1, day, h, m), uid, et, v, "{}")
        for i, (day, h, m, uid, et, v) in enumerate(rows)
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


def _data_file_digests(rollup_path: str) -> dict[str, str]:
    """sha256 of every committed parquet data file, keyed by relative path."""
    out = {}
    root = Path(rollup_path)
    for p in root.rglob("*.parquet"):
        out[str(p.relative_to(root))] = hashlib.sha256(p.read_bytes()).hexdigest()
    return out


# (day, hour, minute, user_id, event_type, value)
WAVE1 = [
    (1, 9, 0, 1, "click", 1.5),
    (1, 9, 30, 2, "click", 2.5),
    (1, 10, 0, 1, "view", 4.0),
    (2, 8, 15, 3, "view", 6.0),
]
# second wave touches ONLY day 2 (one late re-merge) and a new day 3
WAVE2 = [
    (2, 8, 45, 1, "view", 3.0),
    (3, 12, 0, 2, "click", 7.25),
]


def test_stream_maintained_rollup_equals_batch_rebuild(spark, tmp_path):
    landing = tmp_path / "landing"
    rollup_path = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    landing.mkdir()

    _events(spark, WAVE1).write.parquet(str(landing / "wave1.parquet"))
    q = run_rollup_stream(spark, str(landing), rollup_path, ckpt)
    q.awaitTermination(120)
    stored1 = read_rollup(spark, rollup_path)
    got1 = _served(stored1.drop("bucket_date"))
    assert got1 == _served(build_rollup(_events(spark, WAVE1)))
    assert len(got1) == 3  # (d1 9h, click), (d1 10h, view), (d2 8h, view)

    # second wave, same checkpoint: only the new file is processed and
    # folds into the existing table (incl. a late event into day 2's
    # 8h bucket — late data just re-merges its bucket)
    _events(spark, WAVE2).write.parquet(str(landing / "wave2.parquet"))
    q = run_rollup_stream(spark, str(landing), rollup_path, ckpt)
    q.awaitTermination(120)
    got2 = _served(read_rollup(spark, rollup_path).drop("bucket_date"))
    assert got2 == _served(build_rollup(_events(spark, WAVE1 + WAVE2)))
    by_key = {(r[0], r[1]): r[2] for r in got2}
    assert by_key[(dt.datetime(2024, 1, 2, 8, 0), "view")] == 2  # late-merged


def test_fold_rewrites_only_touched_partitions(spark, tmp_path):
    rollup_path = str(tmp_path / "rollup")
    fold_rollup_batch(spark, _events(spark, WAVE1), rollup_path, batch_id=0)
    before = _data_file_digests(rollup_path)
    assert any(p.startswith("bucket_date=2024-01-01/") for p in before)

    # wave 2 touches day 2 (late) and day 3 — day 1 must not be rewritten
    fold_rollup_batch(spark, _events(spark, WAVE2), rollup_path, batch_id=1)
    after = _data_file_digests(rollup_path)

    day1_before = {p: h for p, h in before.items() if p.startswith("bucket_date=2024-01-01/")}
    day1_after = {p: h for p, h in after.items() if p.startswith("bucket_date=2024-01-01/")}
    assert day1_before == day1_after  # byte-identical, same files
    # touched partitions DID move to new version dirs
    assert {p for p in after if p.startswith("bucket_date=2024-01-02/")} != {
        p for p in before if p.startswith("bucket_date=2024-01-02/")
    }
    assert any(p.startswith("bucket_date=2024-01-03/") for p in after)


def test_fold_replay_same_batch_id_is_noop(spark, tmp_path):
    rollup_path = str(tmp_path / "rollup")
    batch1 = _events(spark, WAVE1)
    batch2 = _events(spark, WAVE2)
    fold_rollup_batch(spark, batch1, rollup_path, batch_id=0)
    fold_rollup_batch(spark, batch2, rollup_path, batch_id=1)
    snapshot = _data_file_digests(rollup_path)
    served = _served(read_rollup(spark, rollup_path).drop("bucket_date"))

    # crash-replay: the checkpoint hands the SAME batch to fold again
    fold_rollup_batch(spark, batch2, rollup_path, batch_id=1)
    assert _data_file_digests(rollup_path) == snapshot  # bytes untouched
    assert _served(read_rollup(spark, rollup_path).drop("bucket_date")) == served
    # and the merge applied exactly once: day-2 8h bucket has 2 rows, not 3
    by_key = {(r[0], r[1]): r[2] for r in served}
    assert by_key[(dt.datetime(2024, 1, 2, 8, 0), "view")] == 2
