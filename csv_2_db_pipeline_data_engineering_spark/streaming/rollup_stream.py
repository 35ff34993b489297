"""Streaming continuous aggregate: fold arriving event files into a
persistent rollup table — the hypertable refresh loop on Spark.

``operators.rollup`` proves the algebra (rollup(base ∪ delta) ==
merge(rollup(base), rollup(delta))); this module is the production
wiring: a file-arrival stream whose every micro-batch is aggregated to
mergeable partials and folded into the stored rollup via
``foreachBatch``. History is never rescanned — per batch the work is
O(delta + touched partitions), never O(rollup table).

Storage layout (plain parquet made transactional):

    rollup_path/
      _MANIFEST.json                    <- single atomic commit point
      bucket_date=2024-01-01/v7/*.parquet
      bucket_date=2024-01-02/v12/*.parquet

The manifest records the last applied streaming ``batch_id`` and, per
bucket-date partition, which version directory is live. A fold

1. no-ops if the manifest already records this ``batch_id`` (replay
   after a crash-between-commit-and-checkpoint — the exactly-once
   guarantee; the streaming twin of the reference's upsert idempotency
   contract, reference ``README.md:150``);
2. aggregates the delta and lists the bucket dates it touches;
3. reads ONLY those partitions' live version dirs (path-level pruning —
   untouched partitions are never read, let alone rewritten);
4. writes merged partitions to ``bucket_date=D/v{batch_id}`` (a replay
   of an uncommitted fold overwrites the same dirs — idempotent because
   the manifest still points at the previous versions it merged from);
5. commits by atomically replacing ``_MANIFEST.json`` (``os.replace``),
   then garbage-collects superseded version dirs.

A crash anywhere before (5) leaves the old manifest and old version
dirs intact, so the replayed batch recomputes the identical merge; a
crash after (5) is caught by (1). Stale ``v*`` dirs from a crashed GC
are unreferenced garbage, removed by the next fold of that partition.

Scale notes (100 TB of history): the rollup table is per-(bucket, key)
compact and partitioned by bucket date, so a GB-sized delta touching a
handful of recent days reads and rewrites only those days' partials —
the same partition-pruned maintenance a hypertable refresh does. The
only driver-side materialization is the list of touched bucket DATES
(bounded by the delta's time span, not its rows) and the manifest
(one small JSON per table).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.rollup import build_rollup, merge_rollup

#: schema of the ``events`` table (streaming sources require one declared)
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_MANIFEST = "_MANIFEST.json"


def _read_manifest(rollup_path: str) -> dict | None:
    p = os.path.join(rollup_path, _MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as fh:
        return json.load(fh)


def _commit_manifest(rollup_path: str, manifest: dict) -> None:
    """Atomic commit: tmp file + ``os.replace`` (POSIX rename atomicity)."""
    fd, tmp = tempfile.mkstemp(prefix="._manifest_", dir=rollup_path)
    with os.fdopen(fd, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(rollup_path, _MANIFEST))


def _partition_dir(rollup_path: str, date: str, version: int) -> str:
    return os.path.join(rollup_path, f"bucket_date={date}", f"v{version}")


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame | None:
    """Load the committed rollup (manifest-referenced version dirs only).

    Returns None when no fold has committed yet. ``bucket_date`` is a
    regular column in the data files, so consumers can partition-prune
    by reading a subset of the manifest's dirs the same way ``fold``
    does.
    """
    manifest = _read_manifest(rollup_path)
    if manifest is None or not manifest["partitions"]:
        return None
    paths = [
        _partition_dir(rollup_path, date, version)
        for date, version in manifest["partitions"].items()
    ]
    return spark.read.parquet(*paths)


def fold_rollup_batch(
    spark: SparkSession, batch_df: DataFrame, rollup_path: str, batch_id: int
) -> None:
    """Merge one micro-batch of raw events into the stored rollup.

    Exactly-once under crash-replay: the manifest's ``batch_id`` gate
    plus write-then-atomic-commit make a replayed fold either a no-op
    (already committed) or a byte-level redo of the uncommitted attempt
    (same inputs — the manifest still references the pre-batch
    versions). Cost is O(delta + touched partitions).
    """
    manifest = _read_manifest(rollup_path)
    if manifest is not None and manifest.get("batch_id") == batch_id:
        return  # crash-replay of an already-committed batch
    if batch_df.isEmpty():
        if manifest is not None:  # still record the id so replay detection holds
            _commit_manifest(rollup_path, {**manifest, "batch_id": batch_id})
        return
    os.makedirs(rollup_path, exist_ok=True)
    partitions: dict[str, int] = dict(manifest["partitions"]) if manifest else {}
    # Version dirs use a monotone counter over COMMITTED versions, not the
    # raw batch id: deterministic under replay (the manifest is unchanged
    # until commit, so a replayed fold recomputes the same version and
    # overwrites its own uncommitted dirs), and never colliding with a
    # live dir even if the stream's checkpoint is reset and batch ids
    # restart. (The batch_id replay gate above does assume one rollup
    # table ↔ one checkpoint lineage, the standard streaming contract.)
    version = 1 + max(partitions.values(), default=-1)

    delta = (
        build_rollup(batch_df)
        .withColumn("bucket_date", F.to_date("bucket_start"))
        .localCheckpoint(eager=True)  # delta is bucket-count sized; computed once
    )
    touched = sorted(
        r[0].isoformat() for r in delta.select("bucket_date").distinct().collect()
    )

    base_paths = [
        _partition_dir(rollup_path, d, partitions[d]) for d in touched if d in partitions
    ]
    if base_paths:
        base = spark.read.parquet(*base_paths)
        merged = merge_rollup(base, delta.drop("bucket_date")).withColumn(
            "bucket_date", F.to_date("bucket_start")
        )
    else:
        merged = delta

    # Write every touched partition in ONE job (partitionBy on a derived
    # string key so ``bucket_date`` stays a data column), then move each
    # partition dir to its versioned location. Overwrite-on-move makes a
    # replayed uncommitted fold idempotent.
    staging = tempfile.mkdtemp(prefix=".rollup_batch_", dir=rollup_path)
    try:
        (
            merged.withColumn("p", F.col("bucket_date").cast("string"))
            .write.mode("overwrite")
            .partitionBy("p")
            .parquet(staging)
        )
        for d in touched:
            src = os.path.join(staging, f"p={d}")
            dst = _partition_dir(rollup_path, d, version)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if os.path.exists(dst):
                shutil.rmtree(dst)
            os.replace(src, dst)
    finally:
        shutil.rmtree(staging, ignore_errors=True)

    for d in touched:
        partitions[d] = version
    _commit_manifest(rollup_path, {"batch_id": batch_id, "partitions": partitions})

    # GC superseded versions of the touched partitions (post-commit:
    # a crash here only leaves unreferenced garbage, cleaned next fold).
    for d in touched:
        pdir = os.path.join(rollup_path, f"bucket_date={d}")
        for v in os.listdir(pdir):
            if v != f"v{version}":
                shutil.rmtree(os.path.join(pdir, v), ignore_errors=True)


def run_rollup_stream(
    spark: SparkSession,
    landing_dir: str,
    rollup_path: str,
    checkpoint_dir: str,
    schema: T.StructType = EVENT_SCHEMA,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain the rollup table from parquet files arriving in
    ``landing_dir``. ``available_now=True`` drains what is present and
    stops (test-friendly); ``False`` runs continuously.
    """
    # recursiveFileLookup: producers often land whole directories (one
    # spark write = a dir of part files); pick those up too instead of
    # treating subdirs as partition columns.
    events = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(landing_dir)
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_rollup_batch(spark, batch_df, rollup_path, batch_id)

    writer = events.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
