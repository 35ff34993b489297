"""transformWithStateInPandas: running per-key aggregates with owned state."""

from __future__ import annotations

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="transformWithState's state protocol needs protobuf "
    "(absent in this container; see streaming/stateful.py docstring)",
)

from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
from csv_2_db_pipeline_data_engineering_spark.streaming.stateful import (
    running_user_stats,
)
from tests.conftest import SF_DIR


def test_running_user_stats_converges_to_batch_aggregate(spark, tmp_path):
    """Drain a bounded multi-batch stream: the LAST emitted update per
    user must equal the plain groupBy aggregate, and counts must be
    non-decreasing across a user's updates (state carried forward)."""
    ev = load_table(spark, SF_DIR, "events").select("user_id", "value")
    src = str(tmp_path / "in")
    # several files -> several micro-batches (state must persist across)
    ev.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("tws_running")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stateful stream did not terminate"

    got = spark.table("tws_running")
    # the final (largest-count) update per user is the converged state
    final = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("value_sum").alias("value_sum"),
    )
    exp = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("value_sum")
    )
    j = final.alias("g").join(exp.alias("e"), "user_id").collect()
    assert j and len(j) == exp.count()
    for r in j:
        assert r["g.n_events"] == r["e.n_events"]
        assert abs(r["g.value_sum"] - r["e.value_sum"]) < 1e-6

    # at least one update per user was emitted (running state carried)
    assert got.count() >= exp.count()
