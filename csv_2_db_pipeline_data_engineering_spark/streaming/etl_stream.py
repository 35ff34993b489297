"""File-arrival streaming ETL: landing directory → micro-batch pipeline.

Answers the reference's declared limitation "No file delivery detection"
(reference docs/documentation.md:208) with ``readStream`` on a landing
dir. Each micro-batch reuses the *batch* transform/validate/sink logic
unchanged via ``foreachBatch`` — one code path for both modes, which is
the idiomatic Structured Streaming pattern for JDBC-style sinks.

Scale: the file source lists the landing dir incrementally (no
re-listing of processed files thanks to the checkpoint's file log);
``maxFilesPerTrigger`` bounds per-batch work so one giant drop doesn't
produce an unbounded micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.transform import transform
from ..operators.validate import validate_rows
from ..schema import RAW_SCHEMA
from ..sinks.jdbc import rejected_payload
from ..sinks.parquet_upsert import upsert_parquet


def read_landing_stream(
    spark: SparkSession,
    landing_dir: str,
    max_files_per_trigger: int | None = 100,
) -> DataFrame:
    """CSV file-arrival stream with the pipeline's explicit raw schema.

    Streaming sources require a declared schema (no inference) — the
    deterministic ``RAW_SCHEMA`` the batch path also supports.
    """
    reader = (
        spark.readStream.schema(RAW_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.csv(landing_dir)


def run_stream_pipeline(
    spark: SparkSession,
    landing_dir: str,
    clean_sink_path: str,
    rejected_sink_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream the ETL: every arriving file flows through transform →
    validate/split → idempotent clean upsert + rejected append.

    ``available_now=True`` drains everything currently in the landing dir
    then stops (batch-like, test-friendly); ``False`` runs continuously.
    Exactly-once per file: the checkpoint file-log plus the idempotent
    upsert make replays converge to the same sink state.
    """
    raw = read_landing_stream(spark, landing_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        clean, rejected = validate_rows(transform(batch_df))
        upsert_parquet(clean, clean_sink_path, key="transaction_id")
        if not rejected.isEmpty():
            rejected_payload(rejected).write.mode("append").parquet(rejected_sink_path)

    writer = raw.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
