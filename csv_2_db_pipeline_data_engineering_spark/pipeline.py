"""End-to-end sales ETL pipeline orchestration.

Parity with reference ``main.py:41-136``: run-id, staged execution with
per-stage failure contracts, dead-letter split, idempotent load, summary
metrics. Stage-halt semantics stay driver-side; data never touches the
driver.

Stages (reference ``main.py:45-50``):
    0 bootstrap -> 1 ingest -> 2 structural validation -> 3 transform
    -> 4 business validation/split -> 5 load (clean upsert + rejected
    append) -> 6 summary
"""

from __future__ import annotations

import logging
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession

from .operators.transform import transform
from .operators.validate import validate_rows, validate_structure
from .schema import RAW_SCHEMA
from .sinks.jdbc import rejected_payload
from .sinks.parquet_upsert import upsert_parquet
from .sources.csv_source import ingest_csv

logger = logging.getLogger(__name__)


@dataclass
class RunSummary:
    """The reference's logged summary block (``main.py:125-136``)."""

    run_id: str
    input_rows: int
    clean_rows: int
    rejected_rows: int
    duration_sec: float

    @property
    def rejection_rate_pct(self) -> float:
        if self.input_rows == 0:
            return 0.0
        return round(self.rejected_rows / self.input_rows * 100, 1)


def run_pipeline(
    spark: SparkSession,
    filepath: str,
    clean_sink_path: str,
    rejected_sink_path: str,
    metrics_path: str | None = None,
) -> RunSummary:
    """Run the full ETL against file-based sinks (parquet upsert + append).

    For the Postgres sinks of the reference, swap the two writes for
    ``sinks.jdbc.load_clean_jdbc`` / ``load_rejected_jdbc`` — the plan up
    to the writes is identical.

    Raises (two-exception ingest contract + structural ValueError —
    reference ``main.py:74-97``):
        FileNotFoundError, RuntimeError, ValueError
    """
    run_id = uuid.uuid4().hex[:8]
    start = time.monotonic()
    logger.info("[%s] pipeline start: %s", run_id, filepath)

    raw = ingest_csv(spark, filepath, schema=RAW_SCHEMA)
    validate_structure(raw)

    transformed = transform(raw)
    clean, rejected = validate_rows(transformed)

    upsert_parquet(clean, clean_sink_path, key="transaction_id")
    rejected_count = rejected.count()
    if rejected_count:
        rejected_payload(rejected).write.mode("append").parquet(rejected_sink_path)

    # The split is exhaustive and disjoint (every row gets exactly one
    # branch — invariant pytest-pinned), so the input count is derived
    # from the two cached branch counts instead of re-scanning the
    # source: at 100 TB `raw.count()` was a full extra CSV pass per run.
    n_clean = clean.count()
    input_rows = n_clean + rejected_count
    summary = RunSummary(
        run_id=run_id,
        input_rows=input_rows,
        clean_rows=n_clean,
        rejected_rows=rejected_count,
        duration_sec=round(time.monotonic() - start, 2),
    )
    logger.info(
        "[%s] done: input=%d clean=%d rejected=%d (%.1f%%) in %.2fs",
        run_id,
        summary.input_rows,
        summary.clean_rows,
        summary.rejected_rows,
        summary.rejection_rate_pct,
        summary.duration_sec,
    )
    if metrics_path is not None:
        # Durable twin of the reference's logged summary block: one
        # appended row per run, so operational history (rejection-rate
        # drift, volume trends) is queryable instead of grep-able.
        spark.createDataFrame(
            [
                (
                    summary.run_id,
                    filepath,
                    summary.input_rows,
                    summary.clean_rows,
                    summary.rejected_rows,
                    summary.rejection_rate_pct,
                    summary.duration_sec,
                )
            ],
            "run_id string, source string, input_rows long, clean_rows long, "
            "rejected_rows long, rejection_rate_pct double, duration_sec double",
        ).coalesce(1).write.mode("append").parquet(metrics_path)
    if summary.clean_rows == 0:
        # Reference halts when nothing survives validation (main.py:111-114).
        logger.error("[%s] no clean rows produced - halting", run_id)
    return summary
