"""JSONL source with corrupt-record dead-lettering.

Capability extension beyond the reference's CSV-only ingest
(``src/ingest.py:11-58`` reads CSV exclusively): modern training-data
feeds arrive as JSON Lines. Semantics mirror the engine's CSV contract:

- existence precheck -> FileNotFoundError (retryable) vs RuntimeError
  (non-retryable), same two-exception contract as ``ingest_csv``;
- malformed lines never kill the job: PERMISSIVE parse captures the raw
  line in a corrupt-record column, and ``split_corrupt`` severs it into
  a (clean, dead_letter) pair — the JSON analogue of the row-level
  validation split (reference ``src/validate.py:60-112``).

Scale notes (100 TB): JSONL is splittable — Spark fans a directory (or
one huge file) across executors by byte ranges, each line parsed JVM-side
by Jackson inside whole-stage codegen. An explicit ``schema`` skips the
schema-inference pre-pass, which is mandatory at scale (inference reads
the data twice). The corrupt split is a narrow filter — no shuffle.
"""

from __future__ import annotations

import logging
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

logger = logging.getLogger(__name__)

CORRUPT_COL = "_corrupt_record"


def ingest_jsonl(
    spark: SparkSession,
    filepath: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read JSON Lines (file or directory) with corrupt-record capture.

    With an explicit ``schema``, the corrupt-record column is appended
    automatically and no inference pass runs. Without one, Spark infers
    (acceptable for small interactive reads only).

    Raises:
        FileNotFoundError: path does not exist (retryable).
        RuntimeError: exists but unreadable as JSONL (non-retryable).
    """
    path = Path(filepath)
    if not path.exists():
        logger.error("File not found: %s", filepath)
        raise FileNotFoundError(f"JSONL file does not exist: {filepath}")

    try:
        if schema is None:
            # Interactive-only inference pre-pass (extra read of the data;
            # always pass a schema at scale). Spark may surface its own
            # corrupt column during inference — not a business field.
            inferred = spark.read.json(filepath).schema
            schema = T.StructType(
                [f for f in inferred.fields if f.name != CORRUPT_COL]
            )
        # Parse explicitly: text scan + from_json with a corrupt-record
        # field in the parse schema, so malformed lines carry their raw
        # text instead of killing the job. (Spark's native JSON reader
        # forbids plans that reference only its internal corrupt column;
        # explicit parsing has no such restriction, costs the same single
        # splittable scan, and stays in whole-stage codegen.)
        full = T.StructType(
            schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
        )
        raw = spark.read.text(filepath)
        return raw.select(
            F.from_json(
                "value",
                full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("__row")
        ).select("__row.*")
    except Exception as exc:  # noqa: BLE001 - two-exception contract
        logger.error("Failed to read JSONL: %s", exc)
        raise RuntimeError(f"Could not read file: {filepath}") from exc


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Sever parsed rows from dead letters.

    Returns ``(clean, dead)``: clean rows with the corrupt column
    dropped; dead rows as (raw_line, reason) for the dead-letter sink.
    Spark leaves every data column NULL on a corrupt line, so the
    corrupt column alone is the discriminator.
    """
    is_bad = F.col(CORRUPT_COL).isNotNull()
    clean = df.filter(~is_bad).drop(CORRUPT_COL)
    dead = df.filter(is_bad).select(
        F.col(CORRUPT_COL).alias("raw_line"),
        F.lit("malformed json").alias("reason"),
    )
    return clean, dead
