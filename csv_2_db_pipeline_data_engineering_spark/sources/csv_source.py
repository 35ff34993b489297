"""CSV source with encoding fallback and a two-exception contract.

Parity surface S1-S3 (SURVEY.md §2.1; reference ``src/ingest.py:11-58``):

- S1 chunked CSV scan -> Spark's partitioned file scan. The reference's
  manual 10k-row chunk loop exists only to bound pandas memory; Spark's
  CSV source splits files into input partitions natively
  (``spark.sql.files.maxPartitionBytes``), so at 100 TB a directory of
  CSVs fans out across every executor with no driver materialization.
- S2 encoding fallback: UTF-8 first, then latin-1 ("never fails" — every
  byte sequence is valid latin-1, reference ``docs/documentation.md:84``).
  Spark's CSV reader does not raise on bad bytes by default (it replaces
  them), so we *probe* for invalid UTF-8 declaratively and re-read with
  ISO-8859-1 when found — same observable result as the reference, still
  fully distributed.
- S3 existence precheck, FileNotFoundError distinct from RuntimeError
  (two-exception contract, reference ``docs/documentation.md:67-81``).
"""

from __future__ import annotations

import logging
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

logger = logging.getLogger(__name__)

_REPLACEMENT_CHAR = "�"  # U+FFFD: what UTF-8 decode emits for bad bytes


def _read(spark: SparkSession, path: str, encoding: str, schema: T.StructType | None) -> DataFrame:
    # Always read header-based all-strings first. Passing the schema
    # directly to the reader would (a) bind columns by POSITION, not
    # name, and (b) let PERMISSIVE mode pad missing columns with NULLs —
    # so a structurally broken file would silently pass the column check.
    # The reference binds by header name (pandas); so do we.
    df = (
        spark.read.option("header", True)
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
        .option("inferSchema", False)
        .csv(path)
    )
    if schema is None:
        return df
    # Map file columns to schema fields by normalized name; leave the
    # frame untouched if any field is missing (structural validation
    # reports it with the proper ValueError contract downstream).
    by_norm = {c.strip().lower(): c for c in df.columns}
    wanted = schema.fieldNames()
    if not set(wanted) <= set(by_norm):
        return df
    canonical = [F.col(f"`{by_norm[w]}`").alias(w) for w in wanted]
    extras = [F.col(f"`{c}`") for c in df.columns if c.strip().lower() not in set(wanted)]
    return df.select(*canonical, *extras)


def _has_invalid_utf8(df: DataFrame) -> bool:
    """True if any string cell decoded to U+FFFD (invalid UTF-8 bytes).

    One distributed pass with an early-out ``limit(1)``; no driver
    materialization of data.
    """
    str_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    if not str_cols:
        return False
    pred = None
    for c in str_cols:
        p = F.col(c).contains(_REPLACEMENT_CHAR)
        pred = p if pred is None else (pred | p)
    return df.filter(pred).limit(1).count() > 0


def ingest_csv(
    spark: SparkSession,
    filepath: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read a CSV (file or directory of files) into a DataFrame.

    Raises:
        FileNotFoundError: path does not exist (retryable: upstream
            delivery problem — reference ``src/ingest.py:28-30``).
        RuntimeError: file exists but cannot be read as CSV at all
            (non-retryable: corrupt file — ``src/ingest.py:56-58``).
    """
    path = Path(filepath)
    if not path.exists():
        logger.error("File not found: %s", filepath)
        raise FileNotFoundError(f"CSV file does not exist: {filepath}")

    logger.info("Reading file: %s", filepath)
    try:
        df = _read(spark, filepath, "UTF-8", schema)
        if _has_invalid_utf8(df):
            logger.warning("UTF-8 failed, retrying with latin-1 encoding")
            df = _read(spark, filepath, "ISO-8859-1", schema)
        return df
    except Exception as exc:  # noqa: BLE001 - two-exception contract
        logger.error("Failed to read file with any supported encoding: %s", exc)
        raise RuntimeError(f"Could not read file: {filepath}") from exc
