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
  them), so we *probe* the raw bytes for strict UTF-8 validity (via a
  lossless latin-1 read + ``try_validate_utf8``) and read with
  ISO-8859-1 only when they are genuinely invalid — the same trigger
  semantics as the reference's decode-exception fallback
  (``src/ingest.py:46-58``), still fully distributed.
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
    """True if any string cell holds bytes that are not valid UTF-8.

    ``df`` must be a latin-1 read: latin-1 decoding is byte-lossless
    (every byte maps 1:1 to a char ≤ U+00FF), so re-encoding each cell
    with ISO-8859-1 reconstructs the file's exact original bytes, and
    ``try_validate_utf8`` checks them strictly. This is a true byte
    validity test — a file that legitimately *contains* U+FFFD as valid
    UTF-8 does not trip it (the old probe searched the UTF-8 decode for
    U+FFFD, which couldn't tell a replacement from the real character).
    CSV delimiters/quotes are ASCII and UTF-8 continuation bytes are
    ≥ 0x80, so a multi-byte sequence never spans cells — per-cell
    validation equals whole-file validation for the data bytes.

    One distributed pass with an early-out ``limit(1)``; no driver
    materialization of data.
    """
    str_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    if not str_cols:
        return False
    pred = None
    for c in str_cols:
        p = (
            F.col(c).isNotNull()
            & F.try_validate_utf8(F.encode(F.col(c), "ISO-8859-1")).isNull()
        )
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
        # Probe byte validity on a lossless latin-1 read; only the probe
        # outcome decides which decode the pipeline consumes, so a valid
        # UTF-8 file is read as UTF-8 even if it contains U+FFFD.
        probe = _read(spark, filepath, "ISO-8859-1", None)
        if _has_invalid_utf8(probe):
            logger.warning("UTF-8 failed, retrying with latin-1 encoding")
            return _read(spark, filepath, "ISO-8859-1", schema)
        return _read(spark, filepath, "UTF-8", schema)
    except Exception as exc:  # noqa: BLE001 - two-exception contract
        logger.error("Failed to read file with any supported encoding: %s", exc)
        raise RuntimeError(f"Could not read file: {filepath}") from exc
