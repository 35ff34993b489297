"""Structural + business-rule validation with a dead-letter split.

Parity surface P1-P4, A2 (SURVEY.md §2.2/§2.4; reference
``src/validate.py``). The reference's per-row ``iterrows`` rule engine
(``_check_row``, src/validate.py:89-113) becomes a single array-of-reasons
column expression — distributed, codegen'd, no Python in the loop.

Invariant preserved: count(clean) + count(rejected) == count(input) —
rows are never dropped silently (``src/validate.py:53``).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import EXPECTED_COLUMNS, VALID_STATUSES

logger = logging.getLogger(__name__)

REASONS_COL = "__reasons"


def validate_structure(df: DataFrame) -> None:
    """Schema-level precheck; raises ValueError on violation.

    Column-name matching is whitespace/case-insensitive (reference
    ``src/validate.py:30-34``). Runs driver-side against ``df.columns``
    (metadata only); the emptiness check is the one action, early-out
    via ``isEmpty`` so it scans at most one partition.
    """
    logger.info("Running structural validation")
    actual = {c.strip().lower() for c in df.columns}
    missing = set(EXPECTED_COLUMNS) - actual
    if missing:
        raise ValueError(f"Structural validation failed - missing columns; {missing}")
    if df.isEmpty():
        raise ValueError("Structural validation failed - DataFrame has no rows")
    # Resolve the physical column name (may carry case/whitespace noise —
    # the name check above is insensitive to it).
    key = next(c for c in df.columns if c.strip().lower() == "transaction_id")
    dupes = duplicate_key_count(df, key=key)
    if dupes > 0:
        logger.warning("Source file contains %d duplicate transaction_ids", dupes)


def duplicate_key_count(df: DataFrame, key: str = "transaction_id") -> int:
    """Number of rows carrying an already-seen key (A2).

    ``count - approx`` would be cheaper at 100 TB but the reference's
    signal is exact (``df[key].duplicated().sum()``); one aggregate-only
    shuffle of the single key column after pruning.
    """
    row = (
        df.groupBy(key)
        .count()
        .agg(F.coalesce(F.sum(F.col("count") - F.lit(1)), F.lit(0)).alias("dupes"))
        .first()
    )
    return int(row["dupes"])


def _rule(cond: Column, reason: Column | str) -> Column:
    reason = F.lit(reason) if isinstance(reason, str) else reason
    return F.when(cond, reason)


def reasons_expr() -> Column:
    """Array of ALL violated business rules for a row; empty array = clean.

    The five rules of reference ``_check_row`` (src/validate.py:89-113),
    reason strings verbatim (with the reference's tuple-append bug at
    :111 fixed to its intended formatted string — SURVEY.md §5):
    """
    return F.array_compact(
        F.array(
            _rule(
                F.col("transaction_id").isNull()
                | (F.trim(F.col("transaction_id")) == ""),
                "missing_transaction_id",
            ),
            _rule(
                F.col("transaction_date").isNull(),
                "unparseable or missing transaction date",
            ),
            _rule(
                F.col("unit_price").isNull() | (F.col("unit_price") <= 0),
                "unit_price must be a positive number",
            ),
            _rule(F.col("total_sale").isNull(), "total_sale could not be computed"),
            _rule(
                ~F.col("status").isin(*VALID_STATUSES) | F.col("status").isNull(),
                F.concat(F.lit("invalid status value: "), F.coalesce(F.col("status"), F.lit("None"))),
            ),
        )
    )


def annotate_reasons(df: DataFrame) -> DataFrame:
    """Attach the reasons array to every row (one narrow projection)."""
    return df.withColumn(REASONS_COL, reasons_expr())


def validate_rows(df: DataFrame, cache: bool = True) -> tuple[DataFrame, DataFrame]:
    """Split into (clean, rejected-with-reason) — the dead-letter router.

    Both branches filter ONE annotated plan; ``cache`` pins it so the two
    downstream writes see identical data instead of recomputing (and
    possibly re-reading a changed source) independently — the one place
    the reference's eager materialization was semantically significant
    (SURVEY.md §4.1). At 100 TB prefer ``cache=False`` + write the
    annotated frame once to a staging location if memory is tight.
    """
    logger.info("Running business rule validation")
    annotated = annotate_reasons(df)
    if cache:
        annotated = annotated.cache()
    clean = annotated.filter(F.size(REASONS_COL) == 0).drop(REASONS_COL)
    rejected = (
        annotated.filter(F.size(REASONS_COL) > 0)
        .withColumn("rejection_reason", F.array_join(F.col(REASONS_COL), " | "))
        .drop(REASONS_COL)
    )
    return clean, rejected
