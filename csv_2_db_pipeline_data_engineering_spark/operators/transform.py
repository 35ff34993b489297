"""Typed transform: casts, normalization, date parsing, derived columns.

Parity surface F1-F7 (SURVEY.md §2.8; reference ``src/transform.py:25-57``)
re-expressed as one declarative column block — zero Python UDFs, so the
whole stage lives inside whole-stage codegen and Catalyst can push the
later validation predicates *through* it down to the scan.

Semantics pinned to the reference:
- Numeric coercion (``pd.to_numeric(errors="coerce")``) -> ``try_cast``:
  unparseable input becomes NULL, never an error, regardless of the
  session's ANSI mode.
- Multi-format date parse, first-match-wins in DATE_FORMATS order
  (``src/transform.py:7-23``) -> ``coalesce(try_to_date × 3)``.
- trim/lower/upper normalization (``src/transform.py:45-50``).
- NULL status -> 'unknown' (``src/transform.py:51``); empty string is NOT
  filled (stays invalid and is rejected downstream, like the reference).
- ``total_sale = round(quantity * unit_price, 2)`` as exact decimal
  (``src/transform.py:54``; NUMERIC(10,2) intent in the sink DDL).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import DATE_FORMATS

logger = logging.getLogger(__name__)


def parse_date_expr(col: Column | str, formats: tuple[str, ...] = DATE_FORMATS) -> Column:
    """First-match-wins multi-format date parse; NULL if all formats fail.

    ``try_to_date`` (not ``to_date``) so a non-matching format yields NULL
    instead of raising under ANSI mode — exactly pandas
    ``strptime``-with-fallthrough (reference ``src/transform.py:13-23``).
    Format *order* matters for ambiguous strings; coalesce preserves it.
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.coalesce(*[F.try_to_date(c, fmt) for fmt in formats])


def transform(df: DataFrame) -> DataFrame:
    """Cast, normalize, and enrich the raw sales DataFrame.

    Input: 8 string columns (RAW_SCHEMA). Output: CLEAN_SCHEMA's 9 typed
    columns. One narrow ``select`` — no shuffle, fully pipelined with the
    scan; at 100 TB this stage is pure map-side throughput.
    """
    quantity = F.col("quantity").try_cast("int")
    unit_price = F.col("unit_price").try_cast("decimal(10,2)")
    out = df.select(
        F.upper(F.trim("transaction_id")).alias("transaction_id"),
        F.col("customer_id").try_cast("int").alias("customer_id"),
        F.trim("product_name").alias("product_name"),
        quantity.alias("quantity"),
        unit_price.alias("unit_price"),
        parse_date_expr("transaction_date").alias("transaction_date"),
        F.lower(F.trim("region")).alias("region"),
        F.coalesce(F.lower(F.trim("status")), F.lit("unknown")).alias("status"),
        F.round(quantity * unit_price, 2)
        .cast("decimal(10,2)")
        .alias("total_sale"),
    )
    logger.info("Transform plan built: %d columns", len(out.columns))
    return out
