"""Schemas and contracts for the sales ETL parity surface.

Mirrors the reference's three type layers (SURVEY.md §1.2):
raw/inferred CSV -> typed working schema -> fixed sink DDL.
Evidence: reference ``src/validate.py:6-17`` (expected columns, statuses),
``src/load.py:34-53`` (sink DDL).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Required input columns (reference src/validate.py:6-15). Matching is
# whitespace/case-insensitive on the *names* only (src/validate.py:30).
EXPECTED_COLUMNS: frozenset[str] = frozenset(
    {
        "transaction_id",
        "customer_id",
        "product_name",
        "quantity",
        "unit_price",
        "transaction_date",
        "region",
        "status",
    }
)

# Valid post-normalization statuses (reference src/validate.py:17).
VALID_STATUSES: tuple[str, ...] = ("completed", "pending", "cancelled", "unknown")

# Date formats tried in order; first match wins (reference
# src/transform.py:7-11: %Y-%m-%d, %d/%m/%Y, %b %d %Y). Spark patterns use
# single-letter day/month so both zero-padded and bare values parse.
DATE_FORMATS: tuple[str, ...] = ("yyyy-M-d", "d/M/yyyy", "MMM d yyyy")

# Raw CSV read schema: all strings, so the transform layer owns every cast
# decision deterministically (vs pandas type inference, src/ingest.py:40).
RAW_SCHEMA = T.StructType(
    [
        T.StructField("transaction_id", T.StringType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("quantity", T.StringType()),
        T.StructField("unit_price", T.StringType()),
        T.StructField("transaction_date", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("status", T.StringType()),
    ]
)

# Typed working schema after transform (reference sink DDL src/load.py:34-45).
CLEAN_SCHEMA = T.StructType(
    [
        T.StructField("transaction_id", T.StringType()),
        T.StructField("customer_id", T.IntegerType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("quantity", T.IntegerType()),
        T.StructField("unit_price", T.DecimalType(10, 2)),
        T.StructField("transaction_date", T.DateType()),
        T.StructField("region", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("total_sale", T.DecimalType(10, 2)),
    ]
)

SALES_TABLE = "sales_transactions"
REJECTED_TABLE = "rejected_rows"

# DDL for the JDBC sink bootstrap (reference src/load.py:34-53).
SALES_DDL = f"""
CREATE TABLE IF NOT EXISTS {SALES_TABLE} (
    transaction_id   VARCHAR(20) PRIMARY KEY,
    customer_id      INTEGER NOT NULL,
    product_name     VARCHAR(100) NOT NULL,
    quantity         INTEGER NOT NULL,
    unit_price       NUMERIC(10,2) NOT NULL,
    transaction_date DATE NOT NULL,
    region           VARCHAR(50),
    status           VARCHAR(20),
    total_sale       NUMERIC(10,2),
    loaded_at        TIMESTAMP DEFAULT CURRENT_TIMESTAMP
)
"""

REJECTED_DDL = f"""
CREATE TABLE IF NOT EXISTS {REJECTED_TABLE} (
    id               SERIAL PRIMARY KEY,
    transaction_id   VARCHAR(20),
    raw_data         TEXT,
    rejection_reason TEXT NOT NULL,
    rejected_at      TIMESTAMP DEFAULT CURRENT_TIMESTAMP
)
"""
