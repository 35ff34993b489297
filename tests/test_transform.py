import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.operators.transform import (
    parse_date_expr,
    transform,
)
from csv_2_db_pipeline_data_engineering_spark.schema import RAW_SCHEMA


def _raw(spark, **overrides):
    base = {
        "transaction_id": " t001 ",
        "customer_id": "101",
        "product_name": " Widget ",
        "quantity": "3",
        "unit_price": "19.99",
        "transaction_date": "2024-01-15",
        "region": " NORTH ",
        "status": " Completed ",
    }
    base.update(overrides)
    return spark.createDataFrame([tuple(base[f] for f in RAW_SCHEMA.fieldNames())], RAW_SCHEMA)


def test_normalization_and_derivation(spark):
    row = transform(_raw(spark)).first()
    assert row["transaction_id"] == "T001"
    assert row["region"] == "north"
    assert row["product_name"] == "Widget"
    assert row["status"] == "completed"
    assert row["customer_id"] == 101
    assert row["quantity"] == 3
    assert row["unit_price"] == Decimal("19.99")
    assert row["total_sale"] == Decimal("59.97")
    assert row["transaction_date"] == datetime.date(2024, 1, 15)


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("2024-01-15", datetime.date(2024, 1, 15)),
        ("15/01/2024", datetime.date(2024, 1, 15)),  # day-first, reference %d/%m/%Y
        ("Jan 15 2024", datetime.date(2024, 1, 15)),
        (" 2024-01-15 ", datetime.date(2024, 1, 15)),  # pre-parse strip
        ("2024/13/45", None),
        ("15-Jan-24", None),
        (None, None),
    ],
)
def test_multiformat_date_parse(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "d: string").select(
        parse_date_expr("d").alias("parsed")
    )
    assert df.first()["parsed"] == expected


def test_ambiguous_date_first_format_wins(spark):
    # '03/04/2024' parses as yyyy-M-d? no -> d/M/yyyy -> April 3rd
    # (day-first), matching the reference's DATE_FORMATS order.
    df = spark.createDataFrame([("03/04/2024",)], "d: string").select(
        parse_date_expr("d").alias("parsed")
    )
    assert df.first()["parsed"] == datetime.date(2024, 4, 3)


def test_coerce_semantics_bad_numerics(spark):
    row = transform(
        _raw(spark, quantity="abc", unit_price="", customer_id="x9")
    ).first()
    assert row["quantity"] is None
    assert row["unit_price"] is None
    assert row["customer_id"] is None
    assert row["total_sale"] is None  # NULL-propagating multiply


def test_null_status_becomes_unknown_but_blank_does_not(spark):
    assert transform(_raw(spark, status=None)).first()["status"] == "unknown"
    assert transform(_raw(spark, status="  ")).first()["status"] == ""


def test_transform_is_udf_free(spark):
    plan = transform(_raw(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
