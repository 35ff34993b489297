import pytest
from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.operators.transform import transform
from csv_2_db_pipeline_data_engineering_spark.operators.validate import (
    duplicate_key_count,
    validate_rows,
    validate_structure,
)
from csv_2_db_pipeline_data_engineering_spark.schema import RAW_SCHEMA
from csv_2_db_pipeline_data_engineering_spark.sources.csv_source import ingest_csv


def test_structure_missing_column_raises(spark):
    df = spark.createDataFrame([("a",)], "transaction_id: string")
    with pytest.raises(ValueError, match="missing columns"):
        validate_structure(df)


def test_structure_case_whitespace_insensitive(spark):
    cols = [
        " Transaction_ID ",
        "CUSTOMER_ID",
        "product_name",
        "quantity",
        "unit_price",
        "transaction_date",
        "region",
        "status",
    ]
    df = spark.createDataFrame([tuple("x" for _ in cols)], ", ".join(f"`{c}`: string" for c in cols))
    validate_structure(df)  # should not raise


def test_structure_empty_raises(spark):
    df = spark.createDataFrame([], RAW_SCHEMA)
    with pytest.raises(ValueError, match="no rows"):
        validate_structure(df)


def test_duplicate_key_count(spark):
    df = spark.createDataFrame(
        [("T1",), ("T1",), ("T2",), ("T1",)], "transaction_id: string"
    )
    assert duplicate_key_count(df) == 2


def test_split_invariant_and_reasons(spark, golden_csv):
    raw = ingest_csv(spark, golden_csv, schema=RAW_SCHEMA)
    clean, rejected = validate_rows(transform(raw))
    n_clean, n_rej = clean.count(), rejected.count()
    assert n_clean + n_rej == raw.count()  # never drop silently
    # Golden trace: 9 clean, 1 rejected (T006, invalid status 'shipped')
    assert (n_clean, n_rej) == (9, 1)
    rej = rejected.first()
    assert rej["transaction_id"] == "T006"
    assert rej["rejection_reason"] == "invalid status value: shipped"


def test_multiple_reasons_pipe_joined(spark):
    # quantity unparseable -> total_sale NULL (rule 4); unit_price negative
    # (rule 3); blank id (rule 1); bad date (rule 2); bad status (rule 5).
    raw = spark.createDataFrame(
        [("", "1", "p", "abc", "-5", "not-a-date", "r", "bogus")], RAW_SCHEMA
    )
    _, rejected = validate_rows(transform(raw))
    reason = rejected.first()["rejection_reason"]
    assert reason.split(" | ") == [
        "missing_transaction_id",
        "unparseable or missing transaction date",
        "unit_price must be a positive number",
        "total_sale could not be computed",
        "invalid status value: bogus",
    ]


def test_null_unit_price_rejected(spark):
    raw = spark.createDataFrame(
        [("T1", "1", "p", "2", "abc", "2024-01-01", "r", "pending")], RAW_SCHEMA
    )
    _, rejected = validate_rows(transform(raw))
    assert "unit_price must be a positive number" in rejected.first()["rejection_reason"]


def test_validation_is_udf_free(spark, golden_csv):
    raw = ingest_csv(spark, golden_csv, schema=RAW_SCHEMA)
    clean, _ = validate_rows(transform(raw), cache=False)
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
