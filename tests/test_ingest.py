import pytest

from csv_2_db_pipeline_data_engineering_spark.schema import RAW_SCHEMA
from csv_2_db_pipeline_data_engineering_spark.sources.csv_source import ingest_csv


def test_reads_utf8(spark, golden_csv):
    df = ingest_csv(spark, golden_csv, schema=RAW_SCHEMA)
    assert df.count() == 10
    assert set(df.columns) == set(RAW_SCHEMA.fieldNames())


def test_missing_file_raises_filenotfound(spark):
    with pytest.raises(FileNotFoundError):
        ingest_csv(spark, "/nonexistent/path.csv")


def test_latin1_fallback(spark, tmp_path):
    # 0xE9 = 'é' in latin-1, invalid as UTF-8 -> must trigger the fallback
    # read (reference src/ingest.py:46-54: "latin-1 never fails").
    raw = (
        b"transaction_id,customer_id,product_name,quantity,unit_price,"
        b"transaction_date,region,status\n"
        b"T001,101,Caf\xe9 Grande,3,19.99,2024-01-15,North,completed\n"
    )
    p = tmp_path / "latin1.csv"
    p.write_bytes(raw)
    df = ingest_csv(spark, str(p), schema=RAW_SCHEMA)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["product_name"] == "Café Grande"


def test_all_strings_without_schema(spark, golden_csv):
    df = ingest_csv(spark, golden_csv)
    assert all(t == "string" for _, t in df.dtypes)


def test_legit_replacement_char_stays_utf8(spark, tmp_path):
    # A *valid* UTF-8 file that genuinely contains U+FFFD (bytes EF BF
    # BD) must NOT trigger the latin-1 fallback: the probe checks byte
    # validity, not the presence of the replacement character. Under a
    # latin-1 misread these bytes would mangle to 'ï»½'.
    raw = (
        "transaction_id,customer_id,product_name,quantity,unit_price,"
        "transaction_date,region,status\n"
        "T001,101,Widget � Pro,3,19.99,2024-01-15,North,completed\n"
    ).encode("utf-8")
    p = tmp_path / "fffd.csv"
    p.write_bytes(raw)
    df = ingest_csv(spark, str(p), schema=RAW_SCHEMA)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["product_name"] == "Widget � Pro"
