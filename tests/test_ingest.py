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


def test_single_scan_for_valid_utf8_file(spark, golden_csv):
    # The r4-flagged 2x-I/O: the old eager probe ran a full-file count
    # during ingest. Now ingest itself may trigger at most the reader's
    # header-resolution job, and the returned plan scans the csv exactly
    # once — encoding fallback is per-cell inside the same plan.
    sc = spark.sparkContext
    group = "ingest-scan-count"
    sc.setJobGroup(group, "ingest construction")
    try:
        df = ingest_csv(spark, golden_csv, schema=RAW_SCHEMA)
    finally:
        sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    assert len(tracker.getJobIdsForGroup(group)) <= 1, (
        "ingest_csv must not run a data-scan probe job"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan csv") == 1, "consumed plan must scan the file once"


def test_latin1_file_construction_runs_no_probe_job(spark, tmp_path):
    raw = (
        b"transaction_id,customer_id,product_name,quantity,unit_price,"
        b"transaction_date,region,status\n"
        b"T001,101,Caf\xe9 Grande,3,19.99,2024-01-15,North,completed\n"
    )
    p = tmp_path / "latin1_scan.csv"
    p.write_bytes(raw)
    sc = spark.sparkContext
    group = "ingest-scan-count-latin1"
    sc.setJobGroup(group, "ingest construction")
    try:
        df = ingest_csv(spark, str(p), schema=RAW_SCHEMA)
    finally:
        sc.setJobGroup(None, None)
    assert len(sc.statusTracker().getJobIdsForGroup(group)) <= 1
    assert df.collect()[0]["product_name"] == "Café Grande"


def test_mixed_encoding_file_decodes_per_cell(spark, tmp_path):
    # A genuinely mixed file: row 1 has invalid-UTF-8 latin-1 bytes
    # (0xE9), row 2 a VALID non-ASCII UTF-8 cell (C3 A9). No single
    # whole-file encoding decodes both faithfully; the per-cell rule
    # does (documented divergence from the reference's whole-file
    # fallback, which would mojibake row 2 to 'CafÃ©').
    raw = (
        b"transaction_id,customer_id,product_name,quantity,unit_price,"
        b"transaction_date,region,status\n"
        b"T001,101,Caf\xe9 Uno,3,19.99,2024-01-15,North,completed\n"
        b"T002,102,Caf\xc3\xa9 Dos,1,9.99,2024-01-16,South,completed\n"
    )
    p = tmp_path / "mixed.csv"
    p.write_bytes(raw)
    names = {r["transaction_id"]: r["product_name"]
             for r in ingest_csv(spark, str(p), schema=RAW_SCHEMA).collect()}
    assert names == {"T001": "Café Uno", "T002": "Café Dos"}


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
