import pytest

from csv_2_db_pipeline_data_engineering_spark.pipeline import run_pipeline
from csv_2_db_pipeline_data_engineering_spark.sinks.parquet_upsert import upsert_parquet


def test_golden_trace(spark, golden_csv, tmp_path):
    clean_path = str(tmp_path / "sales_transactions")
    rej_path = str(tmp_path / "rejected_rows")
    s = run_pipeline(spark, golden_csv, clean_path, rej_path)
    # Golden trace (reference README.md:163-167): 10 -> 9 clean, 1 rejected, 10%
    assert (s.input_rows, s.clean_rows, s.rejected_rows) == (10, 9, 1)
    assert s.rejection_rate_pct == 10.0

    clean = spark.read.parquet(clean_path)
    assert clean.count() == 9
    rej = spark.read.parquet(rej_path)
    row = rej.first()
    assert row["transaction_id"] == "T006"
    assert "invalid status value: shipped" in row["rejection_reason"]
    assert '"product_name":"Gadget Max"' in row["raw_data"]


def test_metrics_history_appends_per_run(spark, golden_csv, tmp_path):
    m = str(tmp_path / "run_metrics")
    run_pipeline(spark, golden_csv, str(tmp_path / "c"), str(tmp_path / "r"),
                 metrics_path=m)
    run_pipeline(spark, golden_csv, str(tmp_path / "c"), str(tmp_path / "r"),
                 metrics_path=m)
    hist = spark.read.parquet(m)
    rows = hist.collect()
    assert len(rows) == 2
    assert len({r["run_id"] for r in rows}) == 2
    assert all(
        (r["input_rows"], r["clean_rows"], r["rejected_rows"]) == (10, 9, 1)
        and r["rejection_rate_pct"] == 10.0
        for r in rows
    )


def test_idempotent_rerun(spark, golden_csv, tmp_path):
    """Reference README.md:150: run twice -> identical clean counts."""
    clean_path = str(tmp_path / "sales_transactions")
    rej_path = str(tmp_path / "rejected_rows")
    s1 = run_pipeline(spark, golden_csv, clean_path, rej_path)
    s2 = run_pipeline(spark, golden_csv, clean_path, rej_path)
    clean = spark.read.parquet(clean_path)
    assert clean.count() == 9  # upsert: second run changed nothing
    assert clean.select("transaction_id").distinct().count() == 9
    assert s1.clean_rows == s2.clean_rows
    # dead-letter append is faithfully non-idempotent (SURVEY.md §4.2)
    assert spark.read.parquet(rej_path).count() == 2


def test_upsert_updates_existing_key(spark, tmp_path):
    path = str(tmp_path / "t")
    df1 = spark.createDataFrame([("K1", 1), ("K2", 2)], "k: string, v: int")
    assert upsert_parquet(df1, path, key="k") == 2
    df2 = spark.createDataFrame([("K2", 99), ("K3", 3)], "k: string, v: int")
    assert upsert_parquet(df2, path, key="k") == 3
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"K1": 1, "K2": 99, "K3": 3}


def test_missing_file_contract(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        run_pipeline(spark, "/no/such.csv", str(tmp_path / "c"), str(tmp_path / "r"))
