"""CLI exit-code contract (reference main.py stage-halt semantics)."""

from __future__ import annotations

from csv_2_db_pipeline_data_engineering_spark.__main__ import main


def test_cli_success(spark, golden_csv, tmp_path):
    rc = main(
        [golden_csv, str(tmp_path / "clean"), str(tmp_path / "rej")], spark=spark
    )
    assert rc == 0
    assert spark.read.parquet(str(tmp_path / "clean")).count() == 9


def test_cli_missing_file_exits_1(spark, tmp_path):
    rc = main(
        [str(tmp_path / "nope.csv"), str(tmp_path / "c"), str(tmp_path / "r")],
        spark=spark,
    )
    assert rc == 1


def test_cli_bad_schema_exits_1(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("foo,bar\n1,2\n", encoding="utf-8")
    rc = main([str(p), str(tmp_path / "c"), str(tmp_path / "r")], spark=spark)
    assert rc == 1


def test_cli_all_rejected_exits_1(spark, tmp_path):
    p = tmp_path / "allbad.csv"
    p.write_text(
        "transaction_id,customer_id,product_name,quantity,unit_price,"
        "transaction_date,region,status\n"
        ",101,Widget,1,9.99,2024-01-15,North,completed\n",
        encoding="utf-8",
    )
    rc = main([str(p), str(tmp_path / "c"), str(tmp_path / "r")], spark=spark)
    assert rc == 1


def test_cli_usage_error_exits_2(spark):
    assert main(["only-one-arg"], spark=spark) == 2
