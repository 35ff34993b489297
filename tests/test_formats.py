"""Multi-format IO roundtrips and hive partition pruning (sources/formats.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.sources.formats import (
    FORMATS,
    read_any,
    write_any,
)
from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def nation(spark):
    return load_table(spark, SF_DIR, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_preserves_rows(spark, tmp_path, nation, fmt):
    path = str(tmp_path / f"t_{fmt}")
    write_any(nation, path, fmt)
    back = read_any(spark, path, fmt, schema=nation.schema)
    assert back.count() == nation.count()
    assert back.schema == nation.schema
    assert back.exceptAll(nation).isEmpty() and nation.exceptAll(back).isEmpty()


def test_unsupported_format_rejected(spark, tmp_path, nation):
    with pytest.raises(ValueError, match="unsupported format"):
        write_any(nation, str(tmp_path / "x"), "xml")


def test_partitioned_write_prunes(spark, tmp_path, nation):
    path = str(tmp_path / "part")
    write_any(nation, path, "parquet", partition_by=["n_regionkey"])
    # hive layout on disk
    dirs = {p.name for p in (tmp_path / "part").iterdir() if p.is_dir()}
    assert any(d.startswith("n_regionkey=") for d in dirs)
    back = spark.read.parquet(path)
    pruned = back.filter(F.col("n_regionkey") == 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter handled by listing, not a data filter on rows
    assert back.count() == nation.count()
    assert pruned.count() == nation.filter("n_regionkey = 1").count()
    assert "PartitionFilters: [isnotnull(n_regionkey" in plan or "n_regionkey" in plan
