"""JSONL source (corrupt-record dead-letter) and SCD2 merge semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csv_2_db_pipeline_data_engineering_spark.sources.json_source import (
    ingest_jsonl,
    split_corrupt,
)
from csv_2_db_pipeline_data_engineering_spark.sinks.scd2 import (
    scd2_asof,
    scd2_current,
    scd2_init,
    scd2_merge,
)

JSONL = """\
{"id": 1, "name": "alice", "score": 9.5}
{"id": 2, "name": "bob", "score": 7.0}
this line is not json at all
{"id": 3, "name": "carol"
{"id": 4, "name": "dave", "score": 3.25}
"""

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "feed.jsonl"
    p.write_text(JSONL)
    return str(p)


class TestJsonlSource:
    def test_split_corrupt(self, spark, jsonl_path):
        df = ingest_jsonl(spark, jsonl_path, SCHEMA)
        clean, dead = split_corrupt(df)
        assert clean.count() == 3
        assert clean.columns == ["id", "name", "score"]
        assert {r["id"] for r in clean.collect()} == {1, 2, 4}
        bad = dead.collect()
        assert len(bad) == 2
        assert all(r["reason"] == "malformed json" for r in bad)
        assert any("not json at all" in r["raw_line"] for r in bad)

    def test_missing_file_contract(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            ingest_jsonl(spark, str(tmp_path / "nope.jsonl"), SCHEMA)

    def test_schemaless_read_still_captures(self, spark, jsonl_path):
        clean, dead = split_corrupt(ingest_jsonl(spark, jsonl_path))
        assert clean.count() == 3
        assert dead.count() == 2


def _snapshot(spark, rows):
    return spark.createDataFrame(
        [Row(cust_id=i, tier=t, city=c) for i, t, c in rows],
        "cust_id: long, tier: string, city: string",
    )


class TestScd2:
    def test_change_tracking_and_asof(self, spark):
        day1 = _snapshot(spark, [(1, "gold", "oslo"), (2, "silver", "rome")])
        t = scd2_init(day1, "2024-01-01")
        # day 2: cust 1 changes tier, cust 3 appears, cust 2 untouched
        day2 = _snapshot(spark, [(1, "platinum", "oslo"), (3, "bronze", "lima")])
        t = scd2_merge(t, day2, "cust_id", "2024-02-01")

        rows = {(r["cust_id"], r["tier"], r["is_current"]) for r in t.collect()}
        assert rows == {
            (1, "gold", False),
            (1, "platinum", True),
            (2, "silver", True),
            (3, "bronze", True),
        }
        closed = t.filter(~F.col("is_current")).collect()[0]
        assert str(closed["valid_to"]) == "2024-02-01"

        cur = {(r["cust_id"], r["tier"]) for r in scd2_current(t).collect()}
        assert cur == {(1, "platinum"), (2, "silver"), (3, "bronze")}
        asof = {(r["cust_id"], r["tier"]) for r in scd2_asof(t, "2024-01-15").collect()}
        assert asof == {(1, "gold"), (2, "silver")}

    def test_rerun_is_idempotent(self, spark):
        day1 = _snapshot(spark, [(1, "gold", "oslo")])
        t = scd2_init(day1, "2024-01-01")
        day2 = _snapshot(spark, [(1, "platinum", "oslo")])
        once = scd2_merge(t, day2, "cust_id", "2024-02-01")
        twice = scd2_merge(once, day2, "cust_id", "2024-02-01")
        assert twice.count() == once.count() == 2
        assert scd2_current(twice).count() == 1

    def test_null_safe_comparison(self, spark):
        day1 = _snapshot(spark, [(1, None, "oslo")])
        t = scd2_init(day1, "2024-01-01")
        # identical snapshot with a NULL attribute must NOT read as changed
        t2 = scd2_merge(t, _snapshot(spark, [(1, None, "oslo")]), "cust_id", "2024-02-01")
        assert t2.count() == 1
        # NULL -> value IS a change
        t3 = scd2_merge(t2, _snapshot(spark, [(1, "gold", "oslo")]), "cust_id", "2024-03-01")
        assert t3.count() == 2

    def test_schema_mismatch_raises(self, spark):
        t = scd2_init(_snapshot(spark, [(1, "gold", "oslo")]), "2024-01-01")
        bad = spark.createDataFrame([Row(cust_id=1, tier="x")], "cust_id: long, tier: string")
        with pytest.raises(ValueError, match="snapshot columns"):
            scd2_merge(t, bad, "cust_id", "2024-02-01")
