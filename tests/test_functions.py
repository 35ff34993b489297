"""Column-function library semantics (functions/columns.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.functions import (
    cosine_sim,
    hash_bucket,
    jaccard_arrays,
    md5_sample,
    money,
    null_or_blank,
    parse_date_expr,
    stable_id,
    word_ngrams,
)


def _one(spark, expr, **cols):
    df = spark.createDataFrame([Row(**cols)])
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_null_or_blank(spark):
    df = spark.createDataFrame(
        [Row(s="x"), Row(s="  "), Row(s=""), Row(s=None)]
    )
    got = [r["v"] for r in df.select(null_or_blank("s").alias("v")).collect()]
    assert got == [False, True, True, True]


def test_money_rounds_half_up_exact(spark):
    assert str(_one(spark, money(F.lit("19.995")))) == "20.00"
    assert str(_one(spark, money(F.lit("2.344")))) == "2.34"


def test_parse_date_first_match_wins(spark):
    assert str(_one(spark, parse_date_expr(F.lit("2024-01-15")))) == "2024-01-15"
    assert str(_one(spark, parse_date_expr(F.lit("15/01/2024")))) == "2024-01-15"
    assert _one(spark, parse_date_expr(F.lit("not a date"))) is None


def test_stable_id_deterministic(spark):
    a = _one(spark, stable_id(F.lit("k1"), F.lit(7)))
    b = _one(spark, stable_id(F.lit("k1"), F.lit(7)))
    assert a == b and isinstance(a, int)


def test_hash_bucket_range_and_stability(spark):
    df = spark.range(1000).select(hash_bucket(F.col("id").cast("string"), 8).alias("b"))
    rows = [r["b"] for r in df.collect()]
    assert set(rows) <= set(range(8)) and len(set(rows)) == 8


def test_md5_sample_fraction(spark):
    df = spark.range(16000).select(md5_sample("id").alias("keep"))
    frac = df.filter("keep").count() / 16000
    assert 0.04 < frac < 0.09  # ~1/16 within loose tolerance


def test_word_ngrams(spark):
    got = _one(spark, word_ngrams(F.lit("a b c d"), 3))
    assert got == ["a b c", "b c d"]


def test_jaccard_arrays(spark):
    got = _one(
        spark,
        jaccard_arrays(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            F.array(F.lit("b"), F.lit("c"), F.lit("d")),
        ),
    )
    assert got == pytest.approx(0.5)


def test_cosine_sim(spark):
    v = lambda *xs: F.array(*[F.lit(float(x)) for x in xs])
    assert _one(spark, cosine_sim(v(1, 0), v(0, 1))) == pytest.approx(0.0)
    assert _one(spark, cosine_sim(v(1, 2), v(2, 4))) == pytest.approx(1.0)
    assert _one(spark, cosine_sim(v(0, 0), v(1, 1))) == pytest.approx(0.0)
    got = _one(spark, cosine_sim(v(1, 1), v(1, 0)))
    assert got == pytest.approx(1 / math.sqrt(2))
