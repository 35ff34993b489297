"""Mergeable sketches: count-min heavy hitters + Bloom dedup pre-filter."""

from __future__ import annotations

from csv_2_db_pipeline_data_engineering_spark.operators.lifecycle import (
    release_scoped_caches,
)
from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
    BLOOM_K,
    CMS_HH_MIN,
    CMS_W,
    dedup_bloom_prefilter,
    text_heavy_hitters_cms,
)

from tests.conftest import SF_DIR


def test_cms_never_undercounts_and_respects_bound(spark):
    rows = text_heavy_hitters_cms(spark, SF_DIR).collect()
    release_scoped_caches()
    assert rows, "heavy-hitter set must be non-empty at test sf"
    for r in rows:
        assert r["exact_n"] >= CMS_HH_MIN
        assert r["est_n"] >= r["exact_n"], "CMS must never undercount"
        assert r["overcount"] == r["est_n"] - r["exact_n"]
        assert r["ok_no_undercount"]
    # The sketch is sized to be genuinely lossy at every sf: a vacuous
    # zero-overcount run means W drifted too large for the corpus.
    assert any(r["overcount"] > 0 for r in rows)


def test_cms_sketch_is_fixed_size(spark):
    """The certificate booleans hold, and the estimate comes from a
    sketch no wider than D*W counters (the fixed-size guarantee)."""
    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        CMS_D,
        _cms_bucket,
        _gram_stream,
    )
    from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    grams = _gram_stream(load_table(spark, SF_DIR, "documents"))
    cms = (
        grams.select(
            F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("d"), "gram"
        )
        .select("d", _cms_bucket(F.col("d"), F.col("gram")).alias("bucket"))
        .groupBy("d", "bucket")
        .count()
    )
    assert cms.count() <= CMS_D * CMS_W


def test_bloom_no_false_negatives_and_planted_dups_found(spark):
    rows = dedup_bloom_prefilter(spark, SF_DIR).collect()
    assert rows
    seen = [r for r in rows if r["actually_seen"]]
    assert seen, "planted cross-boundary duplicates must exist"
    for r in rows:
        assert 0 <= r["hits"] <= BLOOM_K
        assert r["ok_no_false_negative"], "Bloom filters cannot false-negative"
        if r["actually_seen"]:
            assert r["maybe_seen"]
    # the filter must also REJECT most genuinely-new rows (the whole
    # point of the pre-filter): rejected rows skip the exact verify.
    rejected = [r for r in rows if not r["maybe_seen"]]
    assert len(rejected) >= len(rows) // 2


def test_bloom_probe_is_broadcast(spark):
    plan = (
        dedup_bloom_prefilter(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
