"""Scoped-cache lifecycle: catalog consumers end with zero lingering caches."""

from __future__ import annotations

from csv_2_db_pipeline_data_engineering_spark.operators.lifecycle import (
    release_scoped_caches,
)
from csv_2_db_pipeline_data_engineering_spark.plans.catalog import get_catalog
from tests.conftest import SF_DIR


def test_cache_heavy_builders_release_cleanly(spark):
    # The advice-flagged leak class: one-shot builders whose cached
    # intermediates outlive the call. After materialize + release, the
    # session's cache manager must be empty again.
    release_scoped_caches()  # start clean regardless of test order
    spark.catalog.clearCache()
    catalog = get_catalog()
    for name in ("text_bigram_logprob", "dedup_minhash_lsh", "dedup_incremental"):
        catalog[name].builder(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        assert not spark._jsparkSession.sharedState().cacheManager().isEmpty(), name
        release_scoped_caches()
        assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), name


def test_release_is_idempotent_when_empty(spark):
    release_scoped_caches()
    release_scoped_caches()
