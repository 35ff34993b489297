"""Physical-plan shape assertions: the scale properties are load-bearing.

These tests pin what `.explain` shows today so a refactor can't silently
regress it: filter/column pushdown into the parquet scan, broadcast of
dimension tables, and the per-group top-k limit pushdown.
"""

from __future__ import annotations

import pytest

from csv_2_db_pipeline_data_engineering_spark.plans.catalog import get_catalog
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = get_catalog()[name].builder(spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned scan: only the 7 referenced columns, not the full lineitem schema
    read = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "l_orderkey" not in read and "l_suppkey" not in read


def test_q5_broadcasts_every_dimension(spark):
    plan = _plan(spark, "q5_supplier_volume")
    # 5 joins in the chain; every one must be broadcast (no fact shuffle).
    # The formatted plan mentions each node twice (tree + detail section).
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_q3_top_k_is_take_ordered(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_per_group_topk_gets_window_group_limit(spark):
    plan = _plan(spark, "top3_orders_per_priority")
    assert "WindowGroupLimit" in plan  # rank<=k pushed below the shuffle


def test_semi_and_anti_join_plans(spark):
    assert "LeftSemi" in _plan(spark, "customers_with_orders")
    assert "LeftAnti" in _plan(spark, "customers_without_orders")
