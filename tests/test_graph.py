"""Fixed-iteration integer PageRank over the derived trade graph."""

from __future__ import annotations

from csv_2_db_pipeline_data_engineering_spark.plans.graph import (
    PR_SCALE,
    graph_pagerank_trade,
    pagerank,
    trade_edges,
)
from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_pagerank_mass_and_ranks(spark):
    rows = graph_pagerank_trade(spark, SF_DIR).collect()
    assert len(rows) == 25  # every nation ranked
    assert all(r["pr_q"] > 0 for r in rows)
    # floor divisions only ever LOSE mass vs the exact distribution
    assert sum(r["pr_q"] for r in rows) <= PR_SCALE
    assert sorted(r["pr_rank"] for r in rows) == list(range(1, 26))


def test_pagerank_is_deterministic(spark):
    a = {r["node"]: r["pr_q"] for r in graph_pagerank_trade(spark, SF_DIR).collect()}
    b = {r["node"]: r["pr_q"] for r in graph_pagerank_trade(spark, SF_DIR).collect()}
    assert a == b


def test_teleport_floor_for_sink_only_node(spark):
    """A node with no in-edges must keep exactly the teleport term."""
    nodes = spark.createDataFrame([(0,), (1,)], "node long")
    edges = spark.createDataFrame([(0, 1, 10)], "src long, dst long, w long")
    p = {r["node"]: r["pr_q"] for r in pagerank(nodes, edges, iters=2).collect()}
    base = PR_SCALE * 15 // (100 * 2)
    assert p[0] == base  # src-only node: teleport mass only
    assert p[1] > p[0]  # the sink receives everything src emits


def test_edge_derivation_broadcasts_dimensions(spark):
    plan = trade_edges(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    # customer / supplier hops must be broadcast; only lineitem⋈orders
    # (fact-fact) may shuffle
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
