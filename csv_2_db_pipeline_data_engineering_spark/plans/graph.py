"""Iterative graph analytics: fixed-iteration PageRank in exact integers.

A corpus-scale engine needs iterative graph algorithms (host-graph
PageRank is a standard web-corpus quality signal — e.g. Common Crawl's
harmonic/PageRank host rankings feed crawl prioritization and quality
filtering).  The testdata has no link table, so the registered query
derives a dense 25-node trade graph from the TPC-H-ish fact tables —
supplier-nation → customer-nation edges weighted by lineitem count —
and runs ``PR_ITERS`` damped PageRank rounds on it.

Scale design (100 TB):
- The edge derivation is the generic big-fact shape: lineitem⋈orders
  shuffles on orderkey once (AQE-planned), every dimension hop
  (customer, supplier, nation×2) is an explicit ``broadcast()``, and
  the group-down to (src, dst) happens with map-side partial
  aggregation before anything wide.
- Each PageRank round is the canonical edge-keyed shape: ranks join
  edges on ``src`` (at web scale: edges pre-partitioned by src so the
  rank frame is the only thing that moves), contributions shuffle on
  ``dst`` with map-side combine, and the damping update is a per-node
  map.  The iterate is ``localCheckpoint``-ed per round (the power-
  iteration lineage-cut pattern) so round N's plan does not replan
  rounds 1..N-1.
- **Determinism**: rank mass lives as scaled integers (``PR_SCALE``)
  and every division is an exact floor-div, so contribution sums are
  order-independent and both engines walk bit-identical iterates —
  no floating point until the final reported share, which is computed
  from the exact integers identically on both sides.

Reference parity note: the reference (pandas→Postgres ETL,
``main.py:41-136``) has no graph surface; this is part of the
driver-mandated large-scale-pipeline extension (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.lifecycle import scoped_cache
from ..operators.similarity import _int_div
from ..sources.tables import load_table
from .catalog import Query

#: rank mass scale: p fits in [0, PR_SCALE]; worst product p*w is
#: bounded by PR_SCALE * |lineitem| ≈ 1e12 * 6e6 (sf1) = 6e18 < 2⁶³.
PR_SCALE = 1_000_000_000_000
PR_ITERS = 3
#: damping 0.85 as the exact rational 85/100
PR_DAMP_NUM = 85
PR_DAMP_DEN = 100


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w): supplier-nation → customer-nation lineitem counts."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """(node, pr_q): damped PageRank mass as exact scaled integers.

    ``p' = floor(0.15·S/N) + floor(0.85·Σ_in floor(p_src·w/outw) / 1)``
    — every step is integer, so the iterate is engine-reproducible.
    Nodes without in-edges keep the teleport term; out-edge-less nodes
    leak their mass (the classic simplified formulation — identical on
    both engines because it is derived from the same arithmetic).
    """
    e = scoped_cache(
        edges.join(
            edges.groupBy("src").agg(F.sum("w").alias("outw")), "src"
        )
    )
    n_count = nodes.count()  # node-set cardinality: O(#nations), driver scalar
    base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // (PR_DAMP_DEN * n_count)
    p = nodes.select("node", F.lit(PR_SCALE // n_count).cast("long").alias("pr_q"))
    for i in range(iters):
        contrib = (
            e.join(p, e.src == p.node)
            .select(
                F.col("dst").alias("node"),
                _int_div(F.col("pr_q") * F.col("w"), F.col("outw")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inmass"))
        )
        p = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + _int_div(
                    F.lit(PR_DAMP_NUM) * F.coalesce("inmass", F.lit(0)),
                    F.lit(PR_DAMP_DEN),
                )
            ).cast("long").alias("pr_q"),
        )
        # The iterate is consumed ONCE per round, so lineage grows
        # LINEARLY in the round count — a per-round eager checkpoint was
        # one extra job per round for nothing at the registered
        # PR_ITERS=3 (r17 A/B: 2.86 -> 2.06 s, rows identical). Cut the
        # lineage only every 8 rounds so a long-iteration caller still
        # never replans an unbounded chain.
        if (i + 1) % 8 == 0 and i + 1 < iters:
            p = p.localCheckpoint(eager=True)
    return p


def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: PageRank over the nation trade graph.

    Emits the exact integer mass, its rank (ties broken by node key),
    and the node's in-/out-degree so the driver row value-checks the
    full graph derivation, not just the iteration.
    """
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node"), F.col("n_name").alias("nation")
    )
    edges = trade_edges(spark, sf_dir)
    pr = pagerank(nodes.select("node"), edges)
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .join(
            edges.groupBy(F.col("dst").alias("node"))
            .agg(F.count(F.lit(1)).alias("in_deg")),
            "node",
            "full",
        )
    )
    w = Window.orderBy(F.col("pr_q").desc(), F.col("node"))
    return (
        nodes.join(pr, "node")
        .join(deg, "node", "left")
        .select(
            "node",
            "nation",
            "pr_q",
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        )
        .withColumn("pr_rank", F.row_number().over(w))
        .orderBy("node")
    )


def _pagerank_sql() -> str:
    """DuckDB twin: identical integer iteration unrolled as CTEs."""
    ctes = [
        "nodes AS (SELECT n_nationkey AS node FROM nation)",
        "e0 AS (SELECT s.s_nationkey AS src, c.c_nationkey AS dst,"
        " CAST(COUNT(*) AS BIGINT) AS w"
        " FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
        " JOIN customer c ON o.o_custkey = c.c_custkey"
        " JOIN supplier s ON l.l_suppkey = s.s_suppkey"
        " GROUP BY src, dst)",
        "e AS (SELECT e0.*, ow.outw FROM e0 JOIN"
        " (SELECT src, CAST(SUM(w) AS BIGINT) AS outw FROM e0 GROUP BY src) ow"
        " USING (src))",
        "nc AS (SELECT COUNT(*) AS n FROM nodes)",
        f"p0 AS (SELECT node, CAST({PR_SCALE} // n AS BIGINT) AS pr_q"
        f" FROM nodes, nc)",
    ]
    base = (
        f"({PR_SCALE} * ({PR_DAMP_DEN} - {PR_DAMP_NUM}))"
        f" // ({PR_DAMP_DEN} * n)"
    )
    for t in range(1, PR_ITERS + 1):
        ctes += [
            f"m{t} AS (SELECT e.dst AS node,"
            f" CAST(SUM((p.pr_q * e.w) // e.outw) AS BIGINT) AS inmass"
            f" FROM e JOIN p{t-1} p ON e.src = p.node GROUP BY e.dst)",
            f"p{t} AS (SELECT n.node, CAST({base} +"
            f" ({PR_DAMP_NUM} * COALESCE(m.inmass, 0)) // {PR_DAMP_DEN}"
            f" AS BIGINT) AS pr_q"
            f" FROM nodes n LEFT JOIN m{t} m USING (node), nc)",
        ]
    k = PR_ITERS
    ctes += [
        "deg AS (SELECT COALESCE(od.node, id.node) AS node,"
        " COALESCE(id.in_deg, 0) AS in_deg, COALESCE(od.out_deg, 0) AS out_deg"
        " FROM (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS out_deg"
        "       FROM e0 GROUP BY src) od"
        " FULL JOIN (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS in_deg"
        "            FROM e0 GROUP BY dst) id ON od.node = id.node)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT n.n_nationkey AS node, n.n_name AS nation, p.pr_q,\n"
        "       COALESCE(d.in_deg, 0) AS in_deg,"
        " COALESCE(d.out_deg, 0) AS out_deg,\n"
        "       CAST(ROW_NUMBER() OVER (ORDER BY p.pr_q DESC, p.node)"
        " AS INTEGER) AS pr_rank\n"
        f"FROM nation n JOIN p{k} p ON n.n_nationkey = p.node\n"
        "LEFT JOIN deg d ON d.node = p.node\n"
        "ORDER BY node"
    )


PAGERANK_ORACLE = _pagerank_sql()


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the undirected trade graph — the other classic
    graph primitive (clustering-coefficient numerator).

    Canonical-edge enumeration: symmetrized edges keep only a < b, and
    triangles join e(a,b) ⋈ e(b,c) ⋈ e(a,c) so every triangle is
    counted exactly once.  At web scale this is the standard two-join
    shape over an edge table pre-partitioned on its first key; counts
    stay exact integers.
    """
    e0 = trade_edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    und = (
        e0.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    nodes = und.select(F.col("a").alias("n")).union(
        und.select(F.col("b").alias("n"))
    ).distinct()
    return (
        nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(und.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
    )


TRIANGLE_ORACLE = """
WITH e0 AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e0
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM und e1 JOIN und e2 ON e1.b = e2.a JOIN und e3
    ON e3.a = e1.a AND e3.b = e2.b
),
nn AS (
  SELECT COUNT(*) AS n_nodes
  FROM (SELECT a AS n FROM und UNION SELECT b FROM und)
)
SELECT CAST(nn.n_nodes AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_edges,
       CAST(tri.n_triangles AS BIGINT) AS n_triangles
FROM nn, tri
"""


QUERIES = [
    Query(
        "graph_pagerank_trade",
        "fixed-iteration damped PageRank in exact scaled integers over "
        "the supplier→customer nation trade graph (edge-keyed iterate, "
        "lineage-cut per round)",
        graph_pagerank_trade,
        PAGERANK_ORACLE,
    ),
    Query(
        "graph_triangle_count",
        "exact triangle count on the undirected trade graph "
        "(canonical-edge two-join enumeration)",
        graph_triangle_count,
        TRIANGLE_ORACLE,
    ),
]
