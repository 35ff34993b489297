"""Correlated-subquery query shapes: EXISTS, NOT EXISTS, scalar compare.

TPC-H Q4/Q21/Q22-style patterns. Spark decorrelates all three into
joins (left-semi, left-anti, and a broadcast scalar), so none of them
execute per-row subqueries — the SQL-text form and the DataFrame form
below compile to the same physical plans.

Scale notes (100 TB):
- EXISTS -> left-semi join: the probe side streams, the build side is
  reduced to the distinct key set before the shuffle (no row explosion
  when the inner side has many matches per key).
- NOT EXISTS -> left-anti join: same plan economics as semi.
- Scalar subqueries (global aggregates) fold to a 1-row broadcast —
  zero shuffle added to the main pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import Query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Q4 shape: EXISTS (left-semi) ----------------------------------------------


def late_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one lineitem shipped >60 days after the order
    date, counted by priority (TPC-H Q4 shape: EXISTS -> left-semi join).

    The EXISTS condition is *correlated beyond key equality* (it compares
    columns of both tables), which Spark still decorrelates into a single
    left-semi hash join with the extra predicate as the join condition.
    """
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("interval 60 days")),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("priority")
    )


LATE_PRIORITY_ORACLE = """
SELECT o_orderpriority AS priority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
GROUP BY priority ORDER BY priority
"""


# --- Q22 shape: NOT EXISTS + scalar subquery (anti + broadcast scalar) ---------


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average balance and no orders since 2000,
    bucketed by nation (TPC-H Q22 shape: scalar subquery + NOT EXISTS).

    The average folds to a 1-row broadcast (cross join of an aggregate);
    the NOT EXISTS is a left-anti join against recent orders — the date
    filter lands on the orders scan (PushedFilters), so the anti join's
    build side shrinks before the shuffle.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("nationkey")
    )


IDLE_RICH_ORACLE = """
SELECT c_nationkey AS nationkey,
       COUNT(*) AS n_customers,
       ROUND(SUM(c_acctbal), 2) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY nationkey ORDER BY nationkey
"""


# --- Q21 shape: EXISTS + NOT EXISTS stacked on the same fact -------------------


def sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late supplier on some multi-supplier
    order (TPC-H Q21 shape: self-EXISTS + self-NOT-EXISTS on lineitem;
    "late" = shipped in the final year of the data).

    Three passes over lineitem resolve to two semi/anti joins against
    per-order supplier sets; all joins key on l_orderkey so AQE can
    coalesce them into one shuffle exchange reuse.
    """
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = l.filter(F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp")).alias("l1")
    other_supp = l.alias("l2")
    other_late = late.alias("l3")
    s = _t(spark, sf_dir, "supplier")

    # EXISTS: another supplier appears on the same order.
    has_other = late.join(
        other_supp,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    # NOT EXISTS: no OTHER supplier was late on that order.
    sole = has_other.join(
        other_late,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count(F.lit(1)).alias("n_waits"))
        .orderBy(F.desc("n_waits"), "supp_name")
    )


SOLE_LATE_ORACLE = """
SELECT s_name AS supp_name, COUNT(*) AS n_waits
FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_shipdate >= TIMESTAMP '2001-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate >= TIMESTAMP '2001-01-01'
  )
GROUP BY s_name ORDER BY n_waits DESC, supp_name
"""


QUERIES = [
    Query("late_order_priority_counts", "EXISTS -> left-semi (TPC-H Q4 shape)",
          late_order_priority_counts, LATE_PRIORITY_ORACLE),
    Query("idle_rich_customers", "scalar subquery + NOT EXISTS (Q22 shape)",
          idle_rich_customers, IDLE_RICH_ORACLE),
    Query("sole_late_suppliers", "stacked EXISTS/NOT EXISTS self-joins (Q21 shape)",
          sole_late_suppliers, SOLE_LATE_ORACLE),
]
