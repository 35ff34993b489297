"""Advanced relational operators: as-of join, range join, pivot, exact
percentiles, per-group top-k, skew-salted aggregation, approx sketches.

These extend the reference surface (it has no joins at all — SURVEY.md
§2.3) with the operators a time-series/warehouse workload needs, each
expressed in its scalable Spark shape and oracle-checked against DuckDB.

Scale notes per operator live on the builder docstrings; the common
theme: every plan here shuffles at most once on a chosen key, joins
broadcast their small side, and nothing ever collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import Query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- as-of join ---------------------------------------------------------------


def asof_last_order_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event: the customer's most recent order-day at-or-before it.

    Spark has no ASOF JOIN; the scalable formulation is the union trick:
    tag both streams, sort each key's timeline once, and carry the last
    non-null order attributes forward with ``last(..., ignorenulls)``.
    ONE shuffle on the join key — no per-row subquery, no range
    explosion, no skew beyond the key's own distribution. Ties on the
    same day resolve order-before-event (tag 0 < 1), giving inclusive
    at-or-before semantics; orders are pre-aggregated per (customer,
    day) so the match is deterministic.
    """
    events = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.to_date("ts").alias("t")
    )
    day_orders = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.to_date("o_orderdate").alias("t"),
        )
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("day_spend")
        )
    )
    u = day_orders.select(
        "user_id",
        "t",
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        "day_spend",
        F.col("t").alias("order_t"),
    ).unionByName(
        events.select(
            "user_id",
            "t",
            F.lit(1).alias("tag"),
            "event_id",
            F.lit(None).cast("double").alias("day_spend"),
            F.lit(None).cast("date").alias("order_t"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("asof_order_date", F.last("order_t", ignorenulls=True).over(w))
        .withColumn("asof_day_spend", F.last("day_spend", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select("event_id", "user_id", "asof_order_date", "asof_day_spend")
        .orderBy("event_id")
    )


ASOF_ORACLE = """
WITH day_orders AS (
  SELECT o_custkey AS user_id, CAST(o_orderdate AS DATE) AS t,
         ROUND(SUM(o_totalprice::DECIMAL(18,2)), 2)::DOUBLE AS day_spend
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, o.t AS asof_order_date, o.day_spend AS asof_day_spend
FROM events e ASOF LEFT JOIN day_orders o
  ON e.user_id = o.user_id AND CAST(e.ts AS DATE) >= o.t
ORDER BY e.event_id
"""


# --- range (interval) join ----------------------------------------------------


def range_join_followup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Follow-up orders by the same customer within 90 days of each order.

    The scalable range-join shape: an EQUI key (customer) carries the
    shuffle; the date-interval predicate is a post-join filter, so
    Catalyst plans a plain hash join — never a cartesian range scan.
    For keyless interval joins, bucket both sides by coarse time bucket
    (floor(date/90d)), join on adjacent buckets, then apply the exact
    range predicate — same plan family, synthetic equi key.
    """
    o = _t(spark, sf_dir, "orders")
    a = o.select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("od")
    ).alias("a")
    b = o.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("bd"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("bp"),
    ).alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("b.bd") > F.col("a.od"))
            & (F.col("b.bd") <= F.date_add(F.col("a.od"), 90)),
        )
        .groupBy(F.col("a.o_orderkey").alias("o_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n_followups"),
            F.round(F.sum("bp"), 2).cast("double").alias("followup_spend"),
        )
        .orderBy("o_orderkey")
    )


RANGE_JOIN_ORACLE = """
SELECT a.o_orderkey, COUNT(*) AS n_followups,
       ROUND(SUM(b.o_totalprice::DECIMAL(18,2)), 2)::DOUBLE AS followup_spend
FROM orders a
JOIN orders b
  ON b.o_custkey = a.o_custkey
 AND CAST(b.o_orderdate AS DATE) > CAST(a.o_orderdate AS DATE)
 AND CAST(b.o_orderdate AS DATE) <= CAST(a.o_orderdate AS DATE) + INTERVAL 90 DAY
GROUP BY a.o_orderkey ORDER BY a.o_orderkey
"""


# --- pivot --------------------------------------------------------------------


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts pivoted to one column per order status.

    Explicit pivot values (no discovery pass over the data) keep this a
    single-shuffle groupBy; missing cells coalesce to 0 to match SQL
    conditional-count semantics.
    """
    p = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(f"status_{c.lower()}")
            for c in ["F", "O", "P"]
        ],
    ).orderBy("o_orderpriority")


PIVOT_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- exact percentiles --------------------------------------------------------


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles of extended price per return flag.

    PERCENTILE_DISC, not CONT: disc returns an actual data element, so
    both engines hold the bit-identical double and round it the same
    way at any scale. CONT's linear interpolation computes the midpoint
    with engine-specific association — a 1-ulp divergence that flips
    the cents rounding exactly at .xx5 boundaries (observed at
    sf0.001: 52724.24 vs 52724.25). Exact percentile sorts within each
    group — at 100 TB switch to ``percentile_approx`` (t-digest
    sketch, fixed memory, mergeable map-side); see
    ``approx_aggregates``.
    """
    li = _t(spark, sf_dir, "lineitem")
    ps = F.expr(
        "percentile_disc(array(0.5, 0.9, 0.99)) "
        "WITHIN GROUP (ORDER BY l_extendedprice)"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(ps.alias("ps"))  # ONE buffered pass for all three quantiles
        .select(
            "l_returnflag",
            *[
                F.round(F.col("ps")[i], 2).alias(n)
                for i, n in enumerate(["p50", "p90", "p99"])
            ],
        )
        .orderBy("l_returnflag")
    )


PERCENTILES_ORACLE = """
SELECT l_returnflag,
       ROUND(quantile_disc(l_extendedprice, 0.5), 2) AS p50,
       ROUND(quantile_disc(l_extendedprice, 0.9), 2) AS p90,
       ROUND(quantile_disc(l_extendedprice, 0.99), 2) AS p99
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- per-group top-k ----------------------------------------------------------


def top3_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3 orders by total price within each priority class.

    row_number + rank filter: Spark pushes a per-partition top-k
    (WindowGroupLimit) below the shuffle, so each map task emits at most
    k rows per group — the shuffle carries O(groups x k), not the table.
    Deterministic tie-break on the key column.
    """
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_orderpriority",
            "rk",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .orderBy("o_orderpriority", "rk")
    )


TOPK_ORACLE = """
SELECT o_orderpriority, rk, o_orderkey, ROUND(o_totalprice, 2) AS total_price
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
  ) AS rk
  FROM orders
)
WHERE rk <= 3 ORDER BY o_orderpriority, rk
"""


# --- skew-salted aggregation --------------------------------------------------


def salted_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation; result identical to a plain groupBy.

    The skew pattern for 100 TB: a hot key (one event_type with 90% of
    rows) would send one reducer 90% of the table. Salting splits each
    key across 16 partial groups (map-side combine still applies), then
    a second tiny aggregation merges the partials. Cost: one extra
    shuffle of |keys| x 16 rows — nothing. Spark's AQE skew handling
    covers joins, not aggregations, so this is the manual recipe.
    """
    salted = (
        _t(spark, sf_dir, "events")
        .withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
        )
    )
    return (
        salted.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.round(F.sum("pv"), 2).cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


SALTED_ORACLE = """
SELECT event_type, COUNT(*) AS n,
       ROUND(SUM(value::DECIMAL(18,6)), 2)::DOUBLE AS total_value
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- scalar-subquery decorrelation --------------------------------------------


def parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts priced above their brand's average retail price.

    The correlated-scalar-subquery pattern (``price > (SELECT AVG ...
    WHERE brand = outer.brand)``) decorrelated into window aggregates —
    ONE shuffle on the correlation key instead of a per-row subquery,
    which is exactly what Catalyst's decorrelation would produce.

    Determinism note: the comparison is done in exact decimals
    (``price * n > sum``, no division), and the reported average is a
    single float division of two exact values — so Spark and the SQL
    oracle agree bit-for-bit (a double ``AVG`` would accumulate in
    engine-specific order and can flip a ROUND boundary).
    """
    w = Window.partitionBy("p_brand")
    p = _t(spark, sf_dir, "part").withColumn(
        "price_dec", F.col("p_retailprice").cast("decimal(18,2)")
    )
    return (
        p.withColumn("brand_sum", F.sum("price_dec").over(w))
        .withColumn("brand_n", F.count(F.lit(1)).over(w))
        .filter(F.col("price_dec") * F.col("brand_n") > F.col("brand_sum"))
        .select(
            "p_partkey",
            "p_brand",
            F.round("p_retailprice", 2).alias("retail_price"),
            F.round(
                F.col("brand_sum").cast("double") / F.col("brand_n"), 2
            ).alias("brand_avg"),
        )
        .orderBy("p_partkey")
    )


SCALAR_SUBQ_ORACLE = """
SELECT p_partkey, p_brand, ROUND(p_retailprice, 2) AS retail_price,
       ROUND(brand_sum::DOUBLE / brand_n, 2) AS brand_avg
FROM (
  SELECT p_partkey, p_brand, p_retailprice,
         p_retailprice::DECIMAL(18,2) AS price_dec,
         SUM(p_retailprice::DECIMAL(18,2)) OVER (PARTITION BY p_brand) AS brand_sum,
         COUNT(*) OVER (PARTITION BY p_brand) AS brand_n
  FROM part
)
WHERE price_dec * brand_n > brand_sum
ORDER BY p_partkey
"""


# --- approximate aggregates ---------------------------------------------------


def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts and t-digest percentiles vs exact.

    The 100 TB shape for cardinality/quantiles: fixed-size mergeable
    sketches, combined map-side, never a sort or a distinct shuffle of
    the raw column. Sketch internals are engine-specific, so the output
    is made hash-stable for the oracle: it carries the EXACT values plus
    in-query booleans asserting the sketch landed within tolerance
    (HLL++ rsd defaults to 5%; t-digest with 10k centroids is ~exact at
    this scale). DuckDB oracles the exact columns and TRUE literals.
    """
    li = _t(spark, sf_dir, "lineitem")
    # The distinct aggregates and the percentile (buffer-based) aggregates
    # run as TWO groupBys joined on the group key: mixing COUNT(DISTINCT)
    # with object-buffer aggs in one agg triggers the Expand rewrite,
    # which replays every input row through the percentile buffers once
    # per distinct group — measured 4x slower than this split-join at
    # sf0.1 (both subtrees are map-side-combined and the join key is the
    # tiny group column).
    distincts = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )
    # disc, not cont: an actual element is bit-identical across engines
    # (see price_percentiles — cont interpolation diverges by 1 ulp).
    pcts = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("exact_p50_raw"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx_p50"
        ),
    )
    return (
        distincts.join(pcts, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_parts",
            F.round("exact_p50_raw", 2).cast("double").alias("exact_p50"),
            # 3x the HLL++ default rsd (5% is ONE standard deviation, not
            # a bound) plus a small absolute floor — a certificate gate
            # must hold for any data, not just the current fixture.
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= F.greatest(
                    F.lit(3.0), 0.15 * F.col("exact_parts").cast("double")
                )
            ).alias("hll_within_15pct"),
            (
                F.abs(F.col("approx_p50") - F.col("exact_p50_raw"))
                <= 0.01 * F.col("exact_p50_raw")
            ).alias("tdigest_within_1pct"),
        )
        .orderBy("l_returnflag")
    )


APPROX_AGG_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       CAST(ROUND(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 2)
            AS DOUBLE) AS exact_p50,
       TRUE AS hll_within_15pct,
       TRUE AS tdigest_within_1pct
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


QUERIES = [
    Query("asof_last_order_per_event", "as-of join via union + last_value timeline",
          asof_last_order_per_event, ASOF_ORACLE),
    Query("range_join_followup_orders", "interval join on equi key + date range",
          range_join_followup_orders, RANGE_JOIN_ORACLE),
    Query("pivot_status_by_priority", "pivot with explicit values",
          pivot_status_by_priority, PIVOT_ORACLE),
    Query("price_percentiles", "exact PERCENTILE_CONT-style quantiles per group",
          price_percentiles, PERCENTILES_ORACLE),
    Query("top3_orders_per_priority", "per-group top-k via rank-filter window",
          top3_orders_per_priority, TOPK_ORACLE),
    Query("salted_event_type_counts", "skew-salted two-stage aggregation",
          salted_event_type_counts, SALTED_ORACLE),
    Query("parts_above_brand_avg", "correlated scalar subquery decorrelated to a window",
          parts_above_brand_avg, SCALAR_SUBQ_ORACLE),
    Query("approx_aggregates", "HLL++ / t-digest sketches beside exact values",
          approx_aggregates, APPROX_AGG_ORACLE),
]
