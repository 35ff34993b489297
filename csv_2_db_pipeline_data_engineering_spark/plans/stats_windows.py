"""Statistical aggregates, window frames, calendar spines, sampling.

Widens the SQL surface beyond plans/analytics.py: correlation/regression
aggregates, explicit window frames (moving averages), distribution
functions (ntile/cume_dist/percent_rank), date-spine generation via
sequence+explode, deterministic hash sampling, and a TPC-H Q18-style
HAVING-subquery join.

Scale notes (100 TB):
- Statistical aggregates (corr/covar/regr_*) are single-pass partial
  aggregates in Spark — map-side combine, one shuffle on the group key,
  no second pass over the fact.
- Window frames shuffle once on the partition key; frames are bounded
  (ROWS BETWEEN k PRECEDING) so state per key is O(k), not O(rows).
- The date spine is generated driver-free with ``sequence()`` on an
  aggregated 1-row bound, then exploded — no collect, no Python loop;
  joining spine←orders broadcasts the spine only if small, else it's a
  shuffle join on a well-distributed date key.
- Deterministic sampling filters by md5 prefix at the scan — pushes the
  projection down and needs no global state, unlike reservoir sampling.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints under PEP 563
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, load_table_spread
from .catalog import Query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- statistical aggregates (corr / covar / regr) ------------------------------


def lineitem_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag correlation / covariance / regression of price on qty.

    Single-pass partial aggregates (Spark computes all four moments
    map-side); rounded to 6 dp on both engines because accumulation
    order differs.
    """
    l = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.corr(y, x), 6).alias("corr_price_qty"),
            F.round(F.covar_samp(y, x), 6).alias("covar_price_qty"),
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.stddev_samp(y), 6).alias("stddev_price"),
        )
        .orderBy("l_returnflag")
    )


PRICE_STATS_ORACLE = """
SELECT l_returnflag,
       ROUND(corr(l_extendedprice, l_quantity), 6)        AS corr_price_qty,
       ROUND(covar_samp(l_extendedprice, l_quantity), 6)  AS covar_price_qty,
       ROUND(regr_slope(l_extendedprice, l_quantity), 6)  AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
       ROUND(stddev_samp(l_extendedprice), 6)             AS stddev_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- window frames: bounded moving average -------------------------------------


def customer_order_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-order moving average of totalprice per customer.

    Bounded frame (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW): per-key
    window state is O(3) regardless of history length. Ordered by the
    unique o_orderkey as tie-break so the frame is deterministic.
    """
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.avg("o_totalprice").over(w), 4).alias("moving_avg_3"),
    ).orderBy("custkey", "orderkey")


MOVING_AVG_ORACLE = """
SELECT o_custkey AS custkey,
       o_orderkey AS orderkey,
       ROUND(AVG(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3
FROM orders ORDER BY custkey, orderkey
"""


# --- distribution window functions: ntile / cume_dist / percent_rank -----------


def order_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile + distribution position of each order within its priority.

    One shuffle on o_orderpriority; ntile/cume_dist/percent_rank all ride
    the same sort, so Catalyst plans a single Window exchange.
    """
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderpriority").alias("priority"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        )
        .orderBy("orderkey")
    )


QUARTILES_ORACLE = """
SELECT o_orderkey AS orderkey,
       o_orderpriority AS priority,
       NTILE(4) OVER w AS quartile,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
ORDER BY orderkey
"""


# --- calendar spine: sequence + explode, zero-filled daily counts --------------


def daily_order_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per calendar day over the full date range, zero-days included.

    The spine is built distributively: min/max fold to one row, then
    ``sequence()`` + ``explode()`` expand it back out — no driver-side
    date loop, no collect. The per-day counts aggregate the fact once;
    the spine side is tiny and broadcast.
    """
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d")
    )
    bounds = o.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    per_day = o.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        spine.join(per_day, "day", "left")
        .select("day", F.coalesce("n_orders", F.lit(0)).alias("n_orders"))
        .orderBy("day")
    )


DAILY_SPINE_ORACLE = """
WITH bounds AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
         MAX(CAST(o_orderdate AS DATE)) AS hi FROM orders
),
spine AS (
  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds
),
per_day AS (
  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT s.day, COALESCE(p.n_orders, 0) AS n_orders
FROM spine s LEFT JOIN per_day p USING (day) ORDER BY s.day
"""


# --- deterministic hash sampling ------------------------------------------------


def deterministic_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~1/16 deterministic sample of orders via md5 prefix, then aggregate.

    Hash-prefix sampling is reproducible across engines and runs (unlike
    TABLESAMPLE / rand()): both engines agree on md5 of the decimal key
    string. Filter evaluates at the scan — no global coordination, no
    reservoir state, same sample at any scale.
    """
    o = _t(spark, sf_dir, "orders")
    sampled = o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "0"
    )
    return (
        sampled.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("status")
    )


DET_SAMPLE_ORACLE = """
SELECT o_orderstatus AS status,
       COUNT(*) AS n_sampled,
       ROUND(AVG(o_totalprice), 4) AS avg_price
FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
GROUP BY status ORDER BY status
"""


# --- TPC-H Q18 style: HAVING subquery over a fact-fact join --------------------


def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose single orders exceed a quantity threshold (Q18 shape).

    The inner aggregate (sum qty per order) reduces lineitem before the
    join — the heavy fact is aggregated first, so the join input is one
    row per qualifying order, not per lineitem. Spark plans this as
    partial-agg → shuffle on l_orderkey → semi-join-like inner join;
    customer is dimension-sized and broadcast.
    """
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_name").alias("cust_name"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "orderkey")
    )


LARGE_VOLUME_ORACLE = """
SELECT c_name AS cust_name,
       o_orderkey AS orderkey,
       o_orderdate AS orderdate,
       o_totalprice AS totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice DESC, orderkey
"""


# --- custom UDAF via Arrow-batched grouped-agg Pandas UDF ----------------------


def priority_price_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean of order totals per priority — a custom UDAF.

    The engine's UDAF surface (SURVEY.md §2.10 names it absent in the
    reference): a ``pandas_udf`` GROUPED_AGG ships each group's column
    slice to Python as ONE Arrow batch (not per-row pickling) and rides
    the same partial-agg/shuffle plan as built-in aggregates. Built-ins
    still win when they exist — this one is expressible as
    ``exp(avg(ln(x)))``, which is exactly what the oracle runs — but the
    UDAF path is the extension point for aggregates SQL can't express.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy()).mean()))

    # Spark disallows mixing GROUPED_AGG pandas UDFs with built-in
    # aggregates in one agg(), so the row count is a (trivial) UDAF too.
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.round(geomean("o_totalprice"), 4).alias("geomean_price"),
            n_rows("o_totalprice").alias("n_orders"),
        )
        .orderBy("priority")
    )


GEOMEAN_ORACLE = """
SELECT o_orderpriority AS priority,
       ROUND(EXP(AVG(LN(o_totalprice))), 4) AS geomean_price,
       COUNT(*) AS n_orders
FROM orders GROUP BY priority ORDER BY priority
"""


def user_hourly_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill: per user, an hourly spine over
    the user's active range, downsampled by max-value-per-hour, with
    missing hours LINEARLY INTERPOLATED between the nearest observed
    neighbors (edges extend the nearest observation).

    All on integer hour buckets from ``ts_us`` (no timestamp
    arithmetic): the spine is ``sequence(min_h, max_h)`` exploded
    per user — driver-free — and the fill is two ignore-nulls window
    passes (last-before, first-after) plus exact-ratio arithmetic on
    identical doubles, so the interpolation is bit-identical on both
    engines.  Shape at scale: one shuffle on user_id for the windows;
    the spine explode is map-side. The events scan is spread to
    defaultParallelism first (the single-file row-group split bound —
    measured 122.1s -> 27.3s at the 100x probe corpus; a many-file
    production layout parallelizes on its own).
    """
    return hourly_interpolate_frame(load_table_spread(spark, sf_dir, "events"))


def hourly_interpolate_frame(ev: DataFrame) -> DataFrame:
    """Core of :func:`user_hourly_interpolate` over any (user_id,
    ts_us, value) frame (split out for direct hand-case testing)."""
    hour = F.floor(F.col("ts_us") / 3_600_000_000).cast("long")
    hourly = ev.groupBy(F.col("user_id"), hour.alias("h")).agg(
        F.max("value").alias("v")
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select("user_id", F.explode(F.sequence("h0", "h1")).alias("h"))
    )
    g = spine.join(hourly, ["user_id", "h"], "left")
    # Both fills as RUNNING (unbounded-preceding) frames — the forward
    # fill runs over DESCENDING h. Spark evaluates a running frame
    # incrementally (O(rows)), but a CURRENT-ROW-to-UNBOUNDED-FOLLOWING
    # frame re-aggregates the remaining rows for EVERY row
    # (UnboundedFollowingWindowFunctionFrame — O(rows²) per user: the
    # r11 full-catalog sweep measured this query at 102 s on sf0.1,
    # 52 s isolated; this rewrite is ~1 s). Each helper lands in ONE
    # named withColumn so the final CASE references columns instead of
    # re-expanding every window expression (10 window instances -> 4).
    wb = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("h"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    h_obs = F.when(F.col("v").isNotNull(), F.col("h"))
    g = (
        g.withColumn("pv", F.last("v", ignorenulls=True).over(wb))
        .withColumn("ph", F.last(h_obs, ignorenulls=True).over(wb))
        .withColumn("nv", F.last("v", ignorenulls=True).over(wf))
        .withColumn("nh", F.last(h_obs, ignorenulls=True).over(wf))
    )
    pv, ph = F.col("pv"), F.col("ph")
    nv, nh = F.col("nv"), F.col("nh")
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(
            pv + (nv - pv) * ((F.col("h") - ph) / (nh - ph))
        )
    )
    return (
        g.select(
            "user_id",
            "h",
            # floor(x*1e4 + 0.5), not round(x, 4): ROUND ties resolve
            # differently across engines on boundary doubles, floor of
            # the identical scaled double never does (the PCA pattern)
            F.floor(filled * 10_000 + F.lit(0.5)).cast("long").alias("value_q4"),
            F.col("v").isNotNull().alias("observed"),
        )
        .orderBy("user_id", "h")
    )


INTERPOLATE_ORACLE = """
WITH hourly AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS h, MAX(value) AS v
  FROM events GROUP BY user_id, h
),
bounds AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY user_id),
spine AS (
  SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM bounds
),
g AS (
  SELECT s.user_id, s.h, hh.v
  FROM spine s LEFT JOIN hourly hh ON s.user_id = hh.user_id AND s.h = hh.h
),
f AS (
  SELECT user_id, h, v,
    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY h
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
    first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY h
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM g
)
SELECT user_id, h,
       CAST(floor((CASE
         WHEN v IS NOT NULL THEN v
         WHEN pv IS NULL THEN nv
         WHEN nv IS NULL THEN pv
         ELSE pv + (nv - pv) * ((h - ph)::DOUBLE / (nh - ph))
       END) * 10000 + 0.5) AS BIGINT) AS value_q4,
       v IS NOT NULL AS observed
FROM f ORDER BY user_id, h
"""


QUERIES = [
    Query("lineitem_price_stats", "corr/covar/regression aggregates per flag",
          lineitem_price_stats, PRICE_STATS_ORACLE),
    Query("priority_price_geomean", "custom UDAF: Arrow grouped-agg pandas_udf",
          priority_price_geomean, GEOMEAN_ORACLE),
    Query("customer_order_moving_avg", "bounded-frame moving average window",
          customer_order_moving_avg, MOVING_AVG_ORACLE),
    Query("order_price_quartiles", "ntile/cume_dist/percent_rank windows",
          order_price_quartiles, QUARTILES_ORACLE),
    Query("daily_order_spine", "sequence+explode calendar spine, zero-filled",
          daily_order_spine, DAILY_SPINE_ORACLE),
    Query("deterministic_sample_stats", "md5 hash-prefix reproducible sampling",
          deterministic_sample_stats, DET_SAMPLE_ORACLE),
    Query("large_volume_orders", "TPC-H Q18-style HAVING subquery join",
          large_volume_orders, LARGE_VOLUME_ORACLE),
    Query("user_hourly_interpolate",
          "hourly resample + linear gap interpolation between nearest "
          "observed neighbors (ignore-nulls window passes)",
          user_hourly_interpolate, INTERPOLATE_ORACLE),
]
