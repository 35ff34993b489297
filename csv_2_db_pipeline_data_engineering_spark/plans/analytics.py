"""General analytics query surface over the TPC-H-ish testdata.

SURVEY.md §7 slice 4: joins (broadcast dim⋈fact, semi/anti), multi-way
joins, aggregations (incl. distinct and rollup/cube), window functions
(ranking, lag, running totals), sorts/top-k, set operations, scalar
function library, date bucketing, sessionization.

Scale notes (100 TB):
- Fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE handles
  skew. Dimension joins (region/nation/supplier/customer at TPC-H
  ratios) are explicitly ``broadcast()`` so they never shuffle the fact.
- Aggregates are expressed directly on the fact scan so Catalyst pushes
  filters into the parquet reader (PushedFilters) and prunes columns.
- Floating aggregates are rounded on both engine and oracle side —
  accumulation order across partitions is nondeterministic by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.lifecycle import scoped_cache
from ..sources.tables import load_table
from .catalog import Query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Q1: pricing summary (flagship: scan→filter→groupBy→agg→sort) -----


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       ROUND(AVG(l_quantity), 2)                                        AS avg_qty,
       ROUND(AVG(l_extendedprice), 2)                                   AS avg_price,
       ROUND(AVG(l_discount), 4)                                        AS avg_disc,
       COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- Q3-style: shipping priority (3-way join + top-k) ------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- Q5-style: local supplier volume (6-way join) ----------------------


def q5_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    # Dimension chain is broadcast; only orders⋈lineitem shuffles.
    dims = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .join(
            F.broadcast(customer),
            (F.col("o_custkey") == customer.c_custkey)
            & (customer.c_nationkey == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_ORACLE = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN supplier ON l_suppkey   = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
JOIN customer ON o_custkey   = c_custkey AND c_nationkey = s_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --- top-k customers by revenue ----------------------------------------


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
             F.count("*").alias("n_orders"))
        .join(F.broadcast(customer), F.col("o_custkey") == customer.c_custkey)
        .select("c_custkey", "c_name", "total_spent", "n_orders")
        .orderBy(F.desc("total_spent"), "c_custkey")
        .limit(10)
    )


TOP_CUSTOMERS_ORACLE = """
SELECT c_custkey, c_name,
       ROUND(SUM(o_totalprice), 2) AS total_spent,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey
LIMIT 10
"""


# --- orders per month (date bucketing) ---------------------------------


def orders_per_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("month")
    )


ORDERS_PER_MONTH_ORACLE = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
GROUP BY month
ORDER BY month
"""


# --- window: last event per user (row_number ranking) -------------------


def last_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts_us"), F.desc("event_id"))
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("last_event_id"),
                F.col("event_type").alias("last_event_type"))
        .orderBy("user_id")
    )


LAST_EVENT_ORACLE = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
"""


# --- window: running revenue per customer --------------------------------


def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


RUNNING_REVENUE_ORACLE = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
ORDER BY o_custkey, o_orderkey
"""


# --- window: lag — mean inter-event gap per user -------------------------


def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = (F.col("ts_us") - F.lag("ts_us").over(w)) / 1_000_000.0
    return (
        _t(spark, sf_dir, "events")
        .withColumn("gap", gap)
        .groupBy("user_id")
        .agg(F.round(F.avg("gap"), 1).alias("avg_gap_sec"),
             F.count("*").alias("n_events"))
        .orderBy("user_id")
    )


USER_EVENT_GAPS_ORACLE = """
SELECT user_id, ROUND(AVG(gap), 1) AS avg_gap_sec, COUNT(*) AS n_events
FROM (
  SELECT user_id,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           / 1000000.0 AS gap
  FROM events
)
GROUP BY user_id
ORDER BY user_id
"""


# --- rollup: order counts by status × year -------------------------------


def rollup_status_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderstatus"), F.year("o_orderdate").cast("int").alias("yr"))
        .rollup("o_orderstatus", "yr")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce(F.col("yr").cast("string"), F.lit("ALL")).alias("year"),
            "n",
        )
        .orderBy("status", "year")
    )


ROLLUP_ORACLE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(CAST(yr AS VARCHAR), 'ALL') AS year,
       COUNT(*) AS n
FROM (SELECT o_orderstatus, CAST(year(o_orderdate) AS INT) AS yr FROM orders)
GROUP BY ROLLUP (o_orderstatus, yr)
ORDER BY status, year
"""


# --- cube: event counts by type × day-of-week ----------------------------


def cube_event_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .select("event_type", F.dayofweek("ts").cast("int").alias("dow"))
        .cube("event_type", "dow")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("dow").cast("string"), F.lit("ALL")).alias("dow"),
            "n",
        )
        .orderBy("event_type", "dow")
    )


CUBE_ORACLE = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(CAST(dow AS VARCHAR), 'ALL') AS dow,
       COUNT(*) AS n
FROM (SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS dow FROM events)
GROUP BY CUBE (event_type, dow)
ORDER BY event_type, dow
"""


# --- explicit grouping sets: two independent dashboards in one pass --------


def grouping_sets_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order count + revenue by priority AND by status, one scan.

    GROUPING SETS ((priority), (status)) — the shape ROLLUP/CUBE can't
    express: two *independent* one-dimensional aggregates sharing a
    single Expand+Aggregate (one fact scan, one shuffle) instead of two
    separate queries. At 100 TB this halves the scan cost of serving
    both dashboard dimensions. Decimal-typed sum keeps the total
    deterministic under any partition/merge order.
    """
    d = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus",
                                           "o_totalprice")
    return (
        d.groupingSets(
            [[F.col("o_orderpriority")], [F.col("o_orderstatus")]],
            F.col("o_orderpriority"),
            F.col("o_orderstatus"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
            "total_price",
        )
        .orderBy("priority", "status")
    )


GROUPING_SETS_ORACLE = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
ORDER BY priority, status
"""


# --- semi / anti joins ----------------------------------------------------


def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders during 1996 (left-anti join)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy("c_custkey")
    )


ANTI_ORACLE = """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01')
ORDER BY c_custkey
"""


# --- set operations --------------------------------------------------------


def rich_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: custkeys with acctbal>5000 ∩ custkeys having orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("custkey"))
    active = o.select(F.col("o_custkey").alias("custkey")).distinct()
    return rich.intersect(active).orderBy("custkey")


INTERSECT_ORACLE = """
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT DISTINCT o_custkey AS custkey FROM orders
ORDER BY custkey
"""


def idle_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: suppliers with no full-truck (quantity >= 48) shipment
    on/after 2001-08-01.

    The quantity qualifier keeps the set difference NON-EMPTY at every
    test sf (every supplier ships *something* in any late window of
    this dense corpus, so a date-only predicate verified the empty set
    — the round-6 vacuity finding; 3 rows at sf0.001, 25 at sf0.01).
    """
    s = _t(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("suppkey"))
    used = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("2001-08-01").cast("timestamp"))
            & (F.col("l_quantity") >= 48)
        )
        .select(F.col("l_suppkey").alias("suppkey"))
    )
    return s.exceptAll(used.distinct()).orderBy("suppkey")


EXCEPT_ORACLE = """
SELECT s_suppkey AS suppkey FROM supplier
EXCEPT
SELECT DISTINCT l_suppkey AS suppkey FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2001-08-01' AND l_quantity >= 48
ORDER BY suppkey
"""


def all_account_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL across customer+supplier balances (U2-style)."""
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"), F.round("c_acctbal", 2).alias("acctbal")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.round("s_acctbal", 2).alias("acctbal")
    )
    return (
        c.unionAll(s)
        .groupBy("kind")
        .agg(F.count("*").alias("n"), F.round(F.avg("acctbal"), 2).alias("avg_bal"))
        .orderBy("kind")
    )


UNION_ORACLE = """
SELECT kind, COUNT(*) AS n, ROUND(AVG(acctbal), 2) AS avg_bal
FROM (
  SELECT 'customer' AS kind, ROUND(c_acctbal, 2) AS acctbal FROM customer
  UNION ALL
  SELECT 'supplier' AS kind, ROUND(s_acctbal, 2) AS acctbal FROM supplier
)
GROUP BY kind ORDER BY kind
"""


# --- distinct aggregation ---------------------------------------------------


def distinct_suppliers_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


DISTINCT_AGG_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- scalar function showcase ------------------------------------------------


def part_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        (F.col("p_size") % 5).alias("size_mod5"),
        F.round(F.col("p_retailprice") * 0.9, 2).alias("discounted"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
    ).orderBy("p_partkey")


SCALAR_ORACLE = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       SUBSTRING(p_name, 1, 10) AS name_prefix,
       LENGTH(p_name) AS name_len,
       CONCAT_WS('-', p_brand, p_type) AS brand_type,
       p_size % 5 AS size_mod5,
       ROUND(p_retailprice * 0.9, 2) AS discounted,
       ABS(p_size - 25) AS size_dist
FROM part WHERE p_partkey <= 100 ORDER BY p_partkey
"""


# --- CASE WHEN bucketing ------------------------------------------------------


def order_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    band = (
        F.when(F.col("o_totalprice") < 50_000, "small")
        .when(F.col("o_totalprice") < 150_000, "medium")
        .otherwise("large")
    )
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(band.alias("band"))
        .agg(F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
        .orderBy("band")
    )


PRICE_BANDS_ORACLE = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS band,
       COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
FROM orders GROUP BY band ORDER BY band
"""


# --- tumbling time window (batch twin of the streaming agg) -------------------


def events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = F.floor(F.col("ts_us") / 3_600_000_000).cast("long")
    return (
        _t(spark, sf_dir, "events")
        .groupBy(bucket.alias("hour_bucket"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("hour_bucket", "event_type")
    )


HOURLY_WINDOW_ORACLE = """
SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_bucket, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY hour_bucket, event_type
ORDER BY hour_bucket, event_type
"""


# --- sessionization (gap > 30 min starts a new session) ------------------------


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = (F.col("ts_us") - F.lag("ts_us").over(w)) / 1_000_000.0
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        _t(spark, sf_dir, "events")
        .withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events"))
        .orderBy("user_id")
    )


SESSIONS_ORACLE = """
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN (epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   / 1000000.0 > 1800
                OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
GROUP BY user_id ORDER BY user_id
"""


# --- JSON column functions ----------------------------------------------------


def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON ``props`` column, aggregated.

    For a SINGLE field ``get_json_object`` (streaming Jackson scan, no
    struct materialization) measured ~2x faster than ``from_json`` with
    a schema; the moment more than one field is needed, switch to one
    ``from_json`` into a typed struct so the document parses once.
    """
    e = _t(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_ORACLE = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
       MIN(CAST(props->>'$.k' AS INTEGER)) AS min_k,
       MAX(CAST(props->>'$.k' AS INTEGER)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- array functions -----------------------------------------------------------


def customer_order_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array pipeline per customer: collect_set -> sort -> join to string.

    Array values are serialized to a CSV string on BOTH engines so the
    comparison is representation-independent (pandas ndarray vs python
    list would stringify differently).
    """
    o = _t(spark, sf_dir, "orders")
    years = F.array_sort(F.collect_set(F.year("o_orderdate")))
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.concat_ws(",", F.transform(years, lambda y: y.cast("string"))).alias(
                "order_years"
            ),
            F.size(years).alias("n_years"),
        )
        .orderBy("custkey")
    )


ORDER_YEARS_ORACLE = """
SELECT o_custkey AS custkey,
       array_to_string(list_sort(list(DISTINCT EXTRACT(year FROM o_orderdate))), ',')
         AS order_years,
       COUNT(DISTINCT EXTRACT(year FROM o_orderdate)) AS n_years
FROM orders GROUP BY o_custkey ORDER BY custkey
"""


# --- regex extraction ----------------------------------------------------------


def part_brand_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex field extraction + tokenized first word, aggregated."""
    p = _t(spark, sf_dir, "part")
    brand_num = F.regexp_extract("p_brand", "[0-9]+", 0)
    first_type_word = F.element_at(F.split("p_type", " "), 1)
    return (
        p.select(brand_num.alias("brand_num"), first_type_word.alias("type_head"))
        .groupBy("brand_num")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct("type_head").alias("n_type_heads"),
        )
        .orderBy("brand_num")
    )


BRAND_REGEX_ORACLE = """
SELECT regexp_extract(p_brand, '[0-9]+') AS brand_num,
       COUNT(*) AS n_parts,
       COUNT(DISTINCT string_split(p_type, ' ')[1]) AS n_type_heads
FROM part GROUP BY brand_num ORDER BY brand_num
"""


# --- UNION (distinct) ----------------------------------------------------------


def nations_with_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys present among suppliers OR customers — UNION distinct
    (completes the set-op family beside UNION ALL / INTERSECT / EXCEPT)."""
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("long").alias("nationkey"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("long").alias("nationkey"))
    return s.union(c).distinct().orderBy("nationkey")


NATIONS_PRESENCE_ORACLE = """
SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
UNION
SELECT CAST(c_nationkey AS BIGINT) FROM customer
ORDER BY nationkey
"""


# --- further TPC-H query shapes (Q14 / Q15 / Q19) --------------------------


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregation market share.

    One month of lineitem joined to a broadcast ``part``; the PROMO
    share is a CASE-inside-SUM over the same rows as the denominator,
    so the whole query is one scan + one broadcast join + one global
    aggregate (partial map-side, 1-row exchange).
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
            / F.sum(rev),
            4,
        ).alias("promo_share_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


PROMO_SHARE_ORACLE = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: max-of-aggregate via a broadcast scalar.

    Quarterly revenue per supplier, then the supplier(s) hitting the
    maximum. The max folds to a 1-row broadcast joined back to the
    per-supplier aggregate — no second shuffle, no global sort; revenue
    is rounded to cents BEFORE max/compare so the equality is on the
    value both engines report.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    # Cached: the per-supplier aggregate (dimension-sized) feeds both
    # the 1-row max and the final join — without it the quarter's
    # lineitem scan + shuffle would run twice.
    rev = scoped_cache(
        li.groupBy("l_suppkey").agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_rev")
        )
    )
    best = rev.agg(F.max("total_rev").alias("best_rev"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(best), F.col("total_rev") == F.col("best_rev"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            "total_rev",
        )
        .orderBy("suppkey")
    )


TOP_SUPPLIER_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey AS suppkey, s_name AS name, total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY suppkey
"""


def disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs bracket predicate over a fact-dim join.

    Three (brand, size-range, quantity-range) brackets OR-ed together.
    Catalyst pushes the common ``p_partkey`` equi-join out of the
    disjunction and evaluates the brackets as a residual filter on the
    broadcast-joined rows — the classic Q19 plan.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    b1 = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#19")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 35)
    )
    return j.filter(b1 | b2 | b3).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


DISJUNCTIVE_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1  AND 15
       AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#2'  AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 35)
"""


QUERIES = [
    Query("q1_pricing_summary", "TPC-H Q1-style pricing summary: filter→groupBy→agg→sort",
          q1_pricing_summary, Q1_ORACLE),
    Query("q3_shipping_priority", "3-way join + top-k revenue (broadcast dims)",
          q3_shipping_priority, Q3_ORACLE),
    Query("q5_supplier_volume", "6-way join through nation/region (broadcast dim chain)",
          q5_supplier_volume, Q5_ORACLE),
    Query("top_customers", "agg + broadcast join + top-k", top_customers, TOP_CUSTOMERS_ORACLE),
    Query("orders_per_month", "date bucketing groupBy", orders_per_month, ORDERS_PER_MONTH_ORACLE),
    Query("last_event_per_user", "row_number ranking window", last_event_per_user, LAST_EVENT_ORACLE),
    Query("running_revenue", "running-total window", running_revenue, RUNNING_REVENUE_ORACLE),
    Query("user_event_gaps", "lag window + agg", user_event_gaps, USER_EVENT_GAPS_ORACLE),
    Query("rollup_status_year", "ROLLUP grouping sets", rollup_status_year, ROLLUP_ORACLE),
    Query("cube_event_type_dow", "CUBE grouping sets", cube_event_type_dow, CUBE_ORACLE),
    Query(
        "grouping_sets_priority_status",
        "explicit GROUPING SETS: two independent dims, one scan",
        grouping_sets_priority_status,
        GROUPING_SETS_ORACLE,
    ),
    Query("customers_with_orders", "left-semi join", customers_with_orders, SEMI_ORACLE),
    Query("customers_without_orders", "left-anti join", customers_without_orders, ANTI_ORACLE),
    Query("rich_active_customers", "INTERSECT", rich_active_customers, INTERSECT_ORACLE),
    Query("idle_suppliers", "EXCEPT", idle_suppliers, EXCEPT_ORACLE),
    Query("all_account_balances", "UNION ALL + agg", all_account_balances, UNION_ORACLE),
    Query("distinct_suppliers_per_flag", "DISTINCT aggregation", distinct_suppliers_per_flag,
          DISTINCT_AGG_ORACLE),
    Query("part_scalar_functions", "scalar string/math function library", part_scalar_functions,
          SCALAR_ORACLE),
    Query("order_price_bands", "CASE WHEN bucketing", order_price_bands, PRICE_BANDS_ORACLE),
    Query("events_hourly_window", "tumbling time window agg (streaming batch-twin)",
          events_hourly_window, HOURLY_WINDOW_ORACLE),
    Query("user_sessions", "sessionization via lag + conditional cumsum", user_sessions,
          SESSIONS_ORACLE),
    Query("events_json_stats", "typed from_json extraction + agg", events_json_stats,
          EVENTS_JSON_ORACLE),
    Query("nations_with_presence", "UNION distinct across two sources",
          nations_with_presence, NATIONS_PRESENCE_ORACLE),
    Query("customer_order_years", "array collect/sort/serialize pipeline",
          customer_order_years, ORDER_YEARS_ORACLE),
    Query("part_brand_regex", "regexp_extract + tokenize + distinct agg",
          part_brand_regex, BRAND_REGEX_ORACLE),
    Query("promo_revenue_share", "conditional-agg market share (TPC-H Q14 shape)",
          promo_revenue_share, PROMO_SHARE_ORACLE),
    Query("top_revenue_supplier", "max-of-aggregate via broadcast scalar (Q15 shape)",
          top_revenue_supplier, TOP_SUPPLIER_ORACLE),
    Query("disjunctive_bracket_revenue", "OR-of-ANDs bracket predicate (Q19 shape)",
          disjunctive_bracket_revenue, DISJUNCTIVE_ORACLE),
]
