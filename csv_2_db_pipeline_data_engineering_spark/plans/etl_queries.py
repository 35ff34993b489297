"""ETL-parity operators as oracle-checked queries over the testdata.

The reference pipeline's operators (SURVEY.md §2: coerce casts,
multi-format date parse, rule-annotation/dead-letter split, reason
group-count, rejection-rate) can't run verbatim on the TPC-H-ish tables
(no raw sales CSV there), so each one is re-expressed over `orders`
with the SAME operator shape — making every parity operator
DuckDB-checkable, not just unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.transform import parse_date_expr
from ..sources.tables import load_table
from .catalog import Query


# --- F2: multi-format date parse, first-match-wins ----------------------
# Render o_orderdate into one of three formats by orderkey%3, parse back
# through the engine's parse_date_expr, then aggregate by parsed year.


def multiformat_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    mod = F.col("o_orderkey") % 3
    rendered = (
        F.when(mod == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(mod == 1, F.date_format("o_orderdate", "dd/MM/yyyy"))
        .otherwise(F.date_format("o_orderdate", "MMM d yyyy"))
    )
    return (
        o.select(rendered.alias("date_str"))
        .select(parse_date_expr("date_str").alias("d"))
        .groupBy(F.year("d").cast("int").alias("year"))
        .agg(F.count("*").alias("n"))
        .orderBy("year")
    )


MULTIFORMAT_ORACLE = """
SELECT CAST(year(d) AS INT) AS year, COUNT(*) AS n
FROM (
  SELECT COALESCE(
           try_strptime(date_str, '%Y-%m-%d'),
           try_strptime(date_str, '%d/%m/%Y'),
           try_strptime(date_str, '%b %d %Y')
         ) AS d
  FROM (
    SELECT CASE o_orderkey % 3
             WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
             WHEN 1 THEN strftime(o_orderdate, '%d/%m/%Y')
             ELSE strftime(o_orderdate, '%b %-d %Y')
           END AS date_str
    FROM orders
  )
)
GROUP BY year ORDER BY year
"""


# --- F1: coerce-cast semantics (try_cast = to_numeric(errors='coerce')) --
# Derive a dirty string column (some numeric, some garbage), try_cast it,
# and count parse successes/failures — NULL-on-failure either way.


def coerce_cast_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    dirty = (
        F.when(F.col("o_orderkey") % 4 == 0, F.lit("not-a-number"))
        .when(F.col("o_orderkey") % 4 == 1, F.lit(""))
        .otherwise(F.col("o_totalprice").cast("string"))
    )
    parsed = dirty.try_cast("double")
    return (
        o.select(parsed.alias("v"))
        .agg(
            F.count("*").alias("n_total"),
            F.count("v").alias("n_parsed"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_coerced_null"),
            F.round(F.sum("v"), 2).alias("sum_parsed"),
        )
    )


COERCE_ORACLE = """
SELECT COUNT(*) AS n_total,
       COUNT(v) AS n_parsed,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_coerced_null,
       ROUND(SUM(v), 2) AS sum_parsed
FROM (
  SELECT TRY_CAST(CASE o_orderkey % 4
                    WHEN 0 THEN 'not-a-number'
                    WHEN 1 THEN ''
                    ELSE CAST(o_totalprice AS VARCHAR)
                  END AS DOUBLE) AS v
  FROM orders
)
"""


# --- P1/P2/A3: rule annotation + dead-letter split + reason group-count --
# The reference's array-of-reasons rule engine applied to orders, then the
# documented ops query: GROUP BY rejection_reason ORDER BY count DESC
# (reference src/load.py:112-115).


def _order_reasons() -> F.Column:
    return F.array_compact(
        F.array(
            F.when(F.col("o_totalprice") <= 15000, F.lit("totalprice below minimum")),
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), F.lit("invalid status")),
            F.when(
                F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"),
                F.lit("order predates system"),
            ),
            F.when(F.col("o_orderpriority").isNull(), F.lit("missing priority")),
        )
    )


def rejection_reason_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    annotated = o.withColumn("reasons", _order_reasons())
    return (
        annotated.filter(F.size("reasons") > 0)
        .select(F.array_join("reasons", " | ").alias("rejection_reason"))
        .groupBy("rejection_reason")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "rejection_reason")
    )


REASON_COUNTS_ORACLE = """
SELECT array_to_string(reasons, ' | ') AS rejection_reason, COUNT(*) AS n
FROM (
  SELECT list_filter([
           CASE WHEN o_totalprice <= 15000 THEN 'totalprice below minimum' END,
           CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 'invalid status' END,
           CASE WHEN o_orderdate < TIMESTAMP '1995-07-01' THEN 'order predates system' END,
           CASE WHEN o_orderpriority IS NULL THEN 'missing priority' END
         ], x -> x IS NOT NULL) AS reasons
  FROM orders
)
WHERE len(reasons) > 0
GROUP BY rejection_reason
ORDER BY n DESC, rejection_reason
"""


# --- A4/U2: rejection-rate over a UNION ALL of clean+rejected -------------
# The README's documented verification query shape (reference
# README.md:136-148): conditional counts + ROUND(rate, 1).


def rejection_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    annotated = o.withColumn("reasons", _order_reasons())
    clean = annotated.filter(F.size("reasons") == 0).select(
        F.lit(None).cast("string").alias("rejection_reason")
    )
    rejected = annotated.filter(F.size("reasons") > 0).select(
        F.array_join("reasons", " | ").alias("rejection_reason")
    )
    return clean.unionAll(rejected).agg(
        F.count("*").alias("total_rows"),
        F.count("rejection_reason").alias("rejected_rows"),
        F.round(F.count("rejection_reason") * 100.0 / F.count("*"), 1).alias(
            "rejection_rate_pct"
        ),
    )


REJECTION_RATE_ORACLE = """
SELECT COUNT(*) AS total_rows,
       COUNT(rejection_reason) AS rejected_rows,
       ROUND(COUNT(rejection_reason) * 100.0 / COUNT(*), 1) AS rejection_rate_pct
FROM (
  SELECT CASE WHEN len(reasons) > 0 THEN array_to_string(reasons, ' | ') END AS rejection_reason
  FROM (
    SELECT list_filter([
             CASE WHEN o_totalprice <= 15000 THEN 'totalprice below minimum' END,
             CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 'invalid status' END,
             CASE WHEN o_orderdate < TIMESTAMP '1995-07-01' THEN 'order predates system' END,
             CASE WHEN o_orderpriority IS NULL THEN 'missing priority' END
           ], x -> x IS NOT NULL) AS reasons
    FROM orders
  )
)
"""


# --- F3-F6/F11: string normalization + JSON serialization ------------------
# trim/lower/upper/coalesce + to_json(struct(*)) — the dead-letter
# raw_data shape — demonstrated on customer.


def normalize_and_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 50)
    return c.select(
        "c_custkey",
        F.upper(F.trim("c_name")).alias("name_norm"),
        F.lower(F.trim("c_mktsegment")).alias("segment_norm"),
        F.coalesce(F.col("c_mktsegment"), F.lit("unknown")).alias("segment_filled"),
        F.length(F.col("c_name")).alias("name_len"),
    ).orderBy("c_custkey")


NORMALIZE_ORACLE = """
SELECT c_custkey,
       UPPER(TRIM(c_name)) AS name_norm,
       LOWER(TRIM(c_mktsegment)) AS segment_norm,
       COALESCE(c_mktsegment, 'unknown') AS segment_filled,
       LENGTH(c_name) AS name_len
FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey
"""


# --- A2: duplicate-key detection --------------------------------------------


def duplicate_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count events per (user_id, event_type) where the pair repeats —
    the reference's duplicate-key warning signal as a query."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(
            F.count("*").alias("n_duplicated_keys"),
            F.sum(F.col("n") - 1).alias("n_excess_rows"),
        )
    )


DUPLICATE_KEYS_ORACLE = """
SELECT COUNT(*) AS n_duplicated_keys, CAST(SUM(n - 1) AS BIGINT) AS n_excess_rows
FROM (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type HAVING COUNT(*) > 1
)
"""


QUERIES = [
    Query("multiformat_date_parse", "F2: 3-format first-match-wins date parse",
          multiformat_date_parse, MULTIFORMAT_ORACLE),
    Query("coerce_cast_semantics", "F1: NULL-on-failure coerce cast", coerce_cast_semantics,
          COERCE_ORACLE),
    Query("rejection_reason_counts", "P1/P2/A3: rule annotation + reason group-count",
          rejection_reason_counts, REASON_COUNTS_ORACLE),
    Query("rejection_rate", "A4/U2: rejection rate over UNION ALL", rejection_rate,
          REJECTION_RATE_ORACLE),
    Query("normalize_and_serialize", "F3-F6: string normalization library",
          normalize_and_serialize, NORMALIZE_ORACLE),
    Query("duplicate_user_events", "A2: duplicate-key detection signal",
          duplicate_user_events, DUPLICATE_KEYS_ORACLE),
]
