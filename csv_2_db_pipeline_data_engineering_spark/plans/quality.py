"""Data-quality operators: column profiling and statistical outlier flags.

The reference's entire quality surface is five fixed row rules
(SURVEY.md §2.2); a production pipeline also needs dataset-level
profiling (null rates, cardinalities, ranges) and distribution-based
anomaly flags. Both are expressed as single-pass aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import Query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- column profile -------------------------------------------------------------

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile: rows, nulls, distincts, min/max — ONE pass.

    All metrics for all columns compute in a single aggregation over one
    scan (Catalyst prunes to exactly the profiled columns); the unpivot
    to long form is a zero-shuffle ``stack``. At 100 TB swap
    ``countDistinct`` for ``approx_count_distinct`` — same plan shape.
    """
    li = _t(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distincts"),
            F.round(F.min(c), 4).cast("double").alias(f"{c}__min"),
            F.round(F.max(c), 4).cast("double").alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distincts, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
    ).orderBy("column_name")


PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(ROUND(MIN({c}), 4) AS DOUBLE) AS min_value,
       CAST(ROUND(MAX({c}), 4) AS DOUBLE) AS max_value
FROM lineitem"""
    for c in _PROFILE_COLS
) + "\nORDER BY column_name"


# --- z-score outliers -----------------------------------------------------------


def event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value sits > 3 sigma above their type's mean.

    (``events.value`` is exponential-tailed — mean ~= sigma — so the
    3-sigma gate actually fires; order prices are uniform and never
    would.) Determinism contract: mean and variance derive from EXACT
    decimal sums (sum x, sum x^2, n), so both engines compute identical
    doubles and the 3-sigma comparison can't flip on accumulation order
    — a plain ``stddev_samp`` over doubles could. One shuffle (the
    groupBy), then a broadcast join back to the rows.
    """
    e = _t(spark, sf_dir, "events").withColumn(
        "p", F.col("value").cast("decimal(18,6)")
    )
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p").cast("double").alias("s1"),
        F.sum(F.col("p") * F.col("p")).cast("double").alias("s2"),
    )
    mu = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    enriched = stats.select("event_type", mu.alias("mu"), F.sqrt(var).alias("sigma"))
    return (
        e.join(F.broadcast(enriched), "event_type")
        .filter(F.col("value") > F.col("mu") + 3 * F.col("sigma"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4).alias("z_score"),
        )
        .orderBy("event_id")
    )


OUTLIERS_ORACLE = """
WITH stats AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(value::DECIMAL(18,6))::DOUBLE AS s1,
         SUM(value::DECIMAL(18,6) * value::DECIMAL(18,6))::DOUBLE AS s2
  FROM events GROUP BY event_type
),
enriched AS (
  SELECT event_type, s1 / n AS mu,
         sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sigma
  FROM stats
)
SELECT e.event_id, e.event_type,
       ROUND(e.value, 2) AS value,
       ROUND((e.value - s.mu) / s.sigma, 4) AS z_score
FROM events e JOIN enriched s USING (event_type)
WHERE e.value > s.mu + 3 * s.sigma
ORDER BY e.event_id
"""


QUERIES = [
    Query("profile_lineitem", "one-pass per-column profile (nulls/distincts/range)",
          profile_lineitem, PROFILE_ORACLE),
    Query("event_value_outliers", "3-sigma outliers from exact-sum moments",
          event_value_outliers, OUTLIERS_ORACLE),
]
