"""Hypertable-style continuous aggregate: incrementally maintained rollups.

The timeseries-DB "continuous aggregate" pattern re-expressed for a
lakehouse: a rollup table holds per-(bucket, key) MERGEABLE partial
states — count, sum, min, max, and an HLL sketch for distincts — so new
data folds in WITHOUT rescanning history:

    rollup(base ∪ delta) == merge(rollup(base), rollup(delta))

That algebraic property (tested in tests/test_rollup.py) is what makes
the operator correct under out-of-order and late arrivals: a delta
touching an old bucket just re-merges that bucket, no matter how late.

Scale notes (100 TB of history, GB-sized deltas):
- Maintenance cost is O(delta + touched buckets), never O(history):
  ``merge_rollup`` unions the existing rollup (partition-pruned to the
  touched buckets by the join on bucket keys at write time) with the
  delta's partials and re-merges. Sum/count/min/max merge by algebra;
  approx-distinct merges via HLL sketch union (``hll_union_agg``) —
  exact distinct is NOT mergeable without keeping full key sets, which
  is the reason hypertables store sketches.
- avg is derived (sum/count) at serve time, never stored — stored
  ratios don't merge.
- The rollup table is itself partitioned by bucket at the sink, so
  serving queries partition-prune to their time range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: columns every rollup carries besides the grouping keys
STATE_COLS = ("n_rows", "sum_value", "min_value", "max_value", "distinct_sketch")


def build_rollup(
    events: DataFrame,
    bucket: str = "1 hour",
    key: str = "event_type",
    ts: str = "ts",
    value: str = "value",
    distinct_col: str = "user_id",
) -> DataFrame:
    """Aggregate raw events into per-(bucket, key) mergeable partials."""
    return (
        events.groupBy(
            F.window(F.col(ts), bucket)["start"].alias("bucket_start"),
            F.col(key).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(value).alias("sum_value"),
            F.min(value).alias("min_value"),
            F.max(value).alias("max_value"),
            F.hll_sketch_agg(distinct_col).alias("distinct_sketch"),
        )
    )


def merge_rollup(existing: DataFrame, delta_rollup: DataFrame) -> DataFrame:
    """Fold a delta's partials into an existing rollup (same schema).

    Pure algebra per state column — one shuffle on (bucket, key), output
    schema identical to the inputs, so the merge composes indefinitely.
    """
    cols = ["bucket_start", "key", *STATE_COLS]
    return (
        existing.select(*cols)
        .unionByName(delta_rollup.select(*cols))
        .groupBy("bucket_start", "key")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.hll_union_agg("distinct_sketch").alias("distinct_sketch"),
        )
    )


def serve_rollup(rollup: DataFrame) -> DataFrame:
    """Reader-facing view: derived avg + sketch resolved to an estimate."""
    return rollup.select(
        "bucket_start",
        "key",
        "n_rows",
        "sum_value",
        (F.col("sum_value") / F.col("n_rows")).alias("avg_value"),
        "min_value",
        "max_value",
        F.hll_sketch_estimate("distinct_sketch").alias("approx_distinct"),
    )


# --- catalog registration -------------------------------------------------------

#: engine-identical exact 4-dp half-away-from-zero average of
#: sum_value/n_rows (see the comment block in ``hourly_rollup_serve``);
#: the two strings differ only in each engine's INTEGER floor-division
#: spelling and wide-integer type.
EXACT_AVG_4DP_SPARK = (
    "CAST((CASE WHEN sum_value < 0 THEN -1 ELSE 1 END)"
    " * CAST((CAST(ABS(sum_value) * 1000000 AS DECIMAL(38,0)) + 50 * n_rows)"
    " DIV (100 * n_rows) AS BIGINT) AS DOUBLE) / 10000"
)
EXACT_AVG_4DP_DUCKDB = (
    "CAST((CASE WHEN sum_value < 0 THEN -1 ELSE 1 END)"
    " * CAST((CAST(ABS(sum_value) * 1000000 AS HUGEINT) + 50 * n_rows)"
    " // (100 * n_rows) AS BIGINT) AS DOUBLE) / 10000"
)


def hourly_rollup_serve(spark, sf_dir: str) -> DataFrame:
    """Served continuous aggregate over events (exact columns only — the
    HLL sketch estimate is engine-specific and recall-tested instead).

    The summed value is quantized to DECIMAL(18,6) before aggregation:
    decimal summation is EXACT and order-independent, where a double
    sum depends on the partial-aggregation tree and diverges between
    engines by an ulp — enough to flip the 4-dp rounding on one bucket
    in ~3k at sf0.1. Exact decimal partials are also the right state
    for a mergeable rollup: re-aggregation gives bit-identical sums no
    matter how deltas are merged. min/max/avg derive from exact picks
    and the exact sum, so every served column is engine-stable.
    """
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("decimal(18,6)")
    )
    served = serve_rollup(build_rollup(ev))
    sum_d = F.col("sum_value").cast("double")
    # avg rounded to 4 dp in PURE INTEGER arithmetic: sum/n in decimal
    # can land exactly on a .xxxx5 tie, where Spark (BigDecimal HALF_UP)
    # and DuckDB (C-library rounding on doubles) disagree. Micro-unit
    # integers + floor((|x| + n/2)/n), sign reapplied, is the same
    # half-AWAY-FROM-ZERO rule computed identically by both engines:
    # the ABS/sign split matters because Spark's DIV truncates toward
    # zero while DuckDB's // floors — they only agree on non-negative
    # operands (the r4 ADVICE finding). Micro-units live in
    # DECIMAL(38,0) (Spark) / HUGEINT (DuckDB oracle) so |sum| is good
    # to ~1.7e32, not the old BIGINT's 9.2e12; the BIGINT quotient cast
    # bounds |avg| < 9.2e14, comfortably above any physical bucket mean.
    # (DuckDB note: // on DECIMAL operands is fractional division —
    # HUGEINT is what keeps it integer floor division there.)
    avg_exact = F.expr(EXACT_AVG_4DP_SPARK)
    return served.select(
        "bucket_start",
        "key",
        "n_rows",
        F.round(sum_d, 4).alias("sum_value"),
        avg_exact.alias("avg_value"),
        F.round(F.col("min_value").cast("double"), 4).alias("min_value"),
        F.round(F.col("max_value").cast("double"), 4).alias("max_value"),
    ).orderBy("bucket_start", "key")


HOURLY_ROLLUP_ORACLE = f"""
WITH agg AS (
  SELECT date_trunc('hour', ts) AS bucket_start,
         event_type AS key,
         COUNT(*) AS n_rows,
         SUM(CAST(value AS DECIMAL(18,6))) AS sum_value,
         MIN(CAST(value AS DECIMAL(18,6))) AS min_value,
         MAX(CAST(value AS DECIMAL(18,6))) AS max_value
  FROM events GROUP BY bucket_start, key
)
SELECT bucket_start, key, n_rows,
       ROUND(CAST(sum_value AS DOUBLE), 4) AS sum_value,
       {EXACT_AVG_4DP_DUCKDB} AS avg_value,
       ROUND(CAST(min_value AS DOUBLE), 4) AS min_value,
       ROUND(CAST(max_value AS DOUBLE), 4) AS max_value
FROM agg ORDER BY bucket_start, key
"""


from ..plans.catalog import Query  # noqa: E402

QUERIES = [
    Query("hourly_rollup_serve", "continuous-aggregate rollup, served view",
          hourly_rollup_serve, HOURLY_ROLLUP_ORACLE),
]
