"""Approximate-nearest-neighbor search over embedding columns.

Driver-mandated extension (SURVEY.md §2.11). Two tiers:

- ``ann_topk_bruteforce``: exact top-k by cosine — the correctness
  baseline and the verifier. O(queries × corpus); fine when the query
  set is small (broadcast it) even at 100 TB corpus.
- ``ann_lsh_bucketed``: random-hyperplane (sign) LSH — corpus hashed
  map-side into 2^planes buckets; a query only meets its own bucket
  (plus multi-probe neighbors) in the join. This is the scale path:
  the shuffle is keyed on the bucket id, never all-pairs. No SQL twin
  (hyperplanes are engine-side constants); recall is asserted against
  the brute-force baseline in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import Query
from ..sources.tables import load_table

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the demo query vectors
N_PLANES = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return e.withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for each query vector (vec_id < N_QUERIES).

    The query side is broadcast — at 100 TB the corpus scan is
    embarrassingly parallel and nothing shuffles except the per-query
    top-k (a tiny aggregate).
    """
    e = _normalized(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.round(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


ANN_TOPK_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(q.v, c.v), 6) AS cosine
  FROM e q JOIN e c ON c.vec_id != q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def hyperplanes(dim: int = 64, n_planes: int = N_PLANES, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded, reproducible)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def _bucket_expr(v: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit b = (v · plane_b) > 0, packed to an int."""
    bucket = F.lit(0)
    for b, plane in enumerate(planes):
        dot = _dot(v, F.array(*[F.lit(float(x)) for x in plane]))
        bucket = bucket + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: query meets only same-bucket corpus vectors.

    Returns the same contract as brute force minus the misses — tests
    assert recall against ``ann_topk_bruteforce``. Multi-probe (flip one
    bit) would raise recall further; single-probe keeps the demo tight.
    """
    planes = hyperplanes()
    e = _normalized(spark, sf_dir).withColumn("bucket", _bucket_expr(F.col("v"), planes))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))
    scored = (
        e.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.round(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


QUERIES = [
    Query("ann_topk_bruteforce", "exact cosine top-k neighbors (broadcast queries)",
          ann_topk_bruteforce, ANN_TOPK_ORACLE),
    Query("ann_lsh_bucketed", "sign-LSH bucketed ANN (scale path; recall tested)",
          ann_lsh_bucketed, None),
]
