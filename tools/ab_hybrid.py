"""Same-session interleaved A/B of retrieval_hybrid_fusion old vs new (r17).

The host shows minute-scale noisy phases; cross-boot stash A/Bs are
unreliable inside one. This tool rebuilds the r16 (pre-r17) hybrid body
inline — old _minmax_norm (no cache), qids from the postings df
aggregate, qvecs via broadcast join against the full spread scan — and
interleaves [q1 control, old, new] reps in ONE JVM so both arms see the
same phase.

Usage: python tools/ab_hybrid.py [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.operators import retrieval as R
from csv_2_db_pipeline_data_engineering_spark.operators.lifecycle import (
    release_scoped_caches,
)
from csv_2_db_pipeline_data_engineering_spark.operators.similarity import _dot
from csv_2_db_pipeline_data_engineering_spark.plans.catalog import get_catalog
from csv_2_db_pipeline_data_engineering_spark.session import get_session
from csv_2_db_pipeline_data_engineering_spark.sources.tables import (
    load_embeddings_spread,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# warm-up + q1 control always run from the full-table source dir (a
# scale-probe corpus holds only documents/embeddings)
CTRL_DIR = "/root/testdata/sf0.1"


def _minmax_norm_old(top, out):
    mm = top.groupBy("query_id").agg(
        F.min("score").alias("smin"), F.max("score").alias("smax")
    )
    norm = F.when(
        F.col("smax") > F.col("smin"),
        F.round((F.col("score") - F.col("smin")) / (F.col("smax") - F.col("smin")), 6),
    ).otherwise(F.lit(1.0))
    return top.join(F.broadcast(mm), "query_id").select(
        "query_id", "doc_id", F.col("rnk").alias(f"rank_{out}"),
        norm.alias(f"norm_{out}"),
    )


def hybrid_old(spark, sf_dir):
    tf, qdf, stats = R._corpus_index(spark, sf_dir)
    contrib = F.col("qtf") * R._idf(F.col("n_docs"), F.col("df")) * R._tf_norm(
        F.col("tf"), F.col("dl"), F.col("avgdl")
    )
    sparse_scored = (
        tf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
        .filter(F.col("doc_id") != F.col("query_id"))
    )
    sparse = _minmax_norm_old(
        R._topk_per_query(sparse_scored, R.HYBRID_DEPTH), "sparse"
    )
    e = load_embeddings_spread(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    qids = qdf.select("query_id").distinct()
    qvecs = e.join(
        F.broadcast(qids), e.vec_id == F.col("query_id")
    ).select("query_id", F.col("v").alias("qv"), F.col("norm").alias("qnorm"))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))
    dense_scored = e.join(
        F.broadcast(qvecs), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.round(cos, 6).alias("score"),
    )
    dense = _minmax_norm_old(
        R._topk_per_query(dense_scored, R.HYBRID_DEPTH), "dense"
    )
    fused = sparse.join(dense, ["query_id", "doc_id"], "full_outer").withColumn(
        "hybrid_score",
        F.round(
            F.lit(R.HYBRID_ALPHA) * F.coalesce("norm_sparse", F.lit(0.0))
            + F.lit(1.0 - R.HYBRID_ALPHA) * F.coalesce("norm_dense", F.lit(0.0)),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("hybrid_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= R.HYBRID_TOPK)
        .select(
            "query_id", "rnk", "doc_id", "hybrid_score",
            "norm_sparse", "norm_dense", "rank_sparse", "rank_dense",
        )
        .orderBy("query_id", "rnk")
    )


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    if args and args[0] == "--reps":
        reps = int(args[1])
    spark = get_session(
        app_name="ab_hybrid",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    catalog = get_catalog()
    # warm-up
    nation = spark.read.parquet(os.path.join(CTRL_DIR, "nation.parquet"))
    region = spark.read.parquet(os.path.join(CTRL_DIR, "region.parquet"))
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .withColumn("rn", F.row_number().over(w))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    arms = {
        "q1": lambda: catalog["q1_pricing_summary"].builder(spark, CTRL_DIR),
        "old": lambda: hybrid_old(spark, SF_DIR),
        "new": lambda: catalog["retrieval_hybrid_fusion"].builder(spark, SF_DIR),
    }
    out = {k: [] for k in arms}
    for _ in range(reps):
        for name, b in arms.items():
            spark.sparkContext.setJobDescription(f"ab_hybrid: {name}")
            t0 = time.monotonic()
            b().write.format("noop").mode("overwrite").save()
            out[name].append(round(time.monotonic() - t0, 3))
            release_scoped_caches()
            spark.catalog.clearCache()
    print(json.dumps({
        "sf_dir": SF_DIR, "reps": reps,
        "mins": {k: min(v) for k, v in out.items()},
        "all_reps": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
