"""Stage-split profile of retrieval_hybrid_fusion (r17 item 1).

Times each constituent subtree in isolation through the noop sink, the
same protocol as the IVF-PQ stage split in r16: one boot, warm-up, then
per-stage timings with scoped caches dropped between full-query reps.

Usage: python tools/profile_hybrid_fusion.py [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.operators.lifecycle import (
    release_scoped_caches,
)
from csv_2_db_pipeline_data_engineering_spark.operators import retrieval as R
from csv_2_db_pipeline_data_engineering_spark.plans.catalog import get_catalog
from csv_2_db_pipeline_data_engineering_spark.session import get_session
from csv_2_db_pipeline_data_engineering_spark.sources.tables import (
    load_embeddings_spread,
    load_table,
    spread_scan,
    table_bytes,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "--reps":
        reps = int(args[1])
    spark = get_session(
        app_name="profile_hybrid",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    catalog = get_catalog()

    # warm-up (same as bench.py)
    from pyspark.sql import Window

    nation = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    region = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
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

    out: dict[str, list[float]] = {}

    def stage(name, fn):
        spark.sparkContext.setJobDescription(f"hybrid profile: {name}")
        t0 = time.monotonic()
        fn()
        out.setdefault(name, []).append(round(time.monotonic() - t0, 3))

    from csv_2_db_pipeline_data_engineering_spark.operators.similarity import _dot

    for _ in range(reps):
        # --- full query baseline (control) ---
        stage("full_query", lambda: noop(catalog["retrieval_hybrid_fusion"].builder(spark, SF_DIR)))
        release_scoped_caches()
        spark.catalog.clearCache()

        # --- constituent stages, rebuilt step by step ---
        t0 = time.monotonic()
        frontier = R._query_frontier(spark, SF_DIR)
        out.setdefault("frontier_collect", []).append(round(time.monotonic() - t0, 3))

        # tf cache build + df/stats via _corpus_index, forced
        t0 = time.monotonic()
        tf, qdf, stats = R._corpus_index(spark, SF_DIR, frontier=frontier)
        noop(tf)  # forces the scoped cache build (tf is cached)
        out.setdefault("tf_cache_build", []).append(round(time.monotonic() - t0, 3))

        stage("stats_agg", lambda: noop(stats))
        stage("qdf_agg", lambda: noop(qdf))

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
        sparse = R._minmax_norm(
            R._topk_per_query(sparse_scored, R.HYBRID_DEPTH), "sparse"
        )
        stage("sparse_topk_norm", lambda: noop(sparse))

        e = load_embeddings_spread(spark, SF_DIR).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ).withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))
        qids = qdf.select("query_id").distinct()
        stage("qids_distinct", lambda: noop(qids))
        qvecs = e.join(
            F.broadcast(qids), e.vec_id == F.col("query_id")
        ).select("query_id", F.col("v").alias("qv"), F.col("norm").alias("qnorm"))
        stage("qvecs_join", lambda: noop(qvecs))
        cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))
        dense_scored = e.join(
            F.broadcast(qvecs), F.col("vec_id") != F.col("query_id")
        ).select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.round(cos, 6).alias("score"),
        )
        dense = R._minmax_norm(R._topk_per_query(dense_scored, R.HYBRID_DEPTH), "dense")
        stage("dense_topk_norm", lambda: noop(dense))

        release_scoped_caches()
        spark.catalog.clearCache()

    print(json.dumps({
        "sf_dir": SF_DIR,
        "reps": reps,
        "mins": {k: min(v) for k, v in out.items()},
        "all": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
