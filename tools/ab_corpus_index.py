"""Same-session interleaved A/B: two-pass (r16) vs sentinel one-pass
(r17) _corpus_index, exercised through the text_bm25_topk plan.

Usage: [SPARK_GRAFT_SF_DIR=...] python tools/ab_corpus_index.py [--reps N]
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
    scoped_cache,
)
from csv_2_db_pipeline_data_engineering_spark.plans.catalog import get_catalog
from csv_2_db_pipeline_data_engineering_spark.session import get_session
from csv_2_db_pipeline_data_engineering_spark.sources.tables import (
    load_table,
    spread_scan,
    table_bytes,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CTRL_DIR = "/root/testdata/sf0.1"


def corpus_index_old(spark, sf_dir, frontier=None):
    """The r16 two-pass body: separate stats scan + tokenize."""
    toks = F.split(F.col("text"), " ")
    if frontier is None:
        frontier = R._query_frontier(spark, sf_dir)
    qvocab, qterm = frontier[0], frontier[1]
    dr = spread_scan(
        load_table(spark, sf_dir, "documents"),
        table_bytes(sf_dir, "documents"),
    )
    tf = scoped_cache(
        dr.select(
            "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term")
        )
        .filter(F.col("term").isin(qvocab))
        .groupBy("doc_id", "term")
        .agg(F.min("dl").alias("dl"), F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = (
        dr.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(toks)).alias("total_dl"),
        )
        .select(
            "n_docs",
            (F.floor(1000 * F.col("total_dl") / F.col("n_docs")) / 1000.0).alias(
                "avgdl"
            ),
        )
    )
    qdf = df_.join(F.broadcast(qterm), "term")
    return tf, qdf, stats


def bm25_topk_old(spark, sf_dir):
    tf, qdf, stats = corpus_index_old(spark, sf_dir)
    contrib = F.col("qtf") * R._idf(F.col("n_docs"), F.col("df")) * R._tf_norm(
        F.col("tf"), F.col("dl"), F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    return (
        R._topk_per_query(scored)
        .select("query_id", "rnk", "doc_id", "score")
        .orderBy("query_id", "rnk")
    )


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    if args and args[0] == "--reps":
        reps = int(args[1])
    spark = get_session(
        app_name="ab_corpus_index",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    catalog = get_catalog()
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
        "topk_old": lambda: bm25_topk_old(spark, SF_DIR),
        "topk_new": lambda: catalog["text_bm25_topk"].builder(spark, SF_DIR),
    }
    out = {k: [] for k in arms}
    for _ in range(reps):
        for name, b in arms.items():
            spark.sparkContext.setJobDescription(f"ab_corpus_index: {name}")
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
