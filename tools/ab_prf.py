"""Same-session interleaved A/B: PRF/serve bodies with text-cache (old,
r16) vs tokenized-cache (new, r17) corpus frames.

Usage: python tools/ab_prf.py [--reps N]
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
# warm-up + q1 control always run from the full-table source dir (a
# scale-probe corpus holds only documents/embeddings)
CTRL_DIR = "/root/testdata/sf0.1"


def prf_expansion_old(spark, sf_dir):
    """The r16 _prf_expansion_parts body: text-cached corpus, split per pass."""
    qvocab, qterm, _ = R._query_frontier(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    dr = scoped_cache(
        spread_scan(
            load_table(spark, sf_dir, "documents").select("doc_id", "text"),
            table_bytes(sf_dir, "documents"),
        )
    )
    st = dr.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("total_dl"),
    ).collect()[0]
    partials = spark.createDataFrame(
        [(st.n_docs, st.total_dl)], "n_docs long, total_dl long"
    )
    tf1 = (
        dr.select(
            "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term")
        )
        .filter(F.col("term").isin(qvocab))
        .groupBy("doc_id", "term")
        .agg(F.min("dl").alias("dl"), F.count(F.lit(1)).alias("tf"))
    )
    fb_rows = (
        R._bm25_topk_frame(tf1, qterm, partials)
        .select("query_id", "rnk", "doc_id")
        .collect()
    )
    fb_doc_ids = sorted({r.doc_id for r in fb_rows})
    fb_map = spark.createDataFrame(
        [(r.query_id, r.doc_id) for r in fb_rows], "query_id long, doc_id long"
    )
    fb_tf = scoped_cache(
        dr.filter(F.col("doc_id").isin(fb_doc_ids))
        .select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf_fb"))
        .join(F.broadcast(fb_map), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.sum("tf_fb").alias("tf_fb"))
        .join(
            F.broadcast(qterm.select("query_id", "term")),
            ["query_id", "term"],
            "left_anti",
        )
    )
    cand_terms = fb_tf.select("term").distinct()
    df_cand = (
        dr.select("doc_id", F.explode(toks).alias("term"))
        .join(F.broadcast(cand_terms), "term")
        .groupBy("term")
        .agg(F.count_distinct(F.col("doc_id")).alias("df"))
    )
    w_exp = Window.partitionBy("query_id").orderBy(F.desc("w"), F.asc("term"))
    expansion = (
        fb_tf.join(df_cand, "term")
        .select(
            "query_id",
            "term",
            F.round(
                F.col("tf_fb") * F.log(F.lit(st.n_docs) / F.col("df")), 6
            ).alias("w"),
        )
        .withColumn("r", F.row_number().over(w_exp))
        .filter(F.col("r") <= R.PRF_EXP_TERMS)
        .select("query_id", "term")
        .collect()
    )
    qterm2 = qterm.unionByName(
        spark.createDataFrame(
            [(r.query_id, r.term, 1) for r in expansion],
            "query_id long, term string, qtf long",
        )
    )
    vocab2 = sorted(set(qvocab) | {r.term for r in expansion})
    tf2 = (
        dr.select(
            "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term")
        )
        .filter(F.col("term").isin(vocab2))
        .groupBy("doc_id", "term")
        .agg(F.min("dl").alias("dl"), F.count(F.lit(1)).alias("tf"))
    )
    return (
        R._bm25_topk_frame(tf2, qterm2, partials)
        .select(
            "query_id", "rnk", "doc_id", F.col("score").alias("score_prf")
        )
        .orderBy("query_id", "rnk")
    )


def bm25_serve_old(spark, sf_dir):
    qvocab, qterm, _ = R._query_frontier(spark, sf_dir)
    dr = scoped_cache(
        spread_scan(
            load_table(spark, sf_dir, "documents").select("doc_id", "text"),
            table_bytes(sf_dir, "documents"),
        )
    )
    base = dr.filter(F.col("doc_id") % 10 != 0)
    delta = dr.filter(F.col("doc_id") % 10 == 0)
    in_vocab = F.col("term").isin(qvocab)
    tf = R.bm25_postings(base, spread=False).filter(in_vocab).unionByName(
        R.bm25_postings(delta, spread=False).filter(in_vocab)
    )
    stats = (
        R.corpus_stats_partial(base)
        .unionByName(R.corpus_stats_partial(delta))
        .agg(F.sum("n_docs").alias("n_docs"), F.sum("total_dl").alias("total_dl"))
    )
    return (
        R._bm25_topk_frame(tf, qterm, stats)
        .select("query_id", "rnk", "doc_id", "score")
        .orderBy("query_id", "rnk")
    )


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    if args and args[0] == "--reps":
        reps = int(args[1])
    spark = get_session(
        app_name="ab_prf",
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
        "prf_old": lambda: prf_expansion_old(spark, SF_DIR),
        "prf_new": lambda: catalog["retrieval_prf_expansion"].builder(spark, SF_DIR),
        "serve_old": lambda: bm25_serve_old(spark, SF_DIR),
        "serve_new": lambda: catalog["bm25_serve_incremental"].builder(spark, SF_DIR),
    }
    out = {k: [] for k in arms}
    for _ in range(reps):
        for name, b in arms.items():
            spark.sparkContext.setJobDescription(f"ab_prf: {name}")
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
