"""10x scale probe: measure how the heaviest query families scale.

The driver's parquet stops at sf0.1 (5k docs); the "100 TB design"
claims need measured evidence that the plans scale ~linearly in data
volume. This tool self-generates an sf1-equivalent ``documents`` table
(10x rows, same vocabulary/length distribution; each extra copy is a
seeded word-level SHUFFLE of a source doc, so copies share unigrams but
NOT trigram shingles — the near-dup pair structure stays sparse instead
of exploding quadratically, which would measure a different corpus, not
a bigger one) and times the probe queries at sf0.1 vs the generated
sf1, min-of-N interleaved reps through the noop sink (the ``bench.py``
estimator).

Usage: python tools/scale_probe.py [--reps 3] [--copies 10]
                                   [--probes name1,name2] [--tables docs,emb,facts]
Writes SCALE_PROBE.json (10x) / SCALE_PROBE_{copies}X.json (other
scales) and prints one JSON line.

The 100x run (VERDICT r8 #6) probes the two heaviest families plus the
semantic family's linear-scale path:
  python tools/scale_probe.py --copies 100 --reps 2 --tables docs,emb \\
      --probes dedup_exact_substring,dedup_semantic_kmeans_kprop,dedup_embedding_cosine
dedup_semantic_kmeans_kprop (a CUSTOM_PROBES builder) runs the
PUBLISHED k ∝ n regime, whose assignment term is O(n·k) = O(n²/650) —
measured so the law is on record (DNF at 100x); probing
``dedup_semantic_kmeans`` by its catalog name measures the REGISTERED
r11 form (fixed cluster budget + sign-LSH within-cluster verify,
17.0x at 100x), with the sign-LSH routed dedup_embedding_cosine
measured alongside (~99.4% per-pair recall contract).
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF_DIR = "/root/testdata/sf0.1"
_SCALEPROBE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaleprobe"
)
DEFAULT_COPIES = 10  # sf0.1 -> sf1 equivalent


def gen_dir(copies: int) -> str:
    return os.path.join(_SCALEPROBE_ROOT, f"sf{copies / 10:g}")
PROBES = [
    "dedup_minhash_lsh",
    "text_bigram_logprob",
    "mm_png_decode_stats",
    "text_line_dedup",  # r7: the line-keyed inverted shape
    "mm_gif_decode_stats",  # r7: LZW kernel (pure-Python Arrow batches)
    "text_bpe_tokenize",  # r7: merge-cascade codegen + doc re-agg
    "mm_phash_dedup",  # r7: codec kernel + banded self-join
    "mm_audio_fp_dedup",  # r7: PCM kernel + banded self-join
    "dedup_semantic_kmeans",  # r8: integer k-means + cluster-keyed pairs
    "graph_pagerank_trade",  # r8: edge derivation + fixed-size iterate
    "dedup_exact_substring",  # r8: df-capped shingle join + island collapse
    "text_bpe_train",  # r8: iterative vocab-aggregation trainer
    "text_heavy_hitters_cms",  # r8: fixed-size sketch build + broadcast probe
    "dedup_bloom_prefilter",  # r8: Bloom bitset build + broadcast membership
    "corpus_snapshot_diff",  # r8: digest-keyed full-outer release diff
    "text_gopher_gate",  # r10: zero-shuffle rule projection (should be ~linear)
    "text_dsir_select",  # r10: O(buckets) model broadcast + doc-keyed score agg
    "dsir_select_incremental",  # r10: merged-model delta scoring (O(delta) shape)
    "text_distinct_hll",  # r10: fixed-register HLL build + sorted-fold estimate
    "domain_mix_waterfill",  # r10: one per-source agg + tiny-frame rounds
    "corpus_epoch_schedule",  # r10: broadcast plan join + source-keyed cumsum
    "mm_video_fp_dedup",  # r10: Y4M kernel + fingerprint-keyed pair join
    "mm_h264_intra_stats",  # r11: from-spec H.264 I-slice decode kernel
    "epoch_schedule_incremental",  # r11: stored-scalar schedule refresh
    "user_hourly_interpolate",  # r11: gap-fill (post running-frame rewrite)
    "text_length_hdr_quantiles",  # r11: HDR quantile sketch (4th algebra)
]


def _semantic_kprop_builder(spark, sf_dir):
    """SemDeDup's PUBLISHED k ∝ n regime (constant cluster size), kept
    as a probe so the O(n·k) = O(n²/650) assignment law stays on
    record (DNF at 100× — see SCALE_PROBE_100X.json). The REGISTERED
    ``dedup_semantic_kmeans`` no longer runs this: since r11 it holds k
    at a fixed budget and routes the within-cluster verify through
    threshold-matched sign-LSH — probe it by its catalog name."""
    from csv_2_db_pipeline_data_engineering_spark.operators.dedup import (
        _with_planted_twins,
    )
    from csv_2_db_pipeline_data_engineering_spark.operators.semantic import (
        semantic_dedup_pairs,
    )
    from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    k = max(8, emb.count() // 650)  # ~650 vectors per cluster at any scale
    return semantic_dedup_pairs(_with_planted_twins(emb), k=k)


# r10: the sign-LSH SemDeDup-0.95 probe config was promoted to the
# registered catalog query ``dedup_semantic_lsh`` (threshold-matched
# 24 planes / 64 tables derived by ``dedup.lsh_params_for_threshold``)
# — probe it by its catalog name; ``emb_neardup_lsh_sem095`` stays as
# an alias so prior probe JSONs remain comparable.
def _semantic_lsh_builder(spark, sf_dir):
    from csv_2_db_pipeline_data_engineering_spark.operators.semantic import (
        dedup_semantic_lsh,
    )

    return dedup_semantic_lsh(spark, sf_dir)


CUSTOM_PROBES = {
    "dedup_semantic_kmeans_kprop": _semantic_kprop_builder,
    "emb_neardup_lsh_sem095": _semantic_lsh_builder,
}


def generate_embeddings(src: str, dst: str, copies: int) -> None:
    """Scaled embeddings: copy k applies a seeded PERMUTATION of the 64
    dimensions (norm/distribution preserved, cosine-to-original destroyed
    — the vector twin of the word-shuffle trick), so the near-dup pair
    structure stays sparse instead of going quadratic in ``copies``."""
    import numpy as np
    import pandas as pd

    out = os.path.join(dst, "embeddings.parquet")
    if os.path.exists(out):
        return
    df = pd.read_parquet(os.path.join(src, "embeddings.parquet"))
    n = int(df["vec_id"].max()) + 1
    arr = np.stack(df["embedding"].to_numpy())
    frames = [df]
    for k in range(1, copies):
        perm = np.random.RandomState(k).permutation(arr.shape[1])
        c = df.copy()
        c["vec_id"] = c["vec_id"] + k * n
        c["embedding"] = list(arr[:, perm])
        frames.append(c)
    pd.concat(frames, ignore_index=True).to_parquet(out, index=False)


def generate_fact_tables(src: str, dst: str, copies: int) -> None:
    """Scaled orders+lineitem (orderkeys offset per copy; the node set —
    the 25 nations — stays fixed, so the graph gains edge WEIGHT, which
    is exactly how a bigger corpus grows a host graph) plus straight
    copies of the dimension tables the probes join against."""
    import shutil

    import duckdb

    out = os.path.join(dst, "lineitem.parquet")
    if os.path.exists(out):
        return
    con = duckdb.connect()
    base = con.sql(
        f"SELECT MAX(o_orderkey) + 1 FROM '{src}/orders.parquet'"
    ).fetchone()[0]
    for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        con.sql(
            f"COPY (SELECT t.* REPLACE ({key} + k.k * {base} AS {key})"
            f" FROM '{src}/{tbl}.parquet' t"
            f" CROSS JOIN (SELECT UNNEST(range({copies})) AS k) k)"
            f" TO '{dst}/{tbl}.parquet' (FORMAT parquet)"
        )
    for tbl in ("customer", "supplier", "nation"):
        shutil.copy(f"{src}/{tbl}.parquet", f"{dst}/{tbl}.parquet")


def generate_events(src: str, dst: str, copies: int) -> None:
    """Scaled events: copy k offsets user_id (and event_id) — the
    time-series queries window per user, so a bigger corpus means MORE
    users with the same per-user activity shape, which is exactly how
    an event stream grows."""
    import duckdb

    out = os.path.join(dst, "events.parquet")
    if os.path.exists(out):
        return
    con = duckdb.connect()
    n_users, n_events = con.sql(
        f"SELECT MAX(user_id) + 1, MAX(event_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()
    con.sql(
        f"COPY (SELECT t.* REPLACE (user_id + k.k * {n_users} AS user_id,"
        f" event_id + k.k * {n_events} AS event_id)"
        f" FROM '{src}/events.parquet' t"
        f" CROSS JOIN (SELECT UNNEST(range({copies})) AS k) k)"
        f" TO '{out}' (FORMAT parquet)"
    )


def generate(src: str, dst: str, copies: int, tables: set[str]) -> None:
    """Materialize the scaled tables (idempotent per table)."""
    import pandas as pd

    os.makedirs(dst, exist_ok=True)
    if "emb" in tables:
        generate_embeddings(src, dst, copies)
    if "facts" in tables:
        generate_fact_tables(src, dst, copies)
    if "events" in tables:
        generate_events(src, dst, copies)
    if "docs" not in tables:
        return
    out = os.path.join(dst, "documents.parquet")
    if os.path.exists(out):
        return
    df = pd.read_parquet(os.path.join(src, "documents.parquet"))
    n = int(df["doc_id"].max()) + 1
    frames = [df]
    for k in range(1, copies):
        c = df.copy()
        texts = []
        for doc_id, text in zip(c["doc_id"], c["text"]):
            words = text.split(" ")
            random.Random(doc_id * copies + k).shuffle(words)
            texts.append(" ".join(words))
        c["text"] = texts
        c["doc_id"] = c["doc_id"] + k * n
        frames.append(c)
    big = pd.concat(frames, ignore_index=True)
    big.to_parquet(out, index=False)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--copies", type=int, default=DEFAULT_COPIES)
    ap.add_argument("--probes", type=str, default=None,
                    help="comma-separated probe names (default: full list)")
    ap.add_argument("--tables", type=str, default="docs,emb,facts,events",
                    help="which scaled tables to generate")
    args = ap.parse_args()
    probes = args.probes.split(",") if args.probes else PROBES
    target_dir = gen_dir(args.copies)

    t0 = time.monotonic()
    generate(SRC_SF_DIR, target_dir, args.copies, set(args.tables.split(",")))
    gen_sec = round(time.monotonic() - t0, 1)

    from csv_2_db_pipeline_data_engineering_spark.operators.lifecycle import (
        release_scoped_caches,
    )
    from csv_2_db_pipeline_data_engineering_spark.plans.catalog import get_catalog
    from csv_2_db_pipeline_data_engineering_spark.session import get_session

    catalog = get_catalog()
    spark = get_session(
        app_name="scale_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm up shared JVM paths on the small scale before timing anything
    big_label = f"sf{args.copies / 10:g}"
    def resolve(name):
        return (
            CUSTOM_PROBES[name] if name in CUSTOM_PROBES else catalog[name].builder
        )

    resolve(probes[0])(spark, SRC_SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    release_scoped_caches()
    spark.catalog.clearCache()

    reps: dict[str, dict[str, list[float]]] = {
        name: {"sf0.1": [], big_label: []} for name in probes
    }
    for _ in range(args.reps):
        for name in probes:
            for label, sf_dir in (("sf0.1", SRC_SF_DIR), (big_label, target_dir)):
                t = time.monotonic()
                resolve(name)(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                reps[name][label].append(round(time.monotonic() - t, 3))
                release_scoped_caches()
                spark.catalog.clearCache()

    summary = {
        "metric": f"scale_probe_{args.copies}x",
        "copies": args.copies,
        "reps": args.reps,
        "generate_sec": gen_sec,
        "queries": {
            name: {
                "sf0.1_sec": min(r["sf0.1"]),
                f"{big_label}_sec": min(r[big_label]),
                "ratio": round(min(r[big_label]) / min(r["sf0.1"]), 2),
            }
            for name, r in reps.items()
        },
    }
    out_name = (
        "SCALE_PROBE.json"
        if args.copies == DEFAULT_COPIES
        else f"SCALE_PROBE_{args.copies}X.json"
    )
    out_path = os.path.join(os.path.dirname(_SCALEPROBE_ROOT), out_name)
    # merge with prior runs at the same scale so probe families can be
    # measured one invocation at a time
    prior_q, prior_r = {}, {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        prior_q = prior.get("queries", {})
        prior_r = prior.get("all_reps", {})
    with open(out_path, "w") as f:
        json.dump(
            {
                **summary,
                "queries": {**prior_q, **summary["queries"]},
                "all_reps": {**prior_r, **reps},
            },
            f,
            indent=1,
        )
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
