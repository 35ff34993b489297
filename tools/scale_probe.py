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


def _simhash_decollided_builder(spark, sf_dir):
    """``dedup_simhash`` over copy-DECOLLIDED text. The word-shuffle
    scale generator preserves each document's DISTINCT-TOKEN SET, and
    SimHash is a unigram-set fingerprint: at 100x every doc therefore
    has 99 identical-fingerprint twins, and the probe would measure an
    adversarial all-duplicates corpus whose pair OUTPUT is
    Θ(copies² · source_docs) by construction — the r13 first attempt
    spent 31 minutes inside one sort-spill task on exactly that mass —
    not a bigger corpus (the media-fingerprint fixtures dodge this with
    square-mod-prime entropy; text got it for free from trigram
    shingles, which the shuffle DOES decollide). Suffixing every token
    with the doc's copy block (doc_id div the source corpus size)
    de-collides the copies while preserving each copy's internal
    near-dup structure, so the probe measures the banded-join PLAN at
    100x corpus mass. On the sf0.1 source itself the block is 0 for
    every doc — the denominator corpus is the same workload, suffixed.
    """
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.dedup import (
        simhash_pairs,
    )

    n_src = (
        pq.read_table(
            os.path.join(SRC_SF_DIR, "documents.parquet"), columns=["doc_id"]
        )["doc_id"]
        .to_pandas()
        .max()
        + 1
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    blk = F.floor(F.col("doc_id") / F.lit(int(n_src))).cast("long")
    decollided = docs.withColumn(
        "text",
        F.array_join(
            F.transform(
                F.split("text", " "),
                lambda t: F.concat(t, F.lit("_"), blk.cast("string")),
            ),
            " ",
        ),
    )
    return simhash_pairs(decollided.select("doc_id", "text"))


CUSTOM_PROBES = {
    "dedup_semantic_kmeans_kprop": _semantic_kprop_builder,
    "emb_neardup_lsh_sem095": _semantic_lsh_builder,
    "dedup_simhash_decollided": _simhash_decollided_builder,
}


# ---------------------------------------------------------------------------
# Probe-coverage audit (VERDICT r12 #4, widened to the FULL catalog by
# r13 #4): every registered catalog entry — not just the driver window
# — must carry EITHER a measured entry in SCALE_PROBE_100X.json OR an
# explicit waiver below, so window rotations can't pull a never-probed
# entry in and silently skip the "would this survive 100 TB" question.
# Waiver grammar (machine-checked by audit_probe_coverage):
#   "scan-shaped — <why no probe is needed>"
#       the plan is a scan + projection/bounded agg with no join or
#       data-proportional shuffle state; linearity is structural.
#   "shuffle-linear — <why no probe is needed>"
#       the plan's shuffles are key-partitioned joins / aggregates /
#       windows whose shuffled volume is O(input) and whose per-key
#       state is bounded (no quadratic candidate generation, no
#       iteration-unbounded state) — the textbook Spark SQL scaling
#       story that AQE/partitioning covers; the probe regime exists
#       for the CUSTOM kernels, not these.
#   "quadratic-oracle — <why the quadratic term is intentional>"
#       an exact exhaustive differential oracle that is quadratic BY
#       CONSTRUCTION and API-guarded against production use; the scale
#       path is its named linear twin.
#   "10x:<probe_name> — <why that measured 10x entry covers this>"
#       a measured SCALE_PROBE.json entry exercises the same plan
#       (audit fails if the named entry is missing from the JSON).
#   "100x:<probe_name> — <why that measured 100x entry covers this>"
#       the named SCALE_PROBE_100X.json entry runs the same code path
#       (audit fails if missing). Only for literal shared kernels —
#       "family twin" inference is NOT a waiver (the r12 verdict found
#       span_strip_incremental wrongly bundled under
#       dedup_exact_substring's probe; it is probed directly now).
PROBE_WAIVERS: dict[str, str] = {
    "rejection_rate": (
        "scan-shaped — one validate projection over events plus a"
        " FILTER/UNION aggregate whose state is a single row; no join,"
        " no data-proportional shuffle"
    ),
    "normalize_and_serialize": (
        "scan-shaped — per-row trim/case/to_json projection with a"
        " LIMITed output; zero shuffle"
    ),
    "text_gopher_gate": (
        "10x:text_gopher_gate — zero-shuffle nine-rule projection; the"
        " measured 10x entry is the same single-scan plan"
    ),
    "text_dsir_select": (
        "10x:text_dsir_select — broadcast hashed-bucket model + one"
        " doc-keyed score agg; 10x entry measures the same plan"
    ),
    "domain_mix_waterfill": (
        "10x:domain_mix_waterfill — one per-source agg then iterate on"
        " the tiny source-count frame; data-proportional work is the"
        " first agg only"
    ),
    "embedding_kmeans_iter": (
        "100x:dedup_semantic_kmeans — the integer-Lloyd iterate IS the"
        " code path inside that probe (operators/semantic.py builds the"
        " clusters via embedding_kmeans_iter's kernel); the query"
        " itself adds only the per-iteration inertia projection"
    ),
    "embedding_linear_probe": (
        "10x:embedding_linear_probe — fixed-dimension integer-GD"
        " aggregates per iteration; per-doc work is one dot product"
    ),
    "embedding_probe_confusion": (
        "10x:embedding_linear_probe — trains the identical model, then"
        " one broadcast-weights scan agg for the confusion counts"
    ),
    "text_fluency_buckets": (
        "10x:text_bigram_logprob — built on the same"
        " bigram_logprob_frame; adds a width-4 bucket agg on top"
    ),
    "text_encoding_fix": (
        "scan-shaped — per-row mojibake repair projection; zero shuffle"
    ),
    "text_boilerplate_strip": (
        "10x:text_line_dedup — the same line-digest inverted shape"
        " (explode lines, digest groupBy), plus a broadcast semi-join"
        " back to strip flagged lines"
    ),
    "url_canonical_dedup": (
        "scan-shaped — canonical-key projection + digest groupBy"
        " (map-side-combinable exact-dedup hash shape); no join"
    ),
    "mm_png_deadletter_stats": (
        "10x:mm_png_decode_stats — same PNG kernel map plus the"
        " dead-letter split projection; plan-identical to the"
        " 100x-certified mm_h264_intra_stats shape"
    ),
    "mm_avi_mjpeg_stats": (
        "10x:mm_avi_mjpeg_stats — kernel map over _spread ids, zero"
        " joins; same certified plan shape as mm_h264_intra_stats"
    ),
    "mm_audio_fp_dedup": (
        "10x:mm_audio_fp_dedup — WAV kernel map + fingerprint-keyed"
        " (banded) pair join; bucket mass bounded by fingerprint"
        " entropy, measured at 10x"
    ),
    "mm_video_fp_dedup": (
        "10x:mm_video_fp_dedup — Y4M kernel map + fingerprint-keyed"
        " pair join; measured at 10x"
    ),
    "corpus_epoch_schedule": (
        "10x:corpus_epoch_schedule — broadcast plan join + source-keyed"
        " cumulative sum; measured at 10x"
    ),
    "q1_pricing_summary": (
        "scan-shaped — TPC-H Q1: one lineitem scan into a"
        " 4-group-key decimal agg; the bench control query"
    ),
    "promo_revenue_share": (
        "scan-shaped — lineitem scan + broadcast part join into a"
        " single-row conditional agg"
    ),
    "top_revenue_supplier": (
        "scan-shaped — lineitem window-free group agg + broadcast"
        " supplier join + max-share filter on the bounded supplier"
        " frame"
    ),
    "disjunctive_bracket_revenue": (
        "scan-shaped — TPC-H Q19 shape: lineitem scan + broadcast part"
        " join with pushed disjunctive brackets into a single-row agg"
    ),
    # --- out-of-window catalog entries (r13 verdict #4: full-catalog
    # audit). Analytics / ETL parity surface: classic key-partitioned
    # Spark SQL plans — shuffles carry O(input) volume with bounded
    # per-key state; pinned plan shapes in tests/test_plan_shapes.py.
    "q3_shipping_priority": (
        "shuffle-linear — customer⋈orders⋈lineitem equi joins into a"
        " group-agg top-k; key-partitioned shuffles only"
    ),
    "q5_supplier_volume": (
        "shuffle-linear — multi-way equi joins (dims broadcast) into a"
        " bounded nation-keyed agg"
    ),
    "top_customers": (
        "shuffle-linear — orders group-agg + broadcast customer join,"
        " ranked top-k"
    ),
    "orders_per_month": "scan-shaped — bounded month-keyed count agg",
    "last_event_per_user": (
        "shuffle-linear — user-partitioned ranked window, one exchange"
    ),
    "running_revenue": (
        "shuffle-linear — cumulative window PARTITIONED BY o_custkey"
        " (never a global single-partition sort)"
    ),
    "user_event_gaps": (
        "shuffle-linear — user-partitioned lag window, one exchange"
    ),
    "rollup_status_year": "scan-shaped — bounded ROLLUP grouping-set agg",
    "cube_event_type_dow": "scan-shaped — bounded CUBE grouping-set agg",
    "grouping_sets_priority_status": (
        "scan-shaped — bounded GROUPING SETS agg"
    ),
    "customers_with_orders": (
        "shuffle-linear — key-partitioned LEFT SEMI join"
    ),
    "customers_without_orders": (
        "shuffle-linear — key-partitioned LEFT ANTI join"
    ),
    "rich_active_customers": (
        "shuffle-linear — semi join + filter; key-partitioned"
    ),
    "idle_suppliers": "shuffle-linear — anti join; key-partitioned",
    "all_account_balances": (
        "scan-shaped — UNION ALL of two projections, bounded agg"
    ),
    "distinct_suppliers_per_flag": (
        "shuffle-linear — distinct-per-key agg (map-side partial)"
    ),
    "part_scalar_functions": "scan-shaped — per-row scalar projection",
    "order_price_bands": "scan-shaped — bounded price-band CASE agg",
    "events_hourly_window": (
        "scan-shaped — time-bucketed agg with bounded hour keys"
    ),
    "user_sessions": (
        "shuffle-linear — user-partitioned lag window + session"
        " cumulative sum, one exchange"
    ),
    "events_json_stats": (
        "scan-shaped — JSON extract projection + bounded agg"
    ),
    "nations_with_presence": "shuffle-linear — semi join on nationkey",
    "customer_order_years": (
        "shuffle-linear — distinct (customer, year) agg"
    ),
    "part_brand_regex": (
        "scan-shaped — regex predicate + extraction projection"
    ),
    "asof_last_order_per_event": (
        "shuffle-linear — as-of via ONE shuffle on the equi key +"
        " ranked window; no per-row subquery, no range scan"
    ),
    "range_join_followup_orders": (
        "shuffle-linear — equi key (customer) carries the shuffle; the"
        " date-interval predicate is a post-join filter (plain hash"
        " join, never cartesian)"
    ),
    "pivot_status_by_priority": (
        "scan-shaped — bounded pivot over enumerated statuses"
    ),
    "price_percentiles": (
        "shuffle-linear — exact percentiles via distributed sort;"
        " O(n log n) with no skew key"
    ),
    "top3_orders_per_priority": (
        "shuffle-linear — ranked window with WindowGroupLimit pushdown"
        " (plan-pinned in tests/test_plan_shapes.py)"
    ),
    "salted_event_type_counts": (
        "scan-shaped — salted two-stage count agg (the skew pattern"
        " demo itself)"
    ),
    "parts_above_brand_avg": (
        "shuffle-linear — brand-keyed avg subframe joined back on the"
        " bounded brand key"
    ),
    "approx_aggregates": (
        "scan-shaped — fixed-size sketch aggregates (approx distinct /"
        " percentile), map-side combinable"
    ),
    "lineitem_price_stats": "scan-shaped — single-scan moment aggs",
    "priority_price_geomean": (
        "scan-shaped — bounded priority-keyed log-mean agg"
    ),
    "customer_order_moving_avg": (
        "shuffle-linear — customer-partitioned frame window"
    ),
    "order_price_quartiles": (
        "shuffle-linear — priority-partitioned ntile window sharing one"
        " Window exchange"
    ),
    "daily_order_spine": (
        "shuffle-linear — bounded agg + sequence()/explode() spine,"
        " broadcast back; no driver loop"
    ),
    "deterministic_sample_stats": (
        "scan-shaped — md5-prefix deterministic sample filter + agg"
    ),
    "large_volume_orders": (
        "shuffle-linear — group-agg with HAVING on the group key"
    ),
    "late_order_priority_counts": (
        "shuffle-linear — semi join + bounded priority count"
    ),
    "idle_rich_customers": (
        "shuffle-linear — anti join + filter; key-partitioned"
    ),
    "sole_late_suppliers": (
        "shuffle-linear — per-order supplier-count agg + filter"
    ),
    "profile_lineitem": (
        "scan-shaped — one-scan data-profile aggregates"
    ),
    "event_value_outliers": (
        "scan-shaped — stddev agg broadcast back as a filter bound"
    ),
    "multiformat_date_parse": (
        "scan-shaped — coalesce(try_to_date×3) projection, zero shuffle"
    ),
    "coerce_cast_semantics": (
        "scan-shaped — try_cast coercion projection, zero shuffle"
    ),
    "rejection_reason_counts": (
        "scan-shaped — validate projection + bounded reason-count agg"
    ),
    "duplicate_user_events": (
        "shuffle-linear — key-count agg (map-side partial), warn-only"
    ),
    # --- dedup / similarity / embeddings (out-of-window) ------------------
    "graph_pagerank_trade": (
        "10x:graph_pagerank_trade — fixed-iteration integer PageRank;"
        " per-iteration edge-keyed agg measured at 10x"
    ),
    "dedup_exact": (
        "scan-shaped — full-row digest groupBy (map-side-combinable"
        " exact-dedup hash shape)"
    ),
    "dedup_exact_hash": (
        "scan-shaped — content-digest groupBy, map-side combinable"
    ),
    "dedup_simhash": (
        "100x:dedup_simhash_decollided — the same pigeonhole-banded"
        " fingerprint join, probed at 100x on the decollided generator"
        " (word-shuffle copies share token sets, so the plain 100x"
        " corpus would measure a different pair structure)"
    ),
    "dedup_incremental": (
        "10x:dedup_minhash_lsh — delta signatures against the persisted"
        " index use the identical gram-hash + banded-join kernels, with"
        " history partitions never rescanned (O(delta) tagged extends)"
    ),
    "dedup_embedding_cosine_block": (
        "quadratic-oracle — exact exhaustive cosine pair search,"
        " Θ(n²) BY CONSTRUCTION as the differential oracle for the"
        " sign-LSH path (dedup_embedding_cosine, 100x-probed);"
        " API-guarded: corpora > 100k vectors raise unless"
        " allow_quadratic=True (operators/dedup.py)"
    ),
    "ann_topk_bruteforce": (
        "scan-shaped — per-row work bounded by the broadcast ≤50-query"
        " batch; one corpus scan, salted top-k, no join"
    ),
    "embedding_label_centroids": (
        "shuffle-linear — dim-keyed centroid agg, map-side combinable"
    ),
    "embedding_norm_stats": "scan-shaped — one-scan vector-norm aggs",
    "embedding_pca_power": (
        "shuffle-linear — fixed-iteration power method: per-iteration"
        " dim-keyed aggregates with a k-row broadcast iterate"
    ),
    "ann_lsh_bucketed": (
        "100x:ann_lsh_neighbors — the same seeded-hyperplane bucket"
        " join kernel (_table_buckets), probed integer-exact at 100x"
    ),
    # --- sketches / text (out-of-window) -----------------------------------
    "text_heavy_hitters_cms": (
        "100x:text_heavy_hitters_incremental — the incremental probe"
        " BUILDS the same cms_rows sketch (history + delta) and runs"
        " the same broadcast probe on top"
    ),
    "text_token_stats": "scan-shaped — per-doc token-count projection",
    "text_bpe_tokenize": (
        "10x:text_bpe_tokenize — codegen literal-rewrite cascade"
        " measured at 10x; zero joins"
    ),
    "text_vocab_zipf": (
        "100x:text_bm25_topk — its only data-proportional stage (token"
        " explode → map-side-combined term-count shuffle) is exactly"
        " the tf aggregate the BM25 probe measures; the rank/fit runs"
        " on the vocabulary frame"
    ),
    "text_bpe_train": (
        "10x:text_bpe_train — iterative pair-count vocab aggregation"
        " measured at 10x"
    ),
    "text_tfidf": (
        "100x:text_bm25_topk — same tf explode/df shuffle shape the"
        " BM25 probe measures (tf-idf is the unsaturated weighting of"
        " the same postings)"
    ),
    "text_top_term": (
        "shuffle-linear — term-count agg + per-doc max_by; both"
        " key-partitioned"
    ),
    "text_winnow_stats": (
        "shuffle-linear — shingle scan + per-doc rolling-min window;"
        " fingerprint density bounded by the winnow window"
    ),
    "text_quality_score": (
        "scan-shaped — length/punct/stopword ratio projection"
    ),
    "text_lang_id": (
        "scan-shaped — n-gram heuristic score projection, zero shuffle"
    ),
    "text_fingerprint": (
        "scan-shaped — per-doc rolling-hash projection"
    ),
    "text_pii_scrub": (
        "scan-shaped — regex detect/redact projection chain"
    ),
    "doc_chunk_plan": (
        "scan-shaped — per-doc chunk arithmetic projection"
    ),
    "text_char_entropy": (
        "shuffle-linear — per-doc char histogram agg (sorted-summation"
        " entropy on bounded 256-key state)"
    ),
    "text_line_dedup": (
        "10x:text_line_dedup — line-digest inverted shape measured at"
        " 10x; the digest machinery is additionally 100x-probed via"
        " line_dedup_incremental"
    ),
    "text_intradoc_dedup": (
        "shuffle-linear — within-doc line digests, doc-keyed agg only"
    ),
    "text_quality_logit": (
        "scan-shaped — frozen broadcast weights, per-doc dot-product"
        " projection"
    ),
    # --- multimodal (out-of-window) ----------------------------------------
    "mm_phash_dedup": (
        "10x:mm_phash_dedup — aHash kernel + pigeonhole-banded pair"
        " join measured at 10x"
    ),
    "mm_payload_stats": "scan-shaped — octet-length aggregate per source",
    "mm_png_decode_stats": (
        "10x:mm_png_decode_stats — stdlib-inflate PNG kernel map"
        " measured at 10x; zero joins"
    ),
    "mm_png_resize_stats": (
        "10x:mm_png_decode_stats — same PNG kernel map through two"
        " codec round trips; zero joins"
    ),
    "mm_wav_decode_stats": (
        "10x:mm_audio_fp_dedup — the identical WAV/PCM decode kernel"
        " (media_codecs) runs inside that probe's fingerprint map"
    ),
    "mm_wav_vad_stats": (
        "10x:mm_audio_fp_dedup — same PCM decode + energy framing"
        " kernel; VAD thresholding is a per-frame projection on top"
    ),
    "mm_jpeg_decode_stats": (
        "10x:mm_jpeg_decode_stats — JPEG entropy+DCT kernel measured at"
        " 10x; also runs per-frame inside the 10x mm_avi_mjpeg probe"
    ),
    "mm_gif_decode_stats": (
        "10x:mm_gif_decode_stats — LZW kernel map measured at 10x"
    ),
    "mm_y4m_video_stats": (
        "10x:mm_video_fp_dedup — the identical Y4M frame-parse kernel"
        " runs inside that probe's fingerprint map"
    ),
    "mm_mpeg1_video_stats": (
        "10x:mm_mpeg1_video_stats — MPEG-1 inter decode kernel measured"
        " at 10x; same certified map-only plan shape as the 100x H.264"
        " probes"
    ),
    "mm_decode_features": (
        "scan-shaped — Arrow map over _spread ids with the documented"
        " stub kernel; zero joins"
    ),
    "mm_frame_sample_stats": (
        "scan-shaped — Arrow map frame sampler, zero joins"
    ),
    # --- rollup / curation / lifecycle (out-of-window) ----------------------
    "hourly_rollup_serve": (
        "shuffle-linear — hour-bucketed agg + union with the persisted"
        " rollup; bucket keys bounded by the time range"
    ),
    "contamination_ngram_overlap": (
        "100x:corpus_decontaminate — runs the same broadcast eval-index"
        " n-gram containment scan (decontaminate adds the excision on"
        " top); eval side corpus-size-independent"
    ),
    "canary_contamination_scan": (
        "100x:corpus_decontaminate — same broadcast eval-index n-gram"
        " scan kernel over planted canaries"
    ),
    "corpus_sample_strata": (
        "scan-shaped — modulus sampling filter + bounded strata agg"
    ),
    "corpus_pack_plan": (
        "shuffle-linear — token-count agg + source-keyed cumulative"
        " window pack assignment"
    ),
    "corpus_shuffle_plan": (
        "shuffle-linear — deterministic hash-bucket assignment +"
        " bounded bucket agg"
    ),
    "domain_mix_allocation": (
        "10x:domain_mix_waterfill — the same per-source aggregate"
        " feeds both; allocation is the single-pass variant of the"
        " measured waterfill"
    ),
    "corpus_split_plan": (
        "shuffle-linear — content-keyed split assignment + certificate"
        " agg; no join"
    ),
    "dedup_eval_metrics": (
        "100x:dedup_ngram_jaccard — the gold side IS that probed plan;"
        " the system side is the simhash banded join (probed as"
        " dedup_simhash_decollided); the eval adds one pair-keyed join"
        " of the two bounded pair sets plus a single-row agg. A direct"
        " raw-generator probe was attempted (r14) and killed: the"
        " word-shuffle copies share unigram sets, so at 100x every doc"
        " has 99 identical-SimHash twins and the pair OUTPUT is"
        " Θ(copies²·sources) by construction — it measures the"
        " generator's adversarial duplicate density, not the plan"
        " (the documented dedup_simhash_decollided rationale)"
    ),
    # (the r14 retrieval additions retrieval_prf_expansion /
    # r16-opt: dedup_minhash_lsh, text_bigram_logprob and
    # text_repetition_stats were probed DIRECTLY at 100x while A/B-ing
    # the zip-of-slices gram derivation (OPTIMIZATION_r16.md change 1),
    # so their waivers retired the same way as the entries below.
    # retrieval_eval_metrics were first waived via 100x:text_bm25_topk,
    # then probed directly at 100x — 6.2x / 4.29x — so their waivers
    # retired. domain_mix_temperature's scan-shaped waiver was likewise
    # retired in r15 with a direct 100x measurement: 4.62x. The r15
    # addition prf_serve_incremental was probed directly at 100x on
    # arrival — no waiver ever issued. The two r15 waivers —
    # embedding_triplet_mining, retrieval_prf_uplift — were retired in
    # r16 with direct 100x measurements: 1.96x / 5.42x (VERDICT r15
    # #7); the r16 additions ann_ivfpq_neighbors (8.84x) and
    # text_kn_perplexity were probed directly on arrival.)
}


def audit_probe_coverage(verbose: bool = True) -> list[str]:
    """Check EVERY registered catalog entry for scale-probe coverage.

    Returns the list of problems (empty = pass). A problem is an entry
    with neither a SCALE_PROBE_100X.json measurement nor a valid
    waiver, a waiver whose referenced probe entry does not exist, a
    waiver for an entry that IS probed at 100x (stale waiver — drop
    it), or a waiver for a name not in the catalog (dead weight).
    Originally window-only (r12 #4); widened to the full catalog
    (r13 #4) so a rotation can never pull a never-probed entry into
    the driver window.
    """
    from csv_2_db_pipeline_data_engineering_spark.plans.catalog import (
        DRIVER_WINDOW,
        get_catalog,
    )

    catalog = list(get_catalog())
    root = os.path.dirname(_SCALEPROBE_ROOT)

    def _queries(fname: str) -> dict:
        p = os.path.join(root, fname)
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f).get("queries", {})

    q100 = _queries("SCALE_PROBE_100X.json")
    q10 = _queries("SCALE_PROBE.json")
    problems: list[str] = []
    for name in catalog:
        if name in q100:
            if name in PROBE_WAIVERS:
                problems.append(
                    f"{name}: probed at 100x AND waived — drop the stale waiver"
                )
            continue
        waiver = PROBE_WAIVERS.get(name)
        if waiver is None:
            problems.append(
                f"{name}: registered with no SCALE_PROBE_100X.json"
                " entry and no waiver"
            )
            continue
        if waiver.startswith("10x:"):
            ref = waiver[4:].split(" ", 1)[0]
            if ref not in q10:
                problems.append(
                    f"{name}: waiver cites 10x probe '{ref}' which is not"
                    " in SCALE_PROBE.json"
                )
        elif waiver.startswith("100x:"):
            ref = waiver[5:].split(" ", 1)[0]
            if ref not in q100:
                problems.append(
                    f"{name}: waiver cites 100x probe '{ref}' which is not"
                    " in SCALE_PROBE_100X.json"
                )
        elif not waiver.startswith(
            ("scan-shaped", "shuffle-linear", "quadratic-oracle")
        ):
            problems.append(f"{name}: waiver has unknown grammar: {waiver!r}")
    for name in PROBE_WAIVERS:
        if name not in catalog:
            problems.append(
                f"{name}: waiver exists but the entry is not in"
                " the catalog — retire it"
            )
    if verbose:
        n = len(catalog)
        probed = sum(1 for x in catalog if x in q100)
        w_probed = sum(1 for x in DRIVER_WINDOW if x in q100)
        print(
            f"probe audit: {n} catalog entries, {probed} probed at 100x,"
            f" {n - probed} waived ({len(DRIVER_WINDOW)} in-window:"
            f" {w_probed} probed, {len(DRIVER_WINDOW) - w_probed} waived),"
            f" {len(problems)} problems"
        )
        for p in problems:
            print(f"  PROBLEM: {p}")
    return problems


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
    ap.add_argument("--audit", action="store_true",
                    help="audit DRIVER_WINDOW probe coverage and exit")
    args = ap.parse_args()
    if args.audit:
        sys.exit(1 if audit_probe_coverage() else 0)
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
