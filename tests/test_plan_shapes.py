"""Physical-plan shape assertions: the scale properties are load-bearing.

These tests pin what `.explain` shows today so a refactor can't silently
regress it: filter/column pushdown into the parquet scan, broadcast of
dimension tables, and the per-group top-k limit pushdown.
"""

from __future__ import annotations

import pytest

from csv_2_db_pipeline_data_engineering_spark.plans.catalog import get_catalog
from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = get_catalog()[name].builder(spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned scan: only the 7 referenced columns, not the full lineitem schema
    read = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "l_orderkey" not in read and "l_suppkey" not in read


def test_q5_broadcasts_every_dimension(spark):
    plan = _plan(spark, "q5_supplier_volume")
    # 5 joins in the chain; every one must be broadcast (no fact shuffle).
    # The formatted plan mentions each node twice (tree + detail section).
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_q3_top_k_is_take_ordered(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_per_group_topk_gets_window_group_limit(spark):
    plan = _plan(spark, "top3_orders_per_priority")
    assert "WindowGroupLimit" in plan  # rank<=k pushed below the shuffle


def test_semi_and_anti_join_plans(spark):
    assert "LeftSemi" in _plan(spark, "customers_with_orders")
    assert "LeftAnti" in _plan(spark, "customers_without_orders")


def test_q18_aggregates_fact_before_join(spark):
    """The lineitem sum must reduce BEFORE the orders join (partial agg
    below the exchange, join above the aggregate)."""
    plan = _plan(spark, "large_volume_orders")
    assert "partial_sum" in plan
    read = next(ln for ln in plan.splitlines()
                if "ReadSchema" in ln and "l_orderkey" in ln)
    assert "l_quantity" in read and "l_extendedprice" not in read


def test_exists_shapes_become_semi_anti_joins(spark):
    """Correlated EXISTS/NOT EXISTS must not execute per-row subqueries."""
    assert "LeftSemi" in _plan(spark, "late_order_priority_counts")
    anti = _plan(spark, "idle_rich_customers")
    assert "LeftAnti" in anti
    # the date bound reaches the orders scan before the anti join
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in anti


def test_spine_has_no_driver_collection(spark):
    """Calendar spine is generated distributively (explode over a 1-row
    aggregate), never via a collected driver loop."""
    plan = _plan(spark, "daily_order_spine")
    assert "explode(sequence(" in plan


def test_stats_aggregates_are_single_pass(spark):
    """corr/covar/regr fold into one partial+final aggregate pair —
    no second scan of lineitem."""
    plan = _plan(spark, "lineitem_price_stats")
    # formatted mode lists each node twice (tree + detail): one scan node
    assert plan.count("(1) Scan parquet") == 1 and "(8) Scan parquet" not in plan
    assert "partial_corr" in plan


def test_tfidf_broadcasts_vocab_and_corpus_size(spark):
    """tf join df join n: the vocabulary-sized and 1-row sides broadcast;
    the big (doc,term) stream never shuffles for them."""
    plan = _plan(spark, "text_tfidf")
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row corpus-size join


def test_tfidf_reuses_tf_shuffle_for_df(spark):
    """df is derived FROM tf, so at runtime the (doc_id, term) shuffle is
    written once and read twice (ReusedExchange) — the corpus is scanned
    and exploded exactly once, not once per aggregate. At 100 TB the
    second scan+explode pass is the dominant avoidable cost."""
    df = get_catalog()["text_tfidf"].builder(spark, SF_DIR)
    df.collect()  # AQE finalizes exchange reuse only at execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_contamination_broadcasts_eval_index(spark):
    """The eval/benchmark side is tiny by construction, so the gram join
    must be broadcast — the 100 TB corpus never shuffles to meet it."""
    plan = _plan(spark, "contamination_ngram_overlap")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_pack_plan_single_data_shuffle(spark):
    """Packing is shard-parallel: ONE hash exchange on shard feeds both
    the cumulative-sum window and the (shard, bin) aggregate; the only
    other exchange is the deterministic output sort."""
    df = get_catalog()["corpus_pack_plan"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hash_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    assert len(hash_exchanges) == 1, hash_exchanges
    assert "Join" not in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """When a selective dimension side is too big to broadcast, Spark can
    inject a bloom filter built from the dim-side join keys into the fact
    scan (`might_contain(...)` in the scan condition), so non-matching
    fact rows die before the shuffle. At 100 TB this is the difference
    between shuffling the whole fact table and shuffling the ~matching
    slice. Local test data sits under the 10 GiB application-side
    threshold, so the thresholds are lowered here to pin the mechanism;
    production sessions keep Spark's defaults, which enable it exactly
    when the fact side is big enough to matter."""
    from pyspark.sql import functions as F

    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle-join case
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, SF_DIR, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "bloom_filter_agg" in plan  # built from the filtered dim keys
        # ...and applied on the fact side before its shuffle
        fact_filter = [
            ln for ln in plan.splitlines()
            if "might_contain" in ln and "l_orderkey" in ln
        ]
        assert fact_filter
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_approx_aggregates_avoids_distinct_expand(spark):
    # The distinct and percentile aggregate families run as separate
    # groupBys joined on the group key; a single mixed agg would insert
    # an Expand node that replays every row through the percentile
    # buffers per distinct group (measured 4x slower).
    plan = _plan(spark, "approx_aggregates")
    assert "Expand" not in plan


def test_repetition_and_shingles_use_codegen_gram_derivation(spark):
    # Gram construction derives in-row from arrays_zip of shifted slice
    # views (codegen builtins, ZERO pre-shuffle — the sketch._gram_stream
    # idiom, applied repo-wide in r16): never the interpreted
    # transform(sequence, slice/element_at) lambda (2-4x slower, round-5
    # lesson) and never the posexplode + window-lead shape, whose per-doc
    # window exchanged and sorted the whole token stream before the
    # first useful operator (r16 rewrite, OPTIMIZATION_r16.md).
    for name in ("text_repetition_stats", "dedup_ngram_jaccard"):
        plan = _plan(spark, name)
        assert "arrays_zip" in plan, name
        assert "transform(sequence" not in plan, name
        assert "lead(" not in plan, name


def test_bigram_logprob_shape(spark):
    # Inverted-join fluency score: the bigram stream must be CACHED and
    # reused by all three consumers (scoring rows + both count frames),
    # and the only nested-loop join allowed is the broadcast of the
    # 1-row vocabulary frame — never a cartesian over data.
    plan = _plan(spark, "text_bigram_logprob")
    assert "CartesianProduct" not in plan
    # formatted plans mention each node twice (tree + detail)
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert plan.count("InMemoryTableScan") >= 3


def test_runtime_bloom_filter_prunes_fact_side_of_shuffle_join(spark):
    """When the dim side is too big to broadcast (forced here), Spark's
    runtime bloom filter must side-channel the selective dim predicate
    onto the fact scan — the row-level pruning that keeps a 100 TB
    fact⋈dim shuffle join from shuffling rows that can never match."""
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {}
    for k, v in overrides.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        p = spark.read.parquet(f"{SF_DIR}/part.parquet").filter(
            F.col("p_brand") == "Brand#4"
        )
        j = (
            li.join(p, li.l_partkey == p.p_partkey)
            .groupBy("p_type")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "might_contain" in plan  # bloom probe applied to the fact side
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_media_fingerprint_dedup_joins_are_banded_not_allpairs(spark):
    """The image/audio near-dup joins must go through the pigeonhole
    chunk keys — a keyed join on (chunk, cv), never a cartesian."""
    from csv_2_db_pipeline_data_engineering_spark.operators.multimodal import (
        mm_audio_fp_dedup,
        mm_phash_dedup,
    )

    for fn in (mm_phash_dedup, mm_audio_fp_dedup):
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "chunk" in plan  # the banding key reaches the join


def test_embedding_lsh_sizing_is_threshold_matched(spark):
    """The registered embedding near-dup queries derive (planes, tables)
    from their cosine threshold (``lsh_params_for_threshold``), so a
    high-threshold caller can never silently run a low-plane
    constant-false-rate regime (the r9-measured Θ(n²)/2^planes blowup
    at 100x).  The SemDeDup 0.95 regime must resolve to the
    100x-probe-proven 24 planes / 64 tables, plane counts must grow
    monotonically with the threshold, and both registered plans must be
    keyed bucket joins — never cartesian."""
    from csv_2_db_pipeline_data_engineering_spark.operators.dedup import (
        lsh_params_for_threshold,
    )

    assert lsh_params_for_threshold(0.95) == (24, 64)
    planes = [
        lsh_params_for_threshold(t)[0] for t in (0.85, 0.88, 0.92, 0.95, 0.98)
    ]
    assert planes == sorted(planes), "planes must widen with the angular gap"
    assert all(lsh_params_for_threshold(t)[1] <= 64 for t in (0.85, 0.88, 0.95))
    for name in ("dedup_embedding_cosine", "dedup_semantic_lsh"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "bucket" in plan  # the LSH bucket key reaches the join


def test_waterfill_rounds_never_rescan_the_corpus(spark):
    """domain_mix_waterfill's redistribution rounds iterate the tiny
    checkpointed source frame — the FINAL plan must not contain a
    documents parquet scan (the corpus is touched exactly once, by the
    per-source token aggregate folded into the round-0 checkpoint)."""
    plan = _plan(spark, "domain_mix_waterfill")
    assert "documents.parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan or "Scan rdd" in plan


def test_r10_sketch_and_selection_queries_avoid_sort_merge_joins(spark):
    """The new sketch/selection queries keep every join broadcast: the
    model/register/eval-index side is bounded (<= 1024 rows), so a
    SortMergeJoin anywhere means a broadcast hint was lost."""
    for name in (
        "text_distinct_hll",
        "dsir_select_incremental",
        "domain_mix_waterfill",
        "corpus_epoch_schedule",
    ):
        plan = _plan(spark, name)
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_decontaminate_probes_eval_index_by_broadcast(spark):
    """corpus_decontaminate's eval gram index must reach the corpus
    shingle stream as a BROADCAST (the corpus is never shuffled on the
    gram key); the doc-keyed joins in the per-doc summary tail are
    legitimate keyed shuffles and may stay sort-merge."""
    plan = _plan(spark, "corpus_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the non-equi interval anti-join rides the broadcast nested loop,
    # never a cartesian expansion
    assert "BroadcastNestedLoopJoin" in plan


def test_weighted_sample_is_shuffle_free_take_ordered(spark):
    """The E-S sample must be map-side keys + TakeOrdered — no exchange
    anywhere in the plan (the 100 TB claim: nothing shuffles)."""
    plan = _plan(spark, "corpus_weighted_sample")
    assert "TakeOrderedAndProject" in plan
    pre_window = plan.split("Window")[0]  # the final rank runs on <=N rows
    assert "Exchange" not in pre_window


def test_kmv_sketch_build_is_take_ordered(spark):
    """The KMV budget frame must come from TakeOrdered (per-partition
    bounded heaps), never a global sort-exchange of the corpus."""
    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        KMV_BUDGET,
        kmv_kept,
    )

    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    # plan inspected on the pre-checkpoint subtree (the registered
    # query eagerly checkpoints the budget frame):
    budget = (
        docs.select(
            "doc_id",
            F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .orderBy("h", "doc_id")
        .limit(KMV_BUDGET)
    )
    plan = budget._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    # and the registered query's kept frame stays bounded
    assert kmv_kept(docs).count() <= KMV_BUDGET


def test_sq8_serving_broadcasts_queries(spark):
    """SQ8 serving must broadcast the query side into one corpus pass
    (BroadcastNestedLoopJoin on the != predicate), never shuffle the
    corpus for the join."""
    plan = _plan(spark, "ann_sq8_neighbors")
    assert "BroadcastNestedLoopJoin" in plan


def test_span_family_single_sh_exchange_per_stream(spark):
    """The span family's shingle chains end in ONE explicit hash(sh)
    repartition per stream (r16 change 6): every consumer (df aggregate,
    cap anti-joins, self-join sides, history-probe join) rides that
    exchange via ReuseExchange. ReuseExchange only fires on
    byte-identical subtrees, so a consumer-side projection drift would
    silently duplicate the exchange AND the scan+md5 chain below it
    (r16 ADVICE) — pin the node counts (formatted plans mention each
    node twice: tree + detail).

    batch/exact_substring: 2 repartition nodes (both self-join sides —
    dedup'd to one exchange at runtime); incremental: 6 (delta + index
    streams x the stats/probe/self-join consumers)."""
    for name, max_nodes in (
        ("text_span_strip", 4),
        ("dedup_exact_substring", 4),
        ("span_strip_incremental", 12),
    ):
        plan = _plan(spark, name)
        n = plan.count("REPARTITION_BY_COL")
        assert 0 < n <= max_nodes, f"{name}: {n} REPARTITION_BY_COL mentions"
        # the repartitions must be the sh-keyed ones, not something new
        assert "lead(" not in plan, name
