"""Corpus-curation operators: contamination, sampling plan, keep/drop."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
    BAND_RATES,
    EVAL_SET_MAX_ID,
    contamination_ngram_overlap,
    corpus_curation_decision,
    corpus_sample_strata,
)
from csv_2_db_pipeline_data_engineering_spark.operators.dedup import dedup_ngram_jaccard
from tests.conftest import SF_DIR


def test_contamination_only_flags_corpus_docs_with_real_overlap(spark):
    out = contamination_ngram_overlap(spark, SF_DIR).collect()
    assert out, "test corpus is known to contain eval-overlapping docs"
    for r in out:
        assert r.doc_id >= EVAL_SET_MAX_ID  # eval docs never flag themselves
        assert r.n_shared_grams >= 1 and r.n_eval_docs_hit >= 1


def test_contamination_eval_df_cap_drops_generic_grams(spark, tmp_path):
    from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
        CONTAM_EVAL_DF_CAP_MIN,
    )

    # 12 eval docs (> cap=max(4, ceil(0.2*13))=4) all share one generic
    # 5-gram; one eval doc holds a rare benchmark-specific 5-gram.
    hot = "the quick brown fox jumps"
    rare = "special secret eval phrase here"
    rows = [(i, f"{hot} uniq{i} filler{i}") for i in range(12)]
    rows.append((12, f"{rare} tail twelve"))
    rows.append((30, f"{hot} something else entirely today"))  # hot-only corpus doc
    rows.append((31, f"{rare} other words follow"))            # genuine contamination
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "docs")
    docs.write.parquet(f"{path}/documents.parquet")
    out = {r.doc_id: r for r in contamination_ngram_overlap(spark, path).collect()}
    assert 30 not in out, "generic gram above the eval-df cap must not flag"
    assert 31 in out and out[31].n_eval_docs_hit == 1
    assert CONTAM_EVAL_DF_CAP_MIN >= 1


def test_sample_strata_rates_and_determinism(spark):
    rows = {(r.lang, r.length_band): r for r in corpus_sample_strata(spark, SF_DIR).collect()}
    assert rows
    for (lang, band), r in rows.items():
        assert 0 <= r.n_sampled <= r.n_docs
        if BAND_RATES[band] == 10:  # long band: policy keeps everything
            assert r.n_sampled == r.n_docs
    rerun = {(r.lang, r.length_band): r.n_sampled
             for r in corpus_sample_strata(spark, SF_DIR).collect()}
    assert rerun == {k: r.n_sampled for k, r in rows.items()}


def test_curation_decision_partitions_corpus(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
        SALAD_ID_OFFSET,
        SALAD_MOD,
    )
    from csv_2_db_pipeline_data_engineering_spark.operators.dedup import (
        PLANT_TWIN_ID_OFFSET,
        PLANT_TWIN_MOD,
    )
    from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table

    out = corpus_curation_decision(spark, SF_DIR)
    total = out.count()
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    n_salads = docs.filter(F.col("doc_id") % SALAD_MOD == 0).count()
    n_semtwins = docs.filter(F.col("doc_id") % PLANT_TWIN_MOD == 0).count()
    # corpus + planted salad + semantic-twin witnesses, nothing dropped
    # silently
    assert total == n_docs + n_salads + n_semtwins
    bad = out.filter(F.col("keep") != (F.col("reason") == "keep")).count()
    assert bad == 0
    # every planted salad falls to the fluency gate; no real doc does
    salads = out.filter(F.col("doc_id") >= SALAD_ID_OFFSET)
    assert salads.count() == n_salads
    assert salads.filter(F.col("reason") != "low_fluency").count() == 0
    assert (
        out.filter(
            (F.col("doc_id") < SALAD_ID_OFFSET) & (F.col("reason") == "low_fluency")
        ).count()
        == 0
    )
    # every planted semantic twin falls to the SemDeDup gate (its text
    # shares nothing with its source — only the embedding ties them)
    twins = out.filter(
        (F.col("doc_id") >= PLANT_TWIN_ID_OFFSET)
        & (F.col("doc_id") < SALAD_ID_OFFSET)
    )
    assert twins.count() == n_semtwins
    assert twins.filter(F.col("reason") != "semantic_dup").count() == 0
    # and no real doc falls to it on this corpus (no natural twins)
    assert (
        out.filter(
            (F.col("doc_id") < PLANT_TWIN_ID_OFFSET)
            & (F.col("reason") == "semantic_dup")
        ).count()
        == 0
    )


def test_pack_plan_conserves_tokens_and_fills_bins(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
        CONTEXT_LEN,
        corpus_pack_plan,
    )
    from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table

    out = corpus_pack_plan(spark, SF_DIR).collect()
    total = sum(r.n_tokens_started for r in out)
    docs = load_table(spark, SF_DIR, "documents")
    expected = docs.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    assert total == expected  # every token is packed exactly once
    # Precondition for the strict contiguity check below: when every doc
    # is shorter than the context window, consecutive start offsets
    # advance < CONTEXT_LEN, so per-shard bins step by 0 or 1 and are
    # gap-free. A >= CONTEXT_LEN doc would make the next bin skip ahead
    # (valid concat-and-chunk output, different assertion).
    max_doc = docs.select(F.max(F.size(F.split("text", " ")))).first()[0]
    assert max_doc < CONTEXT_LEN, "fixture precondition for gap-free bins"
    # concat-and-chunk: within a shard, bins are contiguous from 0 and
    # every bin boundary is crossed by construction (no empty bins).
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.bin)
    for shard, bins in by_shard.items():
        bins.sort()
        assert bins[0] == 0 and bins == list(range(len(bins))), shard


def test_shuffle_plan_is_a_permutation_with_dense_positions(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
        N_SHUFFLE_SHARDS,
        corpus_shuffle_plan,
    )
    from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table

    out = corpus_shuffle_plan(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert len(out) == n_docs  # every doc placed exactly once
    assert len({r.doc_id for r in out}) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r.shard < N_SHUFFLE_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # deterministic: same permutation on rerun
    rerun = corpus_shuffle_plan(spark, SF_DIR).collect()
    assert [(r.doc_id, r.shard, r.pos) for r in out] == [
        (r.doc_id, r.shard, r.pos) for r in rerun
    ]


def test_domain_mix_allocation_respects_budget_and_counts(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
        MIX_BUDGET_FRAC,
        domain_mix_allocation,
    )

    out = domain_mix_allocation(spark, SF_DIR).collect()
    assert out
    total_docs = sum(r.n_docs for r in out)
    budget = -(-int(MIX_BUDGET_FRAC * total_docs) // 1)  # ceil for frac*int
    for r in out:
        assert 1 <= r.weight <= 4
        assert 0 <= r.n_alloc <= r.n_docs
        assert abs(r.keep_rate - r.n_alloc / r.n_docs) < 1e-9
    assert sum(r.n_alloc for r in out) <= budget


def test_curation_near_dup_losers_have_smaller_partner(spark):
    losers = {
        r.doc_id
        for r in corpus_curation_decision(spark, SF_DIR)
        .filter(F.col("reason") == "near_dup")
        .collect()
    }
    pairs = dedup_ngram_jaccard(spark, SF_DIR).collect()
    partnered = {p.doc_b for p in pairs}  # doc_b always has doc_a < doc_b
    assert losers <= partnered


def test_corpus_split_plan_certificates(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
        corpus_split_plan,
    )
    from tests.conftest import SF_DIR

    rows = corpus_split_plan(spark, SF_DIR).collect()
    by_split = {r["split"]: r for r in rows}
    assert set(by_split) == {"train", "val", "test"}
    # content-keyed split can never leak an exact duplicate
    assert all(r["exact_dup_leak_free"] for r in rows)
    # the near-dup residual is a global measure, identical on every row
    assert len({r["n_neardup_cross_pairs"] for r in rows}) == 1
    total = sum(r["n_docs"] for r in rows)
    # hex-prefix bucketing: train 12/16 of fingerprint space (binomial
    # slack: the corpus has hundreds of docs, allow a wide band)
    assert 0.55 < by_split["train"]["n_docs"] / total < 0.9
    # duplicated content collapses fingerprints: n_fp <= n_docs
    assert all(r["n_fingerprints"] <= r["n_docs"] for r in rows)


def test_domain_mix_waterfill_matches_reference_simulation(spark):
    """The registered fixed-round waterfilling equals a pure-Python
    simulation of the same policy on the same corpus, and the standard
    allocation invariants hold."""
    from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
        WATERFILL_BUDGET_DEN,
        WATERFILL_BUDGET_NUM,
        WATERFILL_ROUNDS,
        domain_mix_waterfill,
    )

    out = {r.source: r for r in domain_mix_waterfill(spark, SF_DIR).collect()}
    assert out

    # reference simulation from the raw per-source token counts
    per = {
        r.source: r.n_tok
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("n_tok"))
        .collect()
    }
    caps = {s: (1 + int(s[3:]) % 4) * t for s, t in per.items()}
    budget = WATERFILL_BUDGET_NUM * sum(per.values()) // WATERFILL_BUDGET_DEN
    alloc = dict.fromkeys(per, 0)
    for _ in range(WATERFILL_ROUNDS):
        opened = [s for s in alloc if alloc[s] < caps[s]]
        if not opened:
            break
        share = (budget - sum(alloc.values())) // len(opened)
        for s in opened:
            alloc[s] = min(caps[s], alloc[s] + share)

    assert set(out) == set(per)
    for s, r in out.items():
        assert r.alloc_tok == alloc[s], s
        assert r.epoch_cap == 1 + int(s[3:]) % 4
        assert 0 <= r.alloc_tok <= caps[s]
        assert r.capped == (r.alloc_tok == caps[s])
        # exact integer micro-epochs
        assert r.micro_epochs == r.alloc_tok * 1_000_000 // per[s]
    # never over budget; rounds must leave at most a sub-share remainder
    spent = sum(r.alloc_tok for r in out.values())
    assert spent <= budget
    n_open = sum(1 for r in out.values() if not r.capped)
    if n_open:
        assert budget - spent < n_open  # waterfilling ran to exhaustion


def test_epoch_schedule_realizes_the_waterfill_allocation(spark):
    """Per source: the scheduled token mass never exceeds the
    waterfilled allocation and underfills by less than one doc (the
    doc-granularity bound); repeats are full_epochs or full_epochs+1."""
    from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
        corpus_epoch_schedule,
        domain_mix_waterfill,
    )

    sched = corpus_epoch_schedule(spark, SF_DIR).collect()
    alloc = {r.source: r for r in domain_mix_waterfill(spark, SF_DIR).collect()}
    by_src = {}
    for r in sched:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == set(alloc)
    for s, rows in by_src.items():
        a = alloc[s].alloc_tok
        full = a // alloc[s].n_tok
        assert all(r.n_repeats in (full, full + 1) for r in rows)
        assert all((r.n_repeats == full + 1) == r.frac_pick for r in rows)
        scheduled = sum(r.n_repeats * r.n_tok for r in rows)
        assert scheduled <= a
        assert a - scheduled < max(r.n_tok for r in rows), s
    # deterministic on rerun
    rerun = corpus_epoch_schedule(spark, SF_DIR).collect()
    assert [(r.doc_id, r.n_repeats) for r in sched] == [
        (r.doc_id, r.n_repeats) for r in rerun
    ]


def test_decontaminate_excises_eval_spans_and_passes_clean_docs(spark):
    """Surgical decontamination: every doc flagged by the overlap
    report loses exactly its eval-overlapping spans; untouched docs
    pass through with their original text fingerprint."""
    import hashlib

    from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
        corpus_decontaminate,
    )

    rows = {r.doc_id: r for r in corpus_decontaminate(spark, SF_DIR).collect()}
    assert rows and all(i >= EVAL_SET_MAX_ID for i in rows)
    flagged = {i for i, r in rows.items() if r.n_removed > 0}
    assert flagged, "test corpus is known to contain eval-overlapping docs"
    overlap = {
        r.doc_id for r in contamination_ngram_overlap(spark, SF_DIR).collect()
    }
    assert flagged == overlap
    # every excised interval is at least one full n-gram
    for r in rows.values():
        assert r.n_intervals == 0 or r.n_removed >= 5
    # clean docs keep their exact original text (md5 contract)
    sample_clean = [i for i in rows if rows[i].n_removed == 0][:5]
    orig = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id").isin(*[int(i) for i in sample_clean]))
        .collect()
    }
    for i in sample_clean:
        assert rows[i].clean_md5 == hashlib.md5(orig[i].encode()).hexdigest()


def test_epoch_index_extend_refresh_equals_rebuild(spark, tmp_path):
    """The persisted epoch index's incremental contract: write history,
    extend with a delta (history text never re-tokenized), refresh —
    the schedule must equal a from-scratch rebuild over history+delta;
    compaction must not change it; a crash-replayed extend (same tag)
    must not double-count."""
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
        compact_epoch_index,
        epoch_schedule_from_index,
        epoch_schedule_from_rows,
        epoch_index_rows,
        extend_epoch_index,
        write_epoch_index,
    )
    from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    hist = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    path = str(tmp_path / "epoch_idx")

    write_epoch_index(hist, path, "base")
    extend_epoch_index(delta, path, "b1")
    got = epoch_schedule_from_index(spark, path).collect()
    want = (
        epoch_schedule_from_rows(epoch_index_rows(docs))
        .orderBy("doc_id")
        .collect()
    )
    assert got == want  # fold(history, delta) == rebuild(h + d)

    extend_epoch_index(delta, path, "b1")  # crash replay: same tag
    assert epoch_schedule_from_index(spark, path).collect() == want

    compact_epoch_index(spark, path)
    assert epoch_schedule_from_index(spark, path).collect() == want


def test_zero_token_source_schedules_zero_repeats_not_null(spark):
    """A source whose kept docs were all fully stripped (shipped n_tok
    0) must schedule 0 repeats for its docs — never NULL from the
    0-div-0 the unguarded `alloc div n_tok` would produce."""
    from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
        epoch_schedule_from_rows,
    )

    rows = spark.createDataFrame(
        [(1, "src1", 40), (2, "src1", 60), (3, "src2", 0), (4, "src2", 0)],
        "doc_id long, source string, n_tok long",
    )
    out = {r["doc_id"]: r for r in epoch_schedule_from_rows(rows).collect()}
    assert out[3]["n_repeats"] == 0 and out[4]["n_repeats"] == 0
    assert not out[3]["frac_pick"] and not out[4]["frac_pick"]
    assert all(r["n_repeats"] is not None for r in out.values())
    assert out[1]["n_repeats"] >= 1  # the live source still schedules


def test_domain_mix_temperature_matches_hand_computation(spark):
    """Alpha-sampling invariants + differential: shares recomputed in
    python from the per-source token counts; alpha < 1 must upsample
    below-average sources (boost > 1) and downsample above-average
    ones, with sampling shares summing to ~1 and order preserved."""
    import math

    from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
        MIX_TEMP_ALPHA,
        domain_mix_temperature,
    )

    sf = "/root/testdata/sf0.001"
    rows = domain_mix_temperature(spark, sf).collect()
    assert rows
    docs = spark.read.parquet(sf + "/documents.parquet").collect()
    n_tok = {}
    for r in docs:
        n_tok[r.source] = n_tok.get(r.source, 0) + len(r.text.split(" "))
    total = sum(n_tok.values())
    sum_pa = sum(c ** MIX_TEMP_ALPHA for c in n_tok.values())
    assert abs(sum(r.samp_frac for r in rows) - 1.0) < 1e-4
    mean_share = 1.0 / len(n_tok)
    for r in rows:
        c = n_tok[r.source]
        assert math.isclose(r.nat_frac, round(c / total, 6), abs_tol=1e-6)
        p = c ** MIX_TEMP_ALPHA / sum_pa
        assert math.isclose(r.samp_frac, round(p, 6), abs_tol=1e-6)
        assert math.isclose(r.boost, round(p / (c / total), 6), abs_tol=1e-6)
        if c / total < mean_share * 0.9:
            assert r.boost > 1.0, r
        if c / total > mean_share * 1.1:
            assert r.boost < 1.0, r
    # order preserved: bigger source never gets a smaller sampling share
    by_tok = sorted(rows, key=lambda r: n_tok[r.source])
    shares = [r.samp_frac for r in by_tok]
    assert shares == sorted(shares)


def test_weighted_sample_es_scheme(spark):
    """Efraimidis–Spirakis invariants: exactly N rows, contiguous
    ranks, non-increasing keys, per-row key reproducible in pure
    Python, deterministic across runs, and the sample is genuinely
    weight-biased (avg sampled length > corpus avg length)."""
    import hashlib
    import math

    from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
        WSAMPLE_N,
        WSAMPLE_RANGE,
        corpus_weighted_sample,
    )

    sf = "/root/testdata/sf0.001"
    rows = corpus_weighted_sample(spark, sf).collect()
    assert len(rows) == WSAMPLE_N
    assert [r["rank"] for r in rows] == list(range(1, WSAMPLE_N + 1))
    ks = [r["k"] for r in rows]
    assert ks == sorted(ks, reverse=True)
    docs = {
        r["doc_id"]: (r["text"], r["n_chars"])
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    for r in rows:
        text, n_chars = docs[r["doc_id"]]
        assert r["w"] == n_chars
        u = int(hashlib.md5(text.encode()).hexdigest()[:15], 16) / WSAMPLE_RANGE
        assert abs(r["k"] - math.log(u) / n_chars) < 1.1e-6, r
    again = [r["doc_id"] for r in corpus_weighted_sample(spark, sf).collect()]
    assert again == [r["doc_id"] for r in rows], "must be deterministic"
    avg_all = sum(v[1] for v in docs.values()) / len(docs)
    avg_sampled = sum(r["w"] for r in rows) / len(rows)
    assert avg_sampled > avg_all, (avg_sampled, avg_all)


def test_wsample_reservoir_fold_extend_refold_and_compact(spark, tmp_path):
    """The persisted weighted reservoir: extend two batches and the
    read-back top-N merge must equal a from-scratch reservoir over
    both batches (the A-Res mergeability property); replay is
    idempotent; compaction preserves the reservoir exactly."""
    from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
        WSAMPLE_N,
        compact_wsample_index,
        extend_wsample_index,
        read_wsample_index,
        wsample_keyed_rows,
    )

    def mk(lo, hi):
        return spark.createDataFrame(
            [
                (i, f"text body number {i} padded for weight", 20 + (i * 7) % 300)
                for i in range(lo, hi)
            ],
            "doc_id long, text string, n_chars int",
        )

    b1, b2 = mk(0, 90), mk(90, 260)
    path = str(tmp_path / "wsample_index")
    assert read_wsample_index(spark, path) is None
    extend_wsample_index(b1, path, "batch1")
    extend_wsample_index(b2, path, "batch2")

    def ids(df):
        return sorted((r["doc_id"], r["k"]) for r in df.collect())

    folded = ids(read_wsample_index(spark, path))
    scratch = ids(wsample_keyed_rows(b1.unionByName(b2)))
    assert folded == scratch
    assert len(folded) == min(WSAMPLE_N, 260)

    extend_wsample_index(b2, path, "batch2")  # replay
    assert ids(read_wsample_index(spark, path)) == scratch

    compact_wsample_index(spark, path)
    assert ids(read_wsample_index(spark, path)) == scratch
