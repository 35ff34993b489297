"""Mergeable sketches: count-min heavy hitters + Bloom dedup pre-filter."""

from __future__ import annotations

from csv_2_db_pipeline_data_engineering_spark.operators import lsm
from csv_2_db_pipeline_data_engineering_spark.operators.lifecycle import (
    release_scoped_caches,
)
from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
    BLOOM_K,
    CMS_HH_MIN,
    CMS_W,
    dedup_bloom_prefilter,
    text_heavy_hitters_cms,
)

from tests.conftest import SF_DIR


def test_cms_never_undercounts_and_respects_bound(spark):
    rows = text_heavy_hitters_cms(spark, SF_DIR).collect()
    release_scoped_caches()
    assert rows, "heavy-hitter set must be non-empty at test sf"
    for r in rows:
        assert r["exact_n"] >= CMS_HH_MIN
        assert r["est_n"] >= r["exact_n"], "CMS must never undercount"
        assert r["overcount"] == r["est_n"] - r["exact_n"]
        assert r["ok_no_undercount"]
    # The sketch is sized to be genuinely lossy at every sf: a vacuous
    # zero-overcount run means W drifted too large for the corpus.
    assert any(r["overcount"] > 0 for r in rows)


def test_cms_sketch_is_fixed_size(spark):
    """The certificate booleans hold, and the estimate comes from a
    sketch no wider than D*W counters (the fixed-size guarantee)."""
    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        CMS_D,
        _cms_buckets,
        _gram_stream,
    )
    from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    grams = _gram_stream(load_table(spark, SF_DIR, "documents"))
    cms = (
        grams.select(
            F.posexplode(F.array(*_cms_buckets(F.col("gram")))).alias("d", "bucket")
        )
        .groupBy("d", "bucket")
        .count()
    )
    assert cms.count() <= CMS_D * CMS_W


def test_bloom_no_false_negatives_and_planted_dups_found(spark):
    rows = dedup_bloom_prefilter(spark, SF_DIR).collect()
    assert rows
    seen = [r for r in rows if r["actually_seen"]]
    assert seen, "planted cross-boundary duplicates must exist"
    for r in rows:
        assert 0 <= r["hits"] <= BLOOM_K
        assert r["ok_no_false_negative"], "Bloom filters cannot false-negative"
        if r["actually_seen"]:
            assert r["maybe_seen"]
    # the filter must also REJECT most genuinely-new rows (the whole
    # point of the pre-filter): rejected rows skip the exact verify.
    rejected = [r for r in rows if not r["maybe_seen"]]
    assert len(rejected) >= len(rows) // 2


def test_bloom_probe_is_broadcast(spark):
    plan = (
        dedup_bloom_prefilter(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bloom_screen_no_false_negatives(spark):
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        bloom_bit_rows,
        bloom_screen,
    )

    indexed = spark.range(200).select(F.md5(F.col("id").cast("string")).alias("key"))
    bits = bloom_bit_rows(indexed, "key")
    # candidates: 50 members + 150 non-members
    members = spark.range(50).select(F.md5(F.col("id").cast("string")).alias("key"))
    fresh = spark.range(1000, 1150).select(
        F.md5(F.col("id").cast("string")).alias("key")
    )
    passed = {r["key"] for r in bloom_screen(members.union(fresh), bits).collect()}
    member_keys = {r["key"] for r in members.collect()}
    assert member_keys <= passed, "every true member must survive the screen"
    # the screen must actually reject most genuinely-new keys
    fresh_keys = {r["key"] for r in fresh.collect()}
    assert len(passed & fresh_keys) <= len(fresh_keys) // 10


def test_bloom_screen_robust_to_duplicate_bits(spark):
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        bloom_bit_rows,
        bloom_screen,
    )

    indexed = spark.range(20).select(F.md5(F.col("id").cast("string")).alias("key"))
    bits = bloom_bit_rows(indexed, "key")
    doubled = bits.union(bits)  # crash-replayed append
    a = {r["key"] for r in bloom_screen(indexed, bits).collect()}
    b = {r["key"] for r in bloom_screen(indexed, doubled).collect()}
    assert a == b == {r["key"] for r in indexed.collect()}


def test_curation_decisions_identical_with_bloom_prescreen(spark):
    from csv_2_db_pipeline_data_engineering_spark.curation_pipeline import (
        curation_decisions,
    )
    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        bloom_bit_rows,
    )
    from pyspark.sql import functions as F

    text_a = (
        "the quick brown fox jumps over a lazy dog and it runs to the old "
        "barn of a quiet farm in the misty morning light while it is watching"
    )
    text_b = (
        "a steady river flows through the green valley and it carries boats "
        "of traders to the busy market in the stone city where it meets the sea"
    )
    docs = spark.createDataFrame(
        [(1, text_a), (2, text_b)], "doc_id long, text string"
    )
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    # history: doc 1's normalized content already indexed
    fps = (
        spark.createDataFrame([(0, text_a)], "doc_id long, text string")
        .select(F.md5(norm).alias("fingerprint"))
    )
    bits = bloom_bit_rows(fps)
    no_losers = docs.select("doc_id").filter("doc_id < 0")
    without = curation_decisions(
        docs, near_losers=no_losers, exact_fingerprints=fps
    ).orderBy("doc_id")
    with_bloom = curation_decisions(
        docs, near_losers=no_losers, exact_fingerprints=fps, exact_bloom_bits=bits
    ).orderBy("doc_id")
    assert without.collect() == with_bloom.collect()
    reasons = {r["doc_id"]: r["reason"] for r in with_bloom.collect()}
    assert reasons[1] == "exact_dup" and reasons[2] == "keep"


def test_cms_index_fold_extend_refold(spark, tmp_path):
    """The persisted CMS index: fold batch 1, extend with batch 2, and
    the read-back merge must equal a from-scratch sketch of both
    batches; a crash-replayed extend (same tag) must not double-count."""
    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        cms_rows,
        extend_cms_index,
        read_cms_index,
    )

    b1 = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the cat sat again"),
            (2, "a dog ran to the park and a dog ran back"),
        ],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [
            (3, "the cat sat on the mat near a dog ran path"),
            (4, "rain fell on the roof while the cat sat still"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "cms_index")
    assert read_cms_index(spark, path) is None
    extend_cms_index(b1, path, "batch1")
    extend_cms_index(b2, path, "batch2")

    def as_map(df):
        return {(r["d"], r["bucket"]): r["cnt"] for r in df.collect()}

    folded = as_map(read_cms_index(spark, path))
    scratch = as_map(cms_rows(b1.unionByName(b2)))
    assert folded == scratch

    # replay: overwriting the same tag is idempotent, never additive
    extend_cms_index(b2, path, "batch2")
    assert as_map(read_cms_index(spark, path)) == scratch


def test_incremental_cms_certificate_holds(spark):
    """Every heavy hitter's merged-sketch estimate equals the rebuild's
    (mergeability is exact), and never undercounts."""
    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        text_heavy_hitters_incremental,
    )
    from tests.conftest import SF_DIR

    rows = text_heavy_hitters_incremental(spark, SF_DIR).collect()
    assert rows
    assert all(r["ok_merge_exact"] for r in rows)
    assert all(r["ok_no_undercount"] for r in rows)


def test_cms_index_compaction_preserves_estimates(spark, tmp_path):
    """compact_cms_index folds every tag into ONE base partition whose
    read-back answers identically (counter addition IS the merge), and
    later extends keep folding on top of the compacted base."""
    import os

    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        cms_rows,
        compact_cms_index,
        extend_cms_index,
        read_cms_index,
    )

    b1 = spark.createDataFrame(
        [(1, "the cat sat on the mat and the cat sat again")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(2, "a dog ran to the park and a dog ran back")],
        "doc_id long, text string",
    )
    b3 = spark.createDataFrame(
        [(3, "rain fell on the roof while the cat sat still")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "cms_index")
    extend_cms_index(b1, path, "batch1")
    extend_cms_index(b2, path, "batch2")

    def as_map(df):
        return {(r["d"], r["bucket"]): r["cnt"] for r in df.collect()}

    pre = as_map(read_cms_index(spark, path))
    compact_cms_index(spark, path)
    tags = [t for t in os.listdir(path) if t.startswith("delta=")]
    assert tags == [f"delta={lsm.read_state(path)['base']}"]
    assert as_map(read_cms_index(spark, path)) == pre

    extend_cms_index(b3, path, "batch3")
    scratch = as_map(cms_rows(b1.unionByName(b2).unionByName(b3)))
    assert as_map(read_cms_index(spark, path)) == scratch


def test_hll_certificates_hold_on_corpus(spark):
    """One-row HLL certificate: MAX-merge equals from-scratch, estimate
    within the 3-sigma published bound of the exact distinct count."""
    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        text_distinct_hll,
    )
    from tests.conftest import SF_DIR

    r = text_distinct_hll(spark, SF_DIR).collect()
    assert len(r) == 1
    row = r[0]
    assert row["ok_merge_exact"] and row["ok_err_bound"]
    assert row["est_full"] == row["est_merged"]
    assert 1 <= row["registers_used"] <= 1024


def test_hll_index_disk_roundtrip_and_compaction(spark, tmp_path):
    """extend/read/compact of the persisted HLL index: merged read
    equals the from-scratch register state (MAX over tags IS the
    merge), compaction folds to one base tag answering identically,
    and later extends keep folding on top."""
    import os

    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        compact_hll_index,
        extend_hll_index,
        hll_rows,
        read_hll_index,
    )

    b1 = spark.createDataFrame(
        [(1, "the cat sat on the mat and the cat sat again")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(2, "a dog ran to the park and a dog ran back")],
        "doc_id long, text string",
    )
    b3 = spark.createDataFrame(
        [(3, "rain fell on the roof while the cat sat still")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "hll_index")
    extend_hll_index(b1, path, "batch1")
    extend_hll_index(b2, path, "batch2")

    def as_map(df):
        return {r["reg"]: r["rho"] for r in df.collect()}

    pre = as_map(read_hll_index(spark, path))
    assert pre == as_map(hll_rows(b1.unionByName(b2)))
    compact_hll_index(spark, path)
    tags = [t for t in os.listdir(path) if t.startswith("delta=")]
    assert tags == [f"delta={lsm.read_state(path)['base']}"]
    assert as_map(read_hll_index(spark, path)) == pre

    extend_hll_index(b3, path, "batch3")
    scratch = as_map(hll_rows(b1.unionByName(b2).unionByName(b3)))
    assert as_map(read_hll_index(spark, path)) == scratch


def test_hll_small_range_linear_counting_branch(spark):
    """A tiny corpus (few distinct grams) drives E_raw under 2.5m with
    empty registers, so the estimate must come from the linear-counting
    branch — and still land within the certificate bound."""
    import math

    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        HLL_M,
        _hll_estimate,
        hll_rows,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")],
        "doc_id long, text string",
    )
    n_exact = 10  # 12 words -> 10 distinct 3-gram shingles
    row = _hll_estimate(hll_rows(docs)).collect()[0]
    assert row["n_obs"] <= n_exact < HLL_M
    expected = round(HLL_M * math.log(HLL_M / (HLL_M - row["n_obs"])), 4)
    assert row["est"] == expected  # the linear-counting branch fired
    assert abs(row["est"] - n_exact) <= 0.15 * n_exact


def test_hdr_index_fold_extend_compact_refold(spark, tmp_path):
    """The HDR quantile sketch's persisted-index contract: extends are
    O(delta) histogram partials, the addition-merge read equals a
    from-scratch build, a crash-replayed extend does not double-count,
    and compaction leaves the merged state identical."""
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        compact_hdr_index,
        extend_hdr_index,
        hdr_rows,
        merge_hdr,
        read_hdr_index,
    )
    from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    hist = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    path = str(tmp_path / "hdr")

    def counts(df):
        return {(r["bucket"], r["lo"]): r["cnt"] for r in df.collect()}

    want = counts(
        hdr_rows(docs.select(F.size(F.split("text", " ")).cast("long").alias("x")))
    )
    extend_hdr_index(hist, path, "base")
    extend_hdr_index(delta, path, "b1")
    got = counts(read_hdr_index(spark, path))
    assert got == want  # fold(history, delta) == rebuild

    extend_hdr_index(delta, path, "b1")  # crash replay: same tag
    assert counts(read_hdr_index(spark, path)) == want

    compact_hdr_index(spark, path)
    assert counts(read_hdr_index(spark, path)) == want


def test_hdr_quantile_certificates_hold(spark):
    """Every emitted row must certify: estimate below the exact order
    statistic by less than one sub-bucket (relative error < 1/HDR_M)
    and the addition merge identical to the from-scratch histogram."""
    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        text_length_hdr_quantiles,
    )
    from tests.conftest import SF_DIR

    rows = text_length_hdr_quantiles(spark, SF_DIR).collect()
    assert [r["q"] for r in rows] == [50, 90, 99]
    for r in rows:
        assert r["within_bound"] and r["merge_identical"]
        assert r["est_tok"] <= r["exact_tok"]
        assert (r["exact_tok"] - r["est_tok"]) * 16 <= r["exact_tok"]


def test_hdr_buckets_exact_across_the_full_long_range(spark):
    """The division-first sub-bucket form must stay int64-exact and
    monotone up to the top octave (the naive multiply wraps at
    bit_length >= 61), and equal the multiply form where both are
    exact."""
    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        HDR_M,
        hdr_rows,
    )

    xs = [0, 1, 15, 16, 17, 1023, 2**40 + 12345, 2**60 + 7, 2**62 + 99,
          2**63 - 1]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = {r["lo"]: r["bucket"] for r in hdr_rows(df).collect()}

    def py_bucket(x):
        if x <= 0:
            return 0, 0
        e = x.bit_length()
        p = 1 << (e - 1)
        sub = (x - p) * HDR_M // p  # exact in Python bigints
        return e * HDR_M + sub, p + sub * p // HDR_M
    for x in xs:
        b, lo = py_bucket(x)
        assert got[lo] == b and b >= 0 and lo >= 0, (x, b, lo)
    # monotone: sorted los carry sorted buckets
    los = sorted(got)
    assert [got[lo] for lo in los] == sorted(got.values())


def test_kmv_overlap_certificates_hold(spark):
    """The registered KMV overlap row: every in-plan certificate must
    be TRUE at test sf (budget sufficiency, merge==direct-union set
    equality, 3-sigma cardinality and Jaccard error bounds), and the
    estimates must be non-vacuous (a genuine partial overlap)."""
    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        corpus_overlap_kmv,
    )

    rows = corpus_overlap_kmv(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["ok_budget"] and r["ok_merge_exact"]
    assert r["ok_err_card"] and r["ok_err_jaccard"]
    # Non-vacuous: the slices genuinely partially overlap.
    assert 0 < r["exact_inter"] < r["exact_b"] < r["exact_a"] < r["exact_union"]
    assert 0.0 < r["jaccard_est"] < 1.0
    assert r["est_inter"] > 0


def test_kmv_merge_is_exactly_kmv_of_union(spark):
    """kmv(A) ⊕ kmv(B) == kmv(A ∪ B) — the defining order-statistic
    merge property, checked against a Python-computed expectation on
    synthetic hash sets with controlled overlap."""
    import random

    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        KMV_K,
        merge_kmv,
    )

    rng = random.Random(42)
    pool = rng.sample(range(1, 1 << 59), 500)
    a = set(pool[:300])
    b = set(pool[200:])  # 100-value overlap with a
    fa = spark.createDataFrame([(h,) for h in sorted(a)], "h long")
    fb = spark.createDataFrame([(h,) for h in sorted(b)], "h long")
    ska = spark.createDataFrame(
        [(h,) for h in sorted(a)[:KMV_K]], "h long"
    )
    skb = spark.createDataFrame(
        [(h,) for h in sorted(b)[:KMV_K]], "h long"
    )
    merged = sorted(r["h"] for r in merge_kmv(ska, skb).collect())
    expected = sorted(a | b)[:KMV_K]
    assert merged == expected
    # and the direct union sketch agrees
    direct = sorted(
        r["h"] for r in merge_kmv(fa.union(fb).distinct()).collect()
    )
    assert direct == expected


def test_kmv_kept_flags_are_per_content(spark):
    """A text present in slice A via one doc and slice B via another
    must carry BOTH flags on its single kept hash row (the flag-OR
    group is keyed on content hash, not doc)."""
    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        kmv_kept,
    )

    # doc 1: in A (1%3!=0) and in B (1%2!=0). doc 2: in A only.
    # doc 3: in B only, SAME text as doc 2 -> that content is in both.
    docs = spark.createDataFrame(
        [(1, "unique text one"), (2, "shared text"), (3, "shared text")],
        "doc_id long, text string",
    )
    kept = {
        (r["in_a"], r["in_b"]) for r in kmv_kept(docs).collect()
    }
    assert kept == {(True, True)}


def test_kmv_index_fold_extend_refold_and_compact(spark, tmp_path):
    """The persisted KMV index: extend two batches, and the read-back
    k-smallest merge must equal a from-scratch sketch of both batches
    (merge == rebuild, the defining KMV property); a crash-replayed
    extend is idempotent; compaction preserves the state exactly and
    the estimate falls back to the exact count below K values."""
    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        KMV_K,
        compact_kmv_index,
        extend_kmv_index,
        kmv_estimate,
        kmv_sketch_rows,
        read_kmv_index,
    )

    b1 = spark.createDataFrame(
        [(i, f"doc number {i} about topic {i % 7}") for i in range(60)],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(i, f"doc number {i} about topic {i % 7}") for i in range(40, 140)],
        "doc_id long, text string",
    )  # 20-doc text overlap with b1
    path = str(tmp_path / "kmv_index")
    assert read_kmv_index(spark, path) is None
    extend_kmv_index(b1, path, "batch1")
    extend_kmv_index(b2, path, "batch2")

    def hs(df):
        return sorted(r["h"] for r in df.collect())

    folded = hs(read_kmv_index(spark, path))
    scratch = hs(kmv_sketch_rows(b1.unionByName(b2)))
    assert folded == scratch
    assert len(folded) == min(KMV_K, 140)

    extend_kmv_index(b2, path, "batch2")  # replay: idempotent
    assert hs(read_kmv_index(spark, path)) == scratch

    compact_kmv_index(spark, path)
    assert hs(read_kmv_index(spark, path)) == scratch

    est = kmv_estimate(read_kmv_index(spark, path)).collect()[0]
    if len(scratch) < KMV_K:
        assert est["est"] == float(len(scratch)) == est["n_vals"]
        assert est["kth_h"] is None
    else:
        assert est["kth_h"] == scratch[KMV_K - 1]
        assert abs(est["est"] - 140) * 100 <= 27 * 140
