"""Verbatim-span (exact-substring) dedup over shingle diagonal islands."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.operators import lsm
from csv_2_db_pipeline_data_engineering_spark.operators.spans import (
    MIN_SPAN_TOKENS,
    SPAN_PHRASES,
    SPAN_PLANT_MOD,
    dedup_exact_substring,
    verbatim_span_pairs,
)
from tests.conftest import SF_DIR


def test_planted_boilerplate_pairs_surface(spark):
    rows = dedup_exact_substring(spark, SF_DIR).collect()
    assert rows, "planted spans must produce pairs"
    by_pair = {(r["doc_a"], r["doc_b"]): r for r in rows}
    phrase_md5 = {hashlib.md5(p.encode()).hexdigest() for p in SPAN_PHRASES}
    # every same-variant planted pair shares the 12-token phrase; the
    # reported longest span is at least that phrase
    planted = [
        i for i in range(0, 500, SPAN_PLANT_MOD)
    ]
    seen_phrase_pairs = 0
    for i in planted:
        for j in planted:
            if i < j and i % 3 == j % 3:
                r = by_pair.get((i, j))
                assert r is not None, f"missing planted pair {(i, j)}"
                assert r["span_tokens"] >= 12
                seen_phrase_pairs += 1
                if r["span_tokens"] == 12:
                    assert r["span_md5"] in phrase_md5
    assert seen_phrase_pairs >= 10
    assert all(r["span_tokens"] >= MIN_SPAN_TOKENS for r in rows)


def test_island_collapse_reports_exact_span(spark):
    """Two hand-built docs sharing one verbatim 15-token run -> exactly
    one island of exactly 15 tokens at the right offsets."""
    shared = " ".join(f"s{i}" for i in range(15))
    docs = spark.createDataFrame(
        [
            (1, "a1 a2 a3 " + shared + " z1 z2"),
            (2, "b1 " + shared + " y1 y2 y3 y4"),
        ],
        "doc_id long, text string",
    )
    rows = verbatim_span_pairs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["n_spans"] == 1
    assert r["span_tokens"] == 15
    assert (r["a_start"], r["b_start"]) == (3, 1)


def test_disjoint_runs_stay_separate_islands(spark):
    """Two shared runs separated by noise -> two islands, not one."""
    run1 = " ".join(f"p{i}" for i in range(11))
    run2 = " ".join(f"q{i}" for i in range(13))
    docs = spark.createDataFrame(
        [
            (1, run1 + " mid1 mid2 mid3 " + run2),
            (2, run2 + " other1 other2 " + run1),
        ],
        "doc_id long, text string",
    )
    rows = verbatim_span_pairs(docs).collect()
    assert len(rows) == 1
    assert rows[0]["n_spans"] == 2
    assert rows[0]["span_tokens"] == 13  # the longer run wins


def test_strip_keeps_first_occurrence_only(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.spans import (
        strip_verbatim_spans,
    )

    shared = " ".join(f"s{i}" for i in range(15))
    docs = spark.createDataFrame(
        [
            (1, "a1 a2 " + shared),
            (2, "b1 " + shared + " b2"),
            (3, shared + " c1 c2 c3"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in strip_verbatim_spans(docs).collect()}
    assert out[1]["n_removed"] == 0  # lowest doc_id keeps the span
    assert out[2]["n_removed"] == 15 and out[2]["n_intervals"] == 1
    assert out[3]["n_removed"] == 15 and out[3]["n_intervals"] == 1
    assert out[2]["clean_md5"] == hashlib.md5(b"b1 b2").hexdigest()
    assert out[3]["clean_md5"] == hashlib.md5(b"c1 c2 c3").hexdigest()


def test_strip_merges_overlapping_victim_intervals(spark):
    """Two partners sharing overlapping runs with a victim -> the union
    is removed once (one merged interval, no double count)."""
    from csv_2_db_pipeline_data_engineering_spark.operators.spans import (
        strip_verbatim_spans,
    )

    r = " ".join(f"t{i}" for i in range(20))  # t0..t19
    left = " ".join(f"t{i}" for i in range(12))  # t0..t11
    right = " ".join(f"t{i}" for i in range(8, 20))  # t8..t19
    docs = spark.createDataFrame(
        [(1, left), (2, right), (3, r + " tail1 tail2")],
        "doc_id long, text string",
    )
    out = {x["doc_id"]: x for x in strip_verbatim_spans(docs).collect()}
    # doc 3 is the victim of both doc1 (t0..t11) and doc2 (t8..t19):
    # overlapping intervals merge to one 20-token removal
    assert out[3]["n_intervals"] == 1
    assert out[3]["n_removed"] == 20
    assert out[3]["clean_md5"] == hashlib.md5(b"tail1 tail2").hexdigest()


def test_registered_strip_is_consistent(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.spans import (
        text_span_strip,
    )

    rows = text_span_strip(spark, SF_DIR).collect()
    assert len(rows) == 500  # one summary row per document
    assert all(0 <= r["n_removed"] <= r["n_tokens"] for r in rows)
    assert any(r["n_removed"] >= 12 for r in rows)  # planted phrases stripped


def test_span_join_is_keyed_not_cartesian(spark):
    from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
    from csv_2_db_pipeline_data_engineering_spark.operators.spans import (
        plant_boilerplate,
    )

    docs = plant_boilerplate(
        load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    )
    plan = (
        verbatim_span_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- property: the island collapse vs a brute-force python model -----------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _model_spans(ta, tb, L=8, min_span=10):
    """Brute-force longest-common-run model over two token lists."""
    best = {}
    for i in range(len(ta)):
        for j in range(len(tb)):
            if ta[i] == tb[j] and (i == 0 or j == 0 or ta[i - 1] != tb[j - 1]):
                k = 0
                while i + k < len(ta) and j + k < len(tb) and ta[i + k] == tb[j + k]:
                    k += 1
                if k >= min_span:
                    best[(i, j)] = k
    return best


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture, HealthCheck.too_slow,
    ],
)
@given(
    seed=st.integers(0, 10**6),
    span_len=st.integers(10, 25),
    offset_a=st.integers(0, 12),
    offset_b=st.integers(0, 12),
)
def test_planted_random_span_always_found(spark, seed, span_len, offset_a, offset_b):
    """Recall property: a shared run of >= min_span tokens between two
    otherwise-disjoint random docs is always reported at full length."""
    import random

    rng = random.Random(seed)
    shared = [f"s{seed}_{i}" for i in range(span_len)]
    noise_a = [f"a{rng.randrange(10**9)}" for _ in range(offset_a)]
    noise_b = [f"b{rng.randrange(10**9)}" for _ in range(offset_b)]
    tail_a = [f"at{rng.randrange(10**9)}" for _ in range(3)]
    tail_b = [f"bt{rng.randrange(10**9)}" for _ in range(3)]
    ta = noise_a + shared + tail_a
    tb = noise_b + shared + tail_b
    docs = spark.createDataFrame(
        [(1, " ".join(ta)), (2, " ".join(tb))], "doc_id long, text string"
    )
    rows = verbatim_span_pairs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    model = _model_spans(ta, tb)
    want_len = max(model.values())
    assert r["span_tokens"] == want_len == span_len
    assert (r["a_start"], r["b_start"]) in model


def test_span_index_write_extend_fold_round_trip(spark, tmp_path):
    """Persisted shingle index: fold a delta against the read-back of
    write+extend and get exactly the in-plan result; a replayed extend
    (same tag) stays idempotent."""
    from csv_2_db_pipeline_data_engineering_spark.operators.spans import (
        _raw_shingles,
        extend_span_index,
        incremental_span_strip_frame,
        read_span_index,
        write_span_index,
    )
    from pyspark.sql import functions as F

    phrase = "the quick brown fox jumps over the lazy dog near the river bank"
    base1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta " + phrase), (2, "one two three four five six")],
        "doc_id long, text string",
    )
    base2 = spark.createDataFrame(
        [(3, "red green blue cyan magenta yellow black white gray pink teal")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(10, "zz yy xx ww vv " + phrase), (11, "uu tt ss rr qq pp oo nn mm ll")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "span_index")
    write_span_index(base1, path, "base")
    extend_span_index(base2, path, "batch2")
    extend_span_index(base2, path, "batch2")  # replay: overwrite, not append

    ish, istats = read_span_index(spark, path)
    folded = incremental_span_strip_frame(delta, ish, istats).collect()

    allbase = base1.unionByName(base2)
    inplan = incremental_span_strip_frame(
        delta,
        _raw_shingles(allbase),
        _raw_shingles(allbase)
        .groupBy("sh")
        .agg(F.countDistinct("doc_id").alias("n_docs")),
    ).collect()
    assert folded == inplan

    out = {r["doc_id"]: r for r in folded}
    # doc 10 loses exactly the 12-token phrase first seen in history
    assert out[10]["n_removed"] == len(phrase.split(" "))
    assert out[10]["n_intervals"] == 1
    import hashlib

    assert out[10]["clean_md5"] == hashlib.md5(b"zz yy xx ww vv").hexdigest()
    # doc 11 shares nothing: untouched
    assert out[11]["n_removed"] == 0 and out[11]["n_intervals"] == 0


def test_incremental_first_seen_beats_doc_id_order(spark):
    """A delta doc with a LOWER id than its history partner is still
    the victim (temporal first-seen wins) — the semantics that
    distinguish the incremental fold from batch text_span_strip."""
    from csv_2_db_pipeline_data_engineering_spark.operators.spans import (
        _raw_shingles,
        incremental_span_strip_frame,
        strip_verbatim_spans,
    )
    from pyspark.sql import functions as F

    phrase = "please read the full terms of the service before you use this"
    hist = spark.createDataFrame(
        [(100, "aa bb cc dd ee " + phrase)], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [(5, "ff gg hh ii jj " + phrase)], "doc_id long, text string"
    )
    inc = incremental_span_strip_frame(
        delta,
        _raw_shingles(hist),
        _raw_shingles(hist)
        .groupBy("sh")
        .agg(F.countDistinct("doc_id").alias("n_docs")),
    ).collect()
    assert inc[0]["doc_id"] == 5 and inc[0]["n_removed"] == len(phrase.split(" "))
    # the batch policy would have kept doc 5 (lowest id wins there)
    batch = {
        r["doc_id"]: r
        for r in strip_verbatim_spans(hist.unionByName(delta)).collect()
    }
    assert batch[5]["n_removed"] == 0 and batch[100]["n_removed"] > 0


def test_span_index_compaction_preserves_strip_results(spark, tmp_path):
    """compact_span_index collapses the per-tag df partials (otherwise
    re-merged on EVERY read) and the shingle rows into one base tag;
    the incremental strip over the compacted index is identical, and
    later extends fold on top of the compacted base."""
    import os

    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.spans import (
        compact_span_index,
        extend_span_index,
        incremental_span_strip_frame,
        read_span_index,
        write_span_index,
    )

    phrase = "the quick brown fox jumps over the lazy dog near the river bank"
    base1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta " + phrase)], "doc_id long, text string"
    )
    base2 = spark.createDataFrame(
        [(2, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(10, "zz yy xx ww vv " + phrase)], "doc_id long, text string"
    )
    path = str(tmp_path / "span_index")
    write_span_index(base1, path, "batch1")
    extend_span_index(base2, path, "batch2")

    ish, istats = read_span_index(spark, path)
    pre = sorted(incremental_span_strip_frame(delta, ish, istats).collect())
    pre_stats = {
        r["sh"]: r["n_docs"]
        for r in istats.collect()
    }

    compact_span_index(spark, path)
    for sub in ("shingles", "stats"):
        tags = [
            t for t in os.listdir(os.path.join(path, sub)) if t.startswith("delta=")
        ]
        assert tags == [f"delta={lsm.read_state(path)['base']}"], sub
    ish2, istats2 = read_span_index(spark, path)
    assert {r["sh"]: r["n_docs"] for r in istats2.collect()} == pre_stats
    # the compacted stats table is ALREADY one row per shingle on disk
    raw = spark.read.parquet(
        os.path.join(path, "stats", f"delta={lsm.read_state(path)['base']}")
    )
    assert raw.groupBy("sh").count().filter(F.col("count") > 1).count() == 0
    assert sorted(incremental_span_strip_frame(delta, ish2, istats2).collect()) == pre

    # extends keep working on top of the compacted base
    extend_span_index(delta, path, "batch3")
    ish3, _ = read_span_index(spark, path)
    assert ish3.select("doc_id").distinct().count() == 3
