"""Incremental dedup: a delta folds against a PERSISTED signature index
— the base corpus' text is never rescanned (we prove it by deleting it).
"""

from __future__ import annotations

import shutil

from csv_2_db_pipeline_data_engineering_spark.operators import lsm
from csv_2_db_pipeline_data_engineering_spark.operators.dedup import (
    build_signature_index,
    extend_signature_index,
    incremental_dedup_pairs,
    read_signature_index,
    write_signature_index,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "pack my box with five dozen liquor jugs right now"),
    (3, "entirely unrelated base content about spark shuffles and joins"),
]
DELTA = [
    # near-dup of base 1: long shared word run => jaccard >= 0.4
    (100, "the quick brown fox jumps over the lazy dog today"),
    # near-dup of base 2
    (200, "pack my box with five dozen liquor jugs right here"),
    # unrelated
    (300, "completely fresh delta text with no overlap whatsoever at all"),
]


def test_incremental_fold_finds_cross_pairs_and_only_those(spark):
    pairs = incremental_dedup_pairs(
        _docs(spark, DELTA), build_signature_index(_docs(spark, BASE))
    ).collect()
    assert {(r.doc_delta, r.doc_base) for r in pairs} == {(100, 1), (200, 2)}
    assert all(r.jaccard >= 0.4 for r in pairs)


def test_fold_works_after_base_text_is_deleted(spark, tmp_path):
    base_path = str(tmp_path / "base_docs")
    index_path = str(tmp_path / "sig_index")
    _docs(spark, BASE).write.parquet(base_path)

    # one-time indexing pass: the ONLY read of the base text
    build_signature_index(spark.read.parquet(base_path)).write.parquet(index_path)

    # the base text is gone — only the index remains
    shutil.rmtree(base_path)

    pairs = incremental_dedup_pairs(
        _docs(spark, DELTA), spark.read.parquet(index_path)
    ).collect()
    assert {(r.doc_delta, r.doc_base) for r in pairs} == {(100, 1), (200, 2)}


def test_fold_then_extend_then_refold(spark, tmp_path):
    """Index maintenance loop: fold a delta, extend the index with it,
    fold again — the extension is O(delta) (no existing partition is
    rewritten), replay-idempotent (same tag overwrites the same dir),
    and makes earlier deltas visible to later folds without any text
    rescan (all text is deleted before the final fold)."""
    import os

    base_path = str(tmp_path / "base_docs")
    delta_path = str(tmp_path / "delta_docs")
    index_path = str(tmp_path / "sig_index")
    _docs(spark, BASE).write.parquet(base_path)
    _docs(spark, DELTA).write.parquet(delta_path)

    # one-time indexing pass, then the base text is gone forever
    write_signature_index(spark.read.parquet(base_path), index_path, tag="base")
    shutil.rmtree(base_path)

    # fold delta 1 against the base-only index
    pairs1 = incremental_dedup_pairs(
        spark.read.parquet(delta_path), read_signature_index(spark, index_path)
    ).collect()
    assert {(r.doc_delta, r.doc_base) for r in pairs1} == {(100, 1), (200, 2)}

    # extend: only the new delta=d1 directory may appear — snapshot the
    # base partition's files to prove history is untouched
    base_part = os.path.join(index_path, "delta=base")
    before = {f: os.path.getmtime(os.path.join(base_part, f)) for f in os.listdir(base_part)}
    extend_signature_index(spark.read.parquet(delta_path), index_path, tag="d1")
    after = {f: os.path.getmtime(os.path.join(base_part, f)) for f in os.listdir(base_part)}
    assert before == after, "extending must not read or rewrite existing partitions"
    assert read_signature_index(spark, index_path).count() == len(BASE) + len(DELTA)

    # replay the SAME extension: idempotent (no duplicate rows)
    extend_signature_index(spark.read.parquet(delta_path), index_path, tag="d1")
    assert read_signature_index(spark, index_path).count() == len(BASE) + len(DELTA)

    # re-folding the same delta against the extended index yields the
    # same cross pairs and NO self-pairs (each delta doc now exists in
    # the index under its own id)
    refold = incremental_dedup_pairs(
        spark.read.parquet(delta_path), read_signature_index(spark, index_path)
    ).collect()
    assert {(r.doc_delta, r.doc_base) for r in refold} == {(100, 1), (200, 2)}
    assert all(r.doc_delta != r.doc_base for r in refold)

    # a second delta arrives: near-dup of delta 1's doc 100 — ALL text
    # is deleted; the fold sees it through the extended index alone
    shutil.rmtree(delta_path)
    delta2 = _docs(spark, [(400, "the quick brown fox jumps over the lazy dog forever")])
    pairs2 = incremental_dedup_pairs(
        delta2, read_signature_index(spark, index_path)
    ).collect()
    found = {(r.doc_delta, r.doc_base) for r in pairs2}
    assert (400, 100) in found, "extension must make earlier deltas visible"
    assert (400, 1) in found, "base history must remain visible"


def test_index_is_text_free(spark):
    idx = build_signature_index(_docs(spark, BASE))
    assert "text" not in idx.columns
    # signature columns + hash set + size + id — nothing else
    assert {"doc_id", "sh", "ns"} <= set(idx.columns)
    assert sum(c.startswith("m") for c in idx.columns) == 64


def test_signature_index_compaction_preserves_folds(spark, tmp_path):
    """compact_signature_index rewrites every tag into ONE base
    partition; folds against the compacted index find the same pairs,
    and later extends keep folding on top of the compacted base."""
    import os

    from csv_2_db_pipeline_data_engineering_spark.operators.dedup import (
        compact_signature_index,
    )

    index_path = str(tmp_path / "sig_index")
    write_signature_index(_docs(spark, BASE), index_path, tag="base")
    extend_signature_index(_docs(spark, DELTA), index_path, tag="d1")

    delta2 = _docs(
        spark, [(400, "the quick brown fox jumps over the lazy dog forever")]
    )
    pre = {
        (r.doc_delta, r.doc_base)
        for r in incremental_dedup_pairs(
            delta2, read_signature_index(spark, index_path)
        ).collect()
    }
    pre_rows = read_signature_index(spark, index_path).count()

    compact_signature_index(spark, index_path)
    tags = [t for t in os.listdir(index_path) if t.startswith("delta=")]
    assert tags == [f"delta={lsm.read_state(index_path)['base']}"]
    assert read_signature_index(spark, index_path).count() == pre_rows
    post = {
        (r.doc_delta, r.doc_base)
        for r in incremental_dedup_pairs(
            delta2, read_signature_index(spark, index_path)
        ).collect()
    }
    assert post == pre and pre  # non-vacuous

    extend_signature_index(delta2, index_path, "d2")
    assert read_signature_index(spark, index_path).count() == pre_rows + 1
