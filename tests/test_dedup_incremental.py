"""Incremental dedup: a delta folds against a PERSISTED signature index
— the base corpus' text is never rescanned (we prove it by deleting it).
"""

from __future__ import annotations

import shutil

from csv_2_db_pipeline_data_engineering_spark.operators.dedup import (
    build_signature_index,
    incremental_dedup_pairs,
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


def test_index_is_text_free(spark):
    idx = build_signature_index(_docs(spark, BASE))
    assert "text" not in idx.columns
    # signature columns + hash set + size + id — nothing else
    assert {"doc_id", "sh", "ns"} <= set(idx.columns)
    assert sum(c.startswith("m") for c in idx.columns) == 64
