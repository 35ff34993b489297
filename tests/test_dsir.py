"""DSIR importance resampling: weights, frontier, and needle recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.operators import lsm
from csv_2_db_pipeline_data_engineering_spark.operators.dsir import (
    SELECT_K,
    TARGET_SOURCES,
    dsir_select,
    text_dsir_select,
)
from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_target_flavored_docs_outweigh_plain_ones(spark):
    # src0 is a target source; residue-3 raw docs share its planted
    # flavor; doc 10 (src9, residue 3) is the needle, 11/12 are plain.
    rows = [
        (1, "src0", "alpha beta gamma delta"),
        (2, "src0", "alpha beta gamma delta"),
        (10, "src9", "epsilon zeta eta theta"),
        (11, "src9", "iota kappa lam mu"),
        (12, "src9", "nu xi omicron pi"),
    ]
    got = {r["doc_id"]: r for r in dsir_select(_docs(spark, rows), k=3).collect()}
    assert got[10]["avg_lr"] > got[11]["avg_lr"]
    assert got[10]["selected"] is True
    # exactly k docs selected
    assert sum(1 for r in got.values() if r["selected"]) == 3


def test_frontier_is_exactly_k_with_deterministic_ties(spark):
    # five identical plain docs (ids avoid the flavored residue 3 mod 7)
    # -> identical weights; tie-break keeps the lowest doc_ids
    rows = [(i, "src9", "one two three four") for i in (13, 8, 12, 9, 11)]
    got = {r["doc_id"]: r["selected"] for r in dsir_select(_docs(spark, rows), k=2).collect()}
    assert got == {8: True, 9: True, 11: False, 12: False, 13: False}


def test_corpus_selection_prefers_planted_flavor(spark):
    df = text_dsir_select(spark, SF_DIR)
    sel = df.filter("selected")
    n_sel = sel.count()
    assert n_sel == SELECT_K
    # selected docs are overwhelmingly flavored (target source or
    # residue 3); the corpus is otherwise i.i.d. soup
    d = (
        sel.join(
            text_dsir_select.__globals__["load_table"](spark, SF_DIR, "documents"),
            "doc_id",
        )
        .withColumn(
            "flavored",
            F.col("source").isin(*TARGET_SOURCES) | (F.col("doc_id") % 7 == 3),
        )
    )
    n_flavored = d.filter("flavored").count()
    assert n_flavored >= int(0.9 * n_sel), (n_flavored, n_sel)


def test_incremental_scores_equal_from_scratch_for_delta_docs(spark):
    """dsir_select_incremental's merged history+delta model gives every
    delta doc exactly the weight the from-scratch full-corpus model
    gives it; the within-delta frontier keeps exactly DELTA_SELECT_K."""
    from csv_2_db_pipeline_data_engineering_spark.operators.dsir import (
        DELTA_SELECT_K,
        dsir_select_incremental,
    )

    incr = {r["doc_id"]: r for r in dsir_select_incremental(spark, SF_DIR).collect()}
    assert incr and all(i % 10 == 0 for i in incr)
    full = {
        r["doc_id"]: r
        for r in text_dsir_select(spark, SF_DIR).collect()
        if r["doc_id"] % 10 == 0
    }
    assert set(incr) == set(full)
    for i, r in incr.items():
        assert (r["n_grams"], r["weight"], r["avg_lr"]) == (
            full[i]["n_grams"],
            full[i]["weight"],
            full[i]["avg_lr"],
        ), i
    assert sum(1 for r in incr.values() if r["selected"]) == DELTA_SELECT_K
    # selected = exact top-K of (avg_lr desc, doc_id asc) within delta
    ranked = sorted(incr.values(), key=lambda r: (-r["avg_lr"], r["doc_id"]))
    assert {r["doc_id"] for r in ranked[:DELTA_SELECT_K]} == {
        r["doc_id"] for r in incr.values() if r["selected"]
    }


def test_dsir_index_disk_roundtrip_and_compaction(spark, tmp_path):
    """extend/read/compact of the persisted model index: merged read
    equals the from-scratch model, compaction folds to one base tag and
    answers identically, and later extends fold on top."""
    import os

    from csv_2_db_pipeline_data_engineering_spark.operators.dsir import (
        _planted,
        compact_dsir_index,
        dsir_gram_stream,
        dsir_model_rows,
        extend_dsir_index,
        read_dsir_index,
    )

    b1 = _docs(spark, [(1, "src0", "alpha beta gamma delta"), (2, "src9", "epsilon zeta")])
    b2 = _docs(spark, [(3, "src1", "alpha beta theta"), (10, "src8", "iota kappa")])
    b3 = _docs(spark, [(17, "src2", "lambda mu alpha")])
    path = str(tmp_path / "dsir_index")
    extend_dsir_index(b1, path, "batch1")
    extend_dsir_index(b2, path, "batch2")

    def as_map(df):
        return {r["b"]: (r["cr"], r["ct"]) for r in df.collect()}

    def scratch(*batches):
        docs = batches[0]
        for b in batches[1:]:
            docs = docs.unionByName(b)
        return as_map(dsir_model_rows(dsir_gram_stream(docs, _planted())))

    pre = as_map(read_dsir_index(spark, path))
    assert pre == scratch(b1, b2)
    compact_dsir_index(spark, path)
    tags = [t for t in os.listdir(path) if t.startswith("delta=")]
    assert tags == [f"delta={lsm.read_state(path)['base']}"]
    assert as_map(read_dsir_index(spark, path)) == pre

    extend_dsir_index(b3, path, "batch3")
    assert as_map(read_dsir_index(spark, path)) == scratch(b1, b2, b3)
