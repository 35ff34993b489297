"""DSIR importance resampling: weights, frontier, and needle recall."""

from __future__ import annotations

from pyspark.sql import functions as F

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
