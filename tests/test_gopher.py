"""Gopher-rules quality gate: per-rule semantics on constructed docs."""

from __future__ import annotations

from csv_2_db_pipeline_data_engineering_spark.operators.gopher import (
    RULE_ORDER,
    gopher_rule_frame,
    text_gopher_gate,
)
from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


GOOD = "the report is ready and we have reviewed it with care " * 6  # 66 words


def test_clean_document_passes_every_rule(spark):
    row = gopher_rule_frame(_docs(spark, [(1, GOOD.strip())])).first()
    assert row["keep"] is True
    assert row["n_failed"] == 0
    assert row["first_fail"] == "none"
    for r in RULE_ORDER:
        assert row[r] is True, r


def test_each_rule_fails_on_its_witness(spark):
    cases = {
        # 5 words -> word-count floor
        1: ("tiny doc under the floor", "r_word_count"),
        # mean word length < 3
        2: (" ".join(["a"] * 60) + " the of", "r_mean_word_len"),
        # 12 hashes over 66 words -> symbol ratio > 0.1
        3: (GOOD.strip() + " # # # # # # # # # # # #", "r_symbol_ratio"),
        # every line bulleted -> > 90%
        4: ("\n".join("- " + w for w in GOOD.split()), "r_bullet_lines"),
        # every line ends with ellipsis -> > 30%
        5: ("\n".join(w + "..." for w in GOOD.split()[:55]), "r_ellipsis_lines"),
        # 30 numeric tokens over 66 alpha -> alpha frac < 0.8
        6: (GOOD.strip() + " " + " ".join(str(i) for i in range(30)),
            "r_alpha_words"),
        # no required stopwords at all
        7: (" ".join(["word"] * 60), "r_stopwords"),
        # one line repeated four times -> dup-line frac 0.75
        8: ("\n".join([GOOD.strip()[:40]] * 4), "r_dup_lines"),
    }
    df = gopher_rule_frame(_docs(spark, [(k, t) for k, (t, _) in cases.items()]))
    got = {r["doc_id"]: r for r in df.collect()}
    for doc_id, (_, rule) in cases.items():
        assert got[doc_id][rule] is False, (doc_id, rule)
        assert got[doc_id]["keep"] is False
        assert got[doc_id]["n_failed"] >= 1


def test_first_fail_respects_rule_order(spark):
    # fails word count AND stopwords; word count is first in RULE_ORDER
    row = gopher_rule_frame(_docs(spark, [(1, "just five words right here")])).first()
    assert row["first_fail"] == "r_word_count"
    assert row["n_failed"] == 2


def test_dup_line_char_fraction_uses_char_weights(spark):
    # 3 distinct short lines + 1 long line repeated: dup-line frac is
    # 1/5 (passes <=0.3) but dup CHARS are 80/(3*4+160) (fails <=0.2)
    long = "x" * 80
    text = "\n".join(["aaaa", "bbbb", "cccc", long, long])
    row = gopher_rule_frame(_docs(spark, [(1, text)])).first()
    assert row["r_dup_lines"] is True
    assert row["r_dup_line_chars"] is False


def test_gate_over_corpus_discriminates_by_residue(spark):
    got = {
        r["doc_id"] % 13: r
        for r in text_gopher_gate(spark, SF_DIR).limit(200).collect()
    }
    # the stopword-injection residue is the only one that can keep
    assert got[6]["r_stopwords"] is True
    assert got[1]["r_word_count"] is False
    assert got[2]["r_symbol_ratio"] is False
    assert got[3]["r_bullet_lines"] is False
    assert got[4]["r_ellipsis_lines"] is False
    assert got[5]["r_alpha_words"] is False
    assert got[7]["r_dup_lines"] is False


def test_structural_fail_agrees_with_rule_frame(spark):
    """The pipeline's spliceable expression and the registered frame
    compute the same structural verdict on tricky shapes."""
    from csv_2_db_pipeline_data_engineering_spark.operators.gopher import (
        STRUCTURAL_RULES,
        structural_fail,
    )
    from pyspark.sql import functions as F

    texts = [
        GOOD.strip(),
        "",
        "x",
        "- only one bullet line",
        "\n".join(["- a"] * 10),
        "\n".join(["line one", "line one", "other"]),
        "a " * 30 + "b",
        "#" * 20 + " word",
        "w..." * 5,
        "tail...\nmid...\nplain line\nplain other",
        "word " + "0 1 2 3 4 5 6 7 8 9 " * 3 + "end",
        "\n".join([("y" * 70), "aa", "bb", ("y" * 70)]),
        "supercalifragilistic expialidocious antidisestablishmentarian",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    frame = gopher_rule_frame(docs)
    ok_all = None
    for r in STRUCTURAL_RULES:
        ok_all = F.col(r) if ok_all is None else (ok_all & F.col(r))
    got = (
        frame.select("doc_id", (~ok_all).alias("frame_fail"))
        .join(docs.select("doc_id", structural_fail(F.col("text")).alias("expr_fail")), "doc_id")
        .collect()
    )
    assert got
    for row in got:
        assert row["frame_fail"] == row["expr_fail"], row["doc_id"]


# --- property-based agreement with a Python reference model ---------------

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.from_regex(r"[a-z]{1,12}", fullmatch=True)
_weird = st.sampled_from(["##", "#####", "w...", "...", "a", "zz" * 9])
_token = st.one_of(_word, _word, _weird)
_line_pool = st.lists(_token, min_size=1, max_size=8).map(" ".join)


def _decorate(line: str, bullet: bool, ell: bool) -> str:
    if bullet:
        line = "- " + line
    if ell:
        line = line + "..."
    return line


_line = st.tuples(_line_pool, st.booleans(), st.booleans()).map(
    lambda t: _decorate(*t)
)
# sample WITH replacement from a small pool so duplicate lines occur
_doc = st.lists(_line, min_size=1, max_size=4).flatmap(
    lambda pool: st.lists(
        st.sampled_from(pool), min_size=1, max_size=6
    ).map("\n".join)
)


def _py_structural_fail(text: str) -> bool:
    """Readable Python reference of the structural Gopher verdict."""
    words = text.replace("\n", " ").split(" ")
    lines = text.split("\n")
    n_words, n_lines = len(words), len(lines)
    word_chars = sum(len(w) for w in words)
    n_hash = text.count("#")
    n_ellipsis = text.count("...")
    n_alpha = sum(1 for w in words if re.search("[a-zA-Z]", w))
    n_bullet = sum(1 for l in lines if l.startswith("- "))
    n_ell_lines = sum(1 for l in lines if l.endswith("..."))
    line_chars = sum(len(l) for l in lines)
    distinct_chars = sum(len(l) for l in set(lines))
    n_distinct = len(set(lines))
    ok = (
        word_chars >= 3 * n_words
        and word_chars <= 10 * n_words
        and (n_hash + n_ellipsis) * 10 <= n_words
        and n_bullet * 10 <= 9 * n_lines
        and n_ell_lines * 10 <= 3 * n_lines
        and n_alpha * 5 >= 4 * n_words
        and (n_lines - n_distinct) * 10 <= 3 * n_lines
        and (line_chars - distinct_chars) * 5 <= line_chars
    )
    return not ok


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(docs=st.lists(_doc, min_size=1, max_size=10))
def test_structural_fail_matches_python_reference(spark, docs):
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.gopher import (
        structural_fail,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["fail"]
        for r in df.select(
            "doc_id", structural_fail(F.col("text")).alias("fail")
        ).collect()
    }
    for i, t in enumerate(docs):
        assert got[i] == _py_structural_fail(t), repr(t)
