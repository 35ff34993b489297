"""Boilerplate-removal + quality-classifier operators (operators/boilerplate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.operators import lsm
from csv_2_db_pipeline_data_engineering_spark.operators.boilerplate import (
    STOPWORDS,
    _round4_exact,
    text_intradoc_dedup,
    text_line_dedup,
    text_quality_logit,
)
from tests.conftest import SF_DIR


def test_line_dedup_drops_shared_lines_keeps_one_occurrence(spark):
    rows = {r["doc_id"]: r for r in text_line_dedup(spark, SF_DIR).collect()}
    assert rows
    # doc 0 is the lowest doc_id, hence the canonical keeper of every
    # boilerplate line it contains: nothing of its own is ever dropped.
    assert rows[0]["n_dropped"] == 0
    # every other even doc carries the planted promo line and is not its
    # keeper -> at least one drop
    dropped_docs = [d for d, r in rows.items() if d % 2 == 0 and d > 0]
    assert dropped_docs and all(rows[d]["n_dropped"] >= 1 for d in dropped_docs)
    # the per-doc unique signature line never pushes a doc to zero lines
    assert all(r["n_dropped"] < r["n_lines"] for r in rows.values())


def test_intradoc_dedup_removes_exactly_the_planted_repeats(spark):
    rows = text_intradoc_dedup(spark, SF_DIR).collect()
    assert rows
    # the chorus is planted 1 + doc_id % 3 times -> exactly doc_id % 3
    # copies are removed, independent of the surrounding text
    for r in rows:
        assert r["n_removed"] == r["doc_id"] % 3
        assert r["n_lines"] == r["n_distinct_lines"] + r["n_removed"]


def test_quality_logit_matches_python_and_splits_corpus(spark):
    out = text_quality_logit(spark, SF_DIR)
    rows = out.collect()
    keeps = {r["keep"] for r in rows}
    assert keeps == {True, False}  # non-vacuous decision boundary
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    for r in rows[:25]:
        toks = docs[r["doc_id"]].strip().split()
        n_tok = len(toks)
        n_stop = sum(1 for t in toks if t in STOPWORDS)
        n_distinct = len(set(toks))
        n_char = len(docs[r["doc_id"]].replace(" ", ""))
        n_scaled = (
            -90 * n_tok + 2 * n_tok * n_tok + 150 * n_stop
            + 400 * n_distinct - 50 * n_char
        )
        assert r["keep"] == (n_scaled > 0)
        assert r["n_tokens"] == n_tok
        # exact 4-decimal half-away rounding of the rational logit
        q = n_scaled * 10000
        d = 100 * n_tok
        mag = (abs(q) * 2 + d) // (2 * d)
        expect = (-mag if q < 0 else mag) / 10000.0
        assert r["quality_logit"] == expect


def test_round4_exact_handles_decimal_ties(spark):
    # odd/32 terminates in ...5 at the 5th decimal: the exact tie class
    # where double round() diverges between engines. 1/32 = 0.03125
    # must round half-away to 0.0313 (and -1/32 to -0.0313).
    df = spark.range(1).select(
        _round4_exact(F.lit(1), F.lit(32)).alias("pos"),
        _round4_exact(F.lit(-1), F.lit(32)).alias("neg"),
        _round4_exact(F.lit(3), F.lit(4)).alias("plain"),
    )
    r = df.collect()[0]
    assert r["pos"] == 0.0313
    assert r["neg"] == -0.0313
    assert r["plain"] == 0.75


def _formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_quality_logit_is_shuffle_free_and_jvm_side(spark):
    plan = _formatted_plan(spark, text_quality_logit(spark, SF_DIR))
    assert "hashpartitioning" not in plan  # only the demo ORDER BY exchange
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "ArrowEvalPython" not in plan  # ... and no pandas UDF either


def test_line_dedup_plan_has_no_cartesian_or_python(spark):
    plan = _formatted_plan(spark, text_line_dedup(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_line_index_persisted_fold_matches_inplan(spark, tmp_path):
    """write -> read-back -> fold must equal the in-plan registered query."""
    from csv_2_db_pipeline_data_engineering_spark.operators.boilerplate import (
        _planted_multiline,
        incremental_line_dedup_frame,
        line_dedup_incremental,
        read_line_index,
        write_line_index,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    path = str(tmp_path / "lineidx")
    write_line_index(base, path, "base", _planted_multiline())
    got = incremental_line_dedup_frame(
        delta, read_line_index(spark, path), _planted_multiline()
    ).collect()
    want = line_dedup_incremental(spark, SF_DIR).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert any(r["n_dropped"] > 0 for r in got)


def test_line_index_extend_is_o_delta_and_feeds_later_folds(spark, tmp_path):
    """Extending writes ONLY the new delta partition (history untouched)
    and later folds see the extended lines as boilerplate."""
    import os

    from csv_2_db_pipeline_data_engineering_spark.operators.boilerplate import (
        extend_line_index,
        incremental_line_dedup_frame,
        read_line_index,
        write_line_index,
    )

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    path = str(tmp_path / "idx")
    write_line_index(docs([(1, "common line\nbase only")]), path, "base")

    def listing(tag):
        d = os.path.join(path, f"delta={tag}")
        return {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}

    base_files = listing("base")
    delta2 = docs([(3, "fresh boiler\nuniq three")])

    # before the extend, 'fresh boiler' is unknown -> doc 3 keeps it
    before = incremental_line_dedup_frame(delta2, read_line_index(spark, path)).collect()
    assert before[0]["n_dropped"] == 0

    extend_line_index(docs([(2, "fresh boiler\nuniq two")]), path, "d1")
    assert listing("base") == base_files  # history never rewritten
    after = incremental_line_dedup_frame(delta2, read_line_index(spark, path)).collect()
    assert after[0]["n_dropped"] == 1  # the extended line is now boilerplate

    # same-tag replay is idempotent: index CONTENT identical after
    # re-extend (part-file names are fresh UUIDs; rows are what counts)
    content_before = sorted(map(tuple, read_line_index(spark, path).collect()))
    extend_line_index(docs([(2, "fresh boiler\nuniq two")]), path, "d1")
    spark.catalog.refreshByPath(path)  # overwrite replaced the part files
    again = incremental_line_dedup_frame(delta2, read_line_index(spark, path)).collect()
    assert again[0]["n_dropped"] == 1
    assert sorted(map(tuple, read_line_index(spark, path).collect())) == content_before


def test_line_index_compaction_preserves_fold_semantics(spark, tmp_path):
    """Compacting many delta tags into one must not change any fold
    result: totals and keepers merge exactly (SUM / MIN partials)."""
    import os

    from csv_2_db_pipeline_data_engineering_spark.operators.boilerplate import (
        compact_line_index,
        extend_line_index,
        incremental_line_dedup_frame,
        read_line_index,
        write_line_index,
    )

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    path = str(tmp_path / "idx")
    write_line_index(docs([(1, "shared line\none only")]), path, "base")
    extend_line_index(docs([(2, "shared line\ntwo only")]), path, "d1")
    extend_line_index(docs([(3, "fresh thing\nthree only")]), path, "d2")

    probe = docs([(9, "shared line\nfresh thing\nnine only")])
    before = incremental_line_dedup_frame(probe, read_line_index(spark, path)).collect()

    compact_line_index(spark, path)
    tags = [t for t in os.listdir(path) if t.startswith("delta=")]
    assert tags == [f"delta={lsm.read_state(path)['base']}"]  # one merged base left
    after = incremental_line_dedup_frame(probe, read_line_index(spark, path)).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in before]
    # merged totals are exact: 'shared line' seen in 2 docs, keeper 1
    idx = {
        r["line_md5"]: r for r in read_line_index(spark, path).collect()
    }
    import hashlib
    key = hashlib.md5(b"shared line").hexdigest()
    assert idx[key]["n_docs"] == 2 and idx[key]["keeper"] == 1


def test_canonicalize_url_rules(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.boilerplate import (
        canonicalize_url,
    )

    rows = [
        (1, "HTTP://Site3.Example:80/page/8?utm_source=feed/"),
        (2, "http://site3.example/page/8"),
        (3, "http://a.example/x?ref=promo&utm_medium=mail&q=keep"),
        (4, "http://a.example/x?q=keep"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r["id"]: r["c"] for r in df.select("id", canonicalize_url(F.col("url")).alias("c")).collect()}
    assert got[1] == got[2] == "http://site3.example/page/8"
    assert got[3] == got[4] == "http://a.example/x?q=keep"


def test_url_dedup_collapses_groups_and_blocks_domains(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.boilerplate import (
        url_canonical_dedup,
    )

    rows = url_canonical_dedup(spark, SF_DIR).collect()
    assert rows
    # every canonical page collapses its 3 noisy variants to one fetch
    assert all(r["n_collapsed"] == 3 for r in rows)
    assert all("spam.example" not in r["curl"] for r in rows)
    assert all(r["keeper"] % 4 == 0 for r in rows)  # group minimum kept
