"""End-to-end corpus curation pipeline: split exhaustiveness, chunk
arithmetic vs materialization, PII scrub-through, idempotent rerun."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.curation_pipeline import (
    run_curation_pipeline,
)
from tests.conftest import SF_DIR


def _planted_corpus(spark, tmp_path) -> str:
    """sf0.001 documents with PII planted into every third doc."""
    src = os.path.join(SF_DIR, "documents.parquet")
    p = str(tmp_path / "docs_in")
    (
        spark.read.parquet(src)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.col("text"), F.lit(" contact bob@example.com")),
            ).otherwise(F.col("text")),
        )
        .write.parquet(p)
    )
    return p


def test_curation_pipeline_contracts(spark, tmp_path):
    docs_path = _planted_corpus(spark, tmp_path)
    out = str(tmp_path / "curated")
    s = run_curation_pipeline(spark, docs_path, out)

    n_input = spark.read.parquet(docs_path).count()
    # no silent drops: every doc is kept or dropped-with-reason
    assert s.input_docs == n_input
    assert s.kept_docs + sum(s.dropped.values()) == n_input
    assert spark.read.parquet(os.path.join(out, "kept_docs")).count() == s.kept_docs
    dropped = spark.read.parquet(os.path.join(out, "dropped_docs"))
    assert dropped.count() == n_input - s.kept_docs
    assert set(r["reason"] for r in dropped.select("reason").distinct().collect()) <= {
        "exact_dup", "near_dup", "non_english", "low_quality", "low_fluency",
        "low_classifier",
    }

    # chunk arithmetic == materialized chunk count; tiling is exact
    chunks = spark.read.parquet(os.path.join(out, "chunks"))
    assert chunks.count() == s.n_chunks
    agg = chunks.groupBy("doc_id").agg(
        F.sum("n_tok_chunk").alias("tok_sum"), F.max("chunk_idx").alias("max_idx")
    )
    kept = spark.read.parquet(os.path.join(out, "kept_docs"))
    joined = kept.join(agg, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["tok_sum"] >= r["n_tok"]  # overlap means >= doc length

    # PII was counted and nothing raw leaks into any output text
    assert s.pii_redactions > 0
    assert kept.filter(F.col("text").contains("@example.com")).count() == 0
    assert chunks.filter(F.col("text").contains("@example.com")).count() == 0
    planted_kept = kept.filter(F.col("doc_id") % 3 == 0)
    if planted_kept.count():
        assert (
            planted_kept.filter(F.col("text").contains("<EMAIL>")).count()
            == planted_kept.count()
        )

    # manifest mirrors the summary
    with open(os.path.join(out, "manifest.json"), encoding="utf-8") as fh:
        m = json.load(fh)
    assert m["input_docs"] == s.input_docs
    assert m["kept_docs"] == s.kept_docs
    assert m["n_chunks"] == s.n_chunks


def test_curation_pipeline_rerun_is_idempotent(spark, tmp_path):
    docs_path = _planted_corpus(spark, tmp_path)
    out = str(tmp_path / "curated")
    s1 = run_curation_pipeline(spark, docs_path, out)
    kept1 = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(os.path.join(out, "kept_docs")).collect()
    )
    s2 = run_curation_pipeline(spark, docs_path, out)
    kept2 = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(os.path.join(out, "kept_docs")).collect()
    )
    assert (s1.input_docs, s1.kept_docs, s1.dropped, s1.n_chunks) == (
        s2.input_docs, s2.kept_docs, s2.dropped, s2.n_chunks,
    )
    assert kept1 == kept2


def test_fluency_gate_drops_token_salad(spark, tmp_path):
    """A gibberish doc (large unique vocabulary, no repeated bigrams)
    must fall to the CCNet-style fluency gate — and ONLY docs far below
    the corpus-median bigram score may fall to it."""
    src = os.path.join(SF_DIR, "documents.parquet")
    base = spark.read.parquet(src).select("doc_id", "text")
    # ~300 unique tokens; every 10th is a stopword so the salad passes
    # the non_english gate and genuinely reaches the fluency gate.
    salad_tokens = [
        "the" if j % 10 == 0 else f"qq{j}gibber" for j in range(1, 301)
    ]
    salad = spark.createDataFrame(
        [(999_999, " ".join(salad_tokens))], "doc_id long, text string"
    )
    p = str(tmp_path / "docs_in")
    base.unionByName(salad).write.parquet(p)

    out = str(tmp_path / "curated")
    s = run_curation_pipeline(spark, p, out)

    dropped = spark.read.parquet(os.path.join(out, "dropped_docs"))
    salad_row = dropped.filter(F.col("doc_id") == 999_999).collect()
    assert salad_row and salad_row[0]["reason"] == "low_fluency"
    assert s.dropped.get("low_fluency", 0) >= 1
    # the gate is surgical on this corpus: fluent docs all survive it
    assert s.dropped.get("low_fluency", 0) <= 1


def test_classifier_gate_drops_confident_low_quality(spark):
    """A doc the frozen quality model scores far below its floor must
    fall to low_classifier — AFTER passing every earlier gate (its
    bigrams repeat within the doc, so it clears the fluency cut)."""
    from csv_2_db_pipeline_data_engineering_spark.curation_pipeline import (
        curation_decisions,
    )

    # 10-char rare words: mean word length stays at the Gopher cap
    # (structural gate passes) while the -0.50/char logit term still
    # pulls z far below the -0.30 classifier floor
    chorus = "alphabetag deltaepsil zetaetathe"
    junk = "the " + " ".join([chorus] * 4)  # rare-word mass -> z << -0.30
    rows = [(1, junk)] + [
        (k, f"the w{k}a w{k}b w{k}c and a dog{k} cat{k} tree{k} bird{k} sun{k} moon{k}")
        for k in range(2, 6)
    ]
    out = {
        r["doc_id"]: r
        for r in curation_decisions(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["reason"] == "low_classifier"
    assert all(out[k]["keep"] for k in range(2, 6))


def test_emitted_text_gets_mojibake_repair(spark):
    """The stored-text scrub chain repairs mojibake (ftfy pass) before
    PII redaction; the decision gates still see the raw text."""
    from csv_2_db_pipeline_data_engineering_spark.curation_pipeline import (
        curation_decisions,
    )

    rows = [
        (1, "the quick fox visits a cafÃ© and mails bob@example.com daily"),
        (2, "a steady river flows through the green valley and it meets the sea"),
    ]
    out = {
        r["doc_id"]: r
        for r in curation_decisions(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    red = out[1]["text_redacted"]
    assert "cafÃ©" not in red and "café" in red  # mojibake repaired
    assert "bob@example.com" not in red and "<EMAIL>" in red  # PII still redacted
    assert out[1]["n_pii"] == 1


def test_batch_pre_clean_strips_recurring_boilerplate_lines(spark, tmp_path):
    """A line recurring across >= 4 docs of the corpus disappears from
    every kept doc; the bodies survive untouched."""
    import os

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    promo = "subscribe to our newsletter today"
    planted = base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit("\n" + promo))
        ).otherwise(F.col("text")),
    )
    p = str(tmp_path / "docs_in")
    planted.write.parquet(p)
    out = str(tmp_path / "curated")
    run_curation_pipeline(spark, p, out)
    kept = spark.read.parquet(os.path.join(out, "kept_docs"))
    assert kept.filter(F.col("text").contains(promo)).count() == 0
    # planted docs that were kept retain their original body
    survivors = kept.filter(F.col("doc_id") % 7 == 0)
    assert survivors.count() > 0
    assert survivors.filter(F.length("text") > 50).count() == survivors.count()


_FLUENT = [
    "the quick brown fox jumps over a lazy dog and it runs to the old barn "
    "of a quiet farm in the misty morning light while it is watching birds",
    "a steady river flows through the green valley and it carries boats of "
    "traders to the busy market in the stone city where it meets the sea",
    "seven golden apples fell from the tall tree and it was a sign of "
    "the good harvest to come for the people of the small village inn",
    "nine silver boats sailed past the white cliffs and it was a fine "
    "day for the crews of the long ships to see the light of the tower",
]


def test_semantic_gate_drops_planted_embedding_twin(spark, tmp_path):
    """Two lexically unrelated docs whose EMBEDDINGS are near-identical:
    the higher doc_id must fall to the SemDeDup gate with reason
    semantic_dup; without an embeddings table the gate is off and both
    survive."""
    rows = list(enumerate(_FLUENT, start=1))
    docs_p = str(tmp_path / "docs_in")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(docs_p)
    # doc 3's embedding matches doc 1's within the SemDeDup quantizer
    # (a re-encoded copy); the others are mutually near-orthogonal.
    # With n docs <= SEM_K every vector seeds its own cluster, so only
    # a quantizer-exact twin ties into its source's cluster — larger
    # corpora (the registered dedup_semantic_kmeans query) exercise the
    # near-but-not-equal case.
    vecs = {
        1: [1.0, 0.0, 0.0, 0.0, 0.1, 0.0, 0.0, 0.2],
        2: [0.0, 1.0, 0.0, 0.0, 0.0, 0.3, 0.0, 0.0],
        3: [1.0001, 0.0, 0.0, 0.0, 0.1, 0.0, 0.0, 0.2001],
        4: [0.0, 0.0, 1.0, 0.2, 0.0, 0.0, 0.4, 0.0],
    }
    emb_p = str(tmp_path / "emb_in")
    spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "vec_id long, embedding array<float>"
    ).write.parquet(emb_p)

    out = str(tmp_path / "curated_sem")
    s = run_curation_pipeline(spark, docs_p, out, embeddings_path=emb_p)
    dropped = {
        r["doc_id"]: r["reason"]
        for r in spark.read.parquet(os.path.join(out, "dropped_docs")).collect()
    }
    assert dropped == {3: "semantic_dup"}
    assert s.dropped == {"semantic_dup": 1}
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "kept_docs")).collect()
    }
    assert kept == {1, 2, 4}

    # gate off without embeddings: everything survives
    out2 = str(tmp_path / "curated_nosem")
    s2 = run_curation_pipeline(spark, docs_p, out2)
    assert s2.kept_docs == 4 and s2.dropped == {}


def test_span_strip_removes_verbatim_boilerplate_from_kept_docs(spark, tmp_path):
    """ExactSubstr pre-chunk clean: a >=10-token verbatim phrase shared
    by two otherwise-unrelated kept docs survives only in the lowest
    doc_id; the survivor text matches strip_verbatim_spans' md5
    contract and the chunks are built from the stripped text."""
    import hashlib

    from csv_2_db_pipeline_data_engineering_spark.operators.spans import (
        strip_verbatim_spans,
    )

    phrase = (
        "please read the full terms of the service before you use this site"
    )
    rows = [
        (1, _FLUENT[0] + " " + phrase),
        (2, _FLUENT[1] + " " + phrase),
        (3, _FLUENT[2]),
        (4, _FLUENT[3]),
    ]
    docs_p = str(tmp_path / "docs_in")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(docs_p)
    out = str(tmp_path / "curated")
    s = run_curation_pipeline(spark, docs_p, out)
    assert s.kept_docs == 4  # the shared span alone is not a near-dup

    kept = {
        r["doc_id"]: r
        for r in spark.read.parquet(os.path.join(out, "kept_docs")).collect()
    }
    assert phrase in kept[1]["text"]  # lowest occurrence survives intact
    assert phrase not in kept[2]["text"]  # victim loses exactly the span
    assert kept[2]["text"] == _FLUENT[1]
    assert kept[2]["n_tok"] == len(_FLUENT[1].split(" "))

    # md5-verified survivor contract: the pipeline's kept text is the
    # exact string strip_verbatim_spans fingerprints
    pre_strip = spark.createDataFrame(
        [(d, r) for d, r in ((1, rows[0][1]), (2, rows[1][1]), (3, rows[2][1]), (4, rows[3][1]))],
        "doc_id long, text string",
    )
    md5s = {
        r["doc_id"]: r["clean_md5"]
        for r in strip_verbatim_spans(pre_strip).collect()
    }
    for d in (1, 2, 3, 4):
        assert hashlib.md5(kept[d]["text"].encode()).hexdigest() == md5s[d]

    # chunks come from the stripped text
    chunks = spark.read.parquet(os.path.join(out, "chunks"))
    assert chunks.filter(
        (F.col("doc_id") == 2) & F.col("text").contains("terms of the service")
    ).count() == 0


def test_fully_stripped_doc_ships_zero_tokens_and_no_chunks(spark, tmp_path):
    """A kept doc whose ENTIRE text is a stripped verbatim span must
    report n_tok = 0 (F.split('', ' ') would claim 1 phantom token)
    and ship NO training chunks — empty chunks are corpus poison."""
    phrase = (
        "please read the full terms of the service before you use this site "
        "and then sign the short form at the desk"
    )
    rows = [
        # span keeper (lowest doc_id); long enough that doc 2's capped
        # Jaccard vs it stays below the near-dup threshold
        (1, _FLUENT[0] + " " + _FLUENT[1] + " " + phrase),
        (2, phrase),                     # entire text is the span
        (3, _FLUENT[1]),
        (4, _FLUENT[2]),
        (5, _FLUENT[3]),
    ]
    docs_p = str(tmp_path / "docs_in")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(docs_p)
    out = str(tmp_path / "curated")
    s = run_curation_pipeline(spark, docs_p, out)

    kept = {
        r["doc_id"]: r
        for r in spark.read.parquet(os.path.join(out, "kept_docs")).collect()
    }
    assert 2 in kept, "doc 2 must survive the gates and reach the span strip"
    assert kept[2]["text"] == ""
    assert kept[2]["n_tok"] == 0
    chunks = spark.read.parquet(os.path.join(out, "chunks"))
    assert chunks.filter(F.col("doc_id") == 2).count() == 0
    # token accounting: no doc contributes phantom tokens
    assert all(r["n_tok"] == len(r["text"].split(" ")) for r in kept.values() if r["n_tok"] > 0)


def test_gopher_gate_drops_structural_spam(spark, tmp_path):
    """A bullet-spam doc (every line '- ...') passes the dedup /
    language / TTR gates but falls to the structural Gopher gate; the
    single-line soup corpus is untouched by it."""
    src = os.path.join(SF_DIR, "documents.parquet")
    base = spark.read.parquet(src).select("doc_id", "text")
    # 40 bulleted lines, distinct content words + stopwords: TTR 0.51,
    # stop ratio 0.25, unique text -> reaches the gopher gate, where
    # the 100% bullet-line fraction fails the structural rule set.
    lines = [f"- the w{i} brown fox{i}" for i in range(40)]
    spam = spark.createDataFrame(
        [(999_998, "\n".join(lines))], "doc_id long, text string"
    )
    p = str(tmp_path / "docs_in")
    base.unionByName(spam).write.parquet(p)

    out = str(tmp_path / "curated")
    s = run_curation_pipeline(spark, p, out)

    dropped = spark.read.parquet(os.path.join(out, "dropped_docs"))
    row = dropped.filter(F.col("doc_id") == 999_998).collect()
    assert row and row[0]["reason"] == "gopher_quality"
    # surgical: only the planted doc falls to it
    assert s.dropped.get("gopher_quality", 0) == 1
