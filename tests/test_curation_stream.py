"""Streaming continuous curation: cross-batch dedup via the persisted
index, exactly-once replay, and end-to-end stream drain."""

from __future__ import annotations

import hashlib
from pathlib import Path

from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.operators import lsm
from csv_2_db_pipeline_data_engineering_spark.streaming.curation_stream import (
    DOC_SCHEMA,
    fold_curation_batch,
    read_curated,
    run_curation_stream,
)

# Stopword-dense, varied text that passes every content gate.
_BASE = (
    "the quick brown fox jumps over a lazy dog and it runs to the old barn "
    "of a quiet farm in the misty morning light while it is watching birds"
)
_VARIANT = _BASE.replace("misty morning", "foggy evening")  # near-dup of _BASE
_OTHER = (
    "a steady river flows through the green valley and it carries boats of "
    "traders to the busy market in the stone city where it meets the sea"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _digests(root: str) -> dict[str, str]:
    out = {}
    for p in sorted(Path(root).rglob("*.parquet")):
        out[str(p.relative_to(root))] = hashlib.sha256(p.read_bytes()).hexdigest()
    return out


def test_cross_batch_dedup_via_index(spark, tmp_path):
    out = str(tmp_path / "curated")
    fold_curation_batch(spark, _docs(spark, [(1, _BASE), (2, _OTHER)]), out, 0)
    kept0 = {r["doc_id"] for r in read_curated(spark, out, "kept").collect()}
    assert kept0 == {1, 2}

    # batch 1: exact copy of doc 1, near-dup of doc 1, and a fresh doc
    fresh = (
        "seven golden apples fell from the tall tree and it was a sign of "
        "the good harvest to come for the people of the small village inn"
    )
    fold_curation_batch(
        spark,
        _docs(spark, [(10, _BASE), (11, _VARIANT), (12, fresh)]),
        out,
        1,
    )
    dropped = {
        r["doc_id"]: r["reason"]
        for r in read_curated(spark, out, "dropped").collect()
    }
    assert dropped[10] == "exact_dup"  # caught by the index fingerprint
    assert dropped[11] == "near_dup"  # caught by the signature index
    kept = {r["doc_id"] for r in read_curated(spark, out, "kept").collect()}
    assert kept == {1, 2, 12}
    # the index grew by exactly the newly kept doc
    idx = read_curated(spark, out, "index")
    assert {r["doc_id"] for r in idx.collect()} == {1, 2, 12}


def test_replayed_batch_is_noop(spark, tmp_path):
    out = str(tmp_path / "curated")
    b0 = _docs(spark, [(1, _BASE), (2, _OTHER)])
    fold_curation_batch(spark, b0, out, 0)
    before = _digests(out)
    fold_curation_batch(spark, b0, out, 0)  # crash-replay of committed batch
    assert _digests(out) == before


def test_short_doc_fingerprint_still_guards(spark, tmp_path):
    out = str(tmp_path / "curated")
    # "for the": stopword-dense (passes the language gate), all distinct
    # (passes TTR), mean word length exactly 3 (passes the structural
    # Gopher floor — "of the" would fail it at 5 chars / 2 words), but
    # with 2 words it cannot form a 3-word shingle -> a KEPT doc with
    # NO MinHash signature. Its index row must be fingerprint-only
    # (m0 null) and must still block a later exact copy via the
    # left-join path in fold_curation_batch.
    short = "for the"
    fold_curation_batch(spark, _docs(spark, [(1, short), (2, _BASE)]), out, 0)
    kept = {r["doc_id"] for r in read_curated(spark, out, "kept").collect()}
    assert kept == {1, 2}, "the short stopword-dense doc must pass every gate"
    idx = {r["doc_id"]: r for r in read_curated(spark, out, "index").collect()}
    assert idx[1]["m0"] is None, "short doc's index row must be fingerprint-only"
    assert idx[2]["m0"] is not None

    # batch 1: an exact copy of the signature-less doc, a fresh doc, and
    # another unshingleable doc (exercises the m0-null filter on the
    # banded join side at the same time)
    fold_curation_batch(
        spark, _docs(spark, [(5, short), (6, _OTHER), (7, "was the")]), out, 1
    )
    dropped = {
        r["doc_id"]: r["reason"] for r in read_curated(spark, out, "dropped").collect()
    }
    assert dropped.get(5) == "exact_dup", (
        "fingerprint-only index row must block an exact copy of a "
        "signature-less kept doc"
    )
    kept = {r["doc_id"] for r in read_curated(spark, out, "kept").collect()}
    assert 6 in kept


def test_stream_end_to_end(spark, tmp_path):
    landing = tmp_path / "landing"
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    _docs(spark, [(1, _BASE), (2, _OTHER)]).write.parquet(str(landing / "f1"))
    _docs(spark, [(10, _BASE), (12, _VARIANT)]).write.parquet(str(landing / "f2"))

    q = run_curation_stream(spark, str(landing), out, ckpt)
    q.awaitTermination(300)

    kept = read_curated(spark, out, "kept")
    dropped = read_curated(spark, out, "dropped")
    chunks = read_curated(spark, out, "chunks")
    assert kept is not None and dropped is not None and chunks is not None
    seen = {r["doc_id"] for r in kept.collect()} | {
        r["doc_id"] for r in dropped.collect()
    }
    assert seen == {1, 2, 10, 12}
    # maxFilesPerTrigger=1 => f1 then f2: the f2 copies lose to f1's docs
    assert {r["doc_id"] for r in dropped.collect()} == {10, 12}
    # chunk rows exist only for kept docs
    assert {r["doc_id"] for r in chunks.select("doc_id").distinct().collect()} <= {
        r["doc_id"] for r in kept.collect()
    }


def test_fold_candidate_join_shuffles_only_delta(spark, tmp_path):
    """The fold's cross-index candidate path goes through the maintained
    bucketed band table: the stored side reads bucket-aligned (zero
    Exchange in its subtree), only the delta shuffles on (band, bh) —
    the same plan test_bucketing pins for the standalone operator."""
    from csv_2_db_pipeline_data_engineering_spark.streaming.curation_stream import (
        band_table_name,
        cross_index_losers,
    )

    out = str(tmp_path / "curated")
    fold_curation_batch(spark, _docs(spark, [(1, _BASE), (2, _OTHER)]), out, 0)
    tbl = band_table_name(out)
    assert spark.catalog.tableExists(tbl)  # batch 0 bootstrapped it

    old = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        index = read_curated(spark, out, "index").filter(F.col("m0").isNotNull())
        delta = _docs(spark, [(10, _VARIANT)])
        losers = cross_index_losers(spark, delta, index, out)
        plan = losers._jdf.queryExecution().executedPlan().toString()
        # exactly ONE hash exchange on the band key: the delta side
        assert plan.count("Exchange hashpartitioning(band") == 1, plan
        assert "Bucketed: true" in plan
        # and it still catches the near-dup through the table route
        assert {r["doc_id"] for r in losers.collect()} == {10}
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)

    # folding the delta extends the table by the new kept rows (O(delta)
    # append): doc 10 is dropped as near_dup, so the table is unchanged;
    # a fresh kept doc lands in it.
    fresh = (
        "seven golden apples fell from the tall tree and it was a sign of "
        "the good harvest to come for the people of the small village inn"
    )
    fold_curation_batch(spark, _docs(spark, [(10, _VARIANT), (12, fresh)]), out, 1)
    table_docs = {r["doc_id"] for r in spark.table(tbl).select("doc_id").distinct().collect()}
    assert table_docs == {1, 2, 12}


def test_boilerplate_lines_stripped_across_batches(spark, tmp_path):
    """Once the line index has seen a line in >= STREAM_LINE_DF docs,
    later arrivals lose it before gating; boilerplate-only docs drop
    with a reason instead of vanishing."""
    out = str(tmp_path / "curated")
    promo = "subscribe to our newsletter today"
    bodies = [
        "the quick brown fox jumps over a lazy dog and it runs to the barn",
        "a steady river flows through the green valley and it meets the sea",
        "seven golden apples fell from the tall tree and it was a good sign",
        "the old clock on the wall strikes nine and it wakes the sleepy cat",
    ]
    batch0 = [(i, f"{b}\n{promo}") for i, b in enumerate(bodies)]
    fold_curation_batch(spark, _docs(spark, batch0), out, 0)
    kept0 = {r["doc_id"]: r["text"] for r in read_curated(spark, out, "kept").collect()}
    # index was empty at batch 0 -> nothing stripped yet
    assert kept0 and all(promo in t for t in kept0.values())

    newbody = "a small boat sails along the coast and it carries tea to the port"
    fold_curation_batch(
        spark,
        _docs(spark, [(10, f"{newbody}\n{promo}"), (11, promo)]),
        out,
        1,
    )
    kept = {r["doc_id"]: r["text"] for r in read_curated(spark, out, "kept").collect()}
    assert 10 in kept
    assert promo not in kept[10] and newbody.split()[2] in kept[10]
    # the boilerplate-only doc survives as a row in dropped, with a reason
    dropped = {
        r["doc_id"]: r["reason"] for r in read_curated(spark, out, "dropped").collect()
    }
    assert 11 in dropped and dropped[11]


def test_band_table_appends_visible_to_cloned_sessions(spark, tmp_path):
    """Deterministic twin of the foreachBatch clone-session scenario:
    micro-batch frames carry a CLONED SparkSession, whose relation
    cache the writer-side refreshTable (outer session) does not touch.
    The fold's read path must refresh on ITS OWN session, or bucket
    files appended by earlier folds stay invisible and a cross-batch
    near-dup sails through (the intermittent e2e miss this pins)."""
    out = str(tmp_path / "curated")
    clone = spark.newSession()

    def cdocs(rows):
        return clone.createDataFrame(rows, DOC_SCHEMA)

    # batch 0 creates the band table (doc 2 only); batch 1 APPENDS
    # doc 1's bands; batch 2's near-dup of doc 1 is only caught if the
    # clone re-lists the table after the append.
    fold_curation_batch(spark, cdocs([(2, _OTHER)]), out, 0)
    fold_curation_batch(spark, cdocs([(1, _BASE)]), out, 1)
    fold_curation_batch(spark, cdocs([(12, _VARIANT)]), out, 2)
    dropped = {
        r["doc_id"]: r["reason"] for r in read_curated(spark, out, "dropped").collect()
    }
    assert dropped.get(12) == "near_dup"


def test_bloom_bit_index_maintained_per_fold(spark, tmp_path):
    out = str(tmp_path / "curated")
    fold_curation_batch(spark, _docs(spark, [(1, _BASE), (2, _OTHER)]), out, 0)
    assert (Path(out) / "bloom_index" / "delta=batch0").is_dir()

    fresh = (
        "nine silver boats sailed past the white cliffs and it was a fine "
        "day for the crews of the long ships to see the light of the tower"
    )
    # batch 1: one exact copy (must flow THROUGH the bloom screen to the
    # exact gate) and one provably-new doc (screened out, still kept)
    fold_curation_batch(spark, _docs(spark, [(10, _BASE), (13, fresh)]), out, 1)
    dropped = {
        r["doc_id"]: r["reason"]
        for r in read_curated(spark, out, "dropped").collect()
    }
    assert dropped[10] == "exact_dup"
    kept = {r["doc_id"] for r in read_curated(spark, out, "kept").collect()}
    assert 13 in kept
    assert (Path(out) / "bloom_index" / "delta=batch1").is_dir()


def test_bloom_coverage_backfilled_after_partial_index_loss(spark, tmp_path):
    """A committed batch whose bloom tag is missing (migration / partial
    deletion) must not let exact duplicates of its docs through: the
    coverage gate backfills the tag from the committed index batch, so
    the pre-screen keeps its no-false-negative contract."""
    import shutil

    out = str(tmp_path / "curated")
    fold_curation_batch(spark, _docs(spark, [(1, _BASE), (2, _OTHER)]), out, 0)
    fresh = (
        "four red kites rose over the wide field and it was a good sign "
        "for the children of the town to play by the mill in the warm sun"
    )
    fold_curation_batch(spark, _docs(spark, [(3, fresh)]), out, 1)
    # Simulate a bloom index that predates batch 0 (partial coverage:
    # batch1's tag survives, batch0's is gone).
    shutil.rmtree(Path(out) / "bloom_index" / "delta=batch0")

    # batch 2: exact copy of the batch-0 doc. Without the coverage
    # gate the screen would prune doc 1's fingerprint (its bits are
    # missing) and the copy would be silently kept.
    fold_curation_batch(spark, _docs(spark, [(20, _BASE)]), out, 2)
    dropped = {
        r["doc_id"]: r["reason"]
        for r in read_curated(spark, out, "dropped").collect()
    }
    assert dropped[20] == "exact_dup"
    # the tag was backfilled on read
    assert (Path(out) / "bloom_index" / "delta=batch0").is_dir()


def test_bloom_compaction_preserves_coverage_without_tag_rebuild(spark, tmp_path):
    """After compact_bloom_index the on-disk index is one base tag +
    marker; the coverage gate must treat compacted batches as covered
    (no per-batch tag backfill) and the exact gate must still catch
    duplicates of pre-compaction docs."""
    from csv_2_db_pipeline_data_engineering_spark.streaming.curation_stream import (
        compact_bloom_index,
    )

    out = str(tmp_path / "curated")
    fold_curation_batch(spark, _docs(spark, [(1, _BASE), (2, _OTHER)]), out, 0)
    fresh = (
        "six bright stars rose over the dark hills and it was a clear "
        "night for the folk of the valley farms to walk by the old road"
    )
    fold_curation_batch(spark, _docs(spark, [(3, fresh)]), out, 1)
    compact_bloom_index(spark, out)

    bloom = Path(out) / "bloom_index"
    tags = sorted(t.name for t in bloom.iterdir() if t.name.startswith("delta="))
    assert tags == ["delta=base"]
    assert (bloom / "_COMPACTED.json").is_dir() is False
    assert (bloom / "_COMPACTED.json").exists()

    # a post-compaction fold still catches an exact dup of a batch-0 doc
    fold_curation_batch(spark, _docs(spark, [(30, _BASE)]), out, 2)
    dropped = {
        r["doc_id"]: r["reason"]
        for r in read_curated(spark, out, "dropped").collect()
    }
    assert dropped[30] == "exact_dup"
    # the compacted batches were NOT re-backfilled as per-batch tags
    tags = sorted(t.name for t in bloom.iterdir() if t.name.startswith("delta="))
    assert tags == ["delta=base", "delta=batch2"]


def test_cross_batch_span_strip_on_kept_docs(spark, tmp_path):
    """A verbatim phrase shipped with a batch-0 kept doc is deleted
    from a later batch's kept doc (first-seen-in-history wins), while
    the rest of the later doc's text survives; the chunks are built
    from the stripped text; a replayed fold stays idempotent."""
    phrase = "please read the full terms of the service before you use this site"
    a = _BASE + " " + phrase
    b = _OTHER + " " + phrase
    out = str(tmp_path / "curated")
    fold_curation_batch(spark, _docs(spark, [(1, a)]), out, 0)
    kept0 = {r["doc_id"]: r["text"] for r in read_curated(spark, out, "kept").collect()}
    assert phrase in kept0[1]  # first occurrence ships intact

    fold_curation_batch(spark, _docs(spark, [(2, b)]), out, 1)
    kept = {r["doc_id"]: r for r in read_curated(spark, out, "kept").collect()}
    assert set(kept) == {1, 2}
    assert phrase in kept[1]["text"]
    assert phrase not in kept[2]["text"]
    assert kept[2]["text"] == _OTHER
    assert kept[2]["n_tok"] == len(_OTHER.split(" "))
    chunks = read_curated(spark, out, "chunks")
    assert chunks.filter(
        (F.col("doc_id") == 2) & F.col("text").contains("terms of the service")
    ).count() == 0

    # crash-replay of batch 1: manifest gate no-ops, outputs unchanged
    fold_curation_batch(spark, _docs(spark, [(2, b)]), out, 1)
    kept_again = {
        r["doc_id"]: r["text"] for r in read_curated(spark, out, "kept").collect()
    }
    assert kept_again == {d: r["text"] for d, r in kept.items()}


def test_span_table_rebuilds_from_committed_tags(spark, tmp_path):
    """A session whose catalog lost the bucketed shingle table (fresh
    process) must rebuild it from the committed tagged parquet and keep
    stripping cross-batch spans."""
    from csv_2_db_pipeline_data_engineering_spark.streaming.curation_stream import (
        span_table_name,
    )

    phrase = "please read the full terms of the service before you use this site"
    out = str(tmp_path / "curated")
    fold_curation_batch(spark, _docs(spark, [(1, _BASE + " " + phrase)]), out, 0)
    # simulate a fresh process: the catalog entry is gone, tags remain
    spark.sql(f"DROP TABLE IF EXISTS {span_table_name(out)}")
    import shutil

    shutil.rmtree(Path(out) / "span_table")

    fold_curation_batch(spark, _docs(spark, [(2, _OTHER + " " + phrase)]), out, 1)
    kept = {r["doc_id"]: r["text"] for r in read_curated(spark, out, "kept").collect()}
    assert phrase in kept[1] and phrase not in kept[2]


def test_batch_zero_strips_intra_batch_spans(spark, tmp_path):
    """Victim policy must be consistent across batches: a verbatim
    phrase repeated WITHIN the very first batch (no committed index
    yet) gets the same intra-batch ExactSubstr treatment later batches
    apply via the delta self-join — lowest doc_id keeps, the other
    batch-0 doc loses exactly the span."""
    phrase = "please read the full terms of the service before you use this site"
    out = str(tmp_path / "curated")
    fold_curation_batch(
        spark, _docs(spark, [(1, _BASE + " " + phrase), (2, _OTHER + " " + phrase)]), out, 0
    )
    kept = {r["doc_id"]: r for r in read_curated(spark, out, "kept").collect()}
    assert set(kept) == {1, 2}
    assert phrase in kept[1]["text"]
    assert phrase not in kept[2]["text"]
    assert kept[2]["text"] == _OTHER
    assert kept[2]["n_tok"] == len(_OTHER.split(" "))


def test_streaming_semantic_gate_drops_embedding_twin_across_batches(spark, tmp_path):
    """Incremental SemDeDup: an arrival whose EMBEDDING nearly equals a
    committed kept doc's embedding drops as semantic_dup even though
    its TEXT shares nothing with the history doc (the batch pipeline's
    gate, made incremental via the persisted embedding index); an
    unrelated-embedding arrival in the same batch is kept, and a
    replayed fold stays idempotent."""
    emb_schema = "doc_id long, text string, embedding array<double>"
    dim = 8
    e1 = [1.0] + [0.0] * (dim - 1)
    e2 = [0.0, 1.0] + [0.0] * (dim - 2)
    twin = [1.0, 0.05] + [0.0] * (dim - 2)  # cosine(e1, twin) ~ 0.9988
    e3 = [0.0, 0.0, 1.0] + [0.0] * (dim - 3)
    fresh = (
        "twelve bright lanterns hung above the narrow street and it was a "
        "warm night for the people of the town to walk by the calm water"
    )
    later = (
        "five old wagons rolled along the dusty road and it was a long "
        "journey for the traders to reach the far hills before the rain"
    )

    out = str(tmp_path / "curated")
    b0 = spark.createDataFrame(
        [(1, _BASE, e1), (2, _OTHER, e2)], emb_schema
    )
    fold_curation_batch(spark, b0, out, 0)
    assert {r["doc_id"] for r in read_curated(spark, out, "kept").collect()} == {1, 2}

    b1 = spark.createDataFrame(
        [(10, fresh, twin), (12, later, e3)], emb_schema
    )
    fold_curation_batch(spark, b1, out, 1)
    kept = {r["doc_id"] for r in read_curated(spark, out, "kept").collect()}
    dropped = {
        r["doc_id"]: r["reason"]
        for r in read_curated(spark, out, "dropped").collect()
    }
    assert kept == {1, 2, 12}
    assert dropped[10] == "semantic_dup"

    # replay of committed batch 1: manifest gate no-ops
    fold_curation_batch(spark, b1, out, 1)
    assert {r["doc_id"] for r in read_curated(spark, out, "kept").collect()} == kept


def test_streaming_semantic_gate_within_batch_and_embeddingless_path(spark, tmp_path):
    """Within-batch embedding twins collapse to the lowest doc_id in
    the very first fold, and a schema WITHOUT an embedding column keeps
    flowing through the unchanged path (gate disabled)."""
    emb_schema = "doc_id long, text string, embedding array<double>"
    dim = 8
    e1 = [1.0] + [0.0] * (dim - 1)
    twin = [1.0, 0.05] + [0.0] * (dim - 2)
    out = str(tmp_path / "curated")
    b0 = spark.createDataFrame(
        [(1, _BASE, e1), (2, _OTHER, twin)], emb_schema
    )
    fold_curation_batch(spark, b0, out, 0)
    kept = {r["doc_id"] for r in read_curated(spark, out, "kept").collect()}
    dropped = {
        r["doc_id"]: r["reason"]
        for r in read_curated(spark, out, "dropped").collect()
    }
    assert kept == {1}
    assert dropped[2] == "semantic_dup"

    out2 = str(tmp_path / "curated2")
    fold_curation_batch(spark, _docs(spark, [(1, _BASE), (2, _OTHER)]), out2, 0)
    assert {r["doc_id"] for r in read_curated(spark, out2, "kept").collect()} == {1, 2}


def test_stream_span_and_emb_compaction_preserve_fold_semantics(spark, tmp_path):
    """Fold-compact-refold for the stream's span + embedding indexes:
    after compacting committed tags into one base partition (with
    coverage recorded), a later fold still strips history spans and
    drops embedding twins exactly as an uncompacted twin run does."""
    import os

    from csv_2_db_pipeline_data_engineering_spark.streaming.curation_stream import (
        EMB_INDEX_DIR,
        SPAN_INDEX_DIR,
        compact_emb_index_stream,
        compact_span_index_stream,
    )

    emb_schema = "doc_id long, text string, embedding array<double>"
    dim = 8
    e1 = [1.0] + [0.0] * (dim - 1)
    e2 = [0.0, 1.0] + [0.0] * (dim - 2)
    twin = [1.0, 0.05] + [0.0] * (dim - 2)
    e3 = [0.0, 0.0, 1.0] + [0.0] * (dim - 3)
    e4 = [0.0, 0.0, 0.0, 1.0] + [0.0] * (dim - 4)
    phrase = "please read the full terms of the service before you use this site"
    fresh = (
        "twelve bright lanterns hung above the narrow street and it was a "
        "warm night for the people of the town to walk by the calm water"
    )
    later = (
        "five old wagons rolled along the dusty road and it was a long "
        "journey for the traders to reach the far hills before the rain"
    )
    b0 = [(1, _BASE + " " + phrase, e1)]
    b1 = [(2, _OTHER, e2)]
    b2 = [(10, fresh, twin), (12, later + " " + phrase, e4)]

    def run(out, compact):
        fold_curation_batch(spark, spark.createDataFrame(b0, emb_schema), out, 0)
        fold_curation_batch(spark, spark.createDataFrame(b1, emb_schema), out, 1)
        if compact:
            compact_span_index_stream(spark, out)
            compact_emb_index_stream(spark, out)
            for idx, sub in ((SPAN_INDEX_DIR, "shingles"), (EMB_INDEX_DIR, "buckets")):
                tags = [
                    t
                    for t in os.listdir(os.path.join(out, idx, sub))
                    if t.startswith("delta=")
                ]
                assert tags == [
                    f"delta={lsm.read_state(os.path.join(out, idx))['base']}"
                ], (idx, tags)
        fold_curation_batch(spark, spark.createDataFrame(b2, emb_schema), out, 2)
        kept = {
            r["doc_id"]: (r["text"], r["n_tok"])
            for r in read_curated(spark, out, "kept").collect()
        }
        dropped = {
            r["doc_id"]: r["reason"]
            for r in read_curated(spark, out, "dropped").collect()
        }
        return kept, dropped

    plain = run(str(tmp_path / "plain"), compact=False)
    compacted = run(str(tmp_path / "compacted"), compact=True)
    assert compacted == plain
    kept, dropped = compacted
    assert dropped[10] == "semantic_dup"  # twin caught through compacted emb index
    assert phrase not in kept[12][0]  # span stripped through compacted span index
    assert kept[12][0] == later


def test_emb_cross_history_join_probes_bucketed_table(spark, tmp_path):
    """The semantic gate's cross-history candidate join goes through
    the maintained bucketed embedding table: the stored side reads
    bucket-aligned (no Exchange in its subtree), only the batch's
    bucket rows shuffle on (t, bucket) — the band/span-table discipline
    applied to the embedding index."""
    from csv_2_db_pipeline_data_engineering_spark.operators.semantic import (
        semantic_cross_losers,
    )
    from csv_2_db_pipeline_data_engineering_spark.streaming.curation_stream import (
        _emb_index_committed,
        emb_table_name,
    )

    emb_schema = "doc_id long, text string, embedding array<double>"
    dim = 8
    e1 = [1.0] + [0.0] * (dim - 1)
    twin = [1.0, 0.05] + [0.0] * (dim - 2)
    out = str(tmp_path / "curated")
    fold_curation_batch(
        spark, spark.createDataFrame([(1, _BASE, e1)], emb_schema), out, 0
    )
    tbl = emb_table_name(out)
    assert spark.catalog.tableExists(tbl)  # batch 0 bootstrapped it

    old = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        _hb, hist_vecs = _emb_index_committed(spark, out, 1)
        probe = spark.createDataFrame(
            [(10, twin)], "vec_id long, embedding array<double>"
        )
        losers = semantic_cross_losers(probe, spark.table(tbl), hist_vecs)
        plan = losers._jdf.queryExecution().executedPlan().toString()
        # exactly ONE hash exchange on the (t, bucket) key: the batch side
        assert plan.count("Exchange hashpartitioning(t") == 1, plan
        assert "Bucketed: true" in plan
        assert {r["doc_id"] for r in losers.collect()} == {10}
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_emb_table_rebuilds_from_committed_tags(spark, tmp_path):
    """A session whose catalog lost the bucketed embedding table (fresh
    process) must rebuild it from the committed tagged parquet and keep
    dropping cross-batch embedding twins."""
    import shutil

    from csv_2_db_pipeline_data_engineering_spark.streaming.curation_stream import (
        emb_table_name,
    )

    emb_schema = "doc_id long, text string, embedding array<double>"
    dim = 8
    e1 = [1.0] + [0.0] * (dim - 1)
    twin = [1.0, 0.05] + [0.0] * (dim - 2)
    fresh = (
        "twelve bright lanterns hung above the narrow street and it was a "
        "warm night for the people of the town to walk by the calm water"
    )
    out = str(tmp_path / "curated")
    fold_curation_batch(
        spark, spark.createDataFrame([(1, _BASE, e1)], emb_schema), out, 0
    )
    # simulate a fresh process: the catalog entry is gone, tags remain
    spark.sql(f"DROP TABLE IF EXISTS {emb_table_name(out)}")
    shutil.rmtree(Path(out) / "emb_table")

    fold_curation_batch(
        spark, spark.createDataFrame([(10, fresh, twin)], emb_schema), out, 1
    )
    dropped = {
        r["doc_id"]: r["reason"]
        for r in read_curated(spark, out, "dropped").collect()
    }
    assert dropped[10] == "semantic_dup"


def test_streaming_gopher_gate_drops_structural_spam(spark, tmp_path):
    """Batch/stream parity for the structural Gopher gate: a bullet-spam
    doc arriving in a stream fold is dropped with reason gopher_quality
    (the gate lives in the shared curation_decisions, so the streaming
    fold applies it with no stream-specific code)."""
    out = str(tmp_path / "curated")
    spam = "\n".join(f"- the w{i} brown fox{i}" for i in range(40))
    fold_curation_batch(
        spark, _docs(spark, [(1, _BASE), (2, spam)]), out, 0
    )
    dropped = {
        r["doc_id"]: r["reason"]
        for r in read_curated(spark, out, "dropped").collect()
    }
    kept = {r["doc_id"] for r in read_curated(spark, out, "kept").collect()}
    assert dropped.get(2) == "gopher_quality"
    assert kept == {1}


def test_streaming_epoch_schedule_refreshes_from_stored_scalars(spark, tmp_path):
    """Source-bearing batches extend the epoch index with their SHIPPED
    kept docs' token scalars; the refresh equals a from-scratch
    schedule over the same kept rows, updates when a later batch
    arrives, and survives compaction — kept text never re-read."""
    from csv_2_db_pipeline_data_engineering_spark.operators.curation import (
        epoch_schedule_from_rows,
    )
    from csv_2_db_pipeline_data_engineering_spark.streaming.curation_stream import (
        DOC_SRC_SCHEMA,
        compact_epoch_index_stream,
        epoch_schedule_from_stream,
    )

    out = str(tmp_path / "curated")
    fresh = (
        "seven golden apples fell from the tall tree and it was a sign of "
        "the good harvest to come for the people of the small village inn"
    )

    def src_docs(rows):
        return spark.createDataFrame(rows, DOC_SRC_SCHEMA)

    fold_curation_batch(
        spark, src_docs([(1, _BASE, "src1"), (2, _OTHER, "src2")]), out, 0
    )
    sched0 = epoch_schedule_from_stream(spark, out).collect()
    assert {r["doc_id"] for r in sched0} == {1, 2}

    # batch 1: a dup (dropped -> never scheduled) plus a fresh doc
    fold_curation_batch(
        spark, src_docs([(10, _BASE, "src1"), (12, fresh, "src3")]), out, 1
    )
    sched1 = epoch_schedule_from_stream(spark, out).collect()
    assert {r["doc_id"] for r in sched1} == {1, 2, 12}  # dup 10 excluded

    # rebuild-equivalence: the refresh over stored scalars equals the
    # batch policy over the shipped kept rows (same n_tok source)
    kept = read_curated(spark, out, "kept").select("doc_id", "n_tok")
    srcs = spark.createDataFrame(
        [(1, "src1"), (2, "src2"), (12, "src3")], "doc_id long, source string"
    )
    want = (
        epoch_schedule_from_rows(
            kept.join(srcs, "doc_id").select("doc_id", "source", "n_tok")
        )
        .orderBy("doc_id")
        .collect()
    )
    assert sched1 == want

    compact_epoch_index_stream(spark, out)
    assert epoch_schedule_from_stream(spark, out).collect() == sched1


def test_epoch_index_source_replay_collapses_and_conflict_raises(
    spark, tmp_path
):
    """A duplicated (doc_id, source) row in the raw batch collapses to
    one epoch-index row (no token double-count), but CONFLICTING source
    values for one doc_id fail loudly instead of persisting an
    arbitrary pick — the fail-loudly discipline the waterfill cap set."""
    import os

    import pytest

    from csv_2_db_pipeline_data_engineering_spark.streaming.curation_stream import (
        DOC_SRC_SCHEMA,
        EPOCH_INDEX_DIR,
    )

    def src_docs(rows):
        return spark.createDataFrame(rows, DOC_SRC_SCHEMA)

    # pure replay: same doc arrives twice with the SAME source — the
    # persisted epoch INDEX must carry exactly one (doc_id, source,
    # n_tok) row per kept doc (a fanned-out join here would double-count
    # the doc's tokens in every later schedule refresh)
    out = str(tmp_path / "curated_replay")
    fold_curation_batch(
        spark,
        src_docs([(1, _BASE, "src1"), (1, _BASE, "src1"), (2, _OTHER, "src2")]),
        out,
        0,
    )
    idx = spark.read.parquet(
        os.path.join(out, EPOCH_INDEX_DIR, "delta=batch0")
    ).collect()
    assert sorted(r["doc_id"] for r in idx) == [1, 2]  # one row per doc

    # conflicting sources for one doc_id: the fold must raise, not pick
    out2 = str(tmp_path / "curated_conflict")
    with pytest.raises(Exception, match="conflicting source values"):
        fold_curation_batch(
            spark,
            src_docs([(1, _BASE, "src1"), (1, _BASE, "srcX")]),
            out2,
            0,
        )

    # NULL-safety of the entrance collapse (r12 review findings): a
    # lone NULL value must NOT trip the conflict raise, and a
    # NULL-vs-value mix for one doc_id MUST (min/max skip NULLs, so a
    # naive min==max test gets both wrong)
    out3 = str(tmp_path / "curated_null_ok")
    fold_curation_batch(
        spark,
        src_docs([(1, _BASE, None), (2, _OTHER, "src2")]),
        out3,
        0,
    )  # no raise: NULL source is not a conflict (docs just skip the
    # source-bearing epoch index when NULL rows are absent of source)
    out4 = str(tmp_path / "curated_null_mix")
    with pytest.raises(Exception, match="conflicting source values"):
        fold_curation_batch(
            spark,
            src_docs([(1, _BASE, "src1"), (1, _BASE, None)]),
            out4,
            0,
        )


def test_bm25_from_stream_equals_rebuild_over_shipped_corpus(spark, tmp_path):
    """The stream-maintained postings index must serve the same top-k
    as a from-scratch BM25 build over the shipped kept corpus, after
    multiple folds AND after compaction."""
    from csv_2_db_pipeline_data_engineering_spark.operators.retrieval import (
        _bm25_topk_frame,
        bm25_postings,
        corpus_stats_partial,
    )
    from csv_2_db_pipeline_data_engineering_spark.streaming.curation_stream import (
        bm25_topk_from_stream,
        compact_postings_index_stream,
    )

    out = str(tmp_path / "curated")
    fresh = (
        "seven golden apples fell from the tall tree and it was a sign of "
        "the good harvest to come for the people of the small village inn"
    )
    fold_curation_batch(spark, _docs(spark, [(1, _BASE), (2, _OTHER)]), out, 0)
    fold_curation_batch(spark, _docs(spark, [(12, fresh)]), out, 1)

    kept = read_curated(spark, out, "kept").select("doc_id", "text")
    qterm = (
        kept.orderBy("doc_id")
        .limit(2)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice(F.split("text", " "), 1, 4)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    served = [tuple(r) for r in bm25_topk_from_stream(spark, out, qterm).collect()]
    qvocab = sorted({r.term for r in qterm.select("term").distinct().collect()})
    rebuild = [
        tuple(r)
        for r in _bm25_topk_frame(
            bm25_postings(kept).filter(F.col("term").isin(qvocab)),
            qterm,
            corpus_stats_partial(kept),
        )
        .select("query_id", "rnk", "doc_id", "score")
        .orderBy("query_id", "rnk")
        .collect()
    ]
    assert served == rebuild and served

    compact_postings_index_stream(spark, out)
    after = [tuple(r) for r in bm25_topk_from_stream(spark, out, qterm).collect()]
    assert after == served


def test_prf_from_stream_equals_rebuild_over_shipped_corpus(spark, tmp_path):
    """The streaming twin of prf_serve_incremental: two-round PRF over
    the stream-maintained postings index must equal the from-scratch
    two-round PRF over the shipped kept corpus, after multiple folds
    AND after compaction."""
    from csv_2_db_pipeline_data_engineering_spark.operators.retrieval import (
        _prf_rounds_from_postings,
        bm25_postings,
        corpus_stats_partial,
    )
    from csv_2_db_pipeline_data_engineering_spark.streaming.curation_stream import (
        compact_postings_index_stream,
        prf_topk_from_stream,
    )

    out = str(tmp_path / "curated")
    fresh = (
        "seven golden apples fell from the tall tree and it was a sign of "
        "the good harvest to come for the people of the small village inn"
    )
    fold_curation_batch(spark, _docs(spark, [(1, _BASE), (2, _OTHER)]), out, 0)
    fold_curation_batch(spark, _docs(spark, [(12, fresh)]), out, 1)

    kept = read_curated(spark, out, "kept").select("doc_id", "text")
    qterm = (
        kept.orderBy("doc_id")
        .limit(2)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice(F.split("text", " "), 1, 4)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    served = [tuple(r) for r in prf_topk_from_stream(spark, out, qterm).collect()]
    qvocab = sorted({r.term for r in qterm.select("term").distinct().collect()})
    rebuild = [
        tuple(r)
        for r in _prf_rounds_from_postings(
            spark, bm25_postings(kept), corpus_stats_partial(kept),
            (qvocab, qterm),
        ).collect()
    ]
    assert served == rebuild and served

    compact_postings_index_stream(spark, out)
    after = [tuple(r) for r in prf_topk_from_stream(spark, out, qterm).collect()]
    assert after == served


def test_kmv_from_stream_equals_rebuild_over_shipped_corpus(spark, tmp_path):
    """The stream-maintained KMV index must hold exactly the k-smallest
    content hashes of ALL shipped kept docs after multiple folds (the
    merge law applied across batch tags), after an idempotent replay,
    AND after compaction; the estimate tracks the kept-corpus distinct
    count."""
    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
        KMV_K,
        kmv_estimate,
        kmv_sketch_rows,
    )
    from csv_2_db_pipeline_data_engineering_spark.streaming.curation_stream import (
        compact_kmv_index_stream,
        kmv_state_from_stream,
        read_curated,
    )

    out = str(tmp_path / "curated")
    fresh = (
        "seven golden apples fell from the tall tree and it was a sign of "
        "the good harvest to come for the people of the small village inn"
    )
    fold_curation_batch(spark, _docs(spark, [(1, _BASE), (2, _OTHER)]), out, 0)
    fold_curation_batch(spark, _docs(spark, [(12, fresh)]), out, 1)

    kept = read_curated(spark, out, "kept").select("doc_id", "text")

    def hs(df):
        return sorted(r["h"] for r in df.collect())

    served = hs(kmv_state_from_stream(spark, out))
    rebuild = hs(kmv_sketch_rows(kept))
    assert served == rebuild and served
    assert len(served) == min(KMV_K, kept.count())

    # replayed fold: the overwrite-idempotent tag must not change state
    fold_curation_batch(spark, _docs(spark, [(12, fresh)]), out, 1)
    assert hs(kmv_state_from_stream(spark, out)) == served

    compact_kmv_index_stream(spark, out)
    assert hs(kmv_state_from_stream(spark, out)) == served
    est = kmv_estimate(kmv_state_from_stream(spark, out)).collect()[0]
    assert est["n_vals"] == len(served)
