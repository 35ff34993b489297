"""Streaming continuous corpus curation: fold arriving document files
into an append-only curated corpus + a persisted dedup index.

The streaming twin of :mod:`..curation_pipeline` — and the piece that
makes curation *incremental*: each micro-batch of new documents is
gated against everything already curated WITHOUT rescanning history.

Per batch:
0. boilerplate pre-clean — lines the accumulated line index has seen
   in >= STREAM_LINE_DF distinct docs are stripped (C4's
   keep-one-occurrence rule at stream scale), within-doc repeats keep
   their first occurrence (RefinedWeb); every later stage sees
   boilerplate-free text. The raw batch's lines extend the index
   O(delta) per fold (``operators/boilerplate.write/extend_line_index``
   tagged-partition layout);
1. exact-dup gate — within-batch (fingerprint window) AND against the
   stored index's fingerprints, pre-screened by a persisted Bloom bit
   index (``operators/sketch``): history fingerprints are pruned
   map-side to the batch's maybe-seen keys before any join, so
   provably-new arrivals never pay the O(history) membership join;
   the bit index extends O(delta) per fold like the other indexes;
2. near-dup gate — within-batch MinHash-LSH plus
   ``incremental_dedup_pairs`` against the stored signature index
   (banded signature join + exact-Jaccard verify on stored gram-hash
   sets — history text is never re-shingled, the property proven in
   ``tests/test_dedup_incremental.py``);
3. semantic-dup gate (when the arriving schema carries an
   ``embedding`` column — ``DOC_EMB_SCHEMA``): within-batch SemDeDup
   losers via the LSH-routed keep frame
   (``operators/semantic.semantic_keep_plan_lsh``) plus cross-history
   losers against the persisted embedding index
   (``semantic_cross_losers`` — history vectors hashed once at their
   own fold time, candidates keyed on (table, bucket),
   history-first-seen wins); kept docs' embeddings extend the index
   O(delta) per fold. The gate sits between near_dup and the language
   gates exactly as in the batch ``curation_decisions``;
4. language/quality gates — including the structural Gopher rule
   subset (``operators/gopher.structural_fail``, shared with the batch
   pipeline through ``curation_decisions``) — + PII scrub (map-side);
5. ExactSubstr span strip — verbatim spans already SHIPPED by a
   committed batch are deleted from this batch's kept text before
   chunking (``operators/spans.incremental_span_strip_text`` against
   the kept-corpus shingle index; first-seen-in-history wins; the
   index extends O(delta) per fold and is read committed-tags-only so
   an uncommitted fold's phantom tag can never strip a later first
   occurrence);
6. kept docs, their chunks, their dropped siblings, and the kept docs'
   NEW index rows land in per-batch directories; a manifest commit
   makes the batch visible.

Exactly-once under crash-replay (the reference's idempotency contract,
``README.md:150``, applied to a stream): every output is written to
``<table>/batch=<id>/`` with overwrite semantics, so a replayed
uncommitted fold rewrites its own directories content-identically
(part-file NAMES embed a per-job UUID, so the correctness mechanism is
not byte identity — it is the atomic ``_MANIFEST.json`` commit (tmp +
``os.replace``), the single visibility point; a replay of a COMMITTED
batch no-ops on the manifest gate). Readers resolve the manifest first
and read only committed batch dirs, so a crash mid-write can never
surface partial data.

Scale notes (100 TB of history, TB/day arrivals): per-batch cost is
O(batch + index-candidates). The stored index carries signatures +
gram-hash sets, not text — the 100 TB corpus's index is ~2-3 orders
smaller than the corpus. The only unbounded growth is the index itself,
and at fold time history never moves: the candidate join reads a
maintained bucketed band table (``band_table``) in place and shuffles
ONLY the delta into the bucket scheme (plan pinned by
``tests/test_bucketing.py`` and the fold-path test in
``tests/test_curation_stream.py``); the table itself grows by O(delta)
bucketed appends per fold.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..curation_pipeline import (
    chunk_docs,
    curation_decisions,
    n_tok_expr,
    near_dup_losers,
)
from ..operators.boilerplate import extend_line_index, strip_boilerplate_lines
from ..operators.dedup import (
    build_signature_index,
    extend_banded_index_table,
    incremental_dedup_pairs,
    write_banded_index_table,
)
from ..operators.lifecycle import release_scoped_caches
from ..operators.sketch import bloom_bit_rows
from ..operators.spans import (
    extend_bucketed_shingle_table,
    extend_span_index,
    incremental_span_strip_text,
    write_bucketed_shingle_table,
)

#: minimal arriving-document schema (streaming sources require one)
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

#: arriving-document schema WITH an embedding column — enables the
#: incremental SemDeDup gate (pass as ``run_curation_stream(...,
#: schema=DOC_EMB_SCHEMA)``); the fold detects the column's presence.
DOC_EMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)

#: arriving-document schema WITH a source column — enables the
#: incremental training-loader epoch schedule (the fold extends a
#: persisted per-doc token index with each batch's SHIPPED kept docs;
#: ``epoch_schedule_from_stream`` refreshes the repeat schedule from
#: stored scalars only). Source ids must be the ``srcN`` form the
#: waterfill cap derives from — malformed ids fail loudly at refresh.
DOC_SRC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

_MANIFEST = "_MANIFEST.json"
TABLES = ("kept", "chunks", "dropped", "index")


def _read_manifest(out_dir: str) -> dict:
    p = os.path.join(out_dir, _MANIFEST)
    if not os.path.exists(p):
        return {"applied": []}
    with open(p, encoding="utf-8") as fh:
        return json.load(fh)


def _commit_manifest(out_dir: str, manifest: dict) -> None:
    fd, tmp = tempfile.mkstemp(prefix="._manifest_", dir=out_dir)
    with os.fdopen(fd, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))


LINE_INDEX_DIR = "line_index"
BLOOM_INDEX_DIR = "bloom_index"
SPAN_INDEX_DIR = "span_index"
EMB_INDEX_DIR = "emb_index"
EPOCH_INDEX_DIR = "epoch_index"
POSTINGS_INDEX_DIR = "postings_index"
KMV_INDEX_DIR = "kmv_index"


def _span_index_committed(
    spark: SparkSession, out_dir: str, batch_id: int
) -> tuple[DataFrame, DataFrame] | None:
    """The kept-corpus shingle index restricted to COMMITTED batches,
    excluding the current batch's own tag.

    Committed-only (unlike the line/bloom reads): a span-index tag from
    an uncommitted fold would strip a FIRST occurrence from a later
    batch — for spans the phantom costs data, not just a false
    positive, so the read resolves the manifest first. Own-tag
    exclusion gives crash replays the exact index they saw originally
    (the ``_line_index_excluding`` contract).

    The fold's candidate join does NOT probe these tagged parquet
    partitions (that would reshuffle the whole index on ``sh`` every
    fold) — it probes the bucketed accelerator table
    (``ensure_span_table``), with the committed-kept-ids semi-filter
    supplying the committed-only guarantee post-join. This tagged read
    is the durable fallback: stats for the df cap, and the
    table-rebuild source for a fresh session.
    """
    base = os.path.join(out_dir, SPAN_INDEX_DIR)
    tags = _committed_tags(base, out_dir, batch_id, "shingles")
    if not tags:
        return None
    sh = spark.read.option(
        "basePath", os.path.join(base, "shingles")
    ).parquet(*[os.path.join(base, "shingles", t) for t in tags]).drop("delta")
    stats = (
        spark.read.option("basePath", os.path.join(base, "stats"))
        .parquet(*[os.path.join(base, "stats", t) for t in tags])
        .drop("delta")
        .groupBy("sh")
        .agg(F.sum("n_docs").alias("n_docs"))
    )
    return sh, stats


def _committed_tags(
    index_base: str, out_dir: str, batch_id: int, probe_sub: str | None = None
) -> list[str]:
    """``delta=`` directory names carrying COMMITTED index rows: the
    active compacted base version (batches folded by a stream
    compactor, per ``lsm``'s ``_BASE.json``) plus per-batch tags for
    applied batches not yet folded — excluding the current batch's own
    tag (crash-replay sees exactly the index it saw originally)."""
    from ..operators import lsm

    state = lsm.read_state(index_base)
    folded = set(state["folded"]) if state else set()
    base_tag = state["base"] if state else None
    applied = _read_manifest(out_dir)["applied"]
    probe = (
        index_base if probe_sub is None else os.path.join(index_base, probe_sub)
    )
    tags = [
        f"delta=batch{b}"
        for b in applied
        if b != batch_id
        and f"batch{b}" not in folded
        and os.path.isdir(os.path.join(probe, f"delta=batch{b}"))
    ]
    if base_tag and os.path.isdir(os.path.join(probe, f"delta={base_tag}")):
        tags.insert(0, f"delta={base_tag}")
    return tags


def _emb_index_committed(
    spark: SparkSession, out_dir: str, batch_id: int
) -> tuple[DataFrame, DataFrame] | None:
    """(bucket rows, vectors) of the kept-corpus embedding index across
    COMMITTED batches, excluding the current batch's own tag — the
    ``_span_index_committed`` contract: a phantom tag from an
    uncommitted fold must never drop an arrival against a batch that
    never became visible, and a crash replay sees exactly the index it
    saw originally."""
    base = os.path.join(out_dir, EMB_INDEX_DIR)
    tags = _committed_tags(base, out_dir, batch_id, "buckets")
    if not tags:
        return None
    buckets = (
        spark.read.option("basePath", os.path.join(base, "buckets"))
        .parquet(*[os.path.join(base, "buckets", t) for t in tags])
        .drop("delta")
    )
    vecs = (
        spark.read.option("basePath", os.path.join(base, "vecs"))
        .parquet(*[os.path.join(base, "vecs", t) for t in tags])
        .drop("delta")
    )
    return buckets, vecs


def read_bloom_bits(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """The accumulated Bloom bit rows (k, pos) across all fold tags.

    Unlike the line index, a replayed fold may safely see its OWN tag:
    extra set bits can only turn a provably-new key into a "maybe seen"
    (it then flows to the exact index join, which the committed index
    decides) — never the reverse. So this reads everything, and the
    per-tag overwrite keeps replays idempotent.

    Coverage gate: the screen's no-false-negative contract requires the
    bits to cover EVERY fingerprint in the committed exact index, but a
    committed batch can predate the bloom index (upgrade/migration, or
    a partially deleted ``bloom_index``) — partial coverage would prune
    genuinely-seen history keys and silently keep exact duplicates. So
    any applied batch that wrote an index partition but has neither a
    ``delta=`` tag nor membership in a compacted base tag
    (``_COMPACTED.json``, written by ``compact_bloom_index``) gets its
    tag backfilled here from the committed index batch (idempotent
    per-tag overwrite) before the bits are read.
    """
    base = os.path.join(out_dir, BLOOM_INDEX_DIR)
    covered = _read_compacted(base)
    for b in _read_manifest(out_dir)["applied"]:
        idx = _batch_dir(out_dir, "index", b)
        if (
            b not in covered
            and os.path.isdir(idx)
            and not os.path.isdir(os.path.join(base, f"delta=batch{b}"))
        ):
            extend_bloom_index(
                spark.read.parquet(idx).select("fingerprint"), base, f"batch{b}"
            )
    if not os.path.isdir(base):
        return None
    parts = [os.path.join(base, t) for t in os.listdir(base) if t.startswith("delta=")]
    if not parts:
        return None
    return spark.read.option("basePath", base).parquet(*parts).drop("delta")


def extend_bloom_index(keys: DataFrame, path: str, tag: str) -> None:
    """Append ``keys``' set-bit rows as the (overwrite-idempotent)
    ``delta=<tag>`` partition of the Bloom bit index."""
    bloom_bit_rows(keys).write.mode("overwrite").parquet(
        os.path.join(path, f"delta={tag}")
    )


_COMPACTED = "_COMPACTED.json"


def _read_compacted(base: str) -> set[int]:
    p = os.path.join(base, _COMPACTED)
    if not os.path.exists(p):
        return set()
    with open(p, encoding="utf-8") as fh:
        return set(json.load(fh)["covered"])


def compact_bloom_index(spark: SparkSession, out_dir: str, tag: str = "base") -> None:
    """Merge every delta partition into one DISTINCT ``delta=<tag>``
    partition — the ``compact_line_index`` LSM move for the Bloom bits.

    Long streams accumulate one tag per fold with heavy (k, pos)
    duplication across tags; ``bloom_screen`` caps its broadcast with a
    ``distinct()`` regardless, but compaction makes the on-disk index
    itself O(K·M) again and the per-fold read one partition instead of
    hundreds. The batch ids folded into the base tag are recorded in
    ``_COMPACTED.json`` so ``read_bloom_bits``' coverage gate knows they
    are covered without per-batch tags (and does not re-backfill them).
    Run on the maintenance cadence, amortized O(K·M) against many
    O(delta) folds.
    """
    import shutil

    base = os.path.join(out_dir, BLOOM_INDEX_DIR)
    bits = read_bloom_bits(spark, out_dir)  # backfills any coverage gap first
    if bits is None:
        return
    applied = sorted(
        set(_read_manifest(out_dir)["applied"]) | _read_compacted(base)
    )
    tmp_tag = f"__compact_{tag}"
    bits.distinct().write.mode("overwrite").parquet(
        os.path.join(base, f"delta={tmp_tag}")
    )
    for t in os.listdir(base):
        if t.startswith("delta=") and t != f"delta={tmp_tag}":
            shutil.rmtree(os.path.join(base, t))
    os.replace(
        os.path.join(base, f"delta={tmp_tag}"), os.path.join(base, f"delta={tag}")
    )
    fd, tmp = tempfile.mkstemp(prefix="._compacted_", dir=base)
    with os.fdopen(fd, "w", encoding="utf-8") as fh:
        json.dump({"covered": applied}, fh)
    os.replace(tmp, os.path.join(base, _COMPACTED))
    spark.catalog.refreshByPath(base)


def compact_span_index_stream(spark: SparkSession, out_dir: str) -> None:
    """LSM-compact the stream's span index via the crash-safe versioned
    commit (``operators.lsm``): the per-tag df PARTIALS — otherwise
    re-aggregated by every fold's read, O(tags) growth on a long
    stream — collapse to one row per shingle, the shingle rows rewrite
    into one base version, and only COMMITTED batch tags fold (a
    crashed uncommitted tag is left alone, so committed-only read
    semantics survive compaction at every crash point). The bucketed
    accelerator table is untouched (it is already one table)."""
    from ..operators import lsm

    applied = set(_read_manifest(out_dir)["applied"])
    lsm.compact(
        spark,
        os.path.join(out_dir, SPAN_INDEX_DIR),
        {
            "shingles": None,
            "stats": lambda df: df.groupBy("sh").agg(
                F.sum("n_docs").alias("n_docs")
            ),
        },
        only_tags={f"batch{b}" for b in applied},
    )


def compact_emb_index_stream(spark: SparkSession, out_dir: str) -> None:
    """LSM-compact the stream's embedding index (bucket rows + vectors,
    both immutable per vector — a pure partition-count bound), same
    committed-only versioned commit as the span twin."""
    from ..operators import lsm

    applied = set(_read_manifest(out_dir)["applied"])
    lsm.compact(
        spark,
        os.path.join(out_dir, EMB_INDEX_DIR),
        {"buckets": None, "vecs": None},
        only_tags={f"batch{b}" for b in applied},
    )


def compact_epoch_index_stream(spark: SparkSession, out_dir: str) -> None:
    """LSM-compact the stream's epoch index (immutable per-doc token
    scalars), same committed-only versioned commit as the other
    stream indexes."""
    from ..operators import lsm

    applied = set(_read_manifest(out_dir)["applied"])
    lsm.compact(
        spark,
        os.path.join(out_dir, EPOCH_INDEX_DIR),
        {"": None},
        only_tags={f"batch{b}" for b in applied},
    )


def compact_postings_index_stream(spark: SparkSession, out_dir: str) -> None:
    """LSM-compact the stream's BM25 postings index (postings rows are
    immutable per doc — a pure partition-count bound; the one-row
    stats partials re-aggregate to one row), same committed-only
    versioned commit as the other stream indexes."""
    from ..operators import lsm

    applied = set(_read_manifest(out_dir)["applied"])
    lsm.compact(
        spark,
        os.path.join(out_dir, POSTINGS_INDEX_DIR),
        {
            "postings": None,
            "stats": lambda df: df.agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("total_dl").alias("total_dl"),
            ),
        },
        only_tags={f"batch{b}" for b in applied},
    )


def kmv_state_from_stream(spark: SparkSession, out_dir: str) -> DataFrame:
    """The kept-corpus KMV distinct-content state across COMMITTED
    batches — the k-smallest merge of the per-batch sketches, which
    equals a from-scratch sketch of all shipped kept docs EXACTLY (the
    defining KMV merge law; pytest-certified). Feed to
    ``operators.sketch.kmv_estimate`` for the cardinality estimate.
    Raises if no batch has committed yet."""
    from ..operators.sketch import merge_kmv

    base = os.path.join(out_dir, KMV_INDEX_DIR)
    tags = _committed_tags(base, out_dir, batch_id=-1)
    if not tags:
        raise ValueError(f"no committed KMV-index tags under {base}")
    raw = (
        spark.read.option("basePath", base)
        .parquet(*[os.path.join(base, t) for t in tags])
        .drop("delta")
    )
    return merge_kmv(raw.select("h"))


def compact_kmv_index_stream(spark: SparkSession, out_dir: str) -> None:
    """LSM-compact the stream's KMV index: the k-smallest fold over all
    applied tags IS the merge, so the compacted base answers
    identically from <= KMV_K rows."""
    from ..operators import lsm
    from ..operators.sketch import KMV_K

    from pyspark.sql import Window

    applied = set(_read_manifest(out_dir)["applied"])
    w = Window.orderBy("h")
    lsm.compact(
        spark,
        os.path.join(out_dir, KMV_INDEX_DIR),
        {
            "": lambda df: (
                df.select("h")
                .distinct()
                .withColumn("r", F.row_number().over(w))
                .filter(F.col("r") <= KMV_K)
                .select("h")
            )
        },
        only_tags={f"batch{b}" for b in applied},
    )


def bm25_topk_from_stream(
    spark: SparkSession, out_dir: str, qterm: DataFrame
) -> DataFrame:
    """Top-k BM25 over the stream-maintained postings index, COMMITTED
    batches only: postings restricted to the query vocabulary, the
    per-batch (n_docs, total_dl) partials merged once before the
    single avgdl floor — so serving after any number of folds equals a
    from-scratch build over the shipped kept corpus (the pytest
    certificate). Raises if no batch has committed yet."""
    from ..operators.retrieval import _bm25_topk_frame

    base = os.path.join(out_dir, POSTINGS_INDEX_DIR)
    tags = _committed_tags(base, out_dir, batch_id=-1, probe_sub="postings")
    if not tags:
        raise ValueError(f"no committed postings-index tags under {base}")
    qvocab = sorted({r.term for r in qterm.select("term").distinct().collect()})
    postings = (
        spark.read.option("basePath", os.path.join(base, "postings"))
        .parquet(*[os.path.join(base, "postings", t) for t in tags])
        .drop("delta")
        .filter(F.col("term").isin(qvocab))
    )
    stats = (
        spark.read.option("basePath", os.path.join(base, "stats"))
        .parquet(*[os.path.join(base, "stats", t) for t in tags])
        .drop("delta")
        .agg(F.sum("n_docs").alias("n_docs"), F.sum("total_dl").alias("total_dl"))
    )
    return (
        _bm25_topk_frame(postings, qterm, stats)
        .select("query_id", "rnk", "doc_id", "score")
        .orderBy("query_id", "rnk")
    )


def prf_topk_from_stream(
    spark: SparkSession, out_dir: str, qterm: DataFrame
) -> DataFrame:
    """Two-round PRF expansion over the stream-maintained postings
    index, COMMITTED batches only — the streaming twin of
    ``prf_serve_incremental``: round-1 ranking, the bounded feedback
    term vectors (a doc_id-keyed slice of the same index), candidate
    df, and the round-2 re-rank are all reads of the committed tags;
    the per-batch (n_docs, total_dl) partials merge once before the
    single avgdl floor, so PRF after any number of folds equals a
    from-scratch two-round build over the shipped kept corpus (the
    pytest certificate). Raises if no batch has committed yet."""
    from ..operators.retrieval import _prf_rounds_from_postings

    base = os.path.join(out_dir, POSTINGS_INDEX_DIR)
    tags = _committed_tags(base, out_dir, batch_id=-1, probe_sub="postings")
    if not tags:
        raise ValueError(f"no committed postings-index tags under {base}")
    qvocab = sorted({r.term for r in qterm.select("term").distinct().collect()})
    # NOT pre-filtered to the query vocabulary: the PRF rounds apply
    # their own term-/doc-keyed pushdown slices (round-1 vocab, the
    # feedback doc ids, the candidate vocabulary, the expanded vocab).
    postings = (
        spark.read.option("basePath", os.path.join(base, "postings"))
        .parquet(*[os.path.join(base, "postings", t) for t in tags])
        .drop("delta")
    )
    stats = (
        spark.read.option("basePath", os.path.join(base, "stats"))
        .parquet(*[os.path.join(base, "stats", t) for t in tags])
        .drop("delta")
        .agg(F.sum("n_docs").alias("n_docs"), F.sum("total_dl").alias("total_dl"))
    )
    return _prf_rounds_from_postings(spark, postings, stats, (qvocab, qterm))


def epoch_schedule_from_stream(spark: SparkSession, out_dir: str) -> DataFrame:
    """The repeat schedule a training loader pulls after any number of
    folds: waterfill + per-source fractional cumsum over the epoch
    index's COMMITTED per-doc scalars — kept text is never re-read.
    Raises if no source-bearing batch has committed yet."""
    from ..operators.curation import epoch_schedule_from_rows

    base = os.path.join(out_dir, EPOCH_INDEX_DIR)
    tags = _committed_tags(base, out_dir, batch_id=-1)
    if not tags:
        raise ValueError(f"no committed epoch-index tags under {base}")
    rows = (
        spark.read.option("basePath", base)
        .parquet(*[os.path.join(base, t) for t in tags])
        .drop("delta")
    )
    return epoch_schedule_from_rows(rows).orderBy("doc_id")


def _line_index_excluding(
    spark: SparkSession, out_dir: str, batch_id: int
) -> DataFrame | None:
    """The accumulated line index MINUS the current batch's own tag.

    Excluding ``delta=batch<id>`` makes a crash-replayed fold see
    exactly the index it saw the first time: without the exclusion, a
    replay would find its own lines already indexed and strip first
    occurrences it originally kept (content-identity under replay is
    the stream's exactly-once mechanism).
    """
    base = os.path.join(out_dir, LINE_INDEX_DIR)
    from ..operators import lsm

    if not os.path.isdir(base):
        return None
    parts = [
        os.path.join(base, f"delta={t}")
        for t in lsm.visible_tags(base)
        if t != f"batch{batch_id}"
    ]
    if not parts:
        return None
    return spark.read.option("basePath", base).parquet(*parts).drop("delta")


def _batch_dir(out_dir: str, table: str, batch_id: int) -> str:
    return os.path.join(out_dir, table, f"batch={batch_id}")


def band_table_name(out_dir: str) -> str:
    """Session-catalog name of this stream's bucketed band table."""
    return "spark_graft_bands_" + hashlib.md5(out_dir.encode()).hexdigest()[:10]


def span_table_name(out_dir: str) -> str:
    """Session-catalog name of this stream's bucketed shingle table."""
    return "spark_graft_spans_" + hashlib.md5(out_dir.encode()).hexdigest()[:10]


def ensure_span_table(
    spark: SparkSession, out_dir: str, committed_shingles: DataFrame
) -> str:
    """Make the bucketed shingle table exist for this stream, returning
    its name — the span twin of ``ensure_band_table``: a pure JOIN
    ACCELERATOR bucketed on ``sh`` (the committed-kept-ids semi-filter
    in the fold prunes any phantom rows from uncommitted appends), with
    the manifest-gated tagged parquet as the durable source of truth a
    fresh session rebuilds from (one O(history) pass per process)."""
    tbl = span_table_name(out_dir)
    if not spark.catalog.tableExists(tbl):
        write_bucketed_shingle_table(
            committed_shingles, tbl, path=os.path.join(out_dir, "span_table")
        )
    return tbl


def emb_table_name(out_dir: str) -> str:
    """Session-catalog name of this stream's bucketed embedding table."""
    return "spark_graft_embs_" + hashlib.md5(out_dir.encode()).hexdigest()[:10]


def ensure_emb_table(
    spark: SparkSession, out_dir: str, committed_buckets: DataFrame
) -> str:
    """Make the bucketed embedding-bucket table exist for this stream,
    returning its name — the embedding twin of ``ensure_span_table``: a
    pure JOIN ACCELERATOR bucketed on (t, bucket). Phantom rows from an
    uncommitted (crashed-attempt) append prune automatically at the
    verify step's inner join against the COMMITTED vectors, so no
    exclusion pass is needed; the manifest-gated tagged parquet stays
    the durable source of truth a fresh session rebuilds from."""
    from ..operators.semantic import write_bucketed_emb_table

    tbl = emb_table_name(out_dir)
    if not spark.catalog.tableExists(tbl):
        write_bucketed_emb_table(
            committed_buckets, tbl, path=os.path.join(out_dir, "emb_table")
        )
    return tbl


def ensure_band_table(spark: SparkSession, out_dir: str, index: DataFrame) -> str:
    """Make the bucketed band table exist for this stream, returning its
    name. The table is a pure JOIN ACCELERATOR (the verify join prunes
    any rows not in the committed index), persisted as an EXTERNAL
    bucketed table under ``out_dir``. The manifest-gated parquet index
    stays the durable source of truth: a fresh session whose in-memory
    catalog lost the table entry rebuilds it here from the committed
    index (one O(history) pass per process), after which every fold
    extends it by O(delta) appends."""
    tbl = band_table_name(out_dir)
    if not spark.catalog.tableExists(tbl):
        write_banded_index_table(
            index, tbl, path=os.path.join(out_dir, "band_table")
        )
    return tbl


def cross_index_losers(
    spark: SparkSession,
    docs: DataFrame,
    index: DataFrame,
    out_dir: str,
    gh: DataFrame | None = None,
) -> DataFrame:
    """Batch-vs-history near-dup losers through the bucketed band table:
    candidates come from the delta band rows joined against the stored
    table bucket-aligned — the single delta-side Exchange plan pinned
    by ``tests/test_bucketing.py`` — then exact-Jaccard verified
    against the committed index's gram-hash sets."""
    tbl = ensure_band_table(spark, out_dir, index)
    return incremental_dedup_pairs(docs, index, gh=gh, band_table=tbl).select(
        F.col("doc_delta").alias("doc_id")
    )


def read_curated(spark: SparkSession, out_dir: str, table: str) -> DataFrame | None:
    """Read a curated table across all COMMITTED batches (manifest-gated)."""
    assert table in TABLES, table
    applied = _read_manifest(out_dir)["applied"]
    paths = [
        _batch_dir(out_dir, table, b)
        for b in applied
        if os.path.exists(_batch_dir(out_dir, table, b))
    ]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def fold_curation_batch(
    spark: SparkSession, batch_df: DataFrame, out_dir: str, batch_id: int
) -> None:
    """Curate one micro-batch against the committed index and append it."""
    manifest = _read_manifest(out_dir)
    if batch_id in manifest["applied"]:
        return  # crash-replay of a committed batch
    os.makedirs(out_dir, exist_ok=True)
    if batch_df.isEmpty():
        _commit_manifest(out_dir, {"applied": manifest["applied"] + [batch_id]})
        return

    # One row per doc_id BEFORE any gate: a source replaying the same
    # doc_id twice in one batch would otherwise fan out through every
    # doc_id-keyed join downstream (2 identical arrivals measured 4
    # kept rows — double-counted tokens in every index). Pure replays
    # (identical payloads) collapse; CONFLICTING payloads for one
    # doc_id fail loudly — the raise is embedded in the kept column so
    # column pruning can't drop it. NULL-safe by counting: min==max is
    # NULL (not TRUE) on an all-NULL group and TRUE on a NULL-vs-value
    # mix (min/max skip NULLs), so the agreement test is "at most one
    # distinct non-NULL value AND no NULL/non-NULL mix" instead.
    def _one_per_doc(c: str):
        agree = (F.count_distinct(F.col(c)) <= 1) & (
            (F.count(F.col(c)) == 0)
            | (F.count(F.col(c)) == F.count(F.lit(1)))
        )
        return (
            F.when(agree, F.min(c))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(f"conflicting {c} values in one batch for doc_id "),
                        F.col("doc_id").cast("string"),
                    )
                )
            )
            .alias(c)
        )

    # Cheap duplicate probe first: the collapse agg shuffles the FULL
    # payload (text, and embedding arrays under DOC_EMB_SCHEMA) on
    # every batch, but the common case is a duplicate-free batch. The
    # probe aggregates doc_id alone — column pruning drops the payload
    # and the map-side partial combine makes the exchange ids-only —
    # so duplicate-free batches skip the wide shuffle entirely while
    # the fail-loudly conflict semantics are untouched when the probe
    # does find a repeated key.
    has_dup_ids = not (
        batch_df.groupBy("doc_id").count().filter(F.col("count") > 1).isEmpty()
    )
    if has_dup_ids:
        batch_df = batch_df.groupBy("doc_id").agg(
            *[_one_per_doc(c) for c in batch_df.columns if c != "doc_id"]
        )

    raw_docs = batch_df.select("doc_id", "text")
    # C4-style pre-clean: strip lines the accumulated line index has
    # seen in >= STREAM_LINE_DF docs (and within-doc repeats) BEFORE
    # any gating — fingerprints, signatures, and chunks are all
    # computed on boilerplate-free text.
    docs = strip_boilerplate_lines(
        raw_docs, _line_index_excluding(spark, out_dir, batch_id)
    )
    index = read_curated(spark, out_dir, "index")

    # Batch-scoped cache: unpersisted after the eager checkpoint below,
    # so a long-running stream doesn't accumulate one cached gram stream
    # per micro-batch in executor storage.
    from ..operators.dedup import gram_hash_rows

    gh = gram_hash_rows(docs).cache()
    internal = near_dup_losers(docs, gh=gh)
    if index is not None:
        # Signature-less rows (docs too short to shingle) are tracked by
        # fingerprint only — excluding them from the banded join avoids
        # the degenerate all-shorts-collide bucket.
        cross = cross_index_losers(
            spark, docs, index.filter(F.col("m0").isNotNull()), out_dir, gh=gh
        )
        losers = internal.select("doc_id").union(cross)
        fps = index.select("fingerprint")
        # Bloom pre-screen for the exact gate: prune the O(history)
        # fingerprint index to this batch's maybe-seen keys before the
        # join (operators/sketch.bloom_screen; no false negatives — the
        # bits are extended from the same kept fingerprints the index
        # commits, below).
        bloom = read_bloom_bits(spark, out_dir)
    else:
        losers, fps, bloom = internal, None, None

    # Semantic-dup gate (only when the arriving schema carries an
    # embedding column): within-batch SemDeDup losers via the LSH keep
    # frame, plus arrivals duplicating COMMITTED history through the
    # persisted embedding index (history-first-seen wins). Embedding
    # rows never touch the text gates — only the loser id-frame flows
    # into the decision layer, matching the batch pipeline's wiring.
    sem_losers = None
    batch_emb = None
    if "embedding" in batch_df.columns:
        from ..operators.semantic import (
            semantic_cross_losers,
            semantic_keep_plan_lsh,
        )

        batch_emb = batch_df.select(
            F.col("doc_id").alias("vec_id"), "embedding"
        ).filter(F.col("embedding").isNotNull())
        within = (
            semantic_keep_plan_lsh(batch_emb)
            .filter(~F.col("keep"))
            .select(F.col("vec_id").alias("doc_id"))
        )
        emb_hist = _emb_index_committed(spark, out_dir, batch_id)
        if emb_hist is not None:
            hist_buckets, hist_vecs = emb_hist
            # Probe the bucketed accelerator (stored side read in
            # place, only the batch's bucket rows shuffle); phantom
            # rows from an uncommitted append prune at the inner join
            # against the COMMITTED vectors inside the verify.
            emb_tbl = ensure_emb_table(spark, out_dir, hist_buckets)
            cross = semantic_cross_losers(
                batch_emb, spark.table(emb_tbl), hist_vecs
            )
            sem_losers = within.union(cross).distinct()
        else:
            sem_losers = within

    decisions = curation_decisions(
        docs,
        near_losers=losers,
        exact_fingerprints=fps,
        exact_bloom_bits=bloom,
        semantic_losers=sem_losers,
    ).localCheckpoint(eager=True)  # pin: three writes + index derive from it

    kept = decisions.filter("keep")
    kept_docs = docs.join(kept.select("doc_id"), "doc_id")  # original text for index
    # LEFT join from the fingerprint side: a kept doc too short to have
    # a signature still claims its fingerprint in the index, so later
    # exact copies of it are caught even though LSH can't see it.
    # The kept docs' gram stream is the batch stream filtered to kept
    # ids — reusing the cached frame instead of re-shingling kept text.
    new_index = kept.select("doc_id", "fingerprint").join(
        build_signature_index(
            kept_docs, gh=gh.join(kept.select("doc_id"), "doc_id")
        ),
        "doc_id",
        "left",
    )

    # ExactSubstr pre-chunk clean against the KEPT-history span index
    # (the batch pipeline's RefinedWeb order, made incremental): any
    # verbatim span already shipped by a committed batch is deleted
    # from this batch's kept text — first-seen-in-history wins — and
    # kept n_tok is recomputed from the shipped text.
    kept_text = kept.select("doc_id", F.col("text_redacted").alias("text"))
    span_idx = _span_index_committed(spark, out_dir, batch_id)
    if span_idx is not None:
        _ish_tagged, istats = span_idx
        span_tbl = ensure_span_table(spark, out_dir, _ish_tagged)
        # Probe the bucketed table (stored side read in place, only the
        # batch's shingles shuffle). Micro-batches commit serially, so
        # the only rows the accelerator can carry beyond the committed
        # corpus are a crashed attempt of THIS batch — excluding the
        # batch's own ids restores committed-only semantics with an
        # O(batch) broadcast anti-join, never an O(corpus) membership
        # scan.
        kept_text = incremental_span_strip_text(
            kept_text,
            spark.table(span_tbl),
            istats,
            exclude_src_ids=batch_df.select("doc_id"),
        )
    else:
        # First batch (no committed tags): no history to strip against,
        # but the delta self-join path must still run so spans repeated
        # WITHIN this batch get the same treatment later batches apply
        # intra-batch — empty index frames leave only that path active.
        empty_sh = kept_text.sparkSession.createDataFrame(
            [], "doc_id long, pos long, sh string"
        )
        empty_stats = kept_text.sparkSession.createDataFrame(
            [], "sh string, n_docs long"
        )
        kept_text = incremental_span_strip_text(kept_text, empty_sh, empty_stats)
    shipped = kept_text.join(kept.select("doc_id", "n_pii"), "doc_id").select(
        "doc_id",
        "text",
        # blank-safe count: a fully-stripped doc reports 0 tokens (and
        # ships no chunks — chunk_docs filters zero-token docs)
        n_tok_expr("text").alias("n_tok"),
        "n_pii",
    )

    writes = {
        "kept": shipped,
        "chunks": chunk_docs(kept_text),
        "dropped": decisions.filter(~F.col("keep")).select("doc_id", "reason"),
        "index": new_index,
    }
    for table, df in writes.items():
        df.write.mode("overwrite").parquet(_batch_dir(out_dir, table, batch_id))
    # Extend the span index with this batch's SHIPPED kept text (the
    # spans that survived are exactly the ones later batches must not
    # repeat) — written pre-commit like the other indexes, but READ
    # committed-only (_span_index_committed + the kept-ids candidate
    # filter), so an uncommitted fold's tag can never strip a first
    # occurrence from a later batch. Both forms extend O(delta): the
    # tagged parquet (durable truth) and the bucketed accelerator the
    # candidate join actually probes.
    shipped_kept = spark.read.parquet(
        _batch_dir(out_dir, "kept", batch_id)
    ).select("doc_id", "text")
    extend_span_index(
        shipped_kept, os.path.join(out_dir, SPAN_INDEX_DIR), f"batch{batch_id}"
    )
    # BM25 postings index: the batch's SHIPPED kept docs' (doc_id,
    # term, dl, tf) postings plus the one-row (n_docs, total_dl)
    # normalization partial extend the persisted retrieval index
    # O(delta) — the stream-maintained twin of
    # operators/retrieval.write_postings_index. Written pre-commit,
    # READ committed-only (bm25_topk_from_stream), same replay
    # discipline as the other indexes; kept text is never re-exploded
    # at serve time.
    from ..operators.retrieval import extend_postings_index

    extend_postings_index(
        shipped_kept, os.path.join(out_dir, POSTINGS_INDEX_DIR), f"batch{batch_id}"
    )
    # KMV distinct-content sketch: the batch's SHIPPED kept docs' K
    # smallest content hashes extend the persisted k-smallest state
    # O(delta) — kmv(∪ batches) == K-smallest(∪ per-batch sketches)
    # EXACTLY, so the stream's corpus-cardinality/overlap answers equal
    # a from-scratch rebuild after any number of folds (the pytest
    # certificate). Same pre-commit write / committed-only read
    # discipline as the other indexes.
    from ..operators.sketch import extend_kmv_index

    extend_kmv_index(
        shipped_kept, os.path.join(out_dir, KMV_INDEX_DIR), f"batch{batch_id}"
    )
    # Epoch index (only when the arriving schema carries a source
    # column): the batch's SHIPPED kept docs' (doc_id, source, n_tok)
    # scalars extend the persisted per-doc token index O(delta) — the
    # training-loader handoff. n_tok is the SHIPPED count (post
    # boilerplate/span strip, blank-safe), i.e. the tokens the loader
    # will actually draw; kept text is never re-tokenized at refresh.
    # Same pre-commit write / committed-only read discipline as the
    # other indexes (epoch_schedule_from_stream reads applied tags).
    if "source" in batch_df.columns:
        (
            spark.read.parquet(_batch_dir(out_dir, "kept", batch_id))
            .select("doc_id", "n_tok")
            # batch_df is one-row-per-doc_id by the entrance collapse
            # (pure replays merged, conflicting payloads raised), so
            # this join cannot fan the kept row out or double-count the
            # doc's tokens in the persisted index
            .join(batch_df.select("doc_id", "source"), "doc_id")
            .select("doc_id", "source", "n_tok")
            .write.mode("overwrite")
            .parquet(
                os.path.join(
                    out_dir, EPOCH_INDEX_DIR, f"delta=batch{batch_id}"
                )
            )
        )
    # Embedding index: KEPT docs' vectors + their LSH bucket rows extend
    # the persisted index O(delta) — written pre-commit, READ
    # committed-only (_emb_index_committed), same replay discipline as
    # the span index. Only kept embeddings enter: the gate defends the
    # SHIPPED corpus, and a dropped arrival must not block a future
    # better copy of itself.
    if batch_emb is not None:
        from ..operators.semantic import (
            emb_bucket_rows,
            extend_bucketed_emb_table,
            extend_emb_index,
            write_bucketed_emb_table,
        )

        kept_emb = batch_emb.join(
            kept.select(F.col("doc_id").alias("vec_id")), "vec_id"
        )
        extend_emb_index(
            kept_emb, os.path.join(out_dir, EMB_INDEX_DIR), f"batch{batch_id}"
        )
        # Maintain the bucketed accelerator BEFORE the manifest commit
        # (the band-table discipline): append-then-no-commit only
        # leaves phantom rows the committed-vecs verify join prunes.
        kept_buckets = emb_bucket_rows(kept_emb)
        if spark.catalog.tableExists(emb_table_name(out_dir)):
            extend_bucketed_emb_table(kept_buckets, emb_table_name(out_dir))
        else:
            write_bucketed_emb_table(
                kept_buckets,
                emb_table_name(out_dir),
                path=os.path.join(out_dir, "emb_table"),
            )
    from ..operators.spans import _raw_shingles

    if spark.catalog.tableExists(span_table_name(out_dir)):
        extend_bucketed_shingle_table(
            _raw_shingles(shipped_kept), span_table_name(out_dir)
        )
    else:
        write_bucketed_shingle_table(
            _raw_shingles(shipped_kept),
            span_table_name(out_dir),
            path=os.path.join(out_dir, "span_table"),
        )
    # Maintain the bucketed band accelerator BEFORE the manifest commit:
    # a crash between commit and append would silently lose history
    # coverage, while append-then-no-commit only leaves phantom rows the
    # verify join prunes (and a replay's duplicate candidates collapse
    # in the post-verify groupBy).
    new_sig = (
        spark.read.parquet(_batch_dir(out_dir, "index", batch_id))
        .filter(F.col("m0").isNotNull())
    )
    if index is not None:
        extend_banded_index_table(
            new_sig,
            ensure_band_table(spark, out_dir, index.filter(F.col("m0").isNotNull())),
        )
    else:
        write_banded_index_table(
            new_sig,
            band_table_name(out_dir),
            path=os.path.join(out_dir, "band_table"),
        )
    # Extend the Bloom bit index with the batch's kept fingerprints —
    # the exact-gate twin of the band-table append above, same
    # pre-commit ordering (phantom bits from an uncommitted fold only
    # cost a bloom false-positive; the committed index still decides).
    extend_bloom_index(
        spark.read.parquet(_batch_dir(out_dir, "index", batch_id)).select(
            "fingerprint"
        ),
        os.path.join(out_dir, BLOOM_INDEX_DIR),
        f"batch{batch_id}",
    )
    # Accumulate the batch's RAW lines into the line index (dropped
    # docs included — boilerplate recurs in arrivals regardless of
    # their fate; stripping pre-indexing would keep counts below the
    # threshold forever). Same pre-commit ordering as the band table;
    # a replay overwrites its own delta=batch<id> tag idempotently and
    # never reads it back (_line_index_excluding).
    extend_line_index(
        raw_docs, os.path.join(out_dir, LINE_INDEX_DIR), f"batch{batch_id}"
    )
    # All consumers (decision checkpoint + index write) have
    # materialized — drop the batch's gram-stream cache (and the fluency
    # gate's scoped bigram stream) so a long stream holds at most one
    # batch's worth of executor storage.
    gh.unpersist()
    release_scoped_caches()
    _commit_manifest(out_dir, {"applied": manifest["applied"] + [batch_id]})


def run_curation_stream(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = DOC_SCHEMA,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously curate parquet document files arriving in
    ``landing_dir``. ``available_now=True`` drains and stops."""
    docs = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(landing_dir)
    )
    writer = docs.writeStream.foreachBatch(
        lambda bdf, bid: fold_curation_batch(spark, bdf, out_dir, bid)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
