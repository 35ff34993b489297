"""End-to-end LLM-corpus curation pipeline: the training-data twin of
:mod:`pipeline` (which carries the reference's sales-ETL contract,
``main.py:41-136``).

One call takes a raw ``documents`` parquet directory to training-ready
artifacts:

    raw docs -> PII scrub -> gates (exact-dup, near-dup, semantic-dup,
    language, quality) -> kept/dropped split -> ExactSubstr span strip
    -> strided token chunks -> parquet sinks + manifest

Design contracts (mirroring the reference's pipeline semantics):
- **No silent drops**: every input doc lands in exactly one of
  ``kept_docs`` or ``dropped_docs`` (with its first failing gate as the
  reason) — the dead-letter pattern of ``sinks/jdbc.rejected_payload``.
- **Idempotent**: outputs are deterministic functions of the input and
  written with overwrite semantics; rerunning produces bit-identical
  tables (the reference's rerun contract, ``README.md:150``).
- **Driver-side counts only**: the summary's numbers come from one
  cached per-doc decision frame; document text is never collected.

Scale shapes (100 TB):
- The scrub and gate signals are map-side column expressions.
- Near-dup is the MinHash-LSH path (banded signature join + exact
  Jaccard verify on gram-hash sets) — the same O(candidates) shape as
  ``dedup_minhash_lsh``, never an all-pairs join.
- Chunking is in-partition sequence/explode arithmetic; chunk text is
  sliced map-side on the way into the writer, so the full text column
  crosses no shuffle.
- All three sinks could take ``partition_by`` (e.g. by source/date) via
  ``sources.formats.write_any`` unchanged; kept flat here because the
  test corpus is small.
"""

from __future__ import annotations

import json
import logging
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.boilerplate import quality_nscaled, quality_ntok
from .operators.gopher import structural_fail
from .operators.curation import (
    CLASSIFIER_FLOOR_E2,
    FLUENCY_MARGIN,
    LANG_STOP_RATIO,
    LOW_QUALITY_TTR,
)
from .operators.dedup import (
    JACCARD_THRESHOLD,
    gram_hash_rows,
    lsh_candidate_pairs,
    minhash_signatures,
)
from .operators.lifecycle import release_scoped_caches
from .operators.sketch import bloom_screen
from .operators.scrub import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    fix_mojibake,
    pii_counts,
    redact_pii,
)
from .operators.text import EN_STOPWORDS, bigram_logprob_frame

logger = logging.getLogger(__name__)


@dataclass
class CurationSummary:
    run_id: str
    input_docs: int
    kept_docs: int
    dropped: dict[str, int] = field(default_factory=dict)
    n_chunks: int = 0
    pii_redactions: int = 0
    duration_sec: float = 0.0

    @property
    def drop_rate_pct(self) -> float:
        if self.input_docs == 0:
            return 0.0
        return round(100.0 * (self.input_docs - self.kept_docs) / self.input_docs, 1)


def near_dup_losers(docs: DataFrame, gh: DataFrame | None = None) -> DataFrame:
    """doc_ids dropped by MinHash-LSH near-dup: the larger id of every
    verified pair (keep-first-seen policy). Exact-Jaccard verify keeps
    precision exact; recall is the banded-LSH probability (≈1 at the
    registered threshold — see ``dedup_minhash_lsh``).

    ``gh`` lets a caller that controls the lifecycle (the streaming
    fold, which runs once per micro-batch) pass in an already-cached
    gram stream and unpersist it after materialization — otherwise each
    batch would leave one more cached stream in executor storage for
    the life of the session."""
    # Cache the gram stream: it feeds BOTH the signature branch and the
    # collect_set branch (same reason dedup_minhash_lsh caches it).
    if gh is None:
        gh = gram_hash_rows(docs).cache()
    cands = lsh_candidate_pairs(minhash_signatures(gh))
    sh = (
        gh.groupBy("doc_id")
        .agg(F.collect_set("gh").alias("sh"))
        .withColumn("ns", F.size("sh"))
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"),
                   F.col("ns").alias("n_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"),
                   F.col("ns").alias("n_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.col("n_a") + F.col("n_b") - inter)
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )


def curation_decisions(
    docs: DataFrame,
    near_losers: DataFrame | None = None,
    exact_fingerprints: DataFrame | None = None,
    exact_bloom_bits: DataFrame | None = None,
    semantic_losers: DataFrame | None = None,
) -> DataFrame:
    """Per-doc decision frame: (doc_id, fingerprint, text_redacted,
    n_tok, n_pii, reason, keep, n_chunks).

    Gate order (first failure wins, cheap-to-expensive):
    exact_dup -> near_dup -> semantic_dup -> non_english ->
    low_quality -> gopher_quality -> low_fluency -> low_classifier ->
    keep. The gopher gate applies the STRUCTURAL Gopher rule subset
    (``operators.gopher.structural_fail`` — mean word length, symbol /
    bullet / ellipsis spam, non-alpha dilution, repeated lines; the
    vocabulary-dependent word-count/stopword rules stay corpus knobs,
    see ``gopher.STRUCTURAL_RULES``) as a pure map-side expression. The
    classifier gate serves the frozen logistic quality model
    (``boilerplate.quality_nscaled``) in pure integer arithmetic.

    ``near_losers`` overrides the loser set (a ``doc_id`` frame) — the
    streaming fold passes batch-internal ∪ cross-index losers; batch
    callers default to LSH over ``docs`` itself. ``exact_fingerprints``
    (a ``fingerprint`` frame, e.g. from a persisted index) marks docs
    whose normalized content already exists in an earlier corpus as
    ``exact_dup`` in addition to the in-frame window dedup.
    ``semantic_losers`` (a ``doc_id`` frame, e.g.
    ``operators.semantic.semantic_keep_plan``'s non-keep rows over the
    corpus embeddings) drops SemDeDup group losers as ``semantic_dup``
    directly after the lexical dedup gates — SemDeDup (Abbas et al.
    2023) prunes the deduplicated corpus BEFORE quality filtering.
    Omitted -> the gate passes everything (a corpus without an
    embedding table skips it).

    The fluency gate (CCNet-style perplexity filter with the corpus's
    own bigram MLE as the LM) drops docs scoring > FLUENCY_MARGIN below
    the median ``bigram_logprob_frame`` score of THIS input frame —
    batch-local statistics in the streaming fold (a production pipeline
    would score against a fixed reference LM; the median-relative cut
    keeps the decision stable across corpus sizes and vocabularies).
    Docs with < 2 tokens have no score and pass the gate.
    """
    # Stored text gets the full scrub chain: mojibake repair (ftfy
    # pass), then PII redaction. Gates and fingerprints still see the
    # raw text, so the decision layer is independent of the repair.
    red = redact_pii(fix_mojibake(F.col("text")))
    n_pii = sum(pii_counts(F.col("text")).values())
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))) / n
    ttr = F.size(F.array_distinct(toks)) / n

    w = Window.partitionBy(F.md5(norm))
    base = docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        red.alias("text_redacted"),
        n.alias("n_tok"),
        n_pii.alias("n_pii"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("exact_loser"),
        stop_ratio.alias("stop_ratio"),
        ttr.alias("ttr"),
        structural_fail(F.col("text")).alias("gopher_fail"),
        quality_nscaled(F.col("text")).alias("clf_nscaled"),
        quality_ntok(F.col("text")).alias("clf_ntok"),
    )
    if exact_fingerprints is not None:
        seen = exact_fingerprints.select("fingerprint").distinct()
        if exact_bloom_bits is not None:
            # Bloom pre-screen (operators/sketch.py): the O(corpus)
            # fingerprint index is pruned map-side to just the keys this
            # batch MIGHT contain (broadcast semi-join against the
            # batch's bloom-passing keys) before it ever reaches a
            # shuffle. No false negatives: the bits are maintained from
            # the same kept fingerprints the index stores, so every
            # true hit survives the screen.
            maybe = bloom_screen(
                base.select(F.col("fingerprint").alias("key")), exact_bloom_bits
            ).select(F.col("key").alias("fingerprint"))
            seen = seen.join(F.broadcast(maybe), "fingerprint", "left_semi")
        seen = seen.withColumn("seen_before", F.lit(True))
        base = base.join(seen, "fingerprint", "left").withColumn(
            "exact_loser",
            F.col("exact_loser") | F.coalesce("seen_before", F.lit(False)),
        )
    if near_losers is None:
        near_losers = near_dup_losers(docs)
    losers = near_losers.select("doc_id").distinct().withColumn(
        "near_loser", F.lit(True)
    )
    if semantic_losers is None:
        base = base.withColumn("sem_loser", F.lit(False))
    else:
        base = base.join(
            F.broadcast(
                semantic_losers.select("doc_id")
                .distinct()
                .withColumn("sem_loser", F.lit(True))
            ),
            "doc_id",
            "left",
        ).withColumn("sem_loser", F.coalesce("sem_loser", F.lit(False)))
    scores = bigram_logprob_frame(docs).select("doc_id", "avg_logprob")
    med = scores.agg(F.median("avg_logprob").alias("fluency_med"))
    w_, s_ = CHUNK_TOKENS, CHUNK_STRIDE
    n_chunks = F.when(F.col("n_tok") <= w_, F.lit(1)).otherwise(
        F.lit(1) + ((F.col("n_tok") - w_ + s_ - 1) / s_).cast("int")
    )
    reason = (
        F.when(F.col("exact_loser"), "exact_dup")
        .when(F.col("near_loser"), "near_dup")
        .when(F.col("sem_loser"), "semantic_dup")
        .when(F.col("stop_ratio") < LANG_STOP_RATIO, "non_english")
        .when(F.col("ttr") < LOW_QUALITY_TTR, "low_quality")
        .when(F.col("gopher_fail"), "gopher_quality")
        .when(
            F.col("fluency_med") - F.col("avg_logprob") > FLUENCY_MARGIN,
            "low_fluency",
        )
        .when(
            F.col("clf_nscaled") < F.lit(CLASSIFIER_FLOOR_E2) * F.col("clf_ntok"),
            "low_classifier",
        )
        .otherwise("keep")
    )
    return (
        base.join(losers, "doc_id", "left")
        .withColumn("near_loser", F.coalesce("near_loser", F.lit(False)))
        .join(scores, "doc_id", "left")
        .crossJoin(F.broadcast(med))
        .select(
            "doc_id",
            "fingerprint",
            "text_redacted",
            "n_tok",
            "n_pii",
            reason.alias("reason"),
        )
        .withColumn("keep", F.col("reason") == "keep")
        .withColumn("n_chunks", F.when(F.col("keep"), n_chunks).otherwise(F.lit(0)))
    )


def n_tok_expr(col: str = "text") -> F.Column:
    """Whitespace token count that treats empty/blank text as 0 tokens.

    ``F.split('', ' ')`` yields ``['']`` (size 1), so a doc whose whole
    text was span-stripped away would otherwise report one phantom
    token — wrong accounting, and a zero-content training chunk if it
    reached ``chunk_docs``."""
    return F.when(
        F.trim(F.col(col)) == "", F.lit(0)
    ).otherwise(F.size(F.split(F.col(col), " ")))


def chunk_docs(docs: DataFrame) -> DataFrame:
    """Strided chunks over a (doc_id, text) frame: (doc_id, chunk_idx,
    n_tok_chunk, text). Chunk count derives from the frame's own token
    count, so callers may pass text that was rewritten (span-stripped)
    after the decision layer computed its estimates — zero-token docs
    (fully stripped) produce NO chunks. Slicing happens map-side before
    the write — no text shuffle."""
    w, s = CHUNK_TOKENS, CHUNK_STRIDE
    n_tok = n_tok_expr("text")
    n_chunks = F.when(n_tok <= w, F.lit(1)).otherwise(
        F.lit(1) + ((n_tok - w + s - 1) / s).cast("int")
    )
    toks = F.split(F.col("text"), " ")
    k = F.col("chunk_idx")
    start = (k * s).cast("int")
    end = F.least(start + w, F.col("n_tok"))
    return (
        docs.filter(n_tok > 0)
        .select(
            "doc_id",
            toks.alias("t"),
            n_tok.alias("n_tok"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            (end - start).alias("n_tok_chunk"),
            F.concat_ws(" ", F.slice(F.col("t"), start + 1, end - start)).alias("text"),
        )
    )


def run_curation_pipeline(
    spark: SparkSession,
    docs_path: str,
    out_dir: str,
    embeddings_path: str | None = None,
) -> CurationSummary:
    """Curate a documents parquet directory into ``out_dir``.

    Writes three tables plus a manifest:
      - ``kept_docs``:    doc_id, text (redacted, span-stripped), n_tok, n_pii
      - ``dropped_docs``: doc_id, reason
      - ``chunks``:       doc_id, chunk_idx, n_tok_chunk, text
      - ``manifest.json``: run metadata + all counts in the summary

    ``embeddings_path`` (optional, parquet with ``vec_id``/``embedding``
    matching the corpus doc_ids) enables the SemDeDup gate: per
    semantic near-dup group the lowest-id representative survives and
    every other member drops as ``semantic_dup``
    (``operators.semantic.semantic_keep_plan_lsh`` — the LSH-routed
    linear-scale path, matching corpus_curation_decision's gate).

    After the gates, surviving docs get ExactSubstr span removal
    (``operators.spans.strip_verbatim_span_text``) before chunking —
    the RefinedWeb order: doc-level dedup first, then verbatim-span
    deletion on the survivors (Lee et al. 2022 apply it corpus-wide
    before training).
    """
    run_id = uuid.uuid4().hex[:8]
    start = time.monotonic()
    raw = spark.read.parquet(docs_path).select("doc_id", "text")
    # Boilerplate pre-clean, the batch twin of the streaming fold's:
    # lines appearing in >= STREAM_LINE_DF docs of THIS corpus are
    # deleted everywhere (the RefinedWeb treatment of boilerplate; the
    # registered text_line_dedup query implements C4's
    # keep-one-occurrence variant), and within-doc repeats keep their
    # first occurrence. Single-line corpora without boilerplate pass
    # through byte-identical.
    from .operators.boilerplate import build_line_index, strip_boilerplate_lines

    docs = strip_boilerplate_lines(raw, build_line_index(raw))
    # Run-scoped gram-stream cache (same lifecycle discipline as the
    # streaming fold): dropped after the last consumer below.
    gh = gram_hash_rows(docs).cache()
    semantic_losers = None
    if embeddings_path is not None:
        from .operators.semantic import semantic_keep_plan_lsh

        semantic_losers = (
            semantic_keep_plan_lsh(
                spark.read.parquet(embeddings_path).select("vec_id", "embedding")
            )
            .filter(~F.col("keep"))
            .select(F.col("vec_id").alias("doc_id"))
        )
    decisions = curation_decisions(
        docs,
        near_losers=near_dup_losers(docs, gh=gh),
        semantic_losers=semantic_losers,
    ).cache()

    # ExactSubstr span removal on the SURVIVORS (RefinedWeb order);
    # n_tok is recomputed from the stripped text so the kept table and
    # the chunk plan agree with what actually ships.
    from .operators.spans import strip_verbatim_span_text

    kept_text = strip_verbatim_span_text(
        decisions.filter("keep").select(
            "doc_id", F.col("text_redacted").alias("text")
        )
    )
    kept = kept_text.join(
        decisions.filter("keep").select("doc_id", "n_pii"), "doc_id"
    ).select(
        "doc_id",
        "text",
        n_tok_expr("text").alias("n_tok"),
        "n_pii",
    )
    dropped = decisions.filter(~F.col("keep")).select("doc_id", "reason")
    # fully-stripped docs (n_tok = 0) stay in kept_docs for accounting
    # but ship no chunks (chunk_docs filters them)
    chunks = chunk_docs(kept.select("doc_id", "text"))

    kept.write.mode("overwrite").parquet(os.path.join(out_dir, "kept_docs"))
    dropped.write.mode("overwrite").parquet(os.path.join(out_dir, "dropped_docs"))
    chunks.write.mode("overwrite").parquet(os.path.join(out_dir, "chunks"))

    stats = (
        decisions.groupBy("reason")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_pii").alias("np"),
        )
        .collect()
    )
    by_reason = {r["reason"]: r["n"] for r in stats}
    # Chunk count reflects the POST-strip text, so it comes from the
    # materialized table (a metadata-cheap count on the parquet just
    # written), not the decision layer's pre-strip estimate.
    n_chunks_total = spark.read.parquet(os.path.join(out_dir, "chunks")).count()
    summary = CurationSummary(
        run_id=run_id,
        input_docs=sum(by_reason.values()),
        kept_docs=by_reason.get("keep", 0),
        dropped={k: v for k, v in sorted(by_reason.items()) if k != "keep"},
        n_chunks=n_chunks_total,
        pii_redactions=sum(r["np"] for r in stats),
        duration_sec=round(time.monotonic() - start, 2),
    )
    with open(os.path.join(out_dir, "manifest.json"), "w", encoding="utf-8") as fh:
        json.dump(
            {
                "run_id": summary.run_id,
                "input_docs": summary.input_docs,
                "kept_docs": summary.kept_docs,
                "dropped": summary.dropped,
                "n_chunks": summary.n_chunks,
                "pii_redactions": summary.pii_redactions,
                "drop_rate_pct": summary.drop_rate_pct,
                "chunk_tokens": CHUNK_TOKENS,
                "chunk_stride": CHUNK_STRIDE,
            },
            fh,
            indent=2,
            sort_keys=True,
        )
    decisions.unpersist()
    gh.unpersist()
    release_scoped_caches()  # the fluency gate's bigram stream
    logger.info(
        "[%s] curated %d docs -> %d kept (%s dropped), %d chunks in %.2fs",
        run_id,
        summary.input_docs,
        summary.kept_docs,
        summary.dropped,
        summary.n_chunks,
        summary.duration_sec,
    )
    return summary
