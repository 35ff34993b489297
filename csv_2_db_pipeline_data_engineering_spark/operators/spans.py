"""Exact-substring (verbatim span) dedup — the suffix-array family.

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better", arXiv:2107.06499) deduplicate corpora by finding VERBATIM
token spans repeated across documents (suffix-array ExactSubstr, 50-BPE
-token threshold) — near-dup scoring misses these, and repeated spans
are what models memorize.  A suffix array is a single-machine
construction; the Spark-first equivalent used here:

1. shingle every document into overlapping L-token windows keyed by an
   md5 of the window text (md5 so DuckDB computes the identical key —
   the ``dedup_simhash`` precedent);
2. inverted-index join on the shingle key (document-frequency capped,
   like every inverted join in ``operators/dedup.py``) to get matching
   position pairs;
3. collapse runs of consecutive matches along each alignment DIAGONAL
   (pos_a - pos_b) with the gaps-and-islands window trick: a maximal
   island of c consecutive shingle matches is a verbatim span of
   c + L - 1 tokens.  Every step is integer/string-exact, so the DuckDB
   oracle reproduces the result bit-for-bit.

Scale shape (100 TB): tokenize/shingle is map-side behind one
doc_id-keyed window; the candidate join shuffles 16-byte-ish keys with
a hard df cap (no quadratic bucket); island collapse is keyed on
(doc_a, doc_b, diag) — co-partitioned with the join output; the final
per-pair aggregate is a struct-min.  No UDFs, no driver collection.

The natural corpus is word salad (no cross-doc 8-gram repeats except
exact-duplicate documents), so the registered query plants a fixed
boilerplate phrase on every 17th document IN-PLAN, identically on both
engines (the ``text_pii_scrub`` planting pattern): planted groups must
surface with the exact span, start offsets, and span-text md5, and
exact-duplicate documents surface their full text as one span.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import Query
from ..sources.tables import load_table, load_table_spread
from .lifecycle import scoped_cache

#: shingle width (tokens); an island of c matches = span of c + L - 1
SPAN_SHINGLE = 8
#: minimum reported verbatim span length (tokens)
MIN_SPAN_TOKENS = 10
#: drop shingles present in more than this many documents (corpus-hot
#: boilerplate carries no pair-discriminating signal and would explode
#: the join bucket — same contract as the Jaccard inverted index)
SPAN_DF_CAP = 64

#: deterministic planted boilerplate (12 tokens each, chosen from the
#: corpus vocabulary so tokenization stays trivial)
SPAN_PHRASES = (
    "the scan can merge the table and the hash can batch value",
    "a row value will sort by key and then spark can scan",
    "this part is a fast line for the batch window merge plan",
)
SPAN_PLANT_MOD = 17


def plant_boilerplate(docs: DataFrame) -> DataFrame:
    """Append a phrase (selected by doc_id % 3) to every 17th doc."""
    variant = F.col("doc_id") % len(SPAN_PHRASES)
    phrase = F.when(variant == 0, F.lit(SPAN_PHRASES[0])).when(
        variant == 1, F.lit(SPAN_PHRASES[1])
    ).otherwise(F.lit(SPAN_PHRASES[2]))
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % SPAN_PLANT_MOD == 0,
            F.concat("text", F.lit(" "), phrase),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def _raw_shingles(docs: DataFrame, L: int = SPAN_SHINGLE) -> DataFrame:
    """(doc_id, pos, sh): md5 key per L-token window, UNCAPPED — the
    persistable form (``write_span_index``); the df cap is a read-time
    decision because document frequency is a corpus-global statistic.

    Zero-shuffle derivation (the ``sketch._gram_stream`` idiom, r16):
    posexplode an ``arrays_zip`` of L shifted ``slice`` views of the
    token array — pure codegen builtins, adjacency never leaves the
    row — instead of posexplode + window-lead, whose per-doc window
    shuffled and sorted the whole token stream before the first real
    operator. Same (doc_id, pos, sh) rows (pos is the zip index ==
    the gram's start offset)."""
    w = F.split("text", " ")
    m = F.size(w) - F.lit(L - 1)
    z = F.arrays_zip(*[F.slice(w, i + 1, m) for i in range(L)])
    return (
        docs.filter(F.size(w) >= L)
        .select("doc_id", F.posexplode(z).alias("pos", "z"))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.md5(
                F.concat_ws(" ", *[F.col(f"z.{i}") for i in range(L)])
            ).alias("sh"),
        )
    )


def _shingles(docs: DataFrame, L: int = SPAN_SHINGLE) -> DataFrame:
    """(doc_id, pos, sh): md5 key per L-token window, df-capped.

    EVERY consumer of the stream here is sh-keyed (the hot-shingle df
    aggregate, the anti-join, and the islands self-join above), so the
    chain ends in ONE explicit hash(sh) exchange: ReuseExchange then
    serves all of them from a single scan+md5 execution, and no
    downstream operator adds an exchange of its own. (r16: the zip
    derivation is map-side, so without this the plan re-executed the
    md5 chain once per consumer — caching the gram rows instead was
    measured to starve broadcast builds of execution memory at the
    100x corpus, guide §5.)"""
    sh = _raw_shingles(docs, L).repartition("sh")
    hot = (
        sh.groupBy("sh")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") > SPAN_DF_CAP)
        .select("sh")
    )
    return sh.join(hot, "sh", "left_anti")


def verbatim_span_islands(
    docs: DataFrame,
    L: int = SPAN_SHINGLE,
    min_span: int = MIN_SPAN_TOKENS,
) -> DataFrame:
    """All maximal verbatim spans (doc_a, doc_b, span_tokens, a_start,
    b_start), one row per alignment island of at least ``min_span``
    tokens.

    Diagonal-island collapse: matches of pair (a, b) that continue a
    verbatim run share ``diag = pos_a - pos_b`` and consecutive
    ``pos_a``; subtracting ``row_number`` over (pair, diag, pos_a)
    yields a constant per maximal run — the classic gaps-and-islands
    key, exact in integers on both engines.
    """
    # both self-join sides shuffle by sh over identical subtrees, so
    # ReuseExchange dedups them at the join exchange — no cache needed
    sh = _shingles(docs, L)
    a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "sh"
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "sh"
    )
    m = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pos_a", "pos_b",
                (F.col("pos_a") - F.col("pos_b")).alias("diag"))
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    return (
        m.withColumn("isl", F.col("pos_a") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "isl")
        .agg(
            (F.count(F.lit(1)) + F.lit(L - 1)).alias("span_tokens"),
            F.min("pos_a").alias("a_start"),
            F.min("pos_b").alias("b_start"),
        )
        .filter(F.col("span_tokens") >= min_span)
        .drop("diag", "isl")
    )


def verbatim_span_pairs(
    docs: DataFrame,
    L: int = SPAN_SHINGLE,
    min_span: int = MIN_SPAN_TOKENS,
) -> DataFrame:
    """Per document pair: the longest verbatim span and the island count."""
    islands = verbatim_span_islands(docs, L, min_span)
    best = F.min(F.struct(
        (-F.col("span_tokens")).alias("neg_len"),
        F.col("a_start").alias("a_start"),
        F.col("b_start").alias("b_start"),
    ))
    return (
        islands.groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            best.alias("best"),
        )
        .select(
            "doc_a", "doc_b", "n_spans",
            (-F.col("best.neg_len")).alias("span_tokens"),
            F.col("best.a_start").alias("a_start"),
            F.col("best.b_start").alias("b_start"),
        )
    )


def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: verbatim spans over corpus + planted
    boilerplate, with the longest span's text md5-verified by slicing
    it back out of doc_a (no explode — ``slice`` on the split array).

    Spread before the shingle scan (the single-file row-group-count
    split bound): measured 31.5s -> 17.1s at the 100x probe corpus.
    """
    docs = plant_boilerplate(
        load_table_spread(spark, sf_dir, "documents").select("doc_id", "text")
    )
    spans = verbatim_span_pairs(docs)
    return (
        spans.join(docs.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .select(
            "doc_a", "doc_b", "n_spans", "span_tokens", "a_start", "b_start",
            F.md5(
                F.array_join(
                    F.slice(
                        F.split("text", " "),
                        (F.col("a_start") + 1).cast("int"),
                        F.col("span_tokens").cast("int"),
                    ),
                    " ",
                )
            ).alias("span_md5"),
        )
        .orderBy("doc_a", "doc_b")
    )


def _union_intervals(iv: DataFrame) -> DataFrame:
    """Merge overlapping (doc_id, s, e) token intervals: (doc_id, grp,
    s, e).

    DISTINCT first: interval union is a set operation, and the same
    (victim, start, end) arrives once per partner doc sharing the
    span — deduping removes every fully-tied row from the union
    window (no reliance on tie behavior) and shrinks the frame. Then
    the running-max-end gaps-and-islands window merges overlapping
    intervals so no token is double-deleted.
    """
    iv = iv.distinct()
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        iv.withColumn(
            "new_grp",
            F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
        )
        .withColumn(
            "grp",
            F.sum("new_grp").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "grp")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )


def merged_victim_intervals(docs: DataFrame) -> DataFrame:
    """Per-victim merged token intervals to delete: (doc_id, grp, s, e)."""
    return _union_intervals(
        verbatim_span_islands(docs).select(
            F.col("doc_b").alias("doc_id"),
            F.col("b_start").alias("s"),
            (F.col("b_start") + F.col("span_tokens")).alias("e"),
        )
    )


def strip_verbatim_span_text(docs: DataFrame) -> DataFrame:
    """ExactSubstr span removal returning the survivor TEXT: the
    curation pipeline's pre-chunking hook (RefinedWeb order: doc-level
    dedup first, then exact-substring removal on the survivors).

    Victim-only rebuild: only docs that actually lose an interval are
    exploded and reassembled; every other doc passes through its
    original ``text`` byte-identical (no tokenize/rejoin round trip).
    The rebuilt text is exactly the string ``strip_verbatim_spans``
    fingerprints as ``clean_md5`` — the md5-verified survivor contract.
    """
    return _rebuild_text(docs, merged_victim_intervals(docs))


def _rebuild_text(docs: DataFrame, merged: DataFrame) -> DataFrame:
    """(doc_id, text) with merged victim intervals deleted — victim-only
    rebuild, shared by the batch and incremental strip-text paths.
    ``merged`` (tiny: merged victim intervals) feeds the victim set AND
    the range anti-join — cached so the islands pipeline below it
    executes once. No current caller passes the same ``merged`` frame
    to both this and :func:`_strip_summary`; if one ever does, the
    second ``scoped_cache`` is an idempotent no-op on the
    already-cached plan plus a harmless double unpersist at release
    (r16 ADVICE note)."""
    merged = scoped_cache(merged)
    victims = merged.select("doc_id").distinct()
    toks = (
        docs.join(victims, "doc_id", "left_semi")
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("p", "tok"))
        .select("doc_id", F.col("p").cast("long").alias("p"), "tok")
    )
    kept = toks.alias("t").join(
        merged.alias("m"),
        (F.col("t.doc_id") == F.col("m.doc_id"))
        & (F.col("t.p") >= F.col("m.s"))
        & (F.col("t.p") < F.col("m.e")),
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("clean_text")
    )
    # A victim whose whole text is one span has NO kept tokens (it is
    # absent from ``rebuilt``) — it becomes the empty string, never its
    # original text.
    return (
        docs.join(victims.withColumn("is_victim", F.lit(True)), "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                F.col("is_victim"), F.coalesce("clean_text", F.lit(""))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )


def strip_verbatim_spans(docs: DataFrame) -> DataFrame:
    """ExactSubstr's ACTION: delete every repeated span from all but its
    lowest-doc_id occurrence, per-document summary frame.

    The victim of every span is the pair's HIGHER doc_id, so transitive
    groups keep exactly the first occurrence (the Lee et al. policy and
    the same keep-lowest rule as ``text_line_dedup``).  A doc's victim
    intervals are merged with the running-max-end interval-union window
    (overlapping spans from different partners must not double-delete),
    then tokens inside any merged interval are dropped by a doc-keyed
    range anti-join and the survivor text is md5'd after positional
    reassembly — all integer/string-exact on both engines.
    """
    return _strip_summary(docs, merged_victim_intervals(docs))


def _strip_summary(docs: DataFrame, merged: DataFrame) -> DataFrame:
    """Per-doc removal summary for merged victim intervals: (doc_id,
    n_tokens, n_removed, n_intervals, clean_md5) — the shared tail of
    the batch and incremental strip paths. ``merged`` feeds the range
    anti-join AND the per-doc interval count — cached so the islands
    pipeline below it executes once."""
    merged = scoped_cache(merged)
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p", "tok")
    ).select("doc_id", F.col("p").cast("long").alias("p"), "tok")
    kept = toks.alias("t").join(
        merged.alias("m"),
        (F.col("t.doc_id") == F.col("m.doc_id"))
        & (F.col("t.p") >= F.col("m.s"))
        & (F.col("t.p") < F.col("m.e")),
        "left_anti",
    )
    per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            )
        ).alias("clean_md5"),
    )
    totals = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    n_iv = merged.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_intervals"))
    return (
        totals.join(per_doc, "doc_id", "left")
        .join(n_iv, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce("n_intervals", F.lit(0)).alias("n_intervals"),
            "clean_md5",
        )
        .orderBy("doc_id")
    )


def text_span_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: span removal over corpus + planted boilerplate
    (every planted copy beyond the lowest doc_id loses its phrase)."""
    return strip_verbatim_spans(
        plant_boilerplate(
            load_table_spread(spark, sf_dir, "documents").select("doc_id", "text")
        )
    )


# --- persisted span index + incremental strip ------------------------------


def write_span_index(docs: DataFrame, path: str, tag: str = "base") -> None:
    """Persist a corpus' shingle index under ``<path>/{shingles,stats}/
    delta=<tag>/`` — the ExactSubstr twin of ``write_line_index``.

    Two tagged tables: the raw (doc_id, pos, sh) shingle rows (what the
    candidate join probes) and the per-shingle document-frequency
    partials (what the read-time df cap merges — df is corpus-global,
    so it cannot be baked into any one tag). Later deltas extend both
    with new ``delta=<tag>`` directories: O(delta) per maintenance
    step, history partitions never read or rewritten, same-tag replay
    overwrites idempotently.
    """
    import os

    sh = _raw_shingles(docs)
    sh.write.mode("overwrite").parquet(
        os.path.join(path, "shingles", f"delta={tag}")
    )
    sh.groupBy("sh").agg(F.countDistinct("doc_id").alias("n_docs")).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "stats", f"delta={tag}"))


def extend_span_index(delta_docs: DataFrame, path: str, tag: str) -> None:
    """Fold a delta's shingles INTO the persisted index: O(delta)."""
    write_span_index(delta_docs, path, tag)


def compact_span_index(spark: SparkSession, path: str) -> None:
    """Merge every visible delta partition into one base version — the
    ``lsm.compact`` crash-safe versioned commit for the span index.

    The win is the stats table: df is corpus-global, so the per-tag
    frequency PARTIALS are re-aggregated by ``read_span_index`` on
    EVERY read — O(tags) growth on a long stream. Compaction
    re-aggregates them once to one row per shingle (and rewrites the
    shingle rows, immutable per doc, into one partition), after which
    reads cost one partition until the next extends accumulate. Run on
    the maintenance cadence, amortized O(index) against many O(delta)
    folds. Results are identical by construction: summing partials IS
    the merge.
    """
    from . import lsm

    lsm.compact(
        spark,
        path,
        {
            "shingles": None,
            "stats": lambda df: df.groupBy("sh").agg(
                F.sum("n_docs").alias("n_docs")
            ),
        },
    )


def read_span_index(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """(shingle rows, merged df stats) across all visible delta
    partitions (the ``lsm`` versioned view)."""
    from . import lsm

    sh = lsm.read_visible(spark, path, "shingles")
    stats = lsm.read_visible(spark, path, "stats")
    if sh is None or stats is None:
        raise FileNotFoundError(f"no span-index partitions under {path}")
    return sh, stats.groupBy("sh").agg(F.sum("n_docs").alias("n_docs"))


def write_bucketed_shingle_table(
    sh: DataFrame, table: str, n_buckets: int = 64, path: str | None = None
) -> None:
    """Persist shingle rows as a table bucketed on ``sh`` — the span
    twin of ``dedup.write_banded_index_table``: the candidate join's
    big side (history's shingles) lives bucketed on exactly the join
    key, so each fold reads its buckets in place and shuffles ONLY the
    delta side into the bucket scheme — O(delta) network, zero movement
    of the stored index regardless of corpus size."""
    w = sh.write.bucketBy(n_buckets, "sh").sortBy("sh")
    if path is not None:
        w = w.option("path", path)
    w.mode("overwrite").saveAsTable(table)


def extend_bucketed_shingle_table(
    sh: DataFrame, table: str, n_buckets: int = 64
) -> None:
    """APPEND a delta's shingle rows to the bucketed table (O(delta);
    the explicit ``refreshTable`` invalidates the session's cached file
    listing — the ``extend_banded_index_table`` lesson)."""
    sh.write.bucketBy(n_buckets, "sh").sortBy("sh").mode("append").saveAsTable(
        table
    )
    sh.sparkSession.catalog.refreshTable(table)


def incremental_span_strip_frame(
    delta_docs: DataFrame,
    index_shingles: DataFrame,
    index_stats: DataFrame,
    L: int = SPAN_SHINGLE,
    min_span: int = MIN_SPAN_TOKENS,
    exclude_src_ids: DataFrame | None = None,
) -> DataFrame:
    """ExactSubstr span removal for NEW documents against an indexed
    base corpus — the Lee et al. policy under the incremental
    convention: history is first-seen, so EVERY delta occurrence of a
    span already in the index is deleted (temporal order wins, not
    doc_id order — a delta doc with a lower id than its history partner
    is still the victim); among delta docs the lowest delta doc_id
    keeps. Touches delta text + the stored index only; history text is
    never rescanned, and the candidate join is keyed on the 16-byte
    shingle digest with the corpus-global df cap re-derived by MERGING
    the stored per-tag frequency partials with the delta's (document
    frequency cannot be pre-capped per tag).

    Per-doc output matches :func:`strip_verbatim_spans` (n_tokens,
    n_removed, n_intervals, clean_md5), rows for delta docs only.
    """
    return _strip_summary(
        delta_docs,
        _incremental_victim_intervals(
            delta_docs, index_shingles, index_stats, L, min_span, exclude_src_ids
        ),
    )


def incremental_span_strip_text(
    delta_docs: DataFrame,
    index_shingles: DataFrame,
    index_stats: DataFrame,
    L: int = SPAN_SHINGLE,
    min_span: int = MIN_SPAN_TOKENS,
    exclude_src_ids: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, text) for the delta with indexed spans deleted — the
    streaming fold's pre-chunk hook (same victim policy as
    :func:`incremental_span_strip_frame`, returning survivor text).

    ``exclude_src_ids`` (optional doc_id frame) bars those index docs
    from claiming spans. The streaming fold passes the CURRENT batch's
    own ids: micro-batches commit serially, so the only rows a bucketed
    accelerator table can carry beyond the committed corpus are a
    crashed attempt of this very batch — excluding them restores
    committed-only semantics with an O(batch) anti-join on the (small)
    candidate set instead of an O(corpus) membership join, and the
    bucketed read stays exchange-free.
    """
    return _rebuild_text(
        delta_docs,
        _incremental_victim_intervals(
            delta_docs, index_shingles, index_stats, L, min_span, exclude_src_ids
        ),
    )


def _incremental_victim_intervals(
    delta_docs: DataFrame,
    index_shingles: DataFrame,
    index_stats: DataFrame,
    L: int = SPAN_SHINGLE,
    min_span: int = MIN_SPAN_TOKENS,
    exclude_src_ids: DataFrame | None = None,
) -> DataFrame:
    # every consumer of both shingle streams is sh-keyed (stats aggs,
    # the cap anti-joins, the history probe join, both delta self-join
    # sides): one explicit hash(sh) exchange per stream lets
    # ReuseExchange serve them all from a single scan+md5 execution
    # (the _shingles r16 rule)
    sd = _raw_shingles(delta_docs, L).repartition("sh")
    d_stats = sd.groupBy("sh").agg(F.countDistinct("doc_id").alias("n_docs"))
    hot = (
        index_stats.unionByName(d_stats)
        .groupBy("sh")
        .agg(F.sum("n_docs").alias("df"))
        .filter(F.col("df") > SPAN_DF_CAP)
        .select("sh")
    )
    sdc = sd.join(hot, "sh", "left_anti")
    ih = index_shingles.join(hot, "sh", "left_anti")
    mh = (
        sdc.alias("d")
        .join(ih.alias("h"), "sh")
        .select(
            F.col("h.doc_id").alias("src"),
            F.col("d.doc_id").alias("doc_id"),
            F.col("d.pos").alias("pos_b"),
            (F.col("h.pos") - F.col("d.pos")).alias("diag"),
        )
    )
    if exclude_src_ids is not None:
        mh = mh.join(
            F.broadcast(exclude_src_ids.select(F.col("doc_id").alias("src"))),
            "src",
            "left_anti",
        )
    md = (
        sdc.alias("a")
        .join(sdc.alias("b"), "sh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("src"),
            F.col("b.doc_id").alias("doc_id"),
            F.col("b.pos").alias("pos_b"),
            (F.col("a.pos") - F.col("b.pos")).alias("diag"),
        )
    )
    # DISTINCT is load-bearing: a crash-replayed bucketed append leaves
    # duplicate index rows, and a duplicated (src, doc, diag, pos)
    # match would break the row_number gaps-and-islands arithmetic
    # (pos_b - rn stops being constant along a run).
    m = mh.unionByName(md).distinct()
    w = Window.partitionBy("src", "doc_id", "diag").orderBy("pos_b")
    islands = (
        m.withColumn("isl", F.col("pos_b") - F.row_number().over(w))
        .groupBy("src", "doc_id", "diag", "isl")
        .agg(
            (F.count(F.lit(1)) + F.lit(L - 1)).alias("span_tokens"),
            F.min("pos_b").alias("s"),
        )
        .filter(F.col("span_tokens") >= min_span)
    )
    return _union_intervals(
        islands.select(
            "doc_id", "s", (F.col("s") + F.col("span_tokens")).alias("e")
        )
    )


def span_strip_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered incremental demo: planted corpus split into an
    already-indexed base (doc_id % 10 != 0) and an arriving delta
    (doc_id % 10 == 0); the delta's spans strip against the base's
    shingle index built in-plan. The planted boilerplate phrase lands
    on every 17th doc, so base and delta genuinely share verbatim
    spans across the split — including delta doc 0, whose id is LOWER
    than its history partners but which still loses its phrase
    (first-seen-in-history wins under the incremental convention; the
    batch ``text_span_strip`` would have kept it). The disk
    persistence path — write, extend, fold against the read-back — is
    exercised in ``tests/test_spans.py``.
    """
    # Spread before the shingle scans (the single-file row-group-count
    # split bound — see text_distinct_hll): measured 40.3s -> 28.6s at
    # the 100x probe corpus.
    docs = plant_boilerplate(
        load_table_spread(spark, sf_dir, "documents").select("doc_id", "text")
    )
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    ish = _raw_shingles(base).repartition("sh")
    istats = ish.groupBy("sh").agg(F.countDistinct("doc_id").alias("n_docs"))
    return incremental_span_strip_frame(delta, ish, istats)


#: shared CTE chain through ``spans`` (all maximal islands); the two
#: oracles append different tails
_SPANS_CTE_PREFIX = f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % {SPAN_PLANT_MOD} = 0 THEN
           text || ' ' || (CASE doc_id % {len(SPAN_PHRASES)}
             WHEN 0 THEN '{SPAN_PHRASES[0]}'
             WHEN 1 THEN '{SPAN_PHRASES[1]}'
             ELSE '{SPAN_PHRASES[2]}' END)
         ELSE text END AS text
  FROM documents
),
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM planted),
sh0 AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         md5(array_to_string(w[i : i + {SPAN_SHINGLE - 1}], ' ')) AS sh
  FROM toks, UNNEST(range(1, len(w) - {SPAN_SHINGLE} + 2)) AS t(i)
),
hot AS (
  SELECT sh FROM sh0 GROUP BY sh
  HAVING COUNT(DISTINCT doc_id) > {SPAN_DF_CAP}
),
sh AS (SELECT * FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diag
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
),
isl AS (
  SELECT doc_a, doc_b, diag,
         pos_a - ROW_NUMBER() OVER (
           PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS island,
         pos_a, pos_b
  FROM m
),
spans AS (
  SELECT doc_a, doc_b,
         CAST(COUNT(*) + {SPAN_SHINGLE - 1} AS BIGINT) AS span_tokens,
         MIN(pos_a) AS a_start, MIN(pos_b) AS b_start
  FROM isl GROUP BY doc_a, doc_b, diag, island
  HAVING COUNT(*) + {SPAN_SHINGLE - 1} >= {MIN_SPAN_TOKENS}
)"""

EXACT_SUBSTRING_ORACLE = _SPANS_CTE_PREFIX + f""",
ranked AS (
  SELECT doc_a, doc_b, span_tokens, a_start, b_start,
         CAST(COUNT(*) OVER (PARTITION BY doc_a, doc_b) AS BIGINT) AS n_spans,
         ROW_NUMBER() OVER (
           PARTITION BY doc_a, doc_b
           ORDER BY span_tokens DESC, a_start, b_start) AS rn
  FROM spans
)
SELECT g.doc_a, g.doc_b, g.n_spans, g.span_tokens, g.a_start, g.b_start,
       md5(array_to_string(
         t.w[g.a_start + 1 : g.a_start + g.span_tokens], ' '
       )) AS span_md5
FROM ranked g JOIN toks t ON t.doc_id = g.doc_a
WHERE g.rn = 1
ORDER BY doc_a, doc_b
"""

SPAN_STRIP_ORACLE = _SPANS_CTE_PREFIX + """,
iv AS (
  SELECT DISTINCT doc_b AS doc_id, b_start AS s, b_start + span_tokens AS e
  FROM spans
),
mg AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_grp
  FROM iv
),
mg2 AS (
  SELECT doc_id, s, e,
         SUM(new_grp) OVER (PARTITION BY doc_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM mg
),
merged AS (
  SELECT doc_id, grp, MIN(s) AS s, MAX(e) AS e FROM mg2 GROUP BY doc_id, grp
),
tk AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, w[i] AS tok
  FROM toks, UNNEST(range(1, len(w) + 1)) AS t(i)
),
keptt AS (
  SELECT t.doc_id, t.p, t.tok FROM tk t
  WHERE NOT EXISTS (SELECT 1 FROM merged m
                    WHERE m.doc_id = t.doc_id AND t.p >= m.s AND t.p < m.e)
),
pd AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         md5(string_agg(tok, ' ' ORDER BY p)) AS clean_md5
  FROM keptt GROUP BY doc_id
),
tot AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM toks),
niv AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_intervals
  FROM merged GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens,
       t.n_tokens - COALESCE(p.n_kept, 0) AS n_removed,
       COALESCE(n.n_intervals, 0) AS n_intervals,
       p.clean_md5
FROM tot t LEFT JOIN pd p USING (doc_id) LEFT JOIN niv n USING (doc_id)
ORDER BY doc_id
"""


SPAN_STRIP_INCREMENTAL_ORACLE = _SPANS_CTE_PREFIX + f""",
ih AS (SELECT * FROM sh WHERE doc_id % 10 != 0),
dh AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
im AS (
  SELECT h.doc_id AS src, d.doc_id AS doc_id, d.pos AS pos_b,
         h.pos - d.pos AS diag
  FROM dh d JOIN ih h ON d.sh = h.sh
  UNION ALL
  SELECT a.doc_id, b.doc_id, b.pos, a.pos - b.pos
  FROM dh a JOIN dh b ON a.sh = b.sh AND a.doc_id < b.doc_id
),
iisl AS (
  SELECT src, doc_id, diag,
         pos_b - ROW_NUMBER() OVER (
           PARTITION BY src, doc_id, diag ORDER BY pos_b) AS island,
         pos_b
  FROM im
),
ispans AS (
  SELECT doc_id,
         CAST(COUNT(*) + {SPAN_SHINGLE - 1} AS BIGINT) AS span_tokens,
         MIN(pos_b) AS s
  FROM iisl GROUP BY src, doc_id, diag, island
  HAVING COUNT(*) + {SPAN_SHINGLE - 1} >= {MIN_SPAN_TOKENS}
),
iv AS (SELECT DISTINCT doc_id, s, s + span_tokens AS e FROM ispans),
mg AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_grp
  FROM iv
),
mg2 AS (
  SELECT doc_id, s, e,
         SUM(new_grp) OVER (PARTITION BY doc_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM mg
),
merged AS (
  SELECT doc_id, grp, MIN(s) AS s, MAX(e) AS e FROM mg2 GROUP BY doc_id, grp
),
dtoks AS (SELECT * FROM toks WHERE doc_id % 10 = 0),
tk AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, w[i] AS tok
  FROM dtoks, UNNEST(range(1, len(w) + 1)) AS t(i)
),
keptt AS (
  SELECT t.doc_id, t.p, t.tok FROM tk t
  WHERE NOT EXISTS (SELECT 1 FROM merged m
                    WHERE m.doc_id = t.doc_id AND t.p >= m.s AND t.p < m.e)
),
pd AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         md5(string_agg(tok, ' ' ORDER BY p)) AS clean_md5
  FROM keptt GROUP BY doc_id
),
tot AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM dtoks),
niv AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_intervals
  FROM merged GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens,
       t.n_tokens - COALESCE(p.n_kept, 0) AS n_removed,
       COALESCE(n.n_intervals, 0) AS n_intervals,
       p.clean_md5
FROM tot t LEFT JOIN pd p USING (doc_id) LEFT JOIN niv n USING (doc_id)
ORDER BY doc_id
"""


QUERIES = [
    Query(
        "dedup_exact_substring",
        "verbatim cross-document token spans (suffix-array ExactSubstr "
        "semantics via shingle diagonal islands): longest span, island "
        "count, offsets, and span-text md5 per pair",
        dedup_exact_substring,
        EXACT_SUBSTRING_ORACLE,
    ),
    Query(
        "text_span_strip",
        "ExactSubstr removal: delete repeated verbatim spans from all "
        "but the lowest-doc_id occurrence (interval-union merge, "
        "range anti-join, md5-verified survivor text)",
        text_span_strip,
        SPAN_STRIP_ORACLE,
    ),
    Query(
        "span_strip_incremental",
        "ExactSubstr for arriving docs vs a persisted shingle index: "
        "history-first-seen victim policy, merged df cap, md5-verified "
        "survivor text (O(delta) fold, history text never rescanned)",
        span_strip_incremental,
        SPAN_STRIP_INCREMENTAL_ORACLE,
    ),
]
