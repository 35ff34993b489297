"""DSIR data selection: hashed n-gram importance resampling.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling") select pre-training documents whose hashed n-gram
distribution looks like a TARGET corpus: featurize every document into
hashed unigram+bigram bucket counts, fit bag-of-buckets unigram models
for the target slice and the raw pool (add-1 smoothing), and score
each document by its log importance weight

    w(doc) = sum over gram occurrences of ln p_target(b) - ln p_raw(b)

then keep the top-K. This operator is the published recipe end to end
as a catalog query — the distribution fit, the per-doc weights, and
the exact top-K selection frontier — with every number value-checked.

Spark-first shape (100 TB):
- The gram stream (explode of an ``arrays_zip`` of shifted slice views —
  zero-shuffle, in-row adjacency) is cached once and feeds three
  aggregates.
- Both distributions land in ONE fixed-size bucket table (``N_BUCKETS``
  rows) that joins back to the stream as a BROADCAST — the model is
  O(buckets) no matter the corpus size, which is the whole point of
  hashed features in the paper.
- The per-doc score is one doc_id-keyed shuffle; the selection
  frontier is TakeOrdered(K) reduced to a 1-row broadcast cutoff, so
  the ``selected`` flag never needs a global sort of the corpus.
- Gram -> bucket hashing is md5-derived (bit-identical across engines,
  the ``dedup_simhash`` lesson), and the per-doc weight folds its
  bucket log-ratios in sorted order (the ``bigram_logprob`` lesson) so
  the rounded weight can never flip on partial-sum order.

The synthetic corpus is i.i.d. token soup — every source has the same
distribution, so true DSIR weights would be noise. The query plants a
deterministic "target flavor" (identically in the oracle): target-slice
docs get a flavor phrase appended, and so do raw docs with
``doc_id % 7 == 3`` — the in-distribution needles the selector is
supposed to surface. The pytest asserts the selected set is dominated
by flavored docs; the oracle value-checks every weight and the exact
selection frontier (cutoff weight + tie-broken boundary doc).

Reference parity: no counterpart (the reference has no selection
surface); driver-mandated LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import Query
from ..sources.tables import load_table, load_table_spread
from .lifecycle import scoped_cache

N_BUCKETS = 512
SELECT_K = 100
TARGET_SOURCES = ("src0", "src1", "src2")
_FLAVOR = " quick brown fox jumps over the lazy dog"


def _planted() -> Column:
    """Append the target flavor to target-slice docs and residue-3 docs."""
    flavored = F.col("source").isin(*TARGET_SOURCES) | (F.col("doc_id") % 7 == 3)
    return F.when(flavored, F.concat("text", F.lit(_FLAVOR))).otherwise(F.col("text"))


_TGT_SQL = "(" + ", ".join(f"'{s}'" for s in TARGET_SOURCES) + ")"
_PLANTED_SQL = (
    f"CASE WHEN source IN {_TGT_SQL} OR doc_id % 7 = 3"
    f" THEN text || '{_FLAVOR}' ELSE text END"
)


def _bucket(g: Column) -> Column:
    return F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long") % N_BUCKETS


def dsir_gram_stream(docs: DataFrame, planted: Column | None = None) -> DataFrame:
    """(doc_id, source, b): one row per unigram/bigram occurrence.

    Zero-shuffle gram derivation (the ``sketch._gram_stream`` trick):
    bigrams come from exploding an ``arrays_zip`` of two shifted
    ``slice`` views of the token array — adjacency never leaves the
    row — instead of the posexplode + window-lead shape, whose
    per-doc window is a corpus-wide shuffle of every token."""
    p = planted if planted is not None else F.col("text")
    w = F.split(p, " ")
    n1 = F.size(w) - F.lit(1)
    uni = docs.select("doc_id", "source", F.explode(w).alias("g"))
    bi = (
        docs.filter(F.size(w) >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(F.arrays_zip(F.slice(w, 1, n1), F.slice(w, 2, n1))).alias("z"),
        )
        .select(
            "doc_id",
            "source",
            F.concat_ws(" ", F.col("z.0"), F.col("z.1")).alias("g"),
        )
    )
    return uni.unionByName(bi).select("doc_id", "source", _bucket(F.col("g")).alias("b"))


def dsir_model_rows(grams: DataFrame) -> DataFrame:
    """(b, cr, ct): the bucket-count model STATE for a gram stream.

    This is the mergeable object the incremental path persists:
    raw-pool and target counts are plain sums, so model(h ∪ d) =
    merge(model(h), model(d)) by bucket-wise addition, and the totals
    (nr, nt) re-derive exactly as column sums — the model never needs
    the grams again."""
    is_tgt = F.col("source").isin(*TARGET_SOURCES)
    return grams.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(is_tgt.cast("long")).alias("ct"),
    )


def merge_dsir_models(*models: DataFrame) -> DataFrame:
    """Bucket-wise additive merge of model states (the CMS convention)."""
    out = models[0]
    for m in models[1:]:
        out = out.unionByName(m)
    return out.groupBy("b").agg(
        F.sum("cr").alias("cr"), F.sum("ct").alias("ct")
    )


def _ratio_frame(model: DataFrame) -> DataFrame:
    """(b, lr): add-1-smoothed log importance ratio per bucket, totals
    re-derived from the model rows themselves (exact column sums).

    The model is eagerly checkpointed first: it is <= N_BUCKETS rows
    but feeds TWO consumers (the totals aggregate and the ratio join),
    and without the pin each consumer would re-run the corpus-scale
    gram aggregation behind it."""
    m = model.localCheckpoint(eager=True)
    totals = m.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    lr = F.log((F.col("ct") + 1).cast("double") / (F.col("nt") + N_BUCKETS)) - F.log(
        (F.col("cr") + 1).cast("double") / (F.col("nr") + N_BUCKETS)
    )
    return m.crossJoin(F.broadcast(totals)).select("b", lr.alias("lr"))


def _doc_scores(grams: DataFrame, ratio: DataFrame) -> DataFrame:
    """(doc_id, n_grams, weight, avg_lr) by broadcast-model scoring."""
    lrs = F.sort_array(F.collect_list("lr"))
    fold = F.aggregate(lrs, F.lit(0.0), lambda a, x: a + x)
    # `weight` is the paper's raw log importance weight (a SUM over gram
    # occurrences); in a length-varying pool it selects on length —
    # every gram carries a smoothing-dominated bias term — so the
    # SELECTION key is the per-gram average (the length normalization
    # CCNet applies to LM scores for the same reason).
    return (
        grams.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(fold, 4).alias("weight"),
            F.round(fold / F.size(lrs), 4).alias("avg_lr"),
        )
    )


def _with_frontier(scored: DataFrame, k: int) -> DataFrame:
    """Exact top-``k`` flag: the k-th row of (avg_lr DESC, doc_id ASC)
    as a 1-row broadcast — TakeOrdered(k) then a re-sort of k rows,
    never a global sort. selected = strictly above the frontier, or
    tied on avg_lr and at-or-before the boundary doc."""
    cut = (
        scored.orderBy(F.col("avg_lr").desc(), "doc_id")
        .limit(k)
        .orderBy(F.col("avg_lr").asc(), F.col("doc_id").desc())
        .limit(1)
        .select(F.col("avg_lr").alias("w_k"), F.col("doc_id").alias("id_k"))
    )
    sel = (F.col("avg_lr") > F.col("w_k")) | (
        (F.col("avg_lr") == F.col("w_k")) & (F.col("doc_id") <= F.col("id_k"))
    )
    return scored.crossJoin(F.broadcast(cut)).select(
        "doc_id", "n_grams", "weight", "avg_lr", sel.alias("selected")
    )


def dsir_select(docs: DataFrame, k: int = SELECT_K) -> DataFrame:
    """Per-doc DSIR weights + exact top-``k`` selection flag."""
    grams = scoped_cache(dsir_gram_stream(docs, _planted()))
    scored = _doc_scores(grams, _ratio_frame(dsir_model_rows(grams)))
    return _with_frontier(scored, k)


def text_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered DSIR selection over ``documents`` (planted target).

    The scan is spread to defaultParallelism first (the single-file
    row-group split bound measured on the incremental twin: 37.1s ->
    9.8s at the 100x probe corpus)."""
    d = load_table_spread(spark, sf_dir, "documents")
    return dsir_select(d).orderBy("doc_id")


# --- incremental DSIR: the selection family joins the persisted-index
# convention --------------------------------------------------------
#
# The model state (b, cr, ct) is additive, so a stream maintains it as
# O(delta) tagged extends exactly like the CMS/Bloom/line indexes, and
# an arriving batch is scored against the merged model with O(batch)
# work — history grams are NEVER rescanned. The registered query runs
# that algebra in-plan on the repo's incremental convention (history =
# doc_id % 10 != 0, delta = % 10 == 0): model(h) ⊕ model(d) scores the
# delta docs, and the oracle recomputes the same numbers from scratch —
# a hash match certifies merge(model(h), model(d)) ≡ model(h ∪ d)
# through the full scoring pipeline, not just the counts. The disk
# round trip of the same algebra (extend/read/compact) is
# pytest-verified (tests/test_dsir.py).

DELTA_SELECT_K = 10


def dsir_select_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score the arriving delta against the MERGED history+delta model;
    exact top-``DELTA_SELECT_K`` selection frontier within the delta.

    Spread before the gram streams (the single-file row-group split
    bound): measured 37.1s -> 9.8s at the 100x probe corpus."""
    docs = load_table_spread(spark, sf_dir, "documents")
    g_h = dsir_gram_stream(docs.filter(F.col("doc_id") % 10 != 0), _planted())
    g_d = scoped_cache(
        dsir_gram_stream(docs.filter(F.col("doc_id") % 10 == 0), _planted())
    )
    model = merge_dsir_models(dsir_model_rows(g_h), dsir_model_rows(g_d))
    scored = _doc_scores(g_d, _ratio_frame(model))
    return _with_frontier(scored, DELTA_SELECT_K).orderBy("doc_id")


def extend_dsir_index(docs: DataFrame, path: str, tag: str) -> None:
    """Append ``docs``' model rows as the (overwrite-idempotent)
    ``delta=<tag>`` partition of a persisted DSIR model index — the
    selection-family twin of ``sketch.extend_cms_index``; a crash
    replay overwrites its own tag, so no batch double-counts."""
    import os

    rows = dsir_model_rows(dsir_gram_stream(docs, _planted()))
    rows.write.mode("overwrite").parquet(os.path.join(path, f"delta={tag}"))


def read_dsir_index(spark: SparkSession, path: str) -> DataFrame | None:
    """The merged (b, cr, ct) model across all visible delta tags (None
    if the index does not exist yet): one O(buckets · tags -> buckets)
    aggregate, never a corpus rescan."""
    from . import lsm

    raw = lsm.read_visible(spark, path)
    if raw is None:
        return None
    return merge_dsir_models(raw)


def compact_dsir_index(spark: SparkSession, path: str) -> None:
    """Merge every visible delta tag into one base version (the
    ``lsm.compact`` crash-safe versioned commit) — addition over tags
    IS the merge, so the compacted index scores identically while the
    per-read aggregation input drops back to ``N_BUCKETS`` rows."""
    from . import lsm

    lsm.compact(
        spark,
        path,
        {
            "": lambda df: df.groupBy("b").agg(
                F.sum("cr").alias("cr"), F.sum("ct").alias("ct")
            )
        },
    )


def _dsir_sql(scored_where: str = "", k: int = SELECT_K) -> str:
    """The DSIR recipe as DuckDB SQL; ``scored_where`` restricts which
    docs are SCORED (the model always fits on the full corpus)."""
    return f"""
WITH planted AS (
  SELECT doc_id, source, string_split({_PLANTED_SQL}, ' ') AS w FROM documents
),
uni AS (SELECT doc_id, source, unnest(w) AS g FROM planted),
bi AS (
  SELECT doc_id, source, b.w1 || ' ' || b.w2 AS g
  FROM (
    SELECT doc_id, source,
           unnest([{{'w1': w[i], 'w2': w[i+1]}} for i in range(1, len(w))]) AS b
    FROM planted WHERE len(w) >= 2
  )
),
grams AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(g), 1, 8))::BIGINT % {N_BUCKETS} AS b
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
),
per_bucket AS (
  SELECT b, COUNT(*) AS cr,
         SUM(CASE WHEN source IN {_TGT_SQL} THEN 1 ELSE 0 END) AS ct
  FROM grams GROUP BY b
),
totals AS (
  SELECT COUNT(*) AS nr,
         SUM(CASE WHEN source IN {_TGT_SQL} THEN 1 ELSE 0 END) AS nt
  FROM grams
),
ratio AS (
  SELECT b,
         ln((ct + 1)::DOUBLE / (nt + {N_BUCKETS}))
           - ln((cr + 1)::DOUBLE / (nr + {N_BUCKETS})) AS lr
  FROM per_bucket CROSS JOIN totals
),
scored AS (
  SELECT doc_id, COUNT(*) AS n_grams,
         ROUND(list_reduce(list(lr ORDER BY lr), (a, x) -> a + x), 4) AS weight,
         ROUND(list_reduce(list(lr ORDER BY lr), (a, x) -> a + x)
               / COUNT(*), 4) AS avg_lr
  FROM grams JOIN ratio USING (b)
  {scored_where}
  GROUP BY doc_id
),
lim AS (
  SELECT avg_lr, doc_id FROM scored
  ORDER BY avg_lr DESC, doc_id LIMIT {k}
),
cut AS (
  SELECT avg_lr AS w_k, doc_id AS id_k FROM lim
  ORDER BY avg_lr ASC, doc_id DESC LIMIT 1
)
SELECT doc_id, n_grams, weight, avg_lr,
       (avg_lr > w_k OR (avg_lr = w_k AND doc_id <= id_k)) AS selected
FROM scored CROSS JOIN cut
ORDER BY doc_id
"""


DSIR_ORACLE = _dsir_sql()

# From-scratch recompute of the delta docs' scores under the full-corpus
# model: a hash match against the Spark merge-then-score plan certifies
# the incremental model algebra end to end.
DSIR_INCREMENTAL_ORACLE = _dsir_sql(
    scored_where="WHERE doc_id % 10 = 0", k=DELTA_SELECT_K
)


QUERIES = [
    Query(
        "text_dsir_select",
        "DSIR importance resampling: hashed unigram+bigram bucket models "
        "(target slice vs raw pool), sorted-fold per-doc log importance "
        "weights, exact top-K selection frontier via a 1-row broadcast "
        "cutoff",
        text_dsir_select,
        DSIR_ORACLE,
    ),
    Query(
        "dsir_select_incremental",
        "incremental DSIR: O(delta) mergeable bucket-model extends; the "
        "arriving batch scored against the merged history+delta model "
        "with an exact within-delta top-K frontier",
        dsir_select_incremental,
        DSIR_INCREMENTAL_ORACLE,
    ),
]
