"""BM25 retrieval over the ``documents`` table.

Driver-mandated extension (LLM-data-pipeline similarity/search family):
classic sparse retrieval — an inverted (doc, term) frequency index,
Robertson/Spärck-Jones BM25 scoring, top-k serving per query, and the
MaxScore/WAND upper-bound pruning certificate that justifies the
100 TB serving path.

Scale story (the part the small-SF oracle can't see — each bullet was
probe-driven at 100x, see ``SCALE_PROBE_100X.json`` notes):

* The query frontier is BOUNDED (``BM25_NQ × BM25_QTERMS`` ≤ 64
  terms), collected once and pushed INTO the exploded corpus scan as a
  literal IN-filter — so the only shuffle is the ``(doc_id, term)`` tf
  aggregate of the MATCHING postings, with document length riding it
  as a ``min`` aggregate. Vocabulary-sized work never happens: df per
  query term equals its posting-list length.
* The corpus is spread before the explode when — and only when — the
  planned scan parallelism falls short of the cluster (a single-file
  corpus splits into at most its row-group count; a many-file
  production layout parallelizes itself and gets no extra exchange).
* Ranking is the salted two-stage top-k (rank inside (query, salt),
  then rank the ≤ k·SALTS survivors) — parallelism is never capped at
  one partition per query.

The MaxScore certificate (``text_bm25_maxscore``) verifies on-corpus
that per-term score upper bounds prune the candidate set WITHOUT
losing any true top-k member — the invariant a distributed serving
tier relies on to skip postings at 100 TB.

Reference parity note: the reference pipeline has no retrieval surface
(it is a CSV→Postgres ETL, `/root/reference/main.py:41-136`); this
module is part of the driver-mandated similarity-search extension
alongside ``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import Query
from ..sources.tables import load_table, spread_scan, table_bytes
from .lifecycle import scoped_cache

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 5
BM25_NQ = 16  # constant-size query frontier: the NQ smallest doc_ids
BM25_QTERMS = 4  # first QTERMS tokens of each query doc


def _query_frontier(spark: SparkSession, sf_dir: str):
    """The bounded query frontier, collected ONCE per query plan.

    ``BM25_NQ × BM25_QTERMS`` ≤ 64 terms — the same bounded-collect
    precedent as ``ann_incremental_serve``'s 50-query batch. Returns
    (sorted vocabulary list for the IN-pushdown, (query_id, term, qtf)
    frame for the broadcast side, sorted query-id list for consumers
    that push the ids into a scan as an IN-literal — the dense arm of
    ``retrieval_hybrid_fusion`` — or enumerate queries locally).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    qrows = (
        d.orderBy("doc_id")
        .limit(BM25_NQ)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice(toks, 1, BM25_QTERMS)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
        .collect()
    )
    qvocab = sorted({r.term for r in qrows})
    qterm = spark.createDataFrame(
        [(r.query_id, r.term, r.qtf) for r in qrows],
        "query_id long, term string, qtf long",
    )
    qids = sorted({r.query_id for r in qrows})
    return qvocab, qterm, qids


def _corpus_index(spark: SparkSession, sf_dir: str, frontier=None):
    """(query-term postings, query-vocab df+qtf broadcast, stats).

    The serving plan a 100 TB tier would run against a prebuilt
    inverted index, reconstructed self-contained: the query frontier
    is BOUNDED (``BM25_NQ × BM25_QTERMS`` ≤ 64 terms — the same
    bounded-collect precedent as ``ann_incremental_serve``'s 50-query
    batch), so its terms are collected once and pushed INTO the
    exploded corpus scan as a literal IN-filter. The only shuffle is
    then the (doc, term) tf aggregate of the MATCHING postings — the
    corpus itself is scanned once, map-side, and never shuffled. A
    first draft aggregated df over the full vocabulary instead
    (a second full-corpus-sized shuffle); the 100x probe measured that
    at 71x and this rewrite is what brought it back to near-linear —
    df over the postings of ≤64 terms is exactly equal (tf rows are
    one per (doc, term)) and vocabulary-sized work never happens.

    ``avgdl`` is integer-exact (``floor(1000·Σdl/N)/1000``) so both
    engines compute bit-identical normalization — no float-avg drift.
    """
    toks = F.split(F.col("text"), " ")
    # ``frontier`` lets two-round callers (PRF expansion) reuse an
    # already-collected frontier instead of re-running the bounded
    # collect.
    if frontier is None:
        frontier = _query_frontier(spark, sf_dir)
    qvocab, qterm = frontier[0], frontier[1]
    # A single-file corpus scans as ONE input partition (the _spread
    # lesson, operators/multimodal.py:142): without spreading, the
    # explode + map-side partial agg below runs on one core — the
    # 100x probe measured the tf stage at 102 s serial vs ~6 s spread.
    # spread_scan is conditional: at production layout (many files) the
    # scan parallelizes itself and NO exchange is added (an explicit
    # repartition(N) always materializes a full shuffle — AQE does not
    # coalesce a user-specified count). Multi-pass callers (PRF
    # expansion) build their passes over their own scoped-cached spread
    # frame in ``retrieval_prf_expansion`` rather than through here.
    dr = spread_scan(
        load_table(spark, sf_dir, "documents"),
        table_bytes(sf_dir, "documents"),
    )
    # Postings of the query vocabulary only: the IN-literal filter runs
    # map-side inside the explode, so the tf shuffle carries just the
    # matching (doc, term) rows, never the whole corpus. ONE corpus
    # pass serves postings AND the normalization stats (r17): the
    # filter additionally keeps each document's position-0 token as a
    # sentinel (split() never returns an empty array, so every doc
    # contributes ≥1 row), carrying (doc_id, dl) for docs with no
    # matching term; a sentinel-only row aggregates to tf = 0 and is
    # dropped from the postings but still prices the doc in the
    # (n_docs, total_dl) aggregate — the r16 shape re-scanned and
    # re-tokenized the whole corpus a second time just for those two
    # numbers. The cached frame is the pruned postings plus one ≤
    # 16-byte row per doc — tiny; every downstream consumer (scoring,
    # df counts, the MaxScore per-term frame, the stats aggregate)
    # reuses it instead of re-exploding the corpus.
    g = scoped_cache(
        dr.select(
            "doc_id",
            F.size(toks).alias("dl"),
            F.posexplode(toks).alias("pos", "term"),
        )
        .filter(F.col("term").isin(qvocab) | (F.col("pos") == 0))
        .groupBy("doc_id", "term")
        .agg(
            F.min("dl").alias("dl"),
            F.sum(
                F.when(F.col("term").isin(qvocab), 1).otherwise(0)
            ).alias("tf"),
            # exactly ONE group per doc holds its position-0 token, so
            # this flag marks one row per doc — the stats aggregate
            # below is then a plain filter over the cache, no doc-keyed
            # exchange.
            F.max(F.when(F.col("pos") == 0, 1).otherwise(0)).alias("s0"),
        )
    )
    tf = g.filter(F.col("tf") > 0).drop("s0")
    # df per query term == posting-list length (tf is one row per
    # (doc, term)): a ≤64-key aggregate over the pruned postings.
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = (
        g.filter(F.col("s0") == 1)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("total_dl"),
        )
        .select(
            "n_docs",
            (F.floor(1000 * F.col("total_dl") / F.col("n_docs")) / 1000.0).alias(
                "avgdl"
            ),
        )
    )
    qdf = df_.join(F.broadcast(qterm), "term")
    return tf, qdf, stats


def _idf(n_docs, df):
    return F.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _tf_norm(tf, dl, avgdl):
    return (tf * (BM25_K1 + 1.0)) / (
        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
    )


def bm25_scores(spark: SparkSession, sf_dir: str, frontier=None) -> DataFrame:
    """Exact BM25 score per (query, candidate doc), rounded to 6.

    Rounding happens BEFORE ranking in both engines so ties resolve
    identically (score desc, doc_id asc). ``frontier`` forwards an
    already-collected query frontier (``_corpus_index``'s reuse hook).
    """
    tf, qdf, stats = _corpus_index(spark, sf_dir, frontier=frontier)
    contrib = F.col("qtf") * _idf(F.col("n_docs"), F.col("df")) * _tf_norm(
        F.col("tf"), F.col("dl"), F.col("avgdl")
    )
    return (
        tf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )


_TOPK_SALTS = 32  # stage-1 fan-out of the two-stage top-k


def _topk_per_query(scored: DataFrame, k: int = BM25_TOPK) -> DataFrame:
    """Two-stage top-k: rank inside (query, salt) first, then rank the
    ≤ k·SALTS survivors per query.

    A single window partitioned by query_id alone caps parallelism at
    BM25_NQ partitions (16), each candidate-set-sized — at 100x that
    meant 16 of 32 cores sorting ~500k rows each. Stage 1 gives
    NQ·SALTS partitions (full parallelism, each sort 1/SALTS the
    size); the global top-k is provably inside the union of per-salt
    top-ks, and both stages order by the same (rounded score desc,
    doc_id asc) key, so the result is identical.
    """
    w1 = Window.partitionBy("query_id", "salt").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("salt", F.pmod(F.hash("doc_id"), F.lit(_TOPK_SALTS)))
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k)
        .withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .drop("salt", "r1")
    )


def _bm25_topk_frame(tf: DataFrame, qterm: DataFrame, stats: DataFrame) -> DataFrame:
    """Score + rank a (possibly multi-source) postings frame.

    ``tf``: (doc_id, term, dl, tf) postings already restricted to the
    query vocabulary; ``qterm``: (query_id, term, qtf); ``stats``: one
    row of MERGEABLE corpus partials (n_docs, total_dl) — avgdl is
    derived here with the integer-exact floor so merged partials give
    bit-identical normalization to a from-scratch build.

    The postings frame has two consumers (the per-term df aggregate on
    the broadcast side, and the scoring path), so the upstream subtree
    executes twice per round. Measured at sf0.1, a scoped cache here is
    a net LOSS (~0.6 s/round: the InMemoryRelation write + pipelining
    break costs more than the duplicated pruned-postings subtree) —
    callers whose subtree is expensive pass an already-cached frame
    (``_corpus_index`` does) instead of this helper caching blindly.
    """
    st = stats.select(
        "n_docs",
        (F.floor(1000 * F.col("total_dl") / F.col("n_docs")) / 1000.0).alias(
            "avgdl"
        ),
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qdf = df_.join(F.broadcast(qterm), "term")
    contrib = F.col("qtf") * _idf(F.col("n_docs"), F.col("df")) * _tf_norm(
        F.col("tf"), F.col("dl"), F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(st))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    return _topk_per_query(scored)


def text_bm25_topk(spark: SparkSession, sf_dir: str, frontier=None) -> DataFrame:
    """Top-k BM25 serving: k best candidate docs per query."""
    return (
        _topk_per_query(bm25_scores(spark, sf_dir, frontier=frontier))
        .select("query_id", "rnk", "doc_id", "score")
        .orderBy("query_id", "rnk")
    )


def text_bm25_maxscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaxScore/WAND pruning certificate per query.

    For each query term, the upper bound is the MAX exact per-doc
    contribution observed in its posting list (tighter than the
    analytic ``idf·(k1+1)`` bound, and exactly computable on both
    engines). A candidate doc survives pruning iff the sum of its
    matched terms' upper bounds reaches the exact kth-best score. The
    certificate verifies the serving-tier invariant: every true top-k
    member survives (``topk_preserved``), while ``n_pruned`` ≤
    ``n_candidates`` quantifies how much of the candidate set a
    distributed MaxScore scan may skip.
    """
    tf, qdf, stats = _corpus_index(spark, sf_dir)
    contrib = F.col("qtf") * _idf(F.col("n_docs"), F.col("df")) * _tf_norm(
        F.col("tf"), F.col("dl"), F.col("avgdl")
    )
    # Bounded by the frontier's posting lists; cached because three
    # consumers (ub, scored, doc_ub) fan out from it.
    per_term = scoped_cache(
        tf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(stats))
        .select("query_id", "term", "doc_id", contrib.alias("contrib"))
    )
    # Per-(query, term) upper bound over the posting list. Kept
    # UNROUNDED: only the final ub_sum is rounded, so monotonicity of
    # round() preserves ub_sum >= score -> round(ub_sum) >= round(score)
    # (rounding each term first can undershoot the rounded score by
    # 1e-6 per term and falsely prune a top-k member).
    ub = per_term.groupBy("query_id", "term").agg(
        F.max("contrib").alias("ub")
    )
    scored = per_term.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("contrib"), 6).alias("score")
    )
    topk = _topk_per_query(scored)
    kth = topk.groupBy("query_id").agg(F.min("score").alias("kth_score"))
    # Sum of matched-term upper bounds per candidate doc.
    doc_ub = (
        per_term.join(F.broadcast(ub), ["query_id", "term"])
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("ub"), 6).alias("ub_sum"))
    )
    pruned = (
        doc_ub.join(F.broadcast(kth), "query_id")
        .withColumn("survives", F.col("ub_sum") >= F.col("kth_score"))
    )
    topk_ids = topk.select("query_id", "doc_id")
    lost = (
        topk_ids.join(
            pruned.filter(~F.col("survives")).select("query_id", "doc_id"),
            ["query_id", "doc_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_lost"))
    )
    return (
        pruned.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.count_if(F.col("survives")).alias("n_pruned_survivors"),
        )
        .join(lost, "query_id", "left")
        .select(
            "query_id",
            "n_candidates",
            "n_pruned_survivors",
            (F.coalesce(F.col("n_lost"), F.lit(0)) == 0).alias("topk_preserved"),
        )
        .orderBy("query_id")
    )


_BM25_COMMON_SQL = f"""
tok AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         UNNEST(string_split(text, ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, MIN(dl) AS dl, COUNT(*) AS tf
  FROM tok GROUP BY doc_id, term
),
dfv AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
stats AS (
  SELECT COUNT(*) AS n_docs,
         FLOOR(1000.0 * SUM(len(string_split(text, ' '))) / COUNT(*)) / 1000.0
           AS avgdl
  FROM documents
),
q AS (
  SELECT doc_id AS query_id, string_split(text, ' ')[1:{BM25_QTERMS}] AS qt
  FROM documents ORDER BY doc_id LIMIT {BM25_NQ}
),
qterm AS (
  SELECT query_id, term, COUNT(*) AS qtf
  FROM (SELECT query_id, UNNEST(qt) AS term FROM q)
  GROUP BY query_id, term
),
per_term AS (
  SELECT qt.query_id, tf.term, tf.doc_id,
         qt.qtf * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * tf.tf * ({BM25_K1} + 1.0)
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
           AS contrib
  FROM tf
  JOIN qterm qt USING (term)
  JOIN dfv d ON tf.term = d.term
  CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id, ROUND(SUM(contrib), 6) AS score
  FROM per_term GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rnk
  FROM scored
)
"""

BM25_TOPK_ORACLE = f"""
WITH {_BM25_COMMON_SQL}
SELECT query_id, rnk, doc_id, score
FROM ranked WHERE rnk <= {BM25_TOPK}
ORDER BY query_id, rnk
"""

BM25_MAXSCORE_ORACLE = f"""
WITH {_BM25_COMMON_SQL},
ub AS (
  SELECT query_id, term, MAX(contrib) AS ub
  FROM per_term GROUP BY query_id, term
),
kth AS (
  SELECT query_id, MIN(score) AS kth_score
  FROM ranked WHERE rnk <= {BM25_TOPK} GROUP BY query_id
),
doc_ub AS (
  SELECT p.query_id, p.doc_id, ROUND(SUM(u.ub), 6) AS ub_sum
  FROM per_term p JOIN ub u ON p.query_id = u.query_id AND p.term = u.term
  GROUP BY p.query_id, p.doc_id
),
pruned AS (
  SELECT d.query_id, d.doc_id, d.ub_sum >= k.kth_score AS survives
  FROM doc_ub d JOIN kth k USING (query_id)
),
lost AS (
  SELECT r.query_id, COUNT(*) AS n_lost
  FROM ranked r JOIN pruned p
    ON r.query_id = p.query_id AND r.doc_id = p.doc_id
  WHERE r.rnk <= {BM25_TOPK} AND NOT p.survives
  GROUP BY r.query_id
)
SELECT p.query_id,
       COUNT(*) AS n_candidates,
       COUNT(*) FILTER (WHERE p.survives) AS n_pruned_survivors,
       COALESCE(MAX(l.n_lost), 0) = 0 AS topk_preserved
FROM pruned p LEFT JOIN lost l ON p.query_id = l.query_id
GROUP BY p.query_id
ORDER BY p.query_id
"""

# --- reciprocal-rank fusion over two lexical rankers --------------------------

RRF_K = 60  # the standard RRF damping constant (Cormack et al.)
RRF_FUSE_DEPTH = 10  # fuse each ranker's top-10 list
RRF_TOPK = 5  # fused results served per query


def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two DIFFERENT lexical rankers over the
    same query frontier: BM25 (length-normalized, saturated tf) and a
    raw TF-IDF dot product (``qtf · tf · ln(N/df)`` — the
    ``text_tfidf`` weighting, no length normalization). Each ranker
    contributes its top-``RRF_FUSE_DEPTH`` list; a candidate's fused
    score is ``Σ 1/(RRF_K + rank_i)`` over the lists it appears in,
    and the served result is the fused top-``RRF_TOPK``.

    The production rank-fusion shape: rankers never exchange scores
    (RRF is scale-free — only ranks cross the boundary), so any mix of
    retrieval tiers (sparse, dense, metadata) fuses the same way.

    Scale design: BOTH rankers score from the same pruned postings
    frame (one corpus scan, one tf shuffle — the scan is not repeated
    per ranker); each ranker ranks via the salted two-stage top-k; the
    fusion itself joins two ≤ NQ·DEPTH-row lists — constant-sized.
    Determinism: both rankers round scores to 6 BEFORE ranking with a
    doc_id tie-break, and the fused score is a sum of exact reciprocals
    of small integers rounded to 6, tie-broken by doc_id again.
    """
    tf, qdf, stats = _corpus_index(spark, sf_dir)
    base = tf.join(F.broadcast(qdf), "term").join(F.broadcast(stats))
    bm25 = F.col("qtf") * _idf(F.col("n_docs"), F.col("df")) * _tf_norm(
        F.col("tf"), F.col("dl"), F.col("avgdl")
    )
    tfidf = F.col("qtf") * F.col("tf") * F.log(
        F.col("n_docs") / F.col("df")
    )
    # Candidate-set-sized (≤ the frontier's posting lists, post-agg) and
    # consumed by BOTH rankers' top-k passes — scoped-cached so the
    # join+agg chain above the postings cache executes once, not twice
    # (r16; unlike the pruned-postings cache _bm25_topk_frame rejected,
    # this caches POST-aggregation rows, a fraction of the postings).
    scored = scoped_cache(
        base.groupBy("query_id", "doc_id").agg(
            F.round(F.sum(bm25), 6).alias("bm25_score"),
            F.round(F.sum(tfidf), 6).alias("tfidf_score"),
        )
    )
    r1 = _topk_per_query(
        scored.select("query_id", "doc_id", F.col("bm25_score").alias("score")),
        RRF_FUSE_DEPTH,
    ).select("query_id", "doc_id", F.col("rnk").alias("rank_bm25"))
    r2 = _topk_per_query(
        scored.select("query_id", "doc_id", F.col("tfidf_score").alias("score")),
        RRF_FUSE_DEPTH,
    ).select("query_id", "doc_id", F.col("rnk").alias("rank_tfidf"))
    fused = (
        r1.join(r2, ["query_id", "doc_id"], "full_outer")
        .withColumn(
            "rrf_score",
            F.round(
                F.when(
                    F.col("rank_bm25").isNotNull(),
                    1.0 / (RRF_K + F.col("rank_bm25")),
                ).otherwise(F.lit(0.0))
                + F.when(
                    F.col("rank_tfidf").isNotNull(),
                    1.0 / (RRF_K + F.col("rank_tfidf")),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= RRF_TOPK)
        .select(
            "query_id", "rnk", "doc_id", "rrf_score",
            "rank_bm25", "rank_tfidf",
        )
        .orderBy("query_id", "rnk")
    )


RRF_FUSION_ORACLE = f"""
WITH {_BM25_COMMON_SQL},
tfidf_scored AS (
  SELECT p.query_id, p.doc_id, ROUND(SUM(p.qtf * p.tf
           * ln(p.n_docs::DOUBLE / p.df)), 6) AS score
  FROM (SELECT qt.query_id, tf.doc_id, qt.qtf, tf.tf, d.df, s.n_docs
        FROM tf JOIN qterm qt USING (term)
        JOIN dfv d ON tf.term = d.term CROSS JOIN stats s) p
  GROUP BY p.query_id, p.doc_id
),
r1 AS (
  SELECT query_id, doc_id, rnk AS rank_bm25
  FROM ranked WHERE rnk <= {RRF_FUSE_DEPTH}
),
r2 AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank_tfidf
  FROM tfidf_scored
  QUALIFY rank_tfidf <= {RRF_FUSE_DEPTH}
),
fused AS (
  SELECT COALESCE(r1.query_id, r2.query_id) AS query_id,
         COALESCE(r1.doc_id, r2.doc_id) AS doc_id,
         r1.rank_bm25, r2.rank_tfidf,
         ROUND(COALESCE(1.0 / ({RRF_K} + r1.rank_bm25), 0)
               + COALESCE(1.0 / ({RRF_K} + r2.rank_tfidf), 0), 6)
           AS rrf_score
  FROM r1 FULL OUTER JOIN r2
    ON r1.query_id = r2.query_id AND r1.doc_id = r2.doc_id
)
SELECT query_id, rnk, doc_id, rrf_score, rank_bm25, rank_tfidf
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, doc_id) AS rnk
      FROM fused)
WHERE rnk <= {RRF_TOPK}
ORDER BY query_id, rnk
"""


# --- Dirichlet query-likelihood ranking ---------------------------------------

#: Dirichlet smoothing pseudo-count (Zhai & Lafferty 2001). Tuned to
#: the corpus's ~40-token documents (the canonical 2000-2500 news
#: setting would swamp dl at this length scale); any positive value is
#: the same algebra.
QL_MU = 300.0


def text_ql_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty,
    SIGIR 2001) — the third classical lexical ranker beside BM25 and
    TF-IDF: ``score(q,d) = Σ_{t∈q} qtf·ln((tf_td + μ·P(t|C)) /
    (dl_d + μ))`` INCLUDING the missing-term smoothing mass (a doc is
    penalized for query terms it lacks — scoring only matching terms
    mis-ranks).

    Candidates are docs matching ≥1 query term (the Indri/production
    restriction); the full smoothed score decomposes so nothing
    corpus-sized is needed beyond the pruned postings:
    ``score = A_q + Σ_match qtf·(ln(tf + μP_t) − ln(μP_t))
    − Qlen_q·ln(dl + μ)`` where ``A_q = Σ_{t∈q} qtf·ln(μP_t)`` and
    ``Qlen_q = Σ qtf`` are per-query constants over the ≤ NQ·QTERMS
    broadcast frame, and collection statistics (``cf_t``, total
    collection length) ride the same bounded frontier pushdown as
    BM25's df. Scale shape: identical to the probed BM25 plan — one
    spread corpus scan with the IN-literal filter, one (doc, term) tf
    aggregate, salted two-stage top-k.
    """
    qvocab, qterm, _ = _query_frontier(spark, sf_dir)
    dr = spread_scan(
        load_table(spark, sf_dir, "documents"),
        table_bytes(sf_dir, "documents"),
    )
    toks = F.split(F.col("text"), " ")
    # One corpus pass for postings AND the collection-length stat: the
    # position-0 sentinel row prices every doc's dl without a second
    # scan+tokenize (the _corpus_index r17 shape).
    g = scoped_cache(
        dr.select(
            "doc_id",
            F.size(toks).alias("dl"),
            F.posexplode(toks).alias("pos", "term"),
        )
        .filter(F.col("term").isin(qvocab) | (F.col("pos") == 0))
        .groupBy("doc_id", "term")
        .agg(
            F.min("dl").alias("dl"),
            F.sum(
                F.when(F.col("term").isin(qvocab), 1).otherwise(0)
            ).alias("tf"),
            F.max(F.when(F.col("pos") == 0, 1).otherwise(0)).alias("s0"),
        )
    )
    tf = g.filter(F.col("tf") > 0).drop("s0")
    stats = g.filter(F.col("s0") == 1).agg(F.sum("dl").alias("total_dl"))
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    # μ·P(t|C) per query term, and the per-query constants A_q, Qlen_q
    # — all on ≤ NQ·QTERMS-row broadcast frames.
    qt = (
        qterm.join(F.broadcast(cf), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "mu_p", F.lit(QL_MU) * F.col("cf") / F.col("total_dl")
        )
    )
    qconst = qt.groupBy("query_id").agg(
        F.sum(F.col("qtf") * F.log(F.col("mu_p"))).alias("a_q"),
        F.sum("qtf").alias("qlen"),
    )
    inc = F.col("qtf") * (
        F.log(F.col("tf") + F.col("mu_p")) - F.log(F.col("mu_p"))
    )
    scored = (
        tf.join(F.broadcast(qt.select("query_id", "term", "qtf", "mu_p")), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(inc).alias("inc_sum"), F.min("dl").alias("dl"))
        .join(F.broadcast(qconst), "query_id")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.col("a_q")
                + F.col("inc_sum")
                - F.col("qlen") * F.log(F.col("dl") + F.lit(QL_MU)),
                6,
            ).alias("score"),
        )
    )
    return (
        _topk_per_query(scored)
        .select("query_id", "rnk", "doc_id", "score")
        .orderBy("query_id", "rnk")
    )


QL_DIRICHLET_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
q AS (
  SELECT doc_id AS query_id, string_split(text, ' ')[1:{BM25_QTERMS}] AS qt
  FROM documents ORDER BY doc_id LIMIT {BM25_NQ}
),
qterm AS (
  SELECT query_id, term, COUNT(*) AS qtf
  FROM (SELECT query_id, UNNEST(qt) AS term FROM q)
  GROUP BY query_id, term
),
tf AS (
  SELECT doc_id, term, MIN(dl) AS dl, COUNT(*) AS tf
  FROM tok WHERE term IN (SELECT DISTINCT term FROM qterm)
  GROUP BY doc_id, term
),
stats AS (
  SELECT SUM(len(string_split(text, ' ')))::DOUBLE AS total_dl
  FROM documents
),
cf AS (SELECT term, SUM(tf) AS cf FROM tf GROUP BY term),
qt AS (
  SELECT qterm.query_id, qterm.term, qterm.qtf,
         {QL_MU!r} * cf.cf / s.total_dl AS mu_p
  FROM qterm JOIN cf USING (term) CROSS JOIN stats s
),
qconst AS (
  SELECT query_id, SUM(qtf * ln(mu_p)) AS a_q, SUM(qtf) AS qlen
  FROM qt GROUP BY query_id
),
scored AS (
  SELECT m.query_id, m.doc_id,
         ROUND(c.a_q + m.inc_sum - c.qlen * ln(m.dl + {QL_MU!r}), 6) AS score
  FROM (
    SELECT qt.query_id, tf.doc_id,
           SUM(qt.qtf * (ln(tf.tf + qt.mu_p) - ln(qt.mu_p))) AS inc_sum,
           MIN(tf.dl) AS dl
    FROM tf JOIN qt USING (term)
    GROUP BY qt.query_id, tf.doc_id
  ) m JOIN qconst c USING (query_id)
)
SELECT query_id, rnk, doc_id, score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rnk
      FROM scored)
WHERE rnk <= {BM25_TOPK}
ORDER BY query_id, rnk
"""


# --- hybrid dense + sparse retrieval fusion ----------------------------------

HYBRID_ALPHA = 0.5  # convex weight on the sparse (BM25) side
HYBRID_DEPTH = RRF_FUSE_DEPTH  # each ranker contributes its top-10
HYBRID_TOPK = 5


def _minmax_norm(top: DataFrame, out: str) -> DataFrame:
    """Per-query min-max normalization of a ranker's top list — the
    standard hybrid-search score calibration (scores from BM25 and
    cosine live on incomparable scales; ranks alone would discard the
    margin information RRF ignores). The min/max run over the ranker's
    own top-``HYBRID_DEPTH`` list, so the frame is ≤ NQ·DEPTH rows and
    the stats join is a broadcast. A degenerate list (max == min) maps
    to 1.0 in both engines.

    ``top`` has TWO consumers here (the min/max aggregate and the join
    left side) — scoped-cached so the ranker's whole scoring + salted
    top-k subtree executes ONCE per arm, not once per consumer (r17;
    the stage profile measured the dense arm's broadcast-nested-loop
    cosine pass and the sparse arm's postings aggregation each running
    twice through this helper — the same defect class as the r16
    rrf_fusion dual-score fix; the cache is ≤ NQ·DEPTH rows)."""
    top = scoped_cache(top)
    mm = top.groupBy("query_id").agg(
        F.min("score").alias("smin"), F.max("score").alias("smax")
    )
    norm = F.when(
        F.col("smax") > F.col("smin"),
        F.round((F.col("score") - F.col("smin")) / (F.col("smax") - F.col("smin")), 6),
    ).otherwise(F.lit(1.0))
    return top.join(F.broadcast(mm), "query_id").select(
        "query_id", "doc_id", F.col("rnk").alias(f"rank_{out}"),
        norm.alias(f"norm_{out}"),
    )


def retrieval_hybrid_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid dense + sparse retrieval: min-max-normalized convex score
    fusion of the certified BM25 ranker and an exact-cosine dense
    ranker over the SAME query frontier — the production RAG serving
    shape (a lexical tier and an embedding tier fused per query).

    Queries are the BM25 frontier docs; each query's dense vector is
    its own embedding row (documents and embeddings are id-aligned).
    Self-hits are excluded on BOTH sides (the query doc would trivially
    top each list). Each ranker serves its top-``HYBRID_DEPTH`` by its
    own score (rounded to 6 BEFORE ranking, doc_id tie-break); scores
    are min-max normalized within each list; the fused score is
    ``α·norm_sparse + (1-α)·norm_dense`` with 0 for a candidate absent
    from a list, rounded to 6 before the final rank.

    Scale design: the sparse side is the probed BM25 plan verbatim
    (bounded frontier IN-pushdown, salted two-stage top-k); the dense
    side broadcasts the ≤ NQ query vectors into ONE embeddings pass
    (the ``ann_topk_bruteforce`` shape — at 100 TB an ANN tier such as
    ``ann_ivfpq_neighbors`` swaps in as the candidate generator without
    touching the fusion, which only ever sees two ≤ NQ·DEPTH-row
    lists). No stage shuffles the corpus beyond the BM25 tf aggregate.
    """
    from ..sources.tables import load_embeddings_spread
    from .similarity import _dot

    frontier = _query_frontier(spark, sf_dir)
    tf, qdf, stats = _corpus_index(spark, sf_dir, frontier=frontier)
    contrib = F.col("qtf") * _idf(F.col("n_docs"), F.col("df")) * _tf_norm(
        F.col("tf"), F.col("dl"), F.col("avgdl")
    )
    sparse_scored = (
        tf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
        .filter(F.col("doc_id") != F.col("query_id"))
    )
    sparse = _minmax_norm(
        _topk_per_query(sparse_scored, HYBRID_DEPTH), "sparse"
    )
    e = load_embeddings_spread(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    # The ≤ NQ query vectors: the frontier's already-collected ids push
    # into a dedicated embeddings scan as an IN-literal (PushedFilters
    # reaches the parquet footer — row-group pruning instead of a full
    # second pass), and the norm is computed on the ≤ NQ matching rows
    # only. The first draft re-derived the ids from the postings df
    # aggregate (a whole tf-cache pass + distinct exchange to list 16
    # already-known ids — the eval_metrics defect class, r16) and
    # extracted the vectors with a broadcast join against the full
    # spread scan. Equivalence: every term of query q occurs in doc q
    # itself, so q always survives the postings join the old derivation
    # ran — both enumerate exactly the frontier's query ids (the oracle
    # enumerates FROM qterm too).
    qids = frontier[2]
    qvecs = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").isin(qids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
        .withColumn("qnorm", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))
    dense_scored = e.join(
        F.broadcast(qvecs), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.round(cos, 6).alias("score"),
    )
    dense = _minmax_norm(_topk_per_query(dense_scored, HYBRID_DEPTH), "dense")
    fused = sparse.join(dense, ["query_id", "doc_id"], "full_outer").withColumn(
        "hybrid_score",
        F.round(
            F.lit(HYBRID_ALPHA) * F.coalesce("norm_sparse", F.lit(0.0))
            + F.lit(1.0 - HYBRID_ALPHA) * F.coalesce("norm_dense", F.lit(0.0)),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("hybrid_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= HYBRID_TOPK)
        .select(
            "query_id", "rnk", "doc_id", "hybrid_score",
            "norm_sparse", "norm_dense", "rank_sparse", "rank_dense",
        )
        .orderBy("query_id", "rnk")
    )


HYBRID_FUSION_ORACLE = f"""
WITH {_BM25_COMMON_SQL},
r_s AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank_sparse
  FROM scored WHERE doc_id != query_id
  QUALIFY rank_sparse <= {HYBRID_DEPTH}
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qd AS (SELECT DISTINCT query_id FROM qterm),
dcos AS (
  SELECT qd.query_id, c.vec_id AS doc_id,
         ROUND(list_cosine_similarity(qe.v, c.v), 6) AS score
  FROM qd JOIN e qe ON qe.vec_id = qd.query_id
  JOIN e c ON c.vec_id != qd.query_id
),
r_d AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank_dense
  FROM dcos
  QUALIFY rank_dense <= {HYBRID_DEPTH}
),
n_s AS (
  SELECT query_id, doc_id, rank_sparse,
         CASE WHEN MAX(score) OVER (PARTITION BY query_id)
                   > MIN(score) OVER (PARTITION BY query_id)
              THEN ROUND((score - MIN(score) OVER (PARTITION BY query_id))
                   / (MAX(score) OVER (PARTITION BY query_id)
                      - MIN(score) OVER (PARTITION BY query_id)), 6)
              ELSE 1.0 END AS norm_sparse
  FROM r_s
),
n_d AS (
  SELECT query_id, doc_id, rank_dense,
         CASE WHEN MAX(score) OVER (PARTITION BY query_id)
                   > MIN(score) OVER (PARTITION BY query_id)
              THEN ROUND((score - MIN(score) OVER (PARTITION BY query_id))
                   / (MAX(score) OVER (PARTITION BY query_id)
                      - MIN(score) OVER (PARTITION BY query_id)), 6)
              ELSE 1.0 END AS norm_dense
  FROM r_d
),
fused AS (
  SELECT COALESCE(n_s.query_id, n_d.query_id) AS query_id,
         COALESCE(n_s.doc_id, n_d.doc_id) AS doc_id,
         ROUND({HYBRID_ALPHA!r} * COALESCE(norm_sparse, 0.0)
               + {1.0 - HYBRID_ALPHA!r} * COALESCE(norm_dense, 0.0), 6)
           AS hybrid_score,
         norm_sparse, norm_dense, rank_sparse, rank_dense
  FROM n_s FULL OUTER JOIN n_d
    ON n_s.query_id = n_d.query_id AND n_s.doc_id = n_d.doc_id
)
SELECT query_id, rnk, doc_id, hybrid_score,
       norm_sparse, norm_dense, rank_sparse, rank_dense
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY hybrid_score DESC, doc_id) AS rnk
      FROM fused)
WHERE rnk <= {HYBRID_TOPK}
ORDER BY query_id, rnk
"""


# --- persisted postings index + incremental serving --------------------------
#
# The production shape for retrieval over a growing corpus: the
# inverted index is a tagged-partition LSM store (the shared
# ``operators/lsm`` machinery: O(delta) extends, history partitions
# never rewritten, crash-safe versioned compaction). Postings rows are
# immutable per document (a doc lives in exactly one delta), so the
# fold is a plain union; the corpus-level normalization state
# (n_docs, total_dl) is a one-row MERGEABLE partial per tag — summing
# partials and flooring once gives the identical avgdl a from-scratch
# rebuild computes, which is what makes serve-from-index == rebuild an
# exact certificate rather than an approximation.


def _tokenized_spread_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scoped-cached ``(doc_id, toks)`` spread corpus frame for
    multi-pass retrieval bodies.

    The PRF/serve paths make 3-5 passes over one cached corpus frame;
    caching the TEXT made every pass re-run ``split`` on every document
    (r17 microbench: an explode+filter+agg postings pass over the token
    cache is 0.26 s vs 0.47 s over the text cache at sf0.1 — the split
    is ~45% of each pass). Tokenizing once into the cache removes that
    from every pass; the cached bytes are the same tokens the text held
    (array framing overhead only), so the memory class at 100 TB is
    unchanged from the text cache it replaces."""
    toks = F.split(F.col("text"), " ")
    return scoped_cache(
        spread_scan(
            load_table(spark, sf_dir, "documents").select("doc_id", "text"),
            table_bytes(sf_dir, "documents"),
        ).select("doc_id", toks.alias("toks"))
    )


def _postings_from_toks(tdf: DataFrame) -> DataFrame:
    """Full-vocabulary postings (doc_id, term, dl, tf) from an
    already-tokenized (doc_id, toks) frame — the :func:`bm25_postings`
    algebra minus the split."""
    return (
        tdf.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.min("dl").alias("dl"), F.count(F.lit(1)).alias("tf"))
    )


def _stats_from_toks(tdf: DataFrame) -> DataFrame:
    """One-row mergeable (n_docs, total_dl) partial from an
    already-tokenized frame — :func:`corpus_stats_partial` minus the
    split."""
    return tdf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).alias("total_dl"),
    )


def bm25_postings(docs: DataFrame, spread: bool = True) -> DataFrame:
    """Full-vocabulary postings (doc_id, term, dl, tf) for the index
    WRITE path (one-time/amortized; the serve path reads back only the
    query-vocabulary slice via partition/predicate pushdown).

    ``spread=False`` when the caller already arranged partitioning
    (e.g. a cached pre-spread corpus frame)."""
    toks = F.split(F.col("text"), " ")
    dr = spread_scan(docs) if spread else docs
    return (
        dr.select(
            "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.min("dl").alias("dl"), F.count(F.lit(1)).alias("tf"))
    )


def corpus_stats_partial(docs: DataFrame) -> DataFrame:
    """The one-row mergeable normalization partial for a delta."""
    toks = F.split(F.col("text"), " ")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("total_dl"),
    )


def write_postings_index(docs: DataFrame, path: str, tag: str = "base") -> None:
    """Persist a corpus slice's postings + stats under ``delta=<tag>``
    (the two-sub ``write_span_index`` layout). Same-tag replay
    overwrites with identical content — idempotent."""
    import os

    bm25_postings(docs).write.mode("overwrite").parquet(
        os.path.join(path, "postings", f"delta={tag}")
    )
    corpus_stats_partial(docs).write.mode("overwrite").parquet(
        os.path.join(path, "stats", f"delta={tag}")
    )


def extend_postings_index(delta_docs: DataFrame, path: str, tag: str) -> None:
    """Fold a delta's postings INTO the persisted index: O(delta) —
    history partitions are never read or rewritten."""
    write_postings_index(delta_docs, path, tag)


def read_postings_index(spark: SparkSession, path: str):
    """(postings, merged one-row stats) across visible delta tags."""
    from . import lsm

    postings = lsm.read_visible(spark, path, "postings")
    stats = lsm.read_visible(spark, path, "stats")
    if postings is None or stats is None:
        raise FileNotFoundError(f"no postings-index partitions under {path}")
    return postings, stats.agg(
        F.sum("n_docs").alias("n_docs"), F.sum("total_dl").alias("total_dl")
    )


def compact_postings_index(spark: SparkSession, path: str) -> None:
    """Merge every visible delta into one base version (``lsm.compact``
    crash-safe commit). Postings are immutable per doc — the fold is a
    rewrite into one partition; the stats partials re-aggregate to one
    row, after which reads cost one partition until new extends land."""
    from . import lsm

    lsm.compact(
        spark,
        path,
        {
            "postings": None,
            "stats": lambda df: df.agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("total_dl").alias("total_dl"),
            ),
        },
    )


def serve_bm25_from_index(
    spark: SparkSession, path: str, qterm: DataFrame
) -> DataFrame:
    """Top-k BM25 over the persisted index: postings restricted to the
    query vocabulary (term-keyed pushdown read), stats partials merged
    once — the from-disk twin of the in-plan serve."""
    qvocab = sorted({r.term for r in qterm.select("term").distinct().collect()})
    postings, stats = read_postings_index(spark, path)
    return (
        _bm25_topk_frame(
            postings.filter(F.col("term").isin(qvocab)), qterm, stats
        )
        .select("query_id", "rnk", "doc_id", "score")
        .orderBy("query_id", "rnk")
    )


def bm25_serve_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered incremental demo: documents split by id into an
    already-indexed history (doc_id % 10 != 0) and an arriving delta
    (doc_id % 10 == 0); queries are served against history-index +
    delta-extend WITHOUT ever rebuilding over the union corpus. The
    in-plan twin models exactly what the persistence path does (two
    postings builds restricted to the query vocabulary — the pushdown
    read — and two one-row stats partials merged before the single
    floor); the write/extend/read-back/compact path itself is
    exercised in ``tests/test_retrieval.py`` and certified identical.

    The oracle is the FULL-CORPUS BM25 top-k SQL — so the driver's
    value hash IS the merge == rebuild certificate: any drift between
    folded partials and a from-scratch build (df splits, avgdl
    rounding, tie-break order) fails the gate.
    """
    qvocab, qterm, _ = _query_frontier(spark, sf_dir)
    # One spread corpus scan, tokenized ONCE into the scoped cache: the
    # two postings builds and the two stats partials below are four
    # consumers of the same frame, and each used to re-split every text
    # (this in-plan DEMO re-derives both sides; the production path
    # serves from the persisted LSM index instead, where history is
    # never rescanned at all).
    dr = _tokenized_spread_corpus(spark, sf_dir)
    base = dr.filter(F.col("doc_id") % 10 != 0)
    delta = dr.filter(F.col("doc_id") % 10 == 0)
    in_vocab = F.col("term").isin(qvocab)
    tf = _postings_from_toks(base).filter(in_vocab).unionByName(
        _postings_from_toks(delta).filter(in_vocab)
    )
    stats = (
        _stats_from_toks(base)
        .unionByName(_stats_from_toks(delta))
        .agg(F.sum("n_docs").alias("n_docs"), F.sum("total_dl").alias("total_dl"))
    )
    return (
        _bm25_topk_frame(tf, qterm, stats)
        .select("query_id", "rnk", "doc_id", "score")
        .orderBy("query_id", "rnk")
    )


# --- pseudo-relevance-feedback query expansion (RM3/Rocchio family) ----------

PRF_EXP_TERMS = 3  # expansion terms appended per query
PRF_FB_DEPTH = BM25_TOPK  # feedback set: round-1 top-k docs


def retrieval_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-round retrieval with pseudo-relevance-feedback query
    expansion — the RM3/Rocchio production shape: round 1 ranks with
    BM25, the top-``PRF_FB_DEPTH`` docs per query become the feedback
    set, the ``PRF_EXP_TERMS`` highest-weight NEW terms from that set
    (weight = feedback tf × ln(N/df), rounded before ranking, ties to
    the lexicographically smaller term) join the query with qtf 1, and
    round 2 re-ranks with the expanded query.

    Scale design (every stage bounded or map-side):
    * round 1 is the certified ``text_bm25_topk`` plan (frontier
      IN-pushdown, cached pruned postings, salted top-k);
    * the feedback set is ≤ NQ·k = 80 (query, doc) pairs — collected
      once (the bounded-collect precedent) and pushed into the corpus
      scan as a doc_id IN-literal, so the feedback-term explode is
      map-side over ~80 docs;
    * candidate df comes from ONE corpus pass with the candidate-term
      frame broadcast into the explode (bounded by feedback-set total
      length, corpus-count-independent) — never a full-vocabulary
      shuffle (the r13 BM25 lesson);
    * the expanded vocabulary (≤ NQ·(QTERMS+EXP_TERMS) ≤ 112 terms) is
      collected and pushed down exactly like the round-1 frontier.
    A serving tier with the persisted postings index
    (``serve_bm25_from_index``) runs both rounds as index reads
    instead of corpus scans — registered as ``prf_serve_incremental``.

    Body lives in :func:`_prf_expansion_parts` so the A/B report
    (``retrieval_prf_uplift``) can reuse the round-1 feedback collect
    as its BM25 arm instead of executing the whole round-1 ranking a
    second time (r16).

    The five corpus passes this two-round plan needs (round-1 tf,
    corpus stats, feedback-doc tf, candidate df, round-2 tf) all read
    ONE scoped-cached spread frame (the ``bm25_serve_incremental``
    lesson): the parquet is scanned once; every later pass is a cache
    read. Corpus partials (n_docs, total_dl) are a ONE-ROW bounded
    collect reused by both rounds as a local relation — the r15 trim:
    the first draft re-derived the stats agg (plus its broadcast
    exchange) inside every consuming job, pure per-stage overhead at
    bench scale. At 100 TB the cache is the serving tier's postings
    index — this in-plan twin models that reuse at bench scale.
    """
    return _prf_expansion_parts(spark, sf_dir)[2]


def _prf_expansion_parts(spark: SparkSession, sf_dir: str):
    """(round-1 top-k rows [collected], qterm frame, round-2 DataFrame) —
    the PRF two-round body. The round-1 feedback collect carries ``rnk``
    so ``retrieval_prf_uplift`` can rebuild the full BM25 serving list
    as a ≤ NQ·k-row local relation (PRF_FB_DEPTH == BM25_TOPK) instead
    of executing the whole certified round-1 plan a second time."""
    # retrieval_prf_uplift's BM25 arm IS this feedback collect; if the
    # feedback depth ever decouples from the serving k, the rebuilt arm
    # silently becomes a truncated/extended list (r16 ADVICE) — fail
    # loudly instead.
    assert PRF_FB_DEPTH == BM25_TOPK, (
        "retrieval_prf_uplift rebuilds its BM25 arm from this round-1 "
        "feedback collect; decoupling PRF_FB_DEPTH from BM25_TOPK "
        "requires filtering fb_rows to rnk <= BM25_TOPK there first"
    )
    qvocab, qterm, _ = _query_frontier(spark, sf_dir)
    # Tokenized once into the scoped cache (r17): the five passes below
    # used to re-split every cached text per pass.
    dr = _tokenized_spread_corpus(spark, sf_dir)
    st = _stats_from_toks(dr).collect()[
        0
    ]  # bounded: ONE row; also materializes the corpus cache
    partials = spark.createDataFrame(
        [(st.n_docs, st.total_dl)], "n_docs long, total_dl long"
    )
    tf1 = (
        dr.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        .filter(F.col("term").isin(qvocab))
        .groupBy("doc_id", "term")
        .agg(F.min("dl").alias("dl"), F.count(F.lit(1)).alias("tf"))
    )
    fb_rows = (
        _bm25_topk_frame(tf1, qterm, partials)
        .select("query_id", "rnk", "doc_id")
        .collect()
    )  # bounded: <= NQ * k rows (PRF_FB_DEPTH == BM25_TOPK)
    fb_doc_ids = sorted({r.doc_id for r in fb_rows})
    fb_map = spark.createDataFrame(
        [(r.query_id, r.doc_id) for r in fb_rows], "query_id long, doc_id long"
    )
    # Feedback-term frequencies: explode ONLY the feedback docs (the
    # IN-literal prunes against the cached frame), fan out to their
    # queries. Two consumers below (the candidate-term broadcast side
    # and the expansion-weight join) — scoped-cached so the bounded
    # (~80-doc-vocab) frame computes once.
    fb_tf = scoped_cache(
        dr.filter(F.col("doc_id").isin(fb_doc_ids))
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf_fb"))
        .join(F.broadcast(fb_map), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.sum("tf_fb").alias("tf_fb"))
        # expansion terms must be NEW: drop the original query terms
        .join(
            F.broadcast(qterm.select("query_id", "term")),
            ["query_id", "term"],
            "left_anti",
        )
    )
    cand_terms = fb_tf.select("term").distinct()
    # df per candidate term == distinct containing docs: a single
    # term-keyed exchange (map-side partial distinct) — one fewer
    # shuffle than the (doc, term)-agg-then-count first draft.
    df_cand = (
        dr.select("doc_id", F.explode("toks").alias("term"))
        .join(F.broadcast(cand_terms), "term")
        .groupBy("term")
        .agg(F.count_distinct(F.col("doc_id")).alias("df"))
    )
    w_exp = Window.partitionBy("query_id").orderBy(
        F.desc("w"), F.asc("term")
    )
    expansion = (
        fb_tf.join(df_cand, "term")
        .select(
            "query_id",
            "term",
            F.round(
                F.col("tf_fb") * F.log(F.lit(st.n_docs) / F.col("df")), 6
            ).alias("w"),
        )
        .withColumn("r", F.row_number().over(w_exp))
        .filter(F.col("r") <= PRF_EXP_TERMS)
        .select("query_id", "term")
        .collect()
    )  # bounded: <= NQ * PRF_EXP_TERMS rows
    qterm2 = qterm.unionByName(
        spark.createDataFrame(
            [(r.query_id, r.term, 1) for r in expansion],
            "query_id long, term string, qtf long",
        )
    )
    vocab2 = sorted(set(qvocab) | {r.term for r in expansion})
    tf2 = (
        dr.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        .filter(F.col("term").isin(vocab2))
        .groupBy("doc_id", "term")
        .agg(F.min("dl").alias("dl"), F.count(F.lit(1)).alias("tf"))
    )
    round2 = (
        _bm25_topk_frame(tf2, qterm2, partials)
        .select(
            "query_id", "rnk", "doc_id", F.col("score").alias("score_prf")
        )
        .orderBy("query_id", "rnk")
    )
    return fb_rows, qterm, round2


# The PRF CTE chain (round-1 feedback set through round-2 scores),
# shared by the expansion / serve oracles and the uplift report.
_PRF_COMMON_SQL = f"""
fb AS (
  SELECT query_id, doc_id FROM ranked WHERE rnk <= {PRF_FB_DEPTH}
),
fb_tf AS (
  SELECT f.query_id, t.term, SUM(t.tf) AS tf_fb
  FROM tf t JOIN fb f USING (doc_id)
  WHERE NOT EXISTS (
    SELECT 1 FROM qterm qt
    WHERE qt.query_id = f.query_id AND qt.term = t.term
  )
  GROUP BY f.query_id, t.term
),
expansion AS (
  SELECT query_id, term FROM (
    SELECT ft.query_id, ft.term,
           ROW_NUMBER() OVER (
             PARTITION BY ft.query_id
             ORDER BY ROUND(ft.tf_fb * ln(s.n_docs / d.df), 6) DESC,
                      ft.term
           ) AS r
    FROM fb_tf ft JOIN dfv d USING (term) CROSS JOIN stats s
  ) WHERE r <= {PRF_EXP_TERMS}
),
qterm2 AS (
  SELECT query_id, term, qtf FROM qterm
  UNION ALL
  SELECT query_id, term, 1 AS qtf FROM expansion
),
per_term2 AS (
  SELECT qt.query_id, tf.term, tf.doc_id,
         qt.qtf * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * tf.tf * ({BM25_K1} + 1.0)
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
           AS contrib
  FROM tf
  JOIN qterm2 qt USING (term)
  JOIN dfv d ON tf.term = d.term
  CROSS JOIN stats s
),
scored2 AS (
  SELECT query_id, doc_id, ROUND(SUM(contrib), 6) AS score_prf
  FROM per_term2 GROUP BY query_id, doc_id
),
ranked2 AS (
  SELECT query_id, doc_id, score_prf,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_prf DESC, doc_id) AS rnk
  FROM scored2
)
"""

PRF_EXPANSION_ORACLE = f"""
WITH {_BM25_COMMON_SQL},
{_PRF_COMMON_SQL}
SELECT query_id, rnk, doc_id, score_prf
FROM ranked2
WHERE rnk <= {BM25_TOPK}
ORDER BY query_id, rnk
"""


def prf_serve_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRF expansion served from the incremental postings index — the
    serving tier ``retrieval_prf_expansion``'s docstring promises: BOTH
    rounds run as index reads, never as corpus scans.

    Corpus split like ``bm25_serve_incremental``: an already-indexed
    history (doc_id % 10 != 0) plus an arriving delta (doc_id % 10 ==
    0); postings = history-segment ∪ delta-segment, normalization
    partials summed once before the single floor. Index reads, per
    stage:

    * round-1 tf: the query-vocabulary slice — the term IN-literal
      pushes through the union and each segment's aggregate, so only
      matching postings ever shuffle (the pushdown read);
    * feedback term vectors: a doc_id-keyed slice of the same index
      (the forward-index read a serving tier keeps alongside; the
      doc_id filter pushes below each segment's explode to the scan);
    * candidate df: the feedback docs' vocabulary is BOUNDED
      (≤ NQ·k·dl ≈ 80 doc term vectors — the in-memory feedback model
      every RM3 implementation materializes), so it is collected and
      pushed down exactly like the round-1 frontier; df is then one
      count per term over already-distinct (doc, term) postings rows;
    * round-2 tf: the expanded-vocabulary slice, same pushdown.

    The oracle is the FULL-CORPUS two-round PRF SQL, so the driver's
    value hash certifies serve-from-segments == from-scratch rebuild
    across BOTH rounds (df splits, avgdl partial-merge rounding,
    expansion tie-breaks, final ranking).

    The write/extend/read-back path for the same index is exercised in
    ``tests/test_retrieval.py``; this in-plan twin re-derives the two
    segments so the registered query is self-contained (no tmp dirs).
    """
    qvocab, qterm, _ = _query_frontier(spark, sf_dir)
    # Tokenized once into the scoped cache (r17): the four index-read
    # passes below used to re-split every cached text per pass.
    dr = _tokenized_spread_corpus(spark, sf_dir)
    base = dr.filter(F.col("doc_id") % 10 != 0)
    delta = dr.filter(F.col("doc_id") % 10 == 0)
    postings = _postings_from_toks(base).unionByName(
        _postings_from_toks(delta)
    )
    stats = _stats_from_toks(base).unionByName(
        _stats_from_toks(delta)
    ).agg(
        F.sum("n_docs").alias("n_docs"), F.sum("total_dl").alias("total_dl")
    )
    return _prf_rounds_from_postings(spark, postings, stats, (qvocab, qterm))


def _prf_rounds_from_postings(
    spark: SparkSession, postings, stats, frontier
) -> DataFrame:
    """Both PRF rounds as reads of a (possibly multi-segment) postings
    frame (doc_id, term, dl, tf) + mergeable stats partials — shared by
    the in-plan ``prf_serve_incremental`` twin and the from-disk
    ``serve_prf_from_index`` path."""
    qvocab, qterm = frontier
    st = stats.collect()[0]  # bounded: ONE merged (n_docs, total_dl) row
    partials = spark.createDataFrame(
        [(st.n_docs, st.total_dl)], "n_docs long, total_dl long"
    )
    fb_rows = (
        _bm25_topk_frame(
            postings.filter(F.col("term").isin(qvocab)), qterm, partials
        )
        .select("query_id", "doc_id")
        .collect()
    )  # bounded: <= NQ * k rows
    fb_doc_ids = sorted({r.doc_id for r in fb_rows})
    fb_map = spark.createDataFrame(
        [(r.query_id, r.doc_id) for r in fb_rows], "query_id long, doc_id long"
    )
    fb_tf = scoped_cache(
        postings.filter(F.col("doc_id").isin(fb_doc_ids))
        .select("doc_id", "term", F.col("tf").alias("tf_fb"))
        .join(F.broadcast(fb_map), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.sum("tf_fb").alias("tf_fb"))
        .join(
            F.broadcast(qterm.select("query_id", "term")),
            ["query_id", "term"],
            "left_anti",
        )
    )
    cand_vocab = sorted(
        r.term for r in fb_tf.select("term").distinct().collect()
    )  # bounded: the feedback docs' vocabulary (the RM3 feedback model)
    df_cand = (
        postings.filter(F.col("term").isin(cand_vocab))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    w_exp = Window.partitionBy("query_id").orderBy(F.desc("w"), F.asc("term"))
    expansion = (
        fb_tf.join(df_cand, "term")
        .select(
            "query_id",
            "term",
            F.round(
                F.col("tf_fb") * F.log(F.lit(st.n_docs) / F.col("df")), 6
            ).alias("w"),
        )
        .withColumn("r", F.row_number().over(w_exp))
        .filter(F.col("r") <= PRF_EXP_TERMS)
        .select("query_id", "term")
        .collect()
    )  # bounded: <= NQ * PRF_EXP_TERMS rows
    qterm2 = qterm.unionByName(
        spark.createDataFrame(
            [(r.query_id, r.term, 1) for r in expansion],
            "query_id long, term string, qtf long",
        )
    )
    vocab2 = sorted(set(qvocab) | {r.term for r in expansion})
    return (
        _bm25_topk_frame(
            postings.filter(F.col("term").isin(vocab2)), qterm2, partials
        )
        .select(
            "query_id", "rnk", "doc_id", F.col("score").alias("score_prf")
        )
        .orderBy("query_id", "rnk")
    )


def serve_prf_from_index(
    spark: SparkSession, path: str, qterm: DataFrame
) -> DataFrame:
    """Two-round PRF over the PERSISTED postings index: the from-disk
    twin of ``prf_serve_incremental`` (same rounds, postings and stats
    read back from the LSM store's visible delta tags)."""
    qvocab = sorted({r.term for r in qterm.select("term").distinct().collect()})
    postings, stats = read_postings_index(spark, path)
    return _prf_rounds_from_postings(spark, postings, stats, (qvocab, qterm))


# --- ranking-quality evaluation (MRR / nDCG / recall@k) -----------------------
#
# The eval harness a serving tier needs: deterministic planted graded
# relevance (a modulus rule both engines compute bit-identically), the
# BM25 top-k ranking scored with MRR, nDCG@k (exact 2^rel-1 gains,
# log2 discounts, ideal ranking from per-level relevance counts), and
# recall@k against the per-query corpus-wide relevant count.

EVAL_REL_MOD_HI = 31  # (query_id + doc_id) % 31 == 0 -> rel 2
EVAL_REL_MOD_LO = 7  # else (query_id + doc_id) % 7 == 0 -> rel 1


def _rel_expr(qcol: Column, dcol: Column) -> Column:
    return (
        F.when((qcol + dcol) % EVAL_REL_MOD_HI == 0, F.lit(2))
        .when((qcol + dcol) % EVAL_REL_MOD_LO == 0, F.lit(1))
        .otherwise(F.lit(0))
    )


def retrieval_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query ranking-quality metrics over the BM25 top-k serving
    list: MRR, nDCG@k, recall@k, and the relevant-in-top-k count.

    Relevance is PLANTED (graded: ``(query_id + doc_id) % 31 == 0`` →
    2, else ``% 7 == 0`` → 1, else 0) so both engines derive identical
    judgments without a label table — the certificate is that the
    whole metric pipeline (ranking, gains, log2 discounts, ideal-DCG
    construction, rounding) is bit-identical, which is what makes an
    eval harness trustworthy enough to gate a retriever change.

    Scale design: metrics aggregate the ≤ NQ·k serving list (constant)
    plus ONE corpus pass for the per-query relevant totals (the tiny
    query frame broadcast into the scan — 16·n map-side rows, no
    shuffle wider than the per-query count agg). Ideal DCG needs only
    the per-level relevance COUNTS, never a corpus-wide sort: rank i
    of the ideal list has rel 2 iff i ≤ n2, rel 1 iff i ≤ n2+n1.
    """
    # Collect the bounded frontier ONCE and share it: the serving arm
    # consumes it via _corpus_index, and the query enumeration below is
    # a local relation over the same collected rows. The first draft
    # derived ``queries`` from ``topk`` itself, which re-executed the
    # whole (uncached above its postings) ranking subtree a second time
    # just to list <=16 already-bounded ids — the same defect the r16
    # ADVICE found in retrieval_prf_uplift.
    frontier = _query_frontier(spark, sf_dir)
    topk = text_bm25_topk(spark, sf_dir, frontier=frontier)
    hits = topk.withColumn(
        "rel", _rel_expr(F.col("query_id"), F.col("doc_id"))
    )
    per_rank = hits.select(
        "query_id",
        "rnk",
        "rel",
        ((F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.log2(F.col("rnk") + 1.0)).alias(
            "gain"
        ),
        F.when(F.col("rel") > 0, 1.0 / F.col("rnk")).otherwise(F.lit(None)).alias(
            "rr"
        ),
    )
    agg = per_rank.groupBy("query_id").agg(
        F.round(F.coalesce(F.max("rr"), F.lit(0.0)), 6).alias("mrr"),
        F.sum("gain").alias("dcg"),
        F.count_if(F.col("rel") > 0).alias("n_rel_at_k"),
    )
    # Per-query corpus-wide relevant counts: tiny query frame broadcast
    # into one documents pass. Queries enumerated from the frontier's
    # local relation; the final inner join on ``agg`` drops any query
    # without serving rows in both variants, so the output is identical.
    queries = frontier[1].select("query_id").distinct()
    rel_all = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .crossJoin(F.broadcast(queries))
        .select(
            "query_id", _rel_expr(F.col("query_id"), F.col("doc_id")).alias("rel")
        )
        .filter(F.col("rel") > 0)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_rel_total"),
            F.count_if(F.col("rel") == 2).alias("n2"),
        )
    )
    ideal = (
        rel_all.select(
            "query_id",
            "n_rel_total",
            F.explode(F.sequence(F.lit(1), F.lit(BM25_TOPK))).alias("i"),
            F.col("n2"),
        )
        .select(
            "query_id",
            "n_rel_total",
            (
                (
                    F.pow(
                        F.lit(2.0),
                        F.when(F.col("i") <= F.col("n2"), 2)
                        .when(F.col("i") <= F.col("n_rel_total"), 1)
                        .otherwise(0),
                    )
                    - 1.0
                )
                / F.log2(F.col("i") + 1.0)
            ).alias("ig"),
        )
        .groupBy("query_id", "n_rel_total")
        .agg(F.sum("ig").alias("idcg"))
    )
    return (
        agg.join(ideal, "query_id")
        .select(
            "query_id",
            "mrr",
            F.round(
                F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("ndcg_at_k"),
            F.round(F.col("n_rel_at_k") / F.col("n_rel_total"), 6).alias(
                "recall_at_k"
            ),
            "n_rel_at_k",
        )
        .orderBy("query_id")
    )


EVAL_METRICS_ORACLE = f"""
WITH {_BM25_COMMON_SQL},
topk AS (
  SELECT query_id, rnk, doc_id,
         CASE WHEN (query_id + doc_id) % {EVAL_REL_MOD_HI} = 0 THEN 2
              WHEN (query_id + doc_id) % {EVAL_REL_MOD_LO} = 0 THEN 1
              ELSE 0 END AS rel
  FROM ranked WHERE rnk <= {BM25_TOPK}
),
agg AS (
  SELECT query_id,
         ROUND(COALESCE(MAX(CASE WHEN rel > 0 THEN 1.0 / rnk END), 0), 6)
           AS mrr,
         SUM((POW(2.0, rel) - 1.0) / log2(rnk + 1.0)) AS dcg,
         COUNT(*) FILTER (WHERE rel > 0) AS n_rel_at_k
  FROM topk GROUP BY query_id
),
rel_all AS (
  SELECT q.query_id,
         COUNT(*) AS n_rel_total,
         COUNT(*) FILTER (
           WHERE (q.query_id + d.doc_id) % {EVAL_REL_MOD_HI} = 0
         ) AS n2
  FROM documents d
  CROSS JOIN (SELECT DISTINCT query_id FROM topk) q
  WHERE (q.query_id + d.doc_id) % {EVAL_REL_MOD_HI} = 0
     OR (q.query_id + d.doc_id) % {EVAL_REL_MOD_LO} = 0
  GROUP BY q.query_id
),
ideal AS (
  SELECT r.query_id, r.n_rel_total,
         SUM((POW(2.0, CASE WHEN i.i <= r.n2 THEN 2
                            WHEN i.i <= r.n_rel_total THEN 1
                            ELSE 0 END) - 1.0) / log2(i.i + 1.0)) AS idcg
  FROM rel_all r
  CROSS JOIN (SELECT UNNEST(range(1, {BM25_TOPK} + 1)) AS i) i
  GROUP BY r.query_id, r.n_rel_total
)
SELECT a.query_id, a.mrr,
       ROUND(CASE WHEN i.idcg > 0 THEN a.dcg / i.idcg ELSE 0 END, 6)
         AS ndcg_at_k,
       ROUND(a.n_rel_at_k * 1.0 / i.n_rel_total, 6) AS recall_at_k,
       a.n_rel_at_k
FROM agg a JOIN ideal i USING (query_id)
ORDER BY a.query_id
"""


def retrieval_prf_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does PRF help? Per-query nDCG@k of the round-1 BM25 ranking vs
    the round-2 PRF ranking over the SAME planted graded relevance,
    plus the uplift — the A/B report a retrieval team reads before
    shipping a query-expansion change (the eval-harness twin of
    ``retrieval_eval_metrics``, applied across the two rankers).

    Scale design: the two-round PRF body runs ONCE
    (:func:`_prf_expansion_parts`); its round-1 feedback collect IS the
    full BM25 serving list (PRF_FB_DEPTH == BM25_TOPK), so the BM25 arm
    is rebuilt as a ≤ NQ·k-row local relation instead of executing the
    certified round-1 plan a second time through ``text_bm25_topk``
    (r16 — the first draft ran the whole ranking subtree, its corpus
    spread-cache, and a third frontier collect once more each). The
    metric layer aggregates two ≤ NQ·k serving lists plus ONE corpus
    pass for the per-query relevant totals (the ideal-DCG needs only
    per-level relevance COUNTS, never a corpus sort). Uplift is
    computed from the ROUNDED per-ranker nDCGs so both engines
    difference identical fixed-precision values.
    """
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.log2(F.col("rnk") + 1.0)

    def _dcg(ranked: DataFrame, tag: str) -> DataFrame:
        return (
            ranked.select("query_id", "rnk", "doc_id")
            .withColumn("rel", _rel_expr(F.col("query_id"), F.col("doc_id")))
            .groupBy("query_id")
            .agg(
                F.sum(gain).alias(f"dcg_{tag}"),
                F.count_if(F.col("rel") > 0).alias(f"n_rel_at_k_{tag}"),
            )
        )

    fb_rows, qterm, round2 = _prf_expansion_parts(spark, sf_dir)
    base_ranked = spark.createDataFrame(
        [(r.query_id, r.rnk, r.doc_id) for r in fb_rows],
        "query_id long, rnk int, doc_id long",
    )
    base = _dcg(base_ranked, "bm25")
    prf = _dcg(round2, "prf")
    # Enumerate the query ids from the bounded frontier (already
    # collected once inside the PRF body), NOT from ``base`` — deriving
    # them from the serving list would execute the whole BM25 ranking
    # subtree an extra time just to list <=16 already-bounded ids.
    queries = qterm.select("query_id").distinct()
    rel_all = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .crossJoin(F.broadcast(queries))
        .select(
            "query_id", _rel_expr(F.col("query_id"), F.col("doc_id")).alias("rel")
        )
        .filter(F.col("rel") > 0)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_rel_total"),
            F.count_if(F.col("rel") == 2).alias("n2"),
        )
    )
    ideal = (
        rel_all.select(
            "query_id",
            F.explode(F.sequence(F.lit(1), F.lit(BM25_TOPK))).alias("i"),
            F.col("n2"),
            F.col("n_rel_total"),
        )
        .select(
            "query_id",
            (
                (
                    F.pow(
                        F.lit(2.0),
                        F.when(F.col("i") <= F.col("n2"), 2)
                        .when(F.col("i") <= F.col("n_rel_total"), 1)
                        .otherwise(0),
                    )
                    - 1.0
                )
                / F.log2(F.col("i") + 1.0)
            ).alias("ig"),
        )
        .groupBy("query_id")
        .agg(F.sum("ig").alias("idcg"))
    )
    ndcg_b = F.round(
        F.when(F.col("idcg") > 0, F.col("dcg_bm25") / F.col("idcg")).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    ndcg_p = F.round(
        F.when(F.col("idcg") > 0, F.col("dcg_prf") / F.col("idcg")).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    return (
        base.join(prf, "query_id")
        .join(ideal, "query_id")
        .select(
            "query_id",
            ndcg_b.alias("ndcg_bm25"),
            ndcg_p.alias("ndcg_prf"),
            F.round(ndcg_p - ndcg_b, 6).alias("ndcg_uplift"),
            "n_rel_at_k_bm25",
            "n_rel_at_k_prf",
        )
        .orderBy("query_id")
    )


PRF_UPLIFT_ORACLE = f"""
WITH {_BM25_COMMON_SQL},
{_PRF_COMMON_SQL},
base_hits AS (
  SELECT query_id, rnk,
         CASE WHEN (query_id + doc_id) % {EVAL_REL_MOD_HI} = 0 THEN 2
              WHEN (query_id + doc_id) % {EVAL_REL_MOD_LO} = 0 THEN 1
              ELSE 0 END AS rel
  FROM ranked WHERE rnk <= {BM25_TOPK}
),
prf_hits AS (
  SELECT query_id, rnk,
         CASE WHEN (query_id + doc_id) % {EVAL_REL_MOD_HI} = 0 THEN 2
              WHEN (query_id + doc_id) % {EVAL_REL_MOD_LO} = 0 THEN 1
              ELSE 0 END AS rel
  FROM ranked2 WHERE rnk <= {BM25_TOPK}
),
dcg_b AS (
  SELECT query_id, SUM((POW(2.0, rel) - 1.0) / log2(rnk + 1.0)) AS dcg_bm25,
         COUNT(*) FILTER (WHERE rel > 0) AS n_rel_at_k_bm25
  FROM base_hits GROUP BY query_id
),
dcg_p AS (
  SELECT query_id, SUM((POW(2.0, rel) - 1.0) / log2(rnk + 1.0)) AS dcg_prf,
         COUNT(*) FILTER (WHERE rel > 0) AS n_rel_at_k_prf
  FROM prf_hits GROUP BY query_id
),
rel_all AS (
  SELECT q.query_id,
         COUNT(*) AS n_rel_total,
         COUNT(*) FILTER (
           WHERE (q.query_id + d.doc_id) % {EVAL_REL_MOD_HI} = 0
         ) AS n2
  FROM documents d
  CROSS JOIN (SELECT query_id FROM q) q
  WHERE (q.query_id + d.doc_id) % {EVAL_REL_MOD_HI} = 0
     OR (q.query_id + d.doc_id) % {EVAL_REL_MOD_LO} = 0
  GROUP BY q.query_id
),
ideal AS (
  SELECT r.query_id,
         SUM((POW(2.0, CASE WHEN i.i <= r.n2 THEN 2
                            WHEN i.i <= r.n_rel_total THEN 1
                            ELSE 0 END) - 1.0) / log2(i.i + 1.0)) AS idcg
  FROM rel_all r
  CROSS JOIN (SELECT UNNEST(range(1, {BM25_TOPK} + 1)) AS i) i
  GROUP BY r.query_id
)
SELECT b.query_id,
       ROUND(CASE WHEN i.idcg > 0 THEN b.dcg_bm25 / i.idcg ELSE 0 END, 6)
         AS ndcg_bm25,
       ROUND(CASE WHEN i.idcg > 0 THEN p.dcg_prf / i.idcg ELSE 0 END, 6)
         AS ndcg_prf,
       ROUND(ROUND(CASE WHEN i.idcg > 0 THEN p.dcg_prf / i.idcg ELSE 0 END, 6)
             - ROUND(CASE WHEN i.idcg > 0 THEN b.dcg_bm25 / i.idcg ELSE 0 END, 6),
             6) AS ndcg_uplift,
       b.n_rel_at_k_bm25,
       p.n_rel_at_k_prf
FROM dcg_b b JOIN dcg_p p USING (query_id) JOIN ideal i USING (query_id)
ORDER BY b.query_id
"""


QUERIES = [
    Query(
        "text_bm25_topk",
        "BM25 top-k retrieval: inverted tf index + query-vocab broadcast "
        "pruning + per-query ranked serving",
        text_bm25_topk,
        BM25_TOPK_ORACLE,
    ),
    Query(
        "text_bm25_maxscore",
        "MaxScore/WAND pruning certificate: per-term exact upper bounds "
        "never drop a true top-k member",
        text_bm25_maxscore,
        BM25_MAXSCORE_ORACLE,
    ),
    Query(
        "retrieval_rrf_fusion",
        "reciprocal-rank fusion of BM25 and TF-IDF rankers (scale-free "
        "rank-only combination, the multi-tier retrieval shape)",
        retrieval_rrf_fusion,
        RRF_FUSION_ORACLE,
    ),
    Query(
        "text_ql_dirichlet",
        "Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty) "
        "with the full missing-term smoothing mass, over the same "
        "bounded-frontier pushdown plan as BM25",
        text_ql_dirichlet,
        QL_DIRICHLET_ORACLE,
    ),
    Query(
        "retrieval_hybrid_fusion",
        "hybrid dense+sparse retrieval: min-max-normalized convex score "
        "fusion of the BM25 ranker and an exact-cosine embedding ranker "
        "over the same query frontier (the production RAG serving shape)",
        retrieval_hybrid_fusion,
        HYBRID_FUSION_ORACLE,
    ),
    Query(
        "bm25_serve_incremental",
        "incremental BM25 serving: history postings index + O(delta) "
        "extend, mergeable (n_docs, total_dl) partials — the full-corpus "
        "oracle makes the hash check a merge == rebuild certificate",
        bm25_serve_incremental,
        BM25_TOPK_ORACLE,
    ),
    Query(
        "retrieval_prf_expansion",
        "pseudo-relevance-feedback query expansion (RM3/Rocchio): BM25 "
        "round 1, bounded feedback set, tf·idf-weighted new terms, "
        "re-ranked round 2",
        retrieval_prf_expansion,
        PRF_EXPANSION_ORACLE,
    ),
    Query(
        "prf_serve_incremental",
        "PRF expansion served from the incremental postings index: both "
        "rounds as term-/doc-keyed index reads over history + delta "
        "segments — the full-corpus PRF oracle makes the hash check a "
        "merge == rebuild certificate",
        prf_serve_incremental,
        PRF_EXPANSION_ORACLE,
    ),
    Query(
        "retrieval_eval_metrics",
        "ranking-quality eval harness: MRR / nDCG@k / recall@k over the "
        "BM25 serving list against planted graded relevance",
        retrieval_eval_metrics,
        EVAL_METRICS_ORACLE,
    ),
    Query(
        "retrieval_prf_uplift",
        "PRF A/B report: per-query nDCG@k of the round-1 BM25 ranking vs "
        "the round-2 PRF ranking over the same planted relevance, plus "
        "the rounded uplift",
        retrieval_prf_uplift,
        PRF_UPLIFT_ORACLE,
    ),
]
