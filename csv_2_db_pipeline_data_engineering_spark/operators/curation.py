"""Corpus-curation operators: the decision layer of a training-data pipeline.

Where ``dedup``/``text``/``similarity`` produce *signals*, these queries
produce *decisions*: is a document contaminated by the eval set, which
stratum does it sample into, and does it survive curation at all. This
is the layer a pre-training data engineer actually ships.

Scale shapes (100 TB):
- contamination: the eval/benchmark set is tiny by construction, so its
  n-gram index is a broadcast — the corpus is scanned once map-side and
  only matching (doc, gram) rows reach the per-doc aggregate. Never a
  corpus self-join.
- sampling: pure map-side modulus on the key — zero shuffles beyond the
  stratum-count aggregate (which is grouped on a handful of strata).
- curation decision: one shuffle on the 16-byte content fingerprint
  (exact-dup groups), one semi-join against the (small) near-dup pair
  list, everything else map-side column math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import Query
from ..sources.tables import load_embeddings_spread, load_table, load_table_spread
from .boilerplate import (
    quality_nscaled,
    quality_nscaled_sql,
    quality_ntok,
    quality_ntok_sql,
)
from .dedup import NGRAM_JACCARD_CAPPED_ORACLE, dedup_ngram_jaccard, shingle_rows
from .lifecycle import scoped_cache
from .text import _STOPWORD_LIST_SQL, EN_STOPWORDS, _kn_cte_sql, kn_logprob_frame

# Documents with doc_id below this stand in for the held-out eval /
# benchmark set (real pipelines load benchmark text from a reference
# table; the split keeps the demo self-contained and oracle-checkable).
EVAL_SET_MAX_ID = 25
CONTAM_NGRAM = 5  # contamination n-gram size (8 is common; docs here are short)

# Eval-side document-frequency ceiling: a gram present in more than
# max(MIN, FRAC · n_eval_docs) eval documents is generic boilerplate,
# not benchmark-specific signal — drop it from the broadcast index.
# This is the df cap that matters for THIS join's scale shape: the
# corpus side streams map-side past the broadcast index, so the only
# blow-up risk is per-gram fan-out into the eval set, which the cap
# bounds. (A corpus-side df would need a corpus-wide shuffle and would
# destroy the broadcast-only plan.)
CONTAM_EVAL_DF_CAP_MIN = 4
CONTAM_EVAL_DF_CAP_FRACTION = 0.2

LANG_STOP_RATIO = 0.02  # text_lang_id's en/unknown threshold
LOW_QUALITY_TTR = 0.2  # repetition gate: type-token ratio floor

# Fluency gate (perplexity-style, CCNet): drop documents whose corpus-MLE
# bigram log-probability sits more than FLUENCY_MARGIN below the corpus
# MEDIAN score. The margin is relative, not absolute, because the
# corpus-MLE score shifts with vocabulary size and corpus length (there
# is no fixed external LM in the container); a median-relative cut is
# stable under those shifts while token salad — whose bigrams are all
# smoothing-floor singletons — lands far below any fluent document.
# Measured on this corpus: fluent docs spread ≤ ~0.23 below the median,
# planted salad sits ≥ ~1.1 below — the 0.35 margin cuts through a wide
# empty band on both sides. (Still the batch/stream pipeline's gate —
# curation_pipeline.py — whose incremental batches cannot assume the
# KN reference slice is present in every batch.)
FLUENCY_MARGIN = 0.35

# r16: the registered decision query upgrades its fluency gate from the
# bigram proxy to the reference-trained Kneser-Ney TRIGRAM model
# (text.kn_logprob_frame — the CCNet filter class proper: KenLM-style
# discounted counts + continuation backoff, trained on the fixed
# doc_id < KN_REF_MAX_ID reference slice, scored via broadcast joins).
# Margin measured at sf0.01/sf0.1 over corpus + planted witnesses:
# natural docs spread <= ~0.77 below the median KN score, planted
# salad sits >= ~3.0 below — 1.5 cuts through the empty band with
# >= 2x headroom on both sides.
KN_FLUENCY_MARGIN = 1.5

# Classifier gate (fastText/DCLM-style frozen quality model, served by
# operators/boilerplate.py): drop documents whose logistic quality
# logit z = N / (100 * n_tok) falls below CLASSIFIER_FLOOR. The
# comparison stays in integer space (N < FLOOR_E2 * n_tok), so the gate
# decision is exact cross-engine — no floating point at all. The floor
# sits well below the model's own keep boundary (z > 0): curation only
# rejects the low tail the classifier is confident about, it does not
# re-litigate every borderline doc. Measured at sf0.01: z spans
# [-0.74, +0.67] with median ≈ -0.02; the -0.30 floor drops ~8% of the
# corpus — real witnesses, no planting needed.
CLASSIFIER_FLOOR_E2 = -30  # z floor of -0.30, in integer-scaled units

# Planted token-salad witnesses (the dedup_embedding_cosine twin
# pattern): the synthetic corpus contains no natural gibberish, so the
# registered decision query unions deterministic doc_id-derived salad
# docs — identically in the Spark plan and the DuckDB oracle — making
# the low_fluency rows value-checked instead of vacuously absent.
# Every 10th salad token is 'the' so the salad PASSES the stopword
# (non_english) gate and genuinely reaches the fluency gate.
SALAD_MOD = 100  # one salad per 100 doc_ids -> 5 at the 500-row sf
SALAD_ID_OFFSET = 20_000_000
SALAD_TOKENS = 40

# Planted semantic-dup witnesses: lexically UNIQUE token runs (so the
# exact and near-dup gates pass them) whose doc_id matches a planted
# embedding twin (dedup._with_planted_twins: vec_id % PLANT_TWIN_MOD
# == 0 -> twin at vec_id + PLANT_TWIN_ID_OFFSET within SemDeDup's
# cosine threshold of the source). Only the semantic gate can catch
# them — the SemDeDup integration witness (Abbas et al. 2023 apply
# SemDeDup to the lexically deduplicated corpus BEFORE quality
# filtering, which is exactly where the gate sits in the cascade).
SEM_TWIN_TOKENS = 12


def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing ≥1 n-gram with the
    eval set, with shared-gram and eval-doc-hit counts.

    The standard pre-training hygiene check (n-gram overlap against
    held-out benchmarks). The eval side is exploded to (gram, eval_doc)
    and broadcast; corpus grams stream past it map-side, so the only
    shuffle is the final per-doc count aggregate.
    """
    sh = shingle_rows(load_table_spread(spark, sf_dir, "documents"), n=CONTAM_NGRAM)
    ev_sh = sh.filter(F.col("doc_id") < EVAL_SET_MAX_ID)
    # number of eval DOCS (shingle_rows is per-gram rows, so count
    # distinct docs — same value the per-doc-array frame counted rows of)
    n_eval = ev_sh.agg(F.countDistinct("doc_id").alias("n_eval"))
    cap = F.greatest(
        F.lit(CONTAM_EVAL_DF_CAP_MIN),
        F.ceil(F.lit(CONTAM_EVAL_DF_CAP_FRACTION) * F.col("n_eval")),
    )
    eval_grams = (
        ev_sh.select(F.col("doc_id").alias("eval_doc"), F.col("shingle").alias("gram"))
        .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("gram")))
        .crossJoin(F.broadcast(n_eval))
        .filter(F.col("df") <= cap)
        .select("eval_doc", "gram")
    )
    corpus = sh.filter(F.col("doc_id") >= EVAL_SET_MAX_ID).select(
        "doc_id", F.col("shingle").alias("gram")
    )
    return (
        corpus.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("n_shared_grams"),
            F.countDistinct("eval_doc").alias("n_eval_docs_hit"),
        )
        .orderBy("doc_id")
    )


CONTAMINATION_ORACLE = f"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                        w[i+3] || ' ' || w[i+4]
                        for i in range(1, len(w) - 3)]) s
  FROM docs WHERE len(w) >= {CONTAM_NGRAM}
),
ev AS (SELECT doc_id AS eval_doc, unnest(s) AS gram FROM sh
       WHERE doc_id < {EVAL_SET_MAX_ID}),
caps AS (
  SELECT GREATEST({CONTAM_EVAL_DF_CAP_MIN},
                  CEIL({CONTAM_EVAL_DF_CAP_FRACTION} * COUNT(*))) AS cap
  FROM sh WHERE doc_id < {EVAL_SET_MAX_ID}
),
evk AS (
  SELECT eval_doc, gram
  FROM (SELECT eval_doc, gram, COUNT(*) OVER (PARTITION BY gram) AS df FROM ev), caps
  WHERE df <= cap
),
co AS (SELECT doc_id, unnest(s) AS gram FROM sh
       WHERE doc_id >= {EVAL_SET_MAX_ID})
SELECT co.doc_id,
       COUNT(DISTINCT co.gram) AS n_shared_grams,
       COUNT(DISTINCT evk.eval_doc) AS n_eval_docs_hit
FROM co JOIN evk ON co.gram = evk.gram
GROUP BY co.doc_id ORDER BY doc_id
"""


# Per-band deterministic sample rates (out of 10): long documents are
# kept whole, short ones down-sampled — a toy training-mix policy.
BAND_RATES = {"short": 1, "medium": 5, "long": 10}


def corpus_sample_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling plan: per (lang, length band),
    how many docs the mix policy keeps.

    Selection is ``doc_id % 10 < rate`` — reproducible across engines
    and runs, no RNG state. (Content-stable pipelines key the modulus on
    a content hash instead of the id; the plan shape — pure map-side
    predicate, aggregate over a handful of strata — is identical.)
    """
    d = load_table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " "))
    band = F.when(n < 20, "short").when(n <= 60, "medium").otherwise("long")
    rate = (
        F.when(band == "short", BAND_RATES["short"])
        .when(band == "medium", BAND_RATES["medium"])
        .otherwise(BAND_RATES["long"])
    )
    sampled = (F.pmod(F.col("doc_id"), F.lit(10)) < rate).cast("long")
    return (
        d.select("lang", band.alias("length_band"), sampled.alias("s"))
        .groupBy("lang", "length_band")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("s").alias("n_sampled"))
        .orderBy("lang", "length_band")
    )


SAMPLE_STRATA_ORACLE = f"""
WITH t AS (
  SELECT lang,
         CASE WHEN len(string_split(text, ' ')) < 20 THEN 'short'
              WHEN len(string_split(text, ' ')) <= 60 THEN 'medium'
              ELSE 'long' END AS length_band,
         doc_id % 10 AS m
  FROM documents
)
SELECT lang, length_band, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN m < (CASE length_band
                               WHEN 'short' THEN {BAND_RATES["short"]}
                               WHEN 'medium' THEN {BAND_RATES["medium"]}
                               ELSE {BAND_RATES["long"]} END)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM t GROUP BY lang, length_band ORDER BY lang, length_band
"""


# --- weighted sampling without replacement (Efraimidis–Spirakis) ------------

#: global sample size for the weighted-sample query.
WSAMPLE_N = 100
#: 2^60, the hash range — an exact power-of-two double, so u = h / 2^60
#: is an EXACT division in both engines.
WSAMPLE_RANGE = float(1 << 60)


def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N weighted sampling without replacement, proportional to
    document length — the Efraimidis–Spirakis A-Res scheme (IPL 2006):
    each doc draws key ``ln(u) / w`` (order-equivalent to the paper's
    ``u^(1/w)``) from a DETERMINISTIC uniform u (its 60-bit content
    hash over 2^60 — reproducible across engines, runs, and cluster
    sizes, unlike rand()), and the sample is the global top-N by key.
    The length weight stands in for any per-doc quality weight; the
    plan is weight-agnostic.

    This is the loader-side op "sample N docs with probability ∝ w,
    exactly N, no replacement" that temperature/waterfill mixing rates
    feed at 100 TB. Scale shape: the key is map-side column math at the
    scan; the top-N is a shuffle-free TakeOrdered (per-partition
    bounded heaps — the ``corpus_overlap_kmv`` build shape); nothing
    else leaves the executors. Keys are rounded to 6 BEFORE ranking
    with a doc_id tie-break, the repo's cross-engine rank discipline.
    """
    top = wsample_keyed_rows(load_table(spark, sf_dir, "documents"))
    wr = Window.orderBy(F.desc("k"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(wr)).orderBy("rank")


def wsample_keyed_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, w, k): the Efraimidis–Spirakis keyed frame for ``docs``,
    trimmed to the top-``WSAMPLE_N`` — a weighted-reservoir PARTIAL.
    A-Res's celebrated property is that these partials merge: the
    global top-N of per-batch top-Ns IS the top-N of the union (the
    same k-smallest order-statistic law the KMV sketch certifies,
    mirrored to k-largest), so a persisted reservoir maintains itself
    O(delta) per batch with history never rescanned."""
    u = (
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long")
        / F.lit(WSAMPLE_RANGE)
    )
    return (
        docs.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").alias("w"),
            F.round(F.log(u) / F.col("n_chars"), 6).alias("k"),
        )
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(WSAMPLE_N)
    )


def merge_wsample(*reservoirs: DataFrame) -> DataFrame:
    """Top-N of the union of per-batch reservoirs — exactly the
    reservoir of the combined corpus (rows are doc-keyed and each doc
    lives in one batch, so the union is duplicate-free by contract)."""
    out = reservoirs[0]
    for r in reservoirs[1:]:
        out = out.unionByName(r)
    w = Window.orderBy(F.desc("k"), F.asc("doc_id"))
    return (
        out.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= WSAMPLE_N)
        .drop("_r")
    )


def extend_wsample_index(docs: DataFrame, path: str, tag: str) -> None:
    """Append ``docs``' reservoir partial as the (overwrite-idempotent)
    ``delta=<tag>`` partition of a persisted weighted reservoir —
    O(delta) work, history partitions never rewritten."""
    import os

    wsample_keyed_rows(docs).write.mode("overwrite").parquet(
        os.path.join(path, f"delta={tag}")
    )


def read_wsample_index(spark: SparkSession, path: str) -> DataFrame | None:
    """The merged reservoir across all visible delta tags (None if the
    index does not exist yet). merge == rebuild exactly."""
    from . import lsm

    raw = lsm.read_visible(spark, path)
    if raw is None:
        return None
    return merge_wsample(raw.select("doc_id", "w", "k"))


def compact_wsample_index(spark: SparkSession, path: str) -> None:
    """Fold every visible delta tag into one base version — the top-N
    fold IS the merge, so the compacted reservoir answers identically
    from <= WSAMPLE_N rows."""
    from . import lsm

    lsm.compact(
        spark,
        path,
        {"": lambda df: merge_wsample(df.select("doc_id", "w", "k"))},
    )


WEIGHTED_SAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, n_chars AS w,
         ROUND(ln(('0x' || substr(md5(text), 1, 15))::BIGINT
                  / CAST({WSAMPLE_RANGE!r} AS DOUBLE)) / n_chars, 6) AS k
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, w, k, ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS rank
FROM keyed QUALIFY rank <= {WSAMPLE_N} ORDER BY rank
"""


def _with_planted_salads(docs: DataFrame) -> DataFrame:
    """Union the corpus with deterministic token-salad witness docs.

    Salad token j of source doc_id: 'the' when j % 10 == 0 (passes the
    stopword gate), else the corpus-unique token 'zz<doc_id>x<j>' — a
    closed form both engines evaluate identically, like
    ``dedup._with_planted_twins``."""
    base = docs.select("doc_id", "text")
    salad_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(SALAD_TOKENS)),
            lambda j: F.when(j % 10 == 0, F.lit("the")).otherwise(
                F.concat(
                    F.lit("zz"),
                    F.col("doc_id").cast("string"),
                    F.lit("x"),
                    j.cast("string"),
                )
            ),
        ),
    )
    salads = base.filter(F.col("doc_id") % SALAD_MOD == 0).select(
        (F.col("doc_id") + F.lit(SALAD_ID_OFFSET)).alias("doc_id"),
        salad_text.alias("text"),
    )
    return base.unionByName(salads)


def _semantic_twin_docs(docs: DataFrame) -> DataFrame:
    """Semantic-dup witness docs (see SEM_TWIN_TOKENS note): one per
    planted embedding twin, id = doc_id + PLANT_TWIN_ID_OFFSET, text a
    closed-form run of corpus-unique tokens both engines generate
    identically."""
    from .dedup import PLANT_TWIN_ID_OFFSET, PLANT_TWIN_MOD

    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(SEM_TWIN_TOKENS)),
            lambda j: F.concat(
                F.lit("sem"),
                F.col("doc_id").cast("string"),
                F.lit("x"),
                j.cast("string"),
            ),
        ),
    )
    return docs.filter(F.col("doc_id") % PLANT_TWIN_MOD == 0).select(
        (F.col("doc_id") + F.lit(PLANT_TWIN_ID_OFFSET)).alias("doc_id"),
        text.alias("text"),
    )


def corpus_curation_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keep/drop with the first failing gate as the reason.

    Gate order (cheapest-to-most-expensive is the production order; here
    fixed for determinism): exact_dup → near_dup → semantic_dup →
    non_english → low_quality → low_fluency → low_classifier → keep.
    The dedup gates run as a unit, lexical then semantic — SemDeDup
    (Abbas et al. 2023) prunes the lexically deduplicated corpus before
    any quality filtering, so the semantic gate sits directly after
    near_dup: a doc whose embedding loses its SemDeDup group (a smaller
    vec_id representative exists within the cosine threshold) drops as
    ``semantic_dup`` even when its TEXT shares nothing with the
    representative. The classifier
    gate serves the frozen logistic quality model
    (``boilerplate.quality_nscaled``) entirely in integer arithmetic —
    the decision is exact cross-engine. Exact-dup losers are non-minimum
    doc_ids within a normalized-content-fingerprint group (window min
    over ONE digest shuffle); near-dup losers have a smaller
    Jaccard-verified partner (semi-join against the pair list, which is
    small); the language and repetition gates are map-side ratios shared
    with ``text_lang_id`` / ``text_quality_score``; the fluency gate
    drops docs scoring > KN_FLUENCY_MARGIN below the corpus-median
    Kneser-Ney trigram log-probability (``kn_logprob_frame`` — the
    CCNet perplexity filter class proper: a reference-slice-trained KN
    model with continuation backoff, upgraded in r16 from the add-one
    bigram proxy the batch pipeline still runs).
    Runs over the corpus plus planted salad witnesses (low_fluency)
    and planted semantic-twin witnesses (semantic_dup), so both gate
    families are value-checked, not vacuously absent.
    """
    base_docs = load_table_spread(spark, sf_dir, "documents")
    d = _with_planted_salads(base_docs).unionByName(_semantic_twin_docs(base_docs))
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    toks = F.split(F.col("text"), " ")
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))) / F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / F.size(toks)

    w = Window.partitionBy(F.md5(norm))
    base = d.select(
        "doc_id",
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("exact_loser"),
        stop_ratio.alias("stop_ratio"),
        ttr.alias("ttr"),
        quality_nscaled(F.col("text")).alias("clf_nscaled"),
        quality_ntok(F.col("text")).alias("clf_ntok"),
    )
    near_losers = (
        dedup_ngram_jaccard(spark, sf_dir).select(F.col("doc_b").alias("doc_id")).distinct()
    )
    # Semantic gate: SemDeDup losers over the corpus embeddings plus
    # their planted twins — vec_id and doc_id share the id space, so
    # the keep-frame anti-set joins straight onto the decision frame
    # (broadcast: O(corpus / PLANT_TWIN_MOD + natural losers) rows).
    # The pair search is the LSH-routed linear path
    # (semantic_keep_plan_lsh): Θ(n) hashing + bucket-keyed join, the
    # regime measured ~linear at 100x data — not the k ∝ n k-means
    # route whose exact assignment is O(n²/650).
    from .dedup import _with_planted_twins
    from .semantic import semantic_keep_plan_lsh

    sem_losers = (
        semantic_keep_plan_lsh(
            _with_planted_twins(load_embeddings_spread(spark, sf_dir))
        )
        .filter(~F.col("keep"))
        .select(F.col("vec_id").alias("doc_id"))
        .withColumn("sem_loser", F.lit(True))
    )
    # Fluency: per-doc KN score over the SAME augmented corpus (the
    # reference slice is doc_id-bounded, so planted witnesses can never
    # train the model), median as a 1-row broadcast (never a driver
    # action). The per-doc score frame has TWO consumers (the median
    # aggregate and the decision join) — scoped-cached so the whole KN
    # scoring pipeline (five broadcast joins over the corpus trigram
    # stream + the doc-keyed fold) executes ONCE, not once per consumer
    # (the r16 CC-double-execution lesson applied to the fluency gate;
    # the cache is two columns x n_docs, far smaller than the trigram
    # stream it would otherwise recompute).
    scores = scoped_cache(
        kn_logprob_frame(d).select(
            "doc_id", F.col("kn_logprob").alias("avg_logprob")
        )
    )
    med = scores.agg(F.median("avg_logprob").alias("fluency_med"))
    reason = (
        F.when(F.col("exact_loser"), "exact_dup")
        .when(F.col("near_loser"), "near_dup")
        .when(F.col("sem_loser"), "semantic_dup")
        .when(F.col("stop_ratio") < LANG_STOP_RATIO, "non_english")
        .when(F.col("ttr") < LOW_QUALITY_TTR, "low_quality")
        .when(
            F.col("fluency_med") - F.col("avg_logprob") > KN_FLUENCY_MARGIN,
            "low_fluency",
        )
        .when(
            F.col("clf_nscaled") < F.lit(CLASSIFIER_FLOOR_E2) * F.col("clf_ntok"),
            "low_classifier",
        )
        .otherwise("keep")
    )
    return (
        base.join(
            near_losers.withColumn("near_loser", F.lit(True)), "doc_id", "left"
        )
        .withColumn("near_loser", F.coalesce("near_loser", F.lit(False)))
        .join(F.broadcast(sem_losers), "doc_id", "left")
        .withColumn("sem_loser", F.coalesce("sem_loser", F.lit(False)))
        .join(scores, "doc_id", "left")
        .crossJoin(F.broadcast(med))
        .select("doc_id", reason.alias("reason"))
        .withColumn("keep", F.col("reason") == "keep")
        .orderBy("doc_id")
    )


def _curation_oracle_sql() -> str:
    from .dedup import PLANT_TWIN_ID_OFFSET, PLANT_TWIN_MOD
    from .dedup import twinned_allpairs_oracle
    from .semantic import SEM_COS_DEN, SEM_COS_NUM

    # exact all-pairs at the SemDeDup threshold over corpus + twins —
    # the oracle twin of the LSH-routed pair graph the gate consumes
    spr = twinned_allpairs_oracle(SEM_COS_NUM / SEM_COS_DEN).replace(
        "ORDER BY id_a, id_b", ""
    )
    return f"""
WITH RECURSIVE aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {SALAD_ID_OFFSET} AS doc_id,
         array_to_string([CASE WHEN j % 10 = 0 THEN 'the'
                               ELSE 'zz' || doc_id || 'x' || j END
                          for j in range(1, {SALAD_TOKENS} + 1)], ' ') AS text
  FROM documents WHERE doc_id % {SALAD_MOD} = 0
  UNION ALL
  SELECT doc_id + {PLANT_TWIN_ID_OFFSET} AS doc_id,
         array_to_string(['sem' || doc_id || 'x' || j
                          for j in range(1, {SEM_TWIN_TOKENS} + 1)], ' ') AS text
  FROM documents WHERE doc_id % {PLANT_TWIN_MOD} = 0
),
jac AS ({NGRAM_JACCARD_CAPPED_ORACLE.replace("ORDER BY doc_a, doc_b", "")}),
losers AS (SELECT DISTINCT doc_b FROM jac),
spr AS ({spr}),
sedges AS (
  SELECT id_a AS a, id_b AS b FROM spr
  UNION
  SELECT id_b, id_a FROM spr
),
sreach(a, b) AS (
  SELECT a, b FROM sedges
  UNION
  SELECT r.a, e.b FROM sreach r JOIN sedges e ON r.b = e.a WHERE e.b <> r.a
),
semlosers AS (
  SELECT a AS doc_id FROM sreach GROUP BY a HAVING LEAST(a, MIN(b)) < a
),
{_kn_cte_sql("aug")},
scored AS (SELECT doc_id, kn_lp AS lp FROM kn_doc),
med AS (SELECT quantile_cont(lp, 0.5) AS m FROM scored),
fp AS (
  SELECT doc_id,
         doc_id != MIN(doc_id) OVER (
           PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         ) AS exact_loser,
         len(list_filter(string_split(text, ' '),
             t -> list_contains({_STOPWORD_LIST_SQL}, t)))::DOUBLE
           / len(string_split(text, ' ')) AS stop_ratio,
         len(list_distinct(string_split(text, ' ')))::DOUBLE
           / len(string_split(text, ' ')) AS ttr,
         {quality_nscaled_sql("text")} AS clf_nscaled,
         {quality_ntok_sql("text")} AS clf_ntok
  FROM aug
)
SELECT doc_id, reason, reason = 'keep' AS keep FROM (
  SELECT fp.doc_id,
         CASE WHEN exact_loser THEN 'exact_dup'
              WHEN losers.doc_b IS NOT NULL THEN 'near_dup'
              WHEN semlosers.doc_id IS NOT NULL THEN 'semantic_dup'
              WHEN stop_ratio < {LANG_STOP_RATIO} THEN 'non_english'
              WHEN ttr < {LOW_QUALITY_TTR} THEN 'low_quality'
              WHEN med.m - scored.lp > {KN_FLUENCY_MARGIN} THEN 'low_fluency'
              WHEN clf_nscaled < {CLASSIFIER_FLOOR_E2} * clf_ntok
                THEN 'low_classifier'
              ELSE 'keep' END AS reason
  FROM fp
  LEFT JOIN losers ON losers.doc_b = fp.doc_id
  LEFT JOIN semlosers ON semlosers.doc_id = fp.doc_id
  LEFT JOIN scored ON scored.doc_id = fp.doc_id
  CROSS JOIN med
)
ORDER BY doc_id
"""


CURATION_ORACLE = _curation_oracle_sql()


CONTEXT_LEN = 512  # packing target (tokens per training sequence)
N_PACK_SHARDS = 8  # parallel packing streams


def corpus_pack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence-packing plan: which context-window bin
    every document lands in, summarized per (shard, bin).

    The standard pre-training batching step: concatenate documents and
    split at CONTEXT_LEN boundaries. A single global concatenation would
    serialize on one cumulative sum, so the corpus is first split into
    N_PACK_SHARDS independent streams (modulus-keyed here; content-hash
    keyed in production) and packed per shard — the window's cumulative
    sum runs per-partition, embarrassingly parallel, one shuffle total.
    A doc's bin is its starting offset ÷ CONTEXT_LEN (docs may straddle
    a boundary — that's concat-and-chunk semantics, tokens spill into
    the next window).
    """
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = d.select(
        F.pmod("doc_id", F.lit(N_PACK_SHARDS)).alias("shard"),
        "doc_id",
        n_tokens.alias("n_tokens"),
    ).withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / CONTEXT_LEN),
    )
    return (
        placed.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens_started"),
        )
        .orderBy("shard", "bin")
    )


PACK_PLAN_ORACLE = f"""
WITH placed AS (
  SELECT doc_id % {N_PACK_SHARDS} AS shard, doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(FLOOR((SUM(len(string_split(text, ' '))) OVER (
             PARTITION BY doc_id % {N_PACK_SHARDS} ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - len(string_split(text, ' '))) / {CONTEXT_LEN}) AS BIGINT) AS bin
  FROM documents
)
SELECT shard, bin, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_started
FROM placed GROUP BY shard, bin ORDER BY shard, bin
"""


N_SHUFFLE_SHARDS = 8  # parallel shuffle output streams


def corpus_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-shuffle plan: every document gets a
    (shard, position) under a content-stable pseudo-random permutation.

    The standard pre-training data shuffle WITHOUT a global sort: the
    permutation key is md5 of the doc id (stable across runs/engines,
    no RNG state), the shard is a map-side modulus of that key, and
    positions are assigned per shard — so the only wide operation is a
    per-shard sort over corpus/N_SHUFFLE_SHARDS rows, embarrassingly
    parallel, never a single total order of 100 TB. Readers stream
    shards in position order and the concatenation is a uniform
    permutation of the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat_ws(":", F.lit("shuffle"), F.col("doc_id").cast("string")))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(N_SHUFFLE_SHARDS)
    )
    keyed = d.select("doc_id", h.alias("h"), shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        keyed.withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


SHUFFLE_PLAN_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id,
         md5('shuffle:' || doc_id) AS h,
         ('0x' || substr(md5('shuffle:' || doc_id), 1, 8))::BIGINT
           % {N_SHUFFLE_SHARDS} AS shard
  FROM documents
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
FROM keyed ORDER BY shard, pos
"""


# Domain-mix allocation: temperature-style source reweighting under a
# token/doc budget. Weights are a deterministic function of the source
# name (stand-in for a mix policy table; real pipelines broadcast-join
# a policy dim); allocation uses integer arithmetic so both engines
# agree bit-for-bit with no float boundary hazards.
MIX_BUDGET_FRAC = 0.5  # overall kept fraction of the corpus


def domain_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source doc allocation for a target training mix.

    alloc_s = min(n_s, ⌊budget · w_s / Σw⌋) with budget = ⌈frac·N⌉ —
    the waterfilling-free first pass every mix policy starts from
    (sources with fewer docs than their share keep everything; the
    leftover re-spread is a second identical pass at policy level).
    One tiny aggregate per source plus two broadcast scalars; nothing
    touches the documents other than the grouped count.
    """
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    weight = (F.lit(1) + F.substring("source", 4, 10).try_cast("int") % 4).cast("long")
    weighted = per_src.withColumn("weight", weight)
    totals = weighted.agg(
        F.ceil(F.lit(MIX_BUDGET_FRAC) * F.sum("n_docs")).cast("long").alias("budget"),
        F.sum("weight").alias("sum_w"),
    )
    # integer `div`, not `/` + cast: float division can land an exact
    # multiple at k-ulp and truncate to k-1, diverging from the oracle's
    # exact integer `//`.
    alloc = F.least(F.col("n_docs"), F.expr("(budget * weight) div sum_w"))
    return (
        weighted.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "weight",
            alloc.alias("n_alloc"),
            F.round(alloc / F.col("n_docs"), 6).alias("keep_rate"),
        )
        .orderBy("source")
    )


DOMAIN_MIX_ORACLE = f"""
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(1 + TRY_CAST(substr(source, 4) AS INT) % 4 AS BIGINT) AS weight
  FROM documents GROUP BY source
),
totals AS (
  SELECT CAST(CEIL({MIX_BUDGET_FRAC} * SUM(n_docs)) AS BIGINT) AS budget,
         SUM(weight) AS sum_w
  FROM per_src
)
SELECT source, n_docs, weight,
       LEAST(n_docs, CAST((budget * weight) // sum_w AS BIGINT)) AS n_alloc,
       ROUND(LEAST(n_docs, CAST((budget * weight) // sum_w AS BIGINT))::DOUBLE
             / n_docs, 6) AS keep_rate
FROM per_src, totals
ORDER BY source
"""


# --- epoch-capped waterfilling: the mix policy's second pass ----------
#
# ``domain_mix_allocation`` is the proportional first pass; this is the
# waterfilling redistribution its docstring defers: UniMax-style
# (Chung et al., "UniMax: Fairer and More Effective Language Sampling",
# ICLR 2023) budget allocation over sources with PER-SOURCE repeat
# caps — the data-constrained-scaling regime (Muennighoff et al. 2023:
# high-quality sources tolerate more epochs than web crawl, so the cap
# differs by source). Each round splits the remaining token budget
# equally across still-open sources, caps at epoch_cap · n_tok, and
# re-spreads what the capped sources could not absorb; a fixed round
# count keeps the query (and its oracle) a finite unrolled chain.
#
# Exactness: everything is non-negative int64 (token counts, integer
# `div` shares), so Spark's `div` and DuckDB's `//` agree with no pmod
# dance; share·n_open <= remaining by construction, so the budget never
# goes negative. micro_epochs avoids the (alloc · 1e6) overflow a
# large source would hit by splitting into whole-epoch and remainder
# terms — the binding factor is (alloc % n_tok) · 1e6 < 2^63, i.e.
# n_tok < ~9.2e12 tokens per source (tens of TB of text); a source
# beyond that throws under Spark 4 ANSI mode rather than wrapping.
#
# 100 TB shape: the ONLY corpus-scale work is the per-source token
# aggregate (map-side combine, shuffle carries one row per source);
# the waterfilling iterates over the tiny source frame with 1-row
# broadcast round totals — zero data-scale shuffles.

WATERFILL_ROUNDS = 6
WATERFILL_BUDGET_NUM = 5  # budget = (5 · total_tokens) div 2 — 2.5 epochs
WATERFILL_BUDGET_DEN = 2
MICRO = 1_000_000  # micro-epoch scale for the integer epochs column


def _waterfill_epoch_cap() -> Column:
    """Per-source repeat cap 1..4 from the source id (the
    ``domain_mix_allocation`` weight device: deterministic, engine-
    portable, and it makes caps bind progressively on a near-uniform
    corpus).

    A source id not of the form ``srcN`` makes the try_cast NULL; left
    alone that NULL would flow into ``cap_tok`` and silently starve the
    source to a zero allocation, so it fails loudly instead (coalesce
    short-circuits: ``raise_error`` only evaluates on the NULL branch).
    """
    cap = (
        F.lit(1) + F.substring("source", 4, 10).try_cast("int") % 4
    ).cast("long")
    return F.coalesce(
        cap,
        F.raise_error(
            F.concat(F.lit("waterfill: malformed source id "), F.col("source"))
        ).cast("long"),
    )


def epoch_index_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, source, n_tok): the once-per-doc text work of the epoch
    schedule — what the persisted epoch index stores, so history text
    is tokenized exactly once ever (the incremental contract)."""
    return docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )


def waterfill_alloc(docs: DataFrame) -> DataFrame:
    """(source, n_tok, epoch_cap, cap_tok, alloc) after the fixed
    redistribution rounds — the shared policy core behind the
    registered allocation view and the per-doc epoch schedule."""
    return waterfill_alloc_from_rows(epoch_index_rows(docs))


def waterfill_alloc_from_rows(rows: DataFrame) -> DataFrame:
    """``waterfill_alloc`` over pre-tokenized (source, n_tok) scalar
    rows (an epoch-index read) — no text in the lineage."""
    per_src = (
        rows.groupBy("source")
        .agg(F.sum("n_tok").cast("long").alias("n_tok"))
        .withColumn("epoch_cap", _waterfill_epoch_cap())
        .withColumn("cap_tok", F.col("epoch_cap") * F.col("n_tok"))
    )
    cur = per_src.withColumn("alloc", F.lit(0).cast("long")).localCheckpoint(
        eager=True
    )
    # 1-row budget frame DERIVED FROM THE CHECKPOINTED source frame: the
    # corpus-scale token aggregate runs exactly once (inside cur's eager
    # checkpoint) and the 6 redistribution rounds that crossJoin the
    # budget replay only this tiny per-source agg, never the documents.
    budget = cur.agg(
        F.expr(
            f"({WATERFILL_BUDGET_NUM} * sum(n_tok))"
            f" div {WATERFILL_BUDGET_DEN}"
        ).alias("budget")
    ).localCheckpoint(eager=True)
    for _ in range(WATERFILL_ROUNDS):
        opened = F.sum(
            F.when(F.col("alloc") < F.col("cap_tok"), 1).otherwise(0)
        )
        round_share = (
            cur.crossJoin(F.broadcast(budget))
            .agg(
                opened.alias("n_open"),
                (F.min("budget") - F.sum("alloc")).alias("rem"),
            )
            .select(
                F.when(
                    F.col("n_open") > 0,
                    F.expr("rem div n_open"),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias("share")
            )
        )
        cur = (
            cur.crossJoin(F.broadcast(round_share))
            .withColumn(
                "alloc",
                F.when(
                    F.col("alloc") < F.col("cap_tok"),
                    F.least(F.col("cap_tok"), F.col("alloc") + F.col("share")),
                ).otherwise(F.col("alloc")),
            )
            .select("source", "n_tok", "epoch_cap", "cap_tok", "alloc")
            .localCheckpoint(eager=True)
        )
    return cur


def domain_mix_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-capped waterfilling token allocation per source.

    Returns one row per source: its token count, repeat cap, the
    tokens allocated after WATERFILL_ROUNDS redistribution rounds,
    integer micro-epochs (alloc/n_tok at 1e-6 precision, exact), and
    whether the cap bound.
    """
    cur = waterfill_alloc(load_table(spark, sf_dir, "documents"))
    micro = F.expr(
        f"CASE WHEN n_tok = 0 THEN 0 ELSE"
        f" (alloc div n_tok) * {MICRO}"
        f" + ((alloc % n_tok) * {MICRO}) div n_tok END"
    ).cast("long")
    return cur.select(
        "source",
        "n_tok",
        "epoch_cap",
        F.col("alloc").alias("alloc_tok"),
        micro.alias("micro_epochs"),
        (F.col("alloc") == F.col("cap_tok")).alias("capped"),
    ).orderBy("source")


def _waterfill_ctes(rounds: int = WATERFILL_ROUNDS) -> list[str]:
    """The fixed-round waterfilling unrolled as chained CTEs (the
    ``_linear_probe_sql`` long form); the final state is ``a{rounds}``."""
    ctes = [
        "per_src AS (SELECT source,"
        " CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok,"
        " CAST(1 + TRY_CAST(substr(source, 4) AS INT) % 4 AS BIGINT)"
        " AS epoch_cap FROM documents GROUP BY source)",
        "base AS (SELECT source, n_tok, epoch_cap,"
        " epoch_cap * n_tok AS cap_tok FROM per_src)",
        f"bud AS (SELECT ({WATERFILL_BUDGET_NUM} * SUM(n_tok))"
        f" // {WATERFILL_BUDGET_DEN} AS budget FROM base)",
        "a0 AS (SELECT source, n_tok, epoch_cap, cap_tok,"
        " CAST(0 AS BIGINT) AS alloc FROM base)",
    ]
    for r in range(rounds):
        ctes += [
            f"s{r} AS (SELECT CASE WHEN"
            " SUM(CASE WHEN alloc < cap_tok THEN 1 ELSE 0 END) = 0"
            " THEN CAST(0 AS BIGINT) ELSE CAST("
            " ((SELECT budget FROM bud) - SUM(alloc))"
            " // SUM(CASE WHEN alloc < cap_tok THEN 1 ELSE 0 END)"
            f" AS BIGINT) END AS share FROM a{r})",
            f"a{r + 1} AS (SELECT source, n_tok, epoch_cap, cap_tok,"
            " CASE WHEN alloc < cap_tok THEN"
            " LEAST(cap_tok, alloc + share) ELSE alloc END AS alloc"
            f" FROM a{r}, s{r})",
        ]
    return ctes


def _waterfill_sql(rounds: int = WATERFILL_ROUNDS) -> str:
    return (
        "WITH "
        + ",\n".join(_waterfill_ctes(rounds))
        + f"""
SELECT source, n_tok, epoch_cap, alloc AS alloc_tok,
       CAST(CASE WHEN n_tok = 0 THEN 0 ELSE (alloc // n_tok) * {MICRO}
            + ((alloc % n_tok) * {MICRO}) // n_tok END AS BIGINT) AS micro_epochs,
       alloc = cap_tok AS capped
FROM a{rounds}
ORDER BY source"""
    )


WATERFILL_ORACLE = _waterfill_sql()


# --- temperature (alpha) sampling: the multilingual-LM mix rule -------------

MIX_TEMP_ALPHA = 0.3  # the mT5/XLM-R exponent: p_s ∝ q_s^alpha


def domain_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights — the standard
    multilingual/multi-domain LM mix rule (mT5 / XLM-R alpha-sampling):
    with natural shares ``q_s = n_tok_s / N``, the sampling share is
    ``p_s = q_s^alpha / Σ q^alpha`` — alpha < 1 upsamples small sources
    and downsamples large ones while preserving order.

    Columns: token count, natural share, sampling share, and the
    up/down-sampling boost ``p/q`` (the factor a loader repeats or
    subsamples each source by). All shares are doubles rounded to 6
    AFTER normalization — the ln/idf precedent for irrational math —
    with the count-side arithmetic exact.

    Scale design: one token-count aggregate per source is the only
    data-proportional stage; the power/normalize math runs on the
    bounded source-count frame (scan-shaped, the waterfill family's
    plan).
    """
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tok")
    )
    totals = per_src.agg(
        F.sum("n_tok").alias("n_total"),
        F.sum(F.pow(F.col("n_tok"), F.lit(MIX_TEMP_ALPHA))).alias("sum_pa"),
    )
    # q^alpha / Σ q^alpha == n^alpha / Σ n^alpha (the N^alpha cancels):
    # compute the cancelled form so both engines exponentiate the same
    # exact integers instead of two different float quotients.
    q = F.col("n_tok") / F.col("n_total")
    p = F.pow(F.col("n_tok"), F.lit(MIX_TEMP_ALPHA)) / F.col("sum_pa")
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_tok",
            F.round(q, 6).alias("nat_frac"),
            F.round(p, 6).alias("samp_frac"),
            F.round(p / q, 6).alias("boost"),
        )
        .orderBy("source")
    )


MIX_TEMPERATURE_ORACLE = f"""
WITH per_src AS (
  SELECT source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
  FROM documents GROUP BY source
),
tot AS (
  SELECT SUM(n_tok) AS n_total,
         SUM(POW(n_tok, {MIX_TEMP_ALPHA})) AS sum_pa
  FROM per_src
)
SELECT source, n_tok,
       ROUND(n_tok / n_total, 6) AS nat_frac,
       ROUND(POW(n_tok, {MIX_TEMP_ALPHA}) / sum_pa, 6) AS samp_frac,
       ROUND((POW(n_tok, {MIX_TEMP_ALPHA}) / sum_pa)
             / (n_tok / n_total), 6) AS boost
FROM per_src, tot
ORDER BY source
"""


def corpus_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the waterfilled allocation into a per-doc repeat
    schedule — the row-level artifact a training loader consumes.

    Every doc repeats ``alloc_s div n_tok_s`` full epochs; the
    remainder tokens go to a deterministic fractional pass: docs in
    md5(doc_id) order accumulate a running token sum, and those whose
    running sum fits inside the remainder get one extra repeat
    (doc-granular, so the schedule may underfill by at most one
    partial doc per source — the exact-doc-granularity policy).

    100 TB shape: the policy core (``waterfill_alloc``) touches the
    corpus once via the per-source aggregate; the schedule pass is one
    map-side broadcast join of the tiny plan plus ONE window shuffle
    keyed on source for the running sum — the fractional cumsum is the
    only per-doc ordered scan, and it is per-source, not global.
    """
    return epoch_schedule_from_rows(
        epoch_index_rows(load_table(spark, sf_dir, "documents"))
    ).orderBy("doc_id")


def epoch_schedule_from_rows(rows: DataFrame) -> DataFrame:
    """The per-doc repeat schedule over pre-tokenized epoch-index rows
    (doc_id, source, n_tok) — the shared core of the batch query and
    the incremental index fold; NOTHING downstream of here touches
    document text, so an index-backed caller pays O(stored scalars),
    not a corpus rescan."""
    rows = scoped_cache(rows)  # consumed twice: policy agg + schedule join
    # n_tok = 0 guard: a source whose kept docs were all fully stripped
    # (blank-safe SHIPPED counts can be 0) has nothing to schedule —
    # without the CASE, `alloc div 0` is NULL under non-ANSI mode and
    # the loader would receive NULL n_repeats instead of 0.
    plan = waterfill_alloc_from_rows(rows).select(
        "source",
        F.expr("CASE WHEN n_tok = 0 THEN 0 ELSE alloc div n_tok END")
        .cast("long")
        .alias("full_epochs"),
        F.expr("CASE WHEN n_tok = 0 THEN 0 ELSE alloc % n_tok END")
        .cast("long")
        .alias("rem_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the fractional pass picks token-bearing docs only: a 0-token doc
    # adds nothing to the running sum, so `running <= rem_tok` alone
    # would hand it a free (empty) repeat — including when rem_tok = 0
    pick = (F.col("n_tok") > 0) & (F.col("running") <= F.col("rem_tok"))
    return (
        rows.join(F.broadcast(plan), "source")
        .withColumn("running", F.sum("n_tok").over(w))
        .select(
            "doc_id",
            "source",
            "n_tok",
            (F.col("full_epochs") + F.when(pick, 1).otherwise(0))
            .cast("long")
            .alias("n_repeats"),
            pick.alias("frac_pick"),
        )
    )


EPOCH_SCHEDULE_ORACLE = (
    "WITH "
    + ",\n".join(_waterfill_ctes())
    + f""",
plan AS (
  SELECT source,
         CASE WHEN n_tok = 0 THEN 0 ELSE alloc // n_tok END AS full_epochs,
         CASE WHEN n_tok = 0 THEN 0 ELSE alloc % n_tok END AS rem_tok
  FROM a{WATERFILL_ROUNDS}
),
d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
sched AS (
  SELECT d.doc_id, d.source, d.n_tok, plan.full_epochs, plan.rem_tok,
         SUM(d.n_tok) OVER (
           PARTITION BY d.source
           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS running
  FROM d JOIN plan USING (source)
)
SELECT doc_id, source, n_tok,
       CAST(full_epochs
            + CASE WHEN n_tok > 0 AND running <= rem_tok THEN 1 ELSE 0 END AS BIGINT)
         AS n_repeats,
       (n_tok > 0 AND running <= rem_tok) AS frac_pick
FROM sched
ORDER BY doc_id
"""
)


# --- incremental epoch schedule (persisted per-doc token index) -------
#
# The training-loader handoff at 100 TB is incremental: source
# partitions keep arriving, and re-tokenizing the whole corpus to
# refresh the repeat schedule would be a full rescan per batch. The
# per-doc state the schedule needs is three SCALARS per doc
# (doc_id, source, n_tok) — ``epoch_index_rows`` — which persist as
# O(delta) tagged extends on the shared versioned-commit machinery
# (``operators.lsm``, compaction + single-compactor lock included).
# A refresh then re-runs the waterfill (tiny per-source frame) and the
# per-source cumsum over STORED scalars: history TEXT is tokenized
# exactly once ever; what recurs per refresh is a window over ~16
# bytes/doc of state, the same replay cost class as the CMS/DSIR
# merged-model reads. (The cumsum itself cannot be delta-local: a new
# doc's md5 rank shifts every later running sum in its source, and the
# waterfill re-splits the budget globally — the policy OUTPUT is
# global by definition; the incremental contract is about never
# rescanning text.)
#
# The registered query runs the algebra in-plan on the repo convention
# (history = doc_id % 10 != 0, delta = % 10 == 0): schedule over
# rows(h) ∪ rows(d) with the delta flagged; the oracle recomputes from
# scratch, so the hash match certifies fold(history rows, delta rows)
# ≡ rebuild(h ∪ d) through the full policy. The disk round trip
# (write/extend/read/compact, rebuild-equivalence) is pytest-verified
# in tests/test_curation.py.


def epoch_schedule_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat schedule refreshed from history index rows + an arriving
    delta's rows, delta flagged — merge ≡ rebuild certified by the
    from-scratch oracle."""
    docs = load_table(spark, sf_dir, "documents")
    hist = epoch_index_rows(docs.filter(F.col("doc_id") % 10 != 0))
    delta = epoch_index_rows(docs.filter(F.col("doc_id") % 10 == 0))
    return (
        epoch_schedule_from_rows(hist.unionByName(delta))
        .withColumn("is_delta", F.col("doc_id") % 10 == 0)
        .orderBy("doc_id")
    )


def write_epoch_index(docs: DataFrame, path: str, tag: str = "base") -> None:
    """Materialize ``docs``' (doc_id, source, n_tok) scalars as the
    ``delta=<tag>`` partition of a persisted epoch index (the
    once-per-doc text work; overwrite-idempotent per tag)."""
    import os

    epoch_index_rows(docs).write.mode("overwrite").parquet(
        os.path.join(path, f"delta={tag}")
    )


def extend_epoch_index(delta_docs: DataFrame, path: str, tag: str) -> None:
    """O(delta) tagged extend — history partitions are never touched;
    a crash replay overwrites its own tag, so no doc double-counts."""
    write_epoch_index(delta_docs, path, tag)


def read_epoch_index(spark: SparkSession, path: str) -> DataFrame | None:
    """All visible per-doc rows (None if the index is empty)."""
    from . import lsm

    return lsm.read_visible(spark, path)


def compact_epoch_index(spark: SparkSession, path: str) -> None:
    """Fold visible tags into one base version (rows are immutable
    per-doc scalars — no re-aggregation; crash-safe versioned commit
    with the single-compactor lock)."""
    from . import lsm

    lsm.compact(spark, path, {"": None})


def epoch_schedule_from_index(spark: SparkSession, path: str) -> DataFrame:
    """The refresh a training loader calls after each extend: schedule
    over stored scalars only (raises if the index is empty)."""
    rows = read_epoch_index(spark, path)
    if rows is None:
        raise ValueError(f"epoch index at {path} is empty")
    return epoch_schedule_from_rows(rows).orderBy("doc_id")


EPOCH_SCHEDULE_INCR_ORACLE = EPOCH_SCHEDULE_ORACLE.replace(
    """SELECT doc_id, source, n_tok,
       CAST(full_epochs
            + CASE WHEN n_tok > 0 AND running <= rem_tok THEN 1 ELSE 0 END AS BIGINT)
         AS n_repeats,
       (n_tok > 0 AND running <= rem_tok) AS frac_pick
FROM sched
ORDER BY doc_id""",
    """SELECT doc_id, source, n_tok,
       CAST(full_epochs
            + CASE WHEN n_tok > 0 AND running <= rem_tok THEN 1 ELSE 0 END AS BIGINT)
         AS n_repeats,
       (n_tok > 0 AND running <= rem_tok) AS frac_pick,
       doc_id % 10 = 0 AS is_delta
FROM sched
ORDER BY doc_id""",
)
assert "is_delta" in EPOCH_SCHEDULE_INCR_ORACLE


# --- surgical benchmark decontamination ------------------------------
#
# ``contamination_ngram_overlap`` REPORTS which corpus docs share
# benchmark n-grams; this operator REMOVES the leaked spans (the GPT-3
# appendix-C / FineWeb recipe: excise the overlapping window rather
# than drop the whole document, so one leaked sentence doesn't cost a
# long doc). Reuses the ExactSubstr strip machinery: positional 5-gram
# md5 rows (``spans._raw_shingles``), matched positions become
# [pos, pos+5) token intervals, the gaps-and-islands union merges
# overlaps, and the victim-only rebuild emits an md5-verified clean
# text fingerprint per doc.
#
# 100 TB shape: the eval side is tiny by construction, so its df-capped
# gram set is a BROADCAST; corpus shingles stream past it map-side and
# only matching positions reach the interval union — the corpus is
# never self-joined, and clean docs pass through without a
# tokenize/rejoin round trip.


def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per corpus doc: tokens removed by eval-overlap span excision.

    (doc_id, n_tokens, n_removed, n_intervals, clean_md5) for every
    non-eval doc; the same eval-side df cap as
    ``contamination_ngram_overlap`` keeps generic boilerplate grams out
    of the broadcast index.
    """
    from .spans import _raw_shingles, _strip_summary, _union_intervals

    docs = load_table_spread(spark, sf_dir, "documents")
    sh = scoped_cache(_raw_shingles(docs, L=CONTAM_NGRAM))
    ev = sh.filter(F.col("doc_id") < EVAL_SET_MAX_ID)
    n_eval = ev.agg(F.countDistinct("doc_id").alias("n_eval"))
    cap = F.greatest(
        F.lit(CONTAM_EVAL_DF_CAP_MIN),
        F.ceil(F.lit(CONTAM_EVAL_DF_CAP_FRACTION) * F.col("n_eval")),
    )
    ev_idx = (
        ev.groupBy("sh")
        .agg(F.countDistinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(n_eval))
        .filter(F.col("df") <= cap)
        .select("sh")
    )
    corpus = docs.filter(F.col("doc_id") >= EVAL_SET_MAX_ID)
    iv = (
        sh.filter(F.col("doc_id") >= EVAL_SET_MAX_ID)
        .join(F.broadcast(ev_idx), "sh")
        .select(
            "doc_id",
            F.col("pos").alias("s"),
            (F.col("pos") + CONTAM_NGRAM).alias("e"),
        )
    )
    return _strip_summary(corpus, _union_intervals(iv))


DECONTAMINATE_ORACLE = f"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
shl AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
             w[i+3] || ' ' || w[i+4]) AS sh
  FROM docs, UNNEST(range(1, len(w) - {CONTAM_NGRAM - 2})) AS t(i)
  WHERE len(w) >= {CONTAM_NGRAM}
),
cap AS (
  SELECT GREATEST({CONTAM_EVAL_DF_CAP_MIN},
                  CEIL({CONTAM_EVAL_DF_CAP_FRACTION}
                       * COUNT(DISTINCT doc_id))) AS cap
  FROM shl WHERE doc_id < {EVAL_SET_MAX_ID}
),
evk AS (
  SELECT sh FROM (
    SELECT sh, COUNT(DISTINCT doc_id) AS df FROM shl
    WHERE doc_id < {EVAL_SET_MAX_ID} GROUP BY sh
  ), cap WHERE df <= cap
),
iv AS (
  SELECT DISTINCT s.doc_id, s.pos AS s, s.pos + {CONTAM_NGRAM} AS e
  FROM shl s JOIN evk USING (sh)
  WHERE s.doc_id >= {EVAL_SET_MAX_ID}
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
corpus AS (SELECT doc_id, w FROM docs WHERE doc_id >= {EVAL_SET_MAX_ID}),
tk AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, w[i] AS tok
  FROM corpus, UNNEST(range(1, len(w) + 1)) AS t(i)
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
tot AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM corpus),
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


# --- content-keyed train/val/test split with leakage certificate -----

# First hex char of the content fingerprint: 0-b train (12/16), c-d val,
# e-f test. String comparison only — no hex->int conversion, so the
# bucketing is trivially identical across engines.
SPLIT_TRAIN_MAX = "b"
SPLIT_VAL_MAX = "d"


def corpus_split_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split, keyed on CONTENT, with an
    in-query leakage certificate.

    Splitting on a content fingerprint (not doc_id) makes exact
    duplicates land in the same split by construction — the certificate
    column proves it cross-engine (an id-keyed split would fail it on
    any duplicated corpus). Near-duplicates CAN still straddle splits;
    ``n_neardup_cross_pairs`` measures that residual leakage using the
    capped-Jaccard pair list, which is why real pipelines dedup BEFORE
    splitting (the curation pipeline's gate order).

    Scale: assignment is map-side (hash + substring compare); the
    certificate is one fingerprint-keyed aggregate; the near-dup
    measure joins the (small) verified pair list against the
    assignment twice — broadcast-sized at any corpus scale.
    """
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    h = F.substring(fp, 1, 1)
    split = (
        F.when(h <= SPLIT_TRAIN_MAX, "train")
        .when(h <= SPLIT_VAL_MAX, "val")
        .otherwise("test")
    )
    assign = d.select("doc_id", fp.alias("fp"), split.alias("split"))
    per_split = assign.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_fingerprints"),
    )
    exact_leak = (
        assign.groupBy("fp")
        .agg(F.countDistinct("split").alias("ns"))
        .agg(F.count_if(F.col("ns") > 1).alias("n_leaky_fp"))
    )
    pairs = dedup_ngram_jaccard(spark, sf_dir)
    sa = assign.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = assign.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    near_cross = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .agg(
            F.count_if(F.col("split_a") != F.col("split_b")).alias(
                "n_neardup_cross_pairs"
            )
        )
    )
    return (
        per_split.crossJoin(F.broadcast(exact_leak))
        .crossJoin(F.broadcast(near_cross))
        .select(
            "split",
            "n_docs",
            "n_fingerprints",
            (F.col("n_leaky_fp") == 0).alias("exact_dup_leak_free"),
            "n_neardup_cross_pairs",
        )
        .orderBy("split")
    )


SPLIT_PLAN_ORACLE = f"""
WITH assign AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         CASE WHEN substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 1)
                   <= '{SPLIT_TRAIN_MAX}' THEN 'train'
              WHEN substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 1)
                   <= '{SPLIT_VAL_MAX}' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
per_split AS (
  SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_fingerprints
  FROM assign GROUP BY split
),
leak AS (
  SELECT COUNT(*) FILTER (ns > 1) AS n_leaky_fp
  FROM (SELECT fp, COUNT(DISTINCT split) AS ns FROM assign GROUP BY fp)
),
jac AS ({NGRAM_JACCARD_CAPPED_ORACLE.replace("ORDER BY doc_a, doc_b", "")}),
near AS (
  SELECT COUNT(*) FILTER (a.split <> b.split) AS n_neardup_cross_pairs
  FROM jac
  JOIN assign a ON a.doc_id = jac.doc_a
  JOIN assign b ON b.doc_id = jac.doc_b
)
SELECT split, n_docs, n_fingerprints,
       n_leaky_fp = 0 AS exact_dup_leak_free,
       n_neardup_cross_pairs
FROM per_split CROSS JOIN leak CROSS JOIN near
ORDER BY split
"""


def corpus_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops view of the decision layer: per (lang, reason) doc counts
    with a drop rate — the LLM-pipeline twin of the reference's
    ``rejection_reason_counts`` ops query (reference
    ``docs/documentation.md:101-106``). The per-doc frame is the same
    gate cascade as ``corpus_curation_decision``; this re-aggregates it
    by the corpus' language column (synthetic salads, which have no
    documents row, report lang='synthetic')."""
    decisions = corpus_curation_decision(spark, sf_dir)
    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        decisions.join(langs, "doc_id", "left")
        .withColumn("lang", F.coalesce("lang", F.lit("synthetic")))
        .groupBy("lang", "reason")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "reason")
    )


CURATION_REPORT_ORACLE = f"""
WITH decisions AS ({CURATION_ORACLE.replace("ORDER BY doc_id", "")})
SELECT coalesce(d2.lang, 'synthetic') AS lang, reason, COUNT(*) AS n_docs
FROM decisions
LEFT JOIN documents d2 ON d2.doc_id = decisions.doc_id
GROUP BY 1, 2
ORDER BY lang, reason
"""


QUERIES = [
    Query("contamination_ngram_overlap",
          "eval-set n-gram contamination check (broadcast eval index)",
          contamination_ngram_overlap, CONTAMINATION_ORACLE),
    Query("corpus_sample_strata",
          "stratified deterministic sampling plan per (lang, length band)",
          corpus_sample_strata, SAMPLE_STRATA_ORACLE),
    Query("corpus_weighted_sample",
          "exactly-N weighted sampling without replacement "
          "(Efraimidis-Spirakis keys over a deterministic uniform; "
          "shuffle-free TakeOrdered top-N)",
          corpus_weighted_sample, WEIGHTED_SAMPLE_ORACLE),
    Query("corpus_curation_decision",
          "keep/drop decision per doc: dup gates + language + repetition",
          corpus_curation_decision, CURATION_ORACLE),
    Query("corpus_curation_report",
          "per-(lang, reason) ops rollup of the decision layer",
          corpus_curation_report, CURATION_REPORT_ORACLE),
    Query("corpus_pack_plan",
          "shard-parallel concat-and-chunk sequence-packing plan",
          corpus_pack_plan, PACK_PLAN_ORACLE),
    Query("corpus_shuffle_plan",
          "deterministic sharded training-shuffle permutation (no global sort)",
          corpus_shuffle_plan, SHUFFLE_PLAN_ORACLE),
    Query("domain_mix_allocation",
          "per-source doc allocation under a weighted training-mix budget",
          domain_mix_allocation, DOMAIN_MIX_ORACLE),
    Query("domain_mix_waterfill",
          "UniMax-style epoch-capped waterfilling token budget per source",
          domain_mix_waterfill, WATERFILL_ORACLE),
    Query("domain_mix_temperature",
          "temperature/alpha-sampling source weights (the mT5/XLM-R "
          "multilingual mix rule: p ∝ q^alpha)",
          domain_mix_temperature, MIX_TEMPERATURE_ORACLE),
    Query("corpus_epoch_schedule",
          "per-doc repeat schedule realizing the waterfilled allocation "
          "(full epochs + deterministic fractional pass)",
          corpus_epoch_schedule, EPOCH_SCHEDULE_ORACLE),
    Query("epoch_schedule_incremental",
          "repeat schedule refreshed from persisted per-doc token rows "
          "+ an arriving delta (history text never re-tokenized); "
          "merge == rebuild certified against the from-scratch oracle",
          epoch_schedule_incremental, EPOCH_SCHEDULE_INCR_ORACLE),
    Query("corpus_decontaminate",
          "surgical benchmark decontamination: excise eval-overlapping "
          "n-gram spans via broadcast index + interval union, md5-verified "
          "clean text",
          corpus_decontaminate, DECONTAMINATE_ORACLE),
    Query("corpus_split_plan",
          "content-keyed train/val/test split with exact-dup leakage "
          "certificate and near-dup cross-split measure",
          corpus_split_plan, SPLIT_PLAN_ORACLE),
]
