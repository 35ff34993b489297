"""Text-analysis operators over the ``documents`` table.

Driver-mandated extension (SURVEY.md §2.11): token counting (whitespace
and regex/BPE-ish), quality scoring, language-ID heuristic, document
fingerprinting. All pure column expressions — at 100 TB these run
map-side inside whole-stage codegen with zero shuffles (the group-bys
below exist only to produce compact, oracle-checkable outputs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import Query
from ..sources.tables import load_table, load_table_spread
from .lifecycle import scoped_cache

# Tiny English function-word list for the heuristics (deterministic,
# shared verbatim with the oracles).
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

TOKEN_REGEX = "[a-z]+|[0-9]+"  # BPE-ish: alpha runs and digit runs


def _tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + regex token counts and char length per document."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0)).alias("n_regex_tokens"),
        F.length("text").alias("n_chars"),
    ).orderBy("doc_id")


TOKEN_STATS_ORACLE = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
       len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS n_regex_tokens,
       LENGTH(text) AS n_chars
FROM documents ORDER BY doc_id
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: stopword ratio, type-token ratio, length band.

    The standard pre-training quality gates (Gopher-style rules) as
    column expressions; thresholds are demo values.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n = F.size(toks)
    stop_ratio = F.size(
        F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))
    ) / n
    ttr = F.size(F.array_distinct(toks)) / n
    band = (
        F.when(n < 20, "short").when(n <= 60, "medium").otherwise("long")
    )
    return d.select(
        "doc_id",
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(ttr, 4).alias("type_token_ratio"),
        band.alias("length_band"),
        (stop_ratio >= 0.01).alias("passes_stopword_gate"),
    ).orderBy("doc_id")


_STOPWORD_LIST_SQL = "[" + ", ".join(f"'{s}'" for s in EN_STOPWORDS) + "]"

QUALITY_ORACLE = f"""
SELECT doc_id,
       ROUND(len(list_filter(w, t -> list_contains({_STOPWORD_LIST_SQL}, t)))::DOUBLE
             / len(w), 4) AS stopword_ratio,
       ROUND(len(list_distinct(w))::DOUBLE / len(w), 4) AS type_token_ratio,
       CASE WHEN len(w) < 20 THEN 'short'
            WHEN len(w) <= 60 THEN 'medium'
            ELSE 'long' END AS length_band,
       len(list_filter(w, t -> list_contains({_STOPWORD_LIST_SQL}, t)))::DOUBLE
         / len(w) >= 0.01 AS passes_stopword_gate
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
ORDER BY doc_id
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density language-ID heuristic vs the labeled ``lang``.

    Returns the confusion summary (label × prediction counts). The
    corpus is synthetic token soup, so the value verified is the
    *operator* (deterministic scoring), not model accuracy.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    ratio = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))) / F.size(toks)
    pred = F.when(ratio >= 0.02, "en").otherwise("unknown")
    return (
        d.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted")
    )


LANG_ID_ORACLE = f"""
SELECT lang, predicted, COUNT(*) AS n
FROM (
  SELECT lang,
         CASE WHEN len(list_filter(string_split(text, ' '),
                    t -> list_contains({_STOPWORD_LIST_SQL}, t)))::DOUBLE
                   / len(string_split(text, ' ')) >= 0.02
              THEN 'en' ELSE 'unknown' END AS predicted
  FROM documents
)
GROUP BY lang, predicted ORDER BY lang, predicted
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized md5 content fingerprint (lower, collapse whitespace).

    The canonical doc-level dedup key for pipelines: compute map-side,
    shuffle only the digest.
    """
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return d.select("doc_id", F.md5(norm).alias("fingerprint")).orderBy("doc_id")


FINGERPRINT_ORACLE = r"""
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
FROM documents ORDER BY doc_id
"""


WINNOW_WINDOW = 4  # consecutive gram hashes per winnowing window


def winnow_fingerprints(docs: DataFrame, n: int = 3, w: int = WINNOW_WINDOW) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints: (doc_id, fp) rows.

    The MOSS scheme: hash every word n-gram (the shared zero-shuffle
    gram hasher — ``gram_hash_rows``' zip-of-slices derivation), then
    keep the MINIMUM hash of every w-consecutive-gram window and
    dedupe. Guarantee: any shared run of w+n-1 tokens between two
    documents yields at least one shared fingerprint, while storage is
    ~2/(w+1) of all gram hashes. All window math rides ONE doc_id
    shuffle (the first and only exchange — the gram derivation itself
    is map-side); min-per-sliding-window is a frame-bounded window agg.
    """
    from pyspark.sql import Window as W

    from .dedup import gram_hash_rows

    gh = gram_hash_rows(docs, n=n)
    win = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    has_full = W.partitionBy("doc_id").orderBy("pos").rowsBetween(w - 1, w - 1)
    return (
        gh.withColumn("wmin", F.min("gh").over(win))
        .withColumn("full", F.count(F.lit(1)).over(has_full))
        .filter(F.col("full") == 1)  # only complete windows
        .select("doc_id", F.col("wmin").alias("fp"))
        .distinct()
    )


def text_winnow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint stats with a hash-stable certificate.

    xxhash64 has no DuckDB twin, so the fingerprint COUNT itself can't
    be oracled; instead the query emits what an exact engine CAN derive
    — n_windows, the number of complete winnowing windows, pure token
    arithmetic: (n_tokens - n + 1) - w + 1 — plus a boolean pinning the
    scheme's provable bounds: every complete window selects a
    fingerprint and distinct mins can't exceed windows, so
    1 <= n_fingerprints <= n_windows. The tight ~2/(w+1) density and
    the shared-run guarantee are unit-tested where the hash values are
    visible."""
    d = load_table(spark, sf_dir, "documents")
    n, w = 3, WINNOW_WINDOW
    fps = winnow_fingerprints(d, n=n, w=w)
    counts = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    windows = d.select(
        "doc_id",
        (F.size(F.split("text", " ")) - F.lit(n + w - 2))
        .cast("bigint")
        .alias("n_windows"),
    ).filter(F.col("n_windows") >= 1)
    return (
        windows.join(counts, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            (
                F.coalesce(F.col("n_fp"), F.lit(0)).between(1, F.col("n_windows"))
            ).alias("fp_bounds_ok"),
        )
        .orderBy("doc_id")
    )


WINNOW_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         len(string_split(text, ' ')) - {3 + WINNOW_WINDOW - 2} AS n_windows
  FROM documents
)
SELECT doc_id, CAST(n_windows AS BIGINT) AS n_windows, TRUE AS fp_bounds_ok
FROM t WHERE n_windows >= 1 ORDER BY doc_id
"""


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus TF-IDF per (doc, term): tf * ln(N/df).

    Plan shape for 100 TB: the tf aggregate is the only big shuffle
    (explode → groupBy (doc_id, term), map-side combined). df is derived
    FROM tf — tf is already one row per (doc, term), so rows-per-term IS
    the document frequency — which lets Catalyst reuse the tf exchange
    (ReusedExchange) instead of scanning + exploding the corpus a second
    time. The df table is vocabulary-sized, so it folds to a broadcast
    join; the corpus size N folds to a 1-row broadcast. No driver-side
    collection.
    """
    d = load_table(spark, sf_dir, "documents")
    exploded = d.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = exploded.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # count_if(tf >= 1) ≡ row count per term (tf is a count, always ≥1),
    # but the predicate makes the tf value a real data dependency, so
    # Catalyst can't prune the column and re-derive a distinct from a
    # second corpus scan — both subtrees keep the identical
    # (doc_id, term)-count aggregate and the shuffle is written once and
    # read twice (ReusedExchange).
    df = tf.groupBy("term").agg(
        F.count_if(F.col("tf") >= 1).alias("df")
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias(
                "tfidf"
            ),
        )
        .orderBy("doc_id", "term")
    )


TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, term, tf, df,
       ROUND(tf * ln(n_docs::DOUBLE / df), 6) AS tfidf
FROM tf JOIN df USING (term) CROSS JOIN n
ORDER BY doc_id, term
"""


def text_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most distinctive term per document: row_number over tfidf desc.

    Deterministic total order (tfidf desc, term asc) so the pick is
    reproducible across engines; rides one window shuffle on doc_id.
    """
    scored = text_tfidf(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), "tfidf")
        .orderBy("doc_id")
    )


TOP_TERM_ORACLE = f"""
WITH scored AS ({TFIDF_ORACLE.replace("ORDER BY doc_id, term", "")})
SELECT doc_id, term AS top_term, tfidf
FROM (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rn
  FROM scored
) WHERE rn = 1 ORDER BY doc_id
"""


def bigram_logprob_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob) over an arbitrary (doc_id, text)
    frame — the corpus-MLE bigram fluency score, UNROUNDED (gate
    consumers compare against a corpus statistic; rounding belongs to
    the registered display query only). Docs with < 2 tokens get no row.

    score(doc) = avg over its bigram occurrences of
    ln((C(w1,w2) + 1) / (C(w1·) + V)), counts over the WHOLE input
    frame, V = its vocabulary size. Add-one smoothing is load-bearing,
    not cosmetic: raw MLE assigns P=1 to any bigram whose prefix occurs
    once (a singleton context has a deterministic continuation), so
    token salad made of unique words would score at the MAXIMUM;
    smoothing pulls singleton bigrams toward 1/V and restores the
    intended ordering (repeated fluent patterns high, salad low).

    Plan shape (100 TB): the bigram stream derives in-row from an
    ``arrays_zip`` of two shifted ``slice`` views of the token array
    (the ``sketch._gram_stream`` idiom, r16 — codegen builtins with
    ZERO pre-shuffle, replacing the posexplode + window-lead shape
    that exchanged and sorted the whole token stream by doc_id first),
    cached once (scoped — released by the catalog/pipeline consumers),
    then aggregated twice (pair counts, prefix counts) and joined back
    on token keys — the inverted-index family TF-IDF uses; every join
    is a keyed shuffle, never all-pairs.
    """
    w = F.split("text", " ")
    d = docs.filter(F.size(w) >= 2)
    n1 = F.size(w) - F.lit(1)
    bi = scoped_cache(
        d.select(
            "doc_id",
            F.explode(F.arrays_zip(F.slice(w, 1, n1), F.slice(w, 2, n1))).alias(
                "z"
            ),
        ).select("doc_id", F.col("z.0").alias("w1"), F.col("z.1").alias("w2"))
    )
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    # Vocabulary size as a 1-row broadcast frame (NOT a driver action):
    # counted over ALL token occurrences, including doc-final ones.
    vsize = d.select(F.explode(w).alias("w1")).agg(
        F.countDistinct("w1").alias("v")
    )
    lp = F.log(
        (F.col("n12") + 1).cast("double") / (F.col("n1") + F.col("v"))
    )
    # Deterministic summation: fold the per-bigram logs in sorted order
    # (value sequence is unique under ties) so the rounded average can
    # never flip on engine-dependent partial-sum order; the oracle folds
    # the identical sorted sequence with DuckDB's list_reduce.
    lps = F.sort_array(F.collect_list(lp))
    avg_sorted = F.aggregate(lps, F.lit(0.0), lambda a, x: a + x) / F.size(lps)
    return (
        bi.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vsize))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            avg_sorted.alias("avg_logprob"),
        )
    )


def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered corpus-MLE bigram fluency score (perplexity-style
    quality proxy — CCNet, Wenzek et al. 2020, filters corpora by LM
    perplexity; with no external LM in the container, the corpus's own
    bigram MLE is the self-contained equivalent). Thin display wrapper
    over :func:`bigram_logprob_frame`, which the curation fluency gate
    consumes unrounded."""
    return (
        bigram_logprob_frame(load_table_spread(spark, sf_dir, "documents"))
        .select("doc_id", "n_bigrams", F.round("avg_logprob", 4).alias("avg_logprob"))
        .orderBy("doc_id")
    )


BIGRAM_LOGPROB_ORACLE = """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bi AS (
  SELECT doc_id,
         unnest([{'w1': w[i], 'w2': w[i+1]} for i in range(1, len(w))]) AS b
  FROM docs WHERE len(w) >= 2
),
bb AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bi),
c2 AS (SELECT w1, w2, COUNT(*) AS n12 FROM bb GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS n1 FROM bb GROUP BY w1),
vs AS (
  SELECT COUNT(DISTINCT tok) AS v
  FROM (SELECT unnest(w) AS tok FROM docs WHERE len(w) >= 2)
),
scored AS (
  SELECT doc_id, ln((n12 + 1)::DOUBLE / (n1 + v)) AS lp
  FROM bb JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vs
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(list_reduce(list(lp ORDER BY lp), (a, b) -> a + b) / COUNT(*), 4)
         AS avg_logprob
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


def text_fluency_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail partition of the corpus by LM score
    (Wenzek et al. 2020 split corpora into perplexity terciles; head
    trains as-is, tail is dropped or reweighted).

    Buckets come from ``ntile(3)`` over the UNROUNDED bigram
    log-probability — bit-identical on both engines because the
    per-doc average folds its logs in sorted order — with doc_id as
    the total-order tie-break.  Output is the per-doc bucket label
    plus the rounded score, all value-checked.

    Scale note: ntile over the corpus is a global sort; at 100 TB the
    production form computes two approximate quantile cutpoints
    (``approxQuantile`` / t-digest, already in ``approx_aggregates``)
    and buckets map-side against the broadcast cutpoints — same
    contract, no total order.  The exact form is what the oracle gate
    can value-check.
    """
    scored = bigram_logprob_frame(load_table_spread(spark, sf_dir, "documents"))
    w = Window.orderBy(F.col("avg_logprob").desc(), "doc_id")
    bucket = F.ntile(3).over(w)
    label = (
        F.when(bucket == 1, F.lit("head"))
        .when(bucket == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.select(
            "doc_id",
            label.alias("bucket"),
            F.round("avg_logprob", 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


FLUENCY_BUCKETS_ORACLE = """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bi AS (
  SELECT doc_id,
         unnest([{'w1': w[i], 'w2': w[i+1]} for i in range(1, len(w))]) AS b
  FROM docs WHERE len(w) >= 2
),
bb AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bi),
c2 AS (SELECT w1, w2, COUNT(*) AS n12 FROM bb GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS n1 FROM bb GROUP BY w1),
vs AS (
  SELECT COUNT(DISTINCT tok) AS v
  FROM (SELECT unnest(w) AS tok FROM docs WHERE len(w) >= 2)
),
scored AS (
  SELECT doc_id, ln((n12 + 1)::DOUBLE / (n1 + v)) AS lp
  FROM bb JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vs
),
per_doc AS (
  SELECT doc_id,
         list_reduce(list(lp ORDER BY lp), (a, b) -> a + b) / COUNT(*)
           AS raw_lp
  FROM scored GROUP BY doc_id
),
bucketed AS (
  SELECT doc_id, raw_lp,
         NTILE(3) OVER (ORDER BY raw_lp DESC, doc_id) AS nt
  FROM per_doc
)
SELECT doc_id,
       CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
         AS bucket,
       ROUND(raw_lp, 4) AS avg_logprob
FROM bucketed ORDER BY doc_id
"""


#: Absolute discount for interpolated Kneser-Ney (Chen & Goodman 1999
#: report 0.75 as the robust single-discount choice; CCNet's KenLM
#: filter uses modified KN with per-count discounts — one discount
#: keeps the oracle arithmetic simple while preserving the model class).
KN_DISCOUNT = 0.75


#: Fixed reference slice the KN model trains on (doc_id < this). CCNet
#: scores candidate text against a KenLM trained on TRUSTED text
#: (Wikipedia), never on the corpus being filtered — training on the
#: scored corpus lets junk boost itself: a salad trigram seen once in
#: a once-seen context gets max(1-D,0)/1 = 0.25 of the mass (measured:
#: self-trained KN put planted salad ABOVE the corpus median). A fixed
#: reference also fixes the 100 TB shape: the model frames are bounded
#: by the reference, so scoring is broadcast joins over the corpus
#: stream — no corpus-sized model shuffle. Planted witnesses
#: (doc_id >= 20M) can never enter the reference.
KN_REF_MAX_ID = 250


def kn_logprob_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, n_trigrams, kn_logprob): interpolated Kneser-Ney
    TRIGRAM log-probability of every doc against the model trained on
    the fixed reference slice (doc_id < KN_REF_MAX_ID), UNROUNDED —
    the CCNet LM-perplexity quality filter class (Wenzek et al. 2020
    score with a Wikipedia-trained 5-gram KenLM; the reference-slice
    KN trigram model is the self-contained equivalent, one order up
    from ``bigram_logprob_frame``'s add-one proxy). Docs with < 3
    tokens get no row.

    Model (Chen & Goodman 1999, interpolated form, discount D), with
    KenLM-style immediate backoff for unseen contexts and an add-one
    continuation floor standing in for <unk>:

      P(w3|w1,w2) = max(c(w123)-D,0)/c(w12·)
                    + D·N1+(w12·)/c(w12·) · P(w3|w2)   [ctx seen]
                  = P(w3|w2)                            [ctx unseen]
      P(w3|w2)    = max(N1+(·w23)-D,0)/N1+(·w2·)
                    + D·N1+(w2*)/N1+(·w2·) · P_c(w3)   [w2 seen]
                  = P_c(w3)                             [w2 unseen]
      P_c(w3)     = (N1+(*w3) + 1) / (T + U + 1)

    where c(w12·)=Σ_w3 c(w123), N1+ are distinct-continuation type
    counts, T = distinct (w2,w3) types, U = distinct continuation
    words — all INTEGER aggregates of the reference trigram type
    table, so both engines build bit-identical count frames; the
    float combination is written with the identical operation order
    on both sides. The add-one floor is proper (U seen continuations
    + one OOV bucket sum to 1) and puts out-of-model salad at
    ~ln(1/(T+U+1)) — far below any fluent document.

    Plan shape (100 TB): the trigram stream derives in-row from an
    ``arrays_zip`` of three shifted ``slice`` views of the token array
    (the ``sketch._gram_stream`` idiom, r16 — codegen builtins with
    ZERO pre-shuffle, replacing the posexplode + two-window-leads
    shape that exchanged and sorted the whole token stream by doc_id
    first), cached once (scoped); the MODEL aggregates only the
    reference slice's trigrams (bounded frames), and scoring is five
    BROADCAST left-joins over the occurrence stream — entirely
    map-side — followed by the per-doc aggregate. No corpus-sized
    shuffle except that final doc_id-keyed agg.
    """
    D = F.lit(KN_DISCOUNT)
    w = F.split("text", " ")
    d = docs.filter(F.size(w) >= 3)
    n3 = F.size(w) - F.lit(2)
    tri = scoped_cache(
        d.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(w, 1, n3), F.slice(w, 2, n3), F.slice(w, 3, n3)
                )
            ).alias("z"),
        ).select(
            "doc_id",
            F.col("z.0").alias("w1"),
            F.col("z.1").alias("w2"),
            F.col("z.2").alias("w3"),
        )
    )
    # scoped_cache: the reference type table feeds four statistic
    # aggregates plus the scoring join — bounded by the reference slice
    t3 = scoped_cache(
        tri.filter(F.col("doc_id") < KN_REF_MAX_ID)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("n3"))
    )
    ctx2 = t3.groupBy("w1", "w2").agg(
        F.sum("n3").alias("c_ctx"), F.count(F.lit(1)).alias("n1f")
    )
    midb = t3.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("nb"))
    mid2 = midb.groupBy("w2").agg(
        F.sum("nb").alias("nmid"), F.count(F.lit(1)).alias("nfol")
    )
    cont = midb.groupBy("w3").agg(F.count(F.lit(1)).alias("nc"))
    tot = midb.agg(
        F.count(F.lit(1)).alias("tt"), F.countDistinct("w3").alias("uu")
    )
    pcont = (F.coalesce(F.col("nc"), F.lit(0)) + 1) / (
        F.col("tt") + F.col("uu") + 1
    )
    pmid = F.when(
        F.col("nmid").isNotNull(),
        F.greatest(F.coalesce(F.col("nb"), F.lit(0)) - D, F.lit(0.0))
        / F.col("nmid")
        + D * F.col("nfol") / F.col("nmid") * pcont,
    ).otherwise(pcont)
    p = F.when(
        F.col("c_ctx").isNotNull(),
        F.greatest(F.coalesce(F.col("n3"), F.lit(0)) - D, F.lit(0.0))
        / F.col("c_ctx")
        + D * F.col("n1f") / F.col("c_ctx") * pmid,
    ).otherwise(pmid)
    occ = (
        tri.join(F.broadcast(t3), ["w1", "w2", "w3"], "left")
        .join(F.broadcast(ctx2), ["w1", "w2"], "left")
        .join(F.broadcast(midb), ["w2", "w3"], "left")
        .join(F.broadcast(mid2), "w2", "left")
        .join(F.broadcast(cont), "w3", "left")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.log(p).alias("lp"))
    )
    # sorted fold (the bigram_logprob_frame determinism contract)
    lps = F.sort_array(F.collect_list("lp"))
    avg_sorted = F.aggregate(lps, F.lit(0.0), lambda a, x: a + x) / F.size(lps)
    return occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        avg_sorted.alias("kn_logprob"),
    )


def text_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered Kneser-Ney trigram perplexity score (display wrapper
    over :func:`kn_logprob_frame`, which the curation fluency gate
    consumes unrounded): per-doc trigram count, average KN
    log-probability, and perplexity exp(-avg)."""
    scored = kn_logprob_frame(load_table_spread(spark, sf_dir, "documents"))
    return scored.select(
        "doc_id",
        "n_trigrams",
        F.round("kn_logprob", 4).alias("kn_logprob"),
        F.round(F.exp(-F.col("kn_logprob")), 4).alias("kn_ppl"),
    ).orderBy("doc_id")


def _kn_cte_sql(docs_rel: str) -> str:
    """The KN trigram scoring chain as reusable CTE text over any
    (doc_id, text) relation — shared verbatim by the registered oracle
    and the curation-decision oracle so both engines' gate inputs stay
    definitionally identical."""
    return f"""tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM {docs_rel}),
tr AS (
  SELECT doc_id,
         unnest([{{'w1': w[i], 'w2': w[i+1], 'w3': w[i+2]}}
                 for i in range(1, len(w) - 1)]) AS t
  FROM tw WHERE len(w) >= 3),
tt3 AS (SELECT doc_id, t.w1 AS w1, t.w2 AS w2, t.w3 AS w3 FROM tr),
t3 AS (SELECT w1, w2, w3, COUNT(*) AS n3 FROM tt3
       WHERE doc_id < {KN_REF_MAX_ID} GROUP BY w1, w2, w3),
ctx2 AS (SELECT w1, w2, CAST(SUM(n3) AS BIGINT) AS c_ctx, COUNT(*) AS n1f
         FROM t3 GROUP BY w1, w2),
midb AS (SELECT w2, w3, COUNT(*) AS nb FROM t3 GROUP BY w2, w3),
mid2 AS (SELECT w2, CAST(SUM(nb) AS BIGINT) AS nmid, COUNT(*) AS nfol
         FROM midb GROUP BY w2),
cont AS (SELECT w3, COUNT(*) AS nc FROM midb GROUP BY w3),
tot AS (SELECT COUNT(*) AS tt, COUNT(DISTINCT w3) AS uu FROM midb),
kn_j AS (
  SELECT tt3.doc_id, n3, c_ctx, n1f, nb, nmid, nfol, nc, tt, uu
  FROM tt3
  LEFT JOIN t3 USING (w1, w2, w3)
  LEFT JOIN ctx2 USING (w1, w2)
  LEFT JOIN midb USING (w2, w3)
  LEFT JOIN mid2 USING (w2)
  LEFT JOIN cont USING (w3)
  CROSS JOIN tot),
kn_p AS (
  SELECT doc_id, n3, c_ctx, n1f,
         CASE WHEN nmid IS NOT NULL THEN
                GREATEST(COALESCE(nb, 0) - {KN_DISCOUNT}, 0.0) / nmid
                + {KN_DISCOUNT} * nfol / nmid
                  * ((COALESCE(nc, 0) + 1) / (tt + uu + 1))
              ELSE (COALESCE(nc, 0) + 1) / (tt + uu + 1) END AS pmid
  FROM kn_j),
kn_occ AS (
  SELECT doc_id,
         ln(CASE WHEN c_ctx IS NOT NULL THEN
                   GREATEST(COALESCE(n3, 0) - {KN_DISCOUNT}, 0.0) / c_ctx
                   + {KN_DISCOUNT} * n1f / c_ctx * pmid
                 ELSE pmid END) AS lp
  FROM kn_p),
kn_doc AS (
  SELECT doc_id, COUNT(*) AS n_trigrams,
         list_reduce(list(lp ORDER BY lp), (a, b) -> a + b) / COUNT(*)
           AS kn_lp
  FROM kn_occ GROUP BY doc_id)"""


KN_PERPLEXITY_ORACLE = f"""
WITH {_kn_cte_sql("documents")}
SELECT doc_id, n_trigrams,
       ROUND(kn_lp, 4) AS kn_logprob,
       ROUND(exp(-kn_lp), 4) AS kn_ppl
FROM kn_doc ORDER BY doc_id
"""


def text_vocab_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary rank-frequency statistics (Zipf's law): word
    counts ranked by (count DESC, word) and the log-log regression
    slope of frequency on rank — the standard corpus-health check (a
    natural corpus slopes near -1; templated/duplicated corpora flatten
    or step).  One vocab aggregation + one tiny window; the regression
    is a single-pass ``regr_slope`` aggregate rounded on both engines.
    """
    words = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window as W

    rk = F.row_number().over(W.orderBy(F.col("c").desc(), "w"))
    ranked = vocab.select("w", "c", rk.cast("long").alias("rank"))
    return ranked.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("c").alias("n_tokens"),
        F.max("c").alias("top_count"),
        F.round(
            F.regr_slope(F.log("c"), F.log("rank")), 4
        ).alias("zipf_slope"),
    )


VOCAB_ZIPF_ORACLE = """
WITH vocab AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY w
),
ranked AS (
  SELECT w, c,
         CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS BIGINT) AS rank
  FROM vocab
)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       MAX(c) AS top_count,
       ROUND(regr_slope(ln(c), ln(rank)), 4) AS zipf_slope
FROM ranked
"""


# --- BPE tokenization with a frozen merge table ----------------------------

# Frozen merge list in priority order (a trained BPE vocabulary is
# produced offline; corpus-scale APPLICATION is the Spark job). Chosen
# for this corpus's vocabulary so merges genuinely fire: each entry
# rewrites "x y" -> "xy" everywhere, exactly the reference BPE apply
# step for a rank-ordered merge. Plain literal replaces (no regex), so
# Spark and DuckDB rewrite identically.
BPE_MERGES = (
    ("t h", "th"), ("th e", "the"), ("a n", "an"), ("i n", "in"),
    ("s c", "sc"), ("sc an", "scan"), ("r o", "ro"), ("a s", "as"),
    ("l u", "lu"), ("v a", "va"), ("va lu", "valu"), ("a b", "ab"),
    ("t ab", "tab"), ("tab l", "tabl"), ("tabl e", "table"),
)


def _bpe_spaced(word: Column) -> Column:
    """'spark' -> 's p a r k', then the merge cascade."""
    col = F.trim(F.regexp_replace(word, "(.)", "$1 "))
    for pair, merged in BPE_MERGES:
        col = F.replace(col, F.lit(pair), F.lit(merged))
    return col


def _bpe_spaced_sql(expr: str) -> str:
    out = f"trim(regexp_replace({expr}, '(.)', '\\1 ', 'g'))"
    for pair, merged in BPE_MERGES:
        out = f"replace({out}, '{pair}', '{merged}')"
    return out


#: merges learned by the registered training query
BPE_TRAIN_MERGES = 6


def bpe_train_frame(docs: DataFrame, n_merges: int = BPE_TRAIN_MERGES) -> DataFrame:
    """LEARN a BPE merge table from the corpus (the training half the
    frozen-table ``text_bpe_tokenize`` consumes; Sennrich et al. 2016).

    Classic trainer shape, distributed: the corpus collapses once to
    its word VOCABULARY with counts (pair statistics are
    count-weighted vocab aggregations, never token-stream scans), then
    each round (1) explodes adjacent symbol pairs per vocab word,
    (2) sums counts and takes the global argmax (ties broken
    lexicographically so both engines pick the same pair), and
    (3) rewrites every vocab word with the won merge as a literal
    left-to-right replace — the identical replace-all semantics on
    Spark and DuckDB, which is what makes an ITERATIVE trainer
    oracle-checkable.  The per-round iterate (the rewritten vocab and
    the 1-row winner) is eagerly checkpointed: O(vocab) rows per round,
    the standard lineage cut.

    At web scale the vocab aggregation is the whole cost; production
    trainers cap/sample the vocabulary first — that cap would slot in
    between the vocab groupBy and round 1 without changing the shape.
    """
    from functools import reduce

    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    rep = vocab.select(
        "wc", F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("s")
    ).localCheckpoint(eager=True)
    picks = []
    for r in range(1, n_merges + 1):
        arr = F.split("s", " ")
        pair_at = lambda i: F.struct(  # noqa: E731
            F.element_at(arr, i).alias("lhs"),
            F.element_at(arr, i + 1).alias("rhs"),
        )
        pairs = (
            rep.filter(F.size(arr) >= 2)
            .select(
                "wc",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(arr) - 1), pair_at
                    )
                ).alias("p"),
            )
            .select("wc", "p.lhs", "p.rhs")
        )
        best = (
            pairs.groupBy("lhs", "rhs")
            .agg(F.sum("wc").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        picks.append(
            best.select(
                F.lit(r).alias("merge_rank"), "lhs", "rhs",
                F.concat("lhs", "rhs").alias("merged"), "pair_count",
            )
        )
        rep = (
            rep.crossJoin(
                F.broadcast(
                    best.select(
                        F.col("lhs").alias("bx"), F.col("rhs").alias("by")
                    )
                )
            )
            .select(
                "wc",
                F.replace(
                    F.col("s"),
                    F.concat("bx", F.lit(" "), "by"),
                    F.concat("bx", "by"),
                ).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
    return reduce(lambda x, y: x.unionByName(y), picks).orderBy("merge_rank")


def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: the first BPE_TRAIN_MERGES merges learned from
    the documents corpus, with their selection-time weighted counts."""
    return bpe_train_frame(load_table(spark, sf_dir, "documents"))


def _bpe_train_sql(n_merges: int = BPE_TRAIN_MERGES) -> str:
    """DuckDB twin: the same trainer unrolled as chained CTEs."""
    ctes = [
        "v0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS wc FROM"
        " (SELECT unnest(string_split(text, ' ')) AS w FROM documents)"
        " GROUP BY w)",
        "r0 AS (SELECT wc, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s"
        " FROM v0)",
    ]
    for t in range(1, n_merges + 1):
        ctes += [
            f"p{t} AS (SELECT a[i] AS lhs, a[i + 1] AS rhs,"
            f" CAST(SUM(wc) AS BIGINT) AS pair_count"
            f" FROM (SELECT wc, string_split(s, ' ') AS a FROM r{t-1}) q,"
            f" UNNEST(range(1, len(a))) AS t(i)"
            f" GROUP BY lhs, rhs)",
            f"b{t} AS (SELECT lhs, rhs, pair_count FROM p{t}"
            f" ORDER BY pair_count DESC, lhs, rhs LIMIT 1)",
            f"r{t} AS (SELECT wc, replace(s,"
            f" (SELECT lhs || ' ' || rhs FROM b{t}),"
            f" (SELECT lhs || rhs FROM b{t})) AS s FROM r{t-1})",
        ]
    unions = "\nUNION ALL ".join(
        f"SELECT {t} AS merge_rank, lhs, rhs, lhs || rhs AS merged,"
        f" pair_count FROM b{t}"
        for t in range(1, n_merges + 1)
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT * FROM (\n" + unions + "\n) ORDER BY merge_rank"
    )


BPE_TRAIN_ORACLE = _bpe_train_sql()


def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a frozen BPE merge table to every word; count subword
    tokens and hash the full tokenization.

    The corpus-scale half of BPE (training happens offline, once): per
    word, split to characters and run the rank-ordered merge cascade —
    pure literal string rewrites inside whole-stage codegen, one
    explode + one doc-keyed re-aggregation (the TF-IDF shape). Output
    is value-checked end to end: subword counts AND the md5 of the
    '|'-joined tokenized words in document order.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    enc = words.select(
        "doc_id", "pos", _bpe_spaced(F.col("w")).alias("enc")
    ).withColumn("n_sub", F.size(F.split("enc", " ")))
    picked = F.array_sort(F.collect_list(F.struct("pos", "enc")))
    return (
        enc.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_bpe_tokens"),
            F.md5(
                F.array_join(F.transform(picked, lambda x: x["enc"]), "|")
            ).alias("tokenized_md5"),
        )
        .orderBy("doc_id")
    )


BPE_TOKENIZE_ORACLE = f"""
WITH words AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
  FROM documents
),
enc AS (
  SELECT doc_id, pos, {_bpe_spaced_sql("w")} AS e FROM words
)
SELECT doc_id,
       count(*) AS n_words,
       CAST(sum(len(string_split(e, ' '))) AS BIGINT) AS n_bpe_tokens,
       md5(string_agg(e, '|' ORDER BY pos)) AS tokenized_md5
FROM enc GROUP BY doc_id ORDER BY doc_id
"""


QUERIES = [
    Query("text_token_stats", "whitespace + regex token counting", text_token_stats,
          TOKEN_STATS_ORACLE),
    Query("text_bpe_tokenize",
          "frozen-merge BPE tokenization: subword counts + tokenization hash",
          text_bpe_tokenize, BPE_TOKENIZE_ORACLE),
    Query("text_vocab_zipf",
          "vocabulary rank-frequency stats + log-log Zipf slope "
          "(corpus-health diagnostic)",
          text_vocab_zipf, VOCAB_ZIPF_ORACLE),
    Query("text_fluency_buckets",
          "CCNet head/middle/tail corpus partition by bigram-LM score "
          "(ntile over the engine-stable unrounded fluency)",
          text_fluency_buckets, FLUENCY_BUCKETS_ORACLE),
    Query("text_bpe_train",
          "BPE merge-table TRAINING: iterative count-weighted pair argmax "
          "over the vocab with lexicographic tie-break (Sennrich et al.)",
          text_bpe_train, BPE_TRAIN_ORACLE),
    Query("text_bigram_logprob",
          "corpus-MLE bigram log-probability fluency score (perplexity-style "
          "quality proxy, CCNet-inspired)",
          text_bigram_logprob, BIGRAM_LOGPROB_ORACLE),
    Query("text_kn_perplexity",
          "interpolated Kneser-Ney trigram perplexity (the CCNet LM-quality "
          "filter class: discounted counts + continuation-type backoff, "
          "integer count algebra, sorted-fold per-doc average)",
          text_kn_perplexity, KN_PERPLEXITY_ORACLE),
    Query("text_tfidf", "exact corpus TF-IDF per (doc, term)", text_tfidf,
          TFIDF_ORACLE),
    Query("text_top_term", "most distinctive term per doc (TF-IDF argmax)",
          text_top_term, TOP_TERM_ORACLE),
    Query("text_winnow_stats", "winnowing rolling-hash fingerprints (MOSS scheme)",
          text_winnow_stats, WINNOW_ORACLE),
    Query("text_quality_score", "quality gates: stopword/TTR/length-band",
          text_quality_score, QUALITY_ORACLE),
    Query("text_lang_id", "stopword-density language-ID heuristic", text_lang_id,
          LANG_ID_ORACLE),
    Query("text_fingerprint", "normalized md5 document fingerprint", text_fingerprint,
          FINGERPRINT_ORACLE),
]
