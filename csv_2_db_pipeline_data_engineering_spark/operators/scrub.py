"""Document-hygiene operators: PII scrubbing, repetition stats, chunking.

Three pre-training curation stages the ``text``/``dedup`` families don't
cover, each a pure column-expression plan over ``documents``:

- :func:`text_pii_scrub` — detect + redact emails / IPv4s / card-like
  digit runs / phone-like numbers (the standard scrub pass a corpus gets
  before training). Patterns are chosen to behave identically under
  Java regex (Spark) and RE2 (DuckDB) so the redacted text is
  bit-identical cross-engine and the oracle can hash it.
- :func:`text_repetition_stats` — Gopher-style repetition signals
  (Rae et al. 2021, "Scaling Language Models", Table A1): the fraction
  of n-grams claimed by the most frequent one, and the fraction inside
  duplicated n-grams — the published heuristics for boilerplate and
  looping text, expressed over token n-grams.
- :func:`doc_chunk_plan` — fixed-window / strided token chunking (the
  context-length packing prep step): emits one row per (doc, chunk)
  with token offsets and a content hash of the slice.

Scale shapes (100 TB):
- PII scrub is zero-shuffle: regexp count + replace chains run map-side
  inside whole-stage codegen; nothing but the final demo ORDER BY moves.
- Repetition stats shuffle (doc_id, gram) once per gram size with
  map-side partial counts — the same inverted shape as TF-IDF's tf
  aggregate; gram strings never exceed n tokens and could drop to
  xxhash64 keys at scale (kept as text here so the oracle can see them).
- Chunking is also zero-shuffle: chunk counts are integer arithmetic on
  token counts, the per-chunk rows come from an in-partition
  sequence+explode, and the slice hash is computed before anything
  would move. The text column itself never enters a shuffle.

The synthetic corpus is PII-free word soup, so the scrub query plants
deterministic PII derived from ``doc_id`` — identically in the Spark
plan and the oracle SQL — exercising detection, counting, and redaction
with non-trivial, value-checked results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import Query
from ..sources.tables import load_table, load_table_spread

# Patterns valid and equivalent in BOTH Java regex and RE2: no
# backreferences, no lookaround, ASCII classes and \b only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
DIGIT_RUN_RE = r"\b\d{13,19}\b"  # card-like long digit run
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

_REDACTIONS = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (DIGIT_RUN_RE, "<NUM>"),
    (PHONE_RE, "<PHONE>"),
)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind PII match counts for a text column (map-side)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), 0)),
        "n_ipv4": F.size(F.regexp_extract_all(col, F.lit(IPV4_RE), 0)),
        "n_digit_runs": F.size(F.regexp_extract_all(col, F.lit(DIGIT_RUN_RE), 0)),
        "n_phones": F.size(F.regexp_extract_all(col, F.lit(PHONE_RE), 0)),
    }


def redact_pii(col: Column) -> Column:
    """Replace every PII match with a typed placeholder (fixed order)."""
    out = col
    for pat, token in _REDACTIONS:
        out = F.regexp_replace(out, pat, token)
    return out


def _planted_text() -> Column:
    """``text`` with deterministic doc_id-derived PII appended.

    Presence varies by doc_id modulus so counts are non-uniform; the
    oracle builds the identical string, so detection, counting, and the
    redacted-text hash are all value-checked.
    """
    did = F.col("doc_id")
    email = F.when(
        did % 3 == 0,
        F.concat(F.lit(" contact doc"), did.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 4 == 0,
        F.concat(
            F.lit(" host 10."),
            (did % 256).cast("string"),
            F.lit(".0."),
            (did % 100).cast("string"),
        ),
    ).otherwise(F.lit(""))
    card = F.when(did % 5 == 0, F.lit(" card 4111111111111111")).otherwise(F.lit(""))
    phone = F.when(did % 7 == 0, F.lit(" call 555-867-5309")).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, ip, card, phone)


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect, count, and redact PII; certify nothing survives.

    ``pii_free`` re-runs every detector on the redacted text — the
    in-query proof that the scrub caught everything it can detect.
    """
    d = load_table(spark, sf_dir, "documents")
    planted = _planted_text()
    counts = pii_counts(planted)
    red = redact_pii(planted)
    left = pii_counts(red)
    return d.select(
        "doc_id",
        *[c.alias(name) for name, c in counts.items()],
        F.md5(red).alias("redacted_md5"),
        F.length(red).alias("redacted_len"),
        (sum(left.values()) == 0).alias("pii_free"),
    ).orderBy("doc_id")


def _planted_sql() -> str:
    return (
        "text"
        " || CASE WHEN doc_id % 3 = 0 THEN ' contact doc' || doc_id || '@example.com' ELSE '' END"
        " || CASE WHEN doc_id % 4 = 0 THEN ' host 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' card 4111111111111111' ELSE '' END"
        " || CASE WHEN doc_id % 7 = 0 THEN ' call 555-867-5309' ELSE '' END"
    )


def _redact_sql(expr: str) -> str:
    for pat, token in _REDACTIONS:
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    return expr


PII_SCRUB_ORACLE = f"""
WITH planted AS (
  SELECT doc_id, {_planted_sql()} AS p FROM documents
),
red AS (
  SELECT doc_id, p, {_redact_sql("p")} AS r FROM planted
)
SELECT doc_id,
       len(regexp_extract_all(p, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(p, '{IPV4_RE}')) AS n_ipv4,
       len(regexp_extract_all(p, '{DIGIT_RUN_RE}')) AS n_digit_runs,
       len(regexp_extract_all(p, '{PHONE_RE}')) AS n_phones,
       md5(r) AS redacted_md5,
       LENGTH(r) AS redacted_len,
       len(regexp_extract_all(r, '{EMAIL_RE}'))
         + len(regexp_extract_all(r, '{IPV4_RE}'))
         + len(regexp_extract_all(r, '{DIGIT_RUN_RE}'))
         + len(regexp_extract_all(r, '{PHONE_RE}')) = 0 AS pii_free
FROM red ORDER BY doc_id
"""


# --- Gopher-style repetition signals ---------------------------------

REP_MIN_TOKENS = 5  # need at least one 5-gram


def _gram_rows(d: DataFrame, n: int, out: str) -> DataFrame:
    """Explode token n-grams: one row per (doc_id, gram occurrence)."""
    grams = F.expr(
        f"transform(sequence(0, size(split(text, ' ')) - {n}),"
        f" i -> concat_ws(' ', slice(split(text, ' '), i + 1, {n})))"
    )
    return d.select("doc_id", F.explode(grams).alias(out))


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition fractions over token n-grams.

    - ``top_bigram_frac``: share of all bigram occurrences claimed by
      the most frequent bigram (Gopher's top-2-gram signal).
    - ``dup_5gram_frac``: share of 5-gram occurrences inside 5-grams
      that appear more than once (Gopher's dup-n-gram signal) — the
      looping-text detector.

    Docs shorter than 5 tokens are excluded (no 5-gram exists).

    Plan shape: each gram size is a zip-of-shifted-slices branch (the
    ``sketch._gram_stream`` idiom, r16 — ``arrays_zip``/``slice``/
    ``concat_ws`` are codegen builtins, so this is NOT the interpreted
    ``transform(sequence, slice)`` lambda that measured ~3x slower in
    round 5): grams derive in-row with ZERO pre-shuffle, where the
    posexplode + window-lead shape this replaces shuffled and sorted
    the token stream by doc_id per branch. Every aggregate above is
    keyed by doc_id with map-side partial combine. The branches stay
    separate: a forced single-scan variant (all leads in one shared
    window frame) was measured SLOWER in r13, and with the window gone
    each branch is a cheap scan-fused explode anyway.
    """
    d = load_table_spread(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= REP_MIN_TOKENS
    )
    w = F.split("text", " ")

    def gram_branch(n_gram: int) -> DataFrame:
        m = F.size(w) - F.lit(n_gram - 1)
        z = F.arrays_zip(*[F.slice(w, i + 1, m) for i in range(n_gram)])
        return (
            d.select("doc_id", F.explode(z).alias("z"))
            .select(
                "doc_id",
                F.concat_ws(
                    " ", *[F.col(f"z.{i}") for i in range(n_gram)]
                ).alias("g"),
            )
            .groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def frac_agg(per_gram: DataFrame, top: bool, alias: str) -> DataFrame:
        num = (
            F.max("n")
            if top
            else F.sum(F.when(F.col("n") >= 2, F.col("n")).otherwise(F.lit(0)))
        )
        return per_gram.groupBy("doc_id").agg(
            F.round(num / F.sum("n"), 6).alias(alias)
        )

    bi = frac_agg(gram_branch(2), top=True, alias="top_bigram_frac")
    five = frac_agg(gram_branch(5), top=False, alias="dup_5gram_frac")
    return bi.join(five, "doc_id").orderBy("doc_id")


REPETITION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= {REP_MIN_TOKENS}
),
bi AS (
  SELECT doc_id, ROUND(MAX(n)::DOUBLE / SUM(n), 6) AS top_bigram_frac
  FROM (
    SELECT doc_id, bg, COUNT(*) AS n
    FROM (
      SELECT doc_id,
             UNNEST(list_transform(range(len(t) - 1),
                    i -> array_to_string(list_slice(t, i + 1, i + 2), ' '))) AS bg
      FROM toks
    ) GROUP BY doc_id, bg
  ) GROUP BY doc_id
),
five AS (
  SELECT doc_id,
         ROUND(SUM(CASE WHEN n >= 2 THEN n ELSE 0 END)::DOUBLE / SUM(n), 6)
           AS dup_5gram_frac
  FROM (
    SELECT doc_id, fg, COUNT(*) AS n
    FROM (
      SELECT doc_id,
             UNNEST(list_transform(range(len(t) - 4),
                    i -> array_to_string(list_slice(t, i + 1, i + 4 + 1), ' '))) AS fg
      FROM toks
    ) GROUP BY doc_id, fg
  ) GROUP BY doc_id
)
SELECT doc_id, top_bigram_frac, dup_5gram_frac
FROM bi JOIN five USING (doc_id) ORDER BY doc_id
"""


# --- Token-window chunking -------------------------------------------

CHUNK_TOKENS = 32  # context window per chunk, in tokens
CHUNK_STRIDE = 24  # overlap = CHUNK_TOKENS - CHUNK_STRIDE


def doc_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided fixed-window chunking: one row per (doc, chunk).

    ``n_chunks = 1`` when the doc fits one window, else
    ``1 + ceil((n_tok - W) / S)`` — the last chunk always reaches the
    final token, interior chunks overlap by ``W - S``. ``chunk_md5``
    hashes the actual token slice, so the oracle verifies the slicing,
    not just the arithmetic.
    """
    w, s = CHUNK_TOKENS, CHUNK_STRIDE
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    n_chunks = F.when(n <= w, F.lit(1)).otherwise(
        F.lit(1) + ((n - w + s - 1) / s).cast("int")
    )
    base = d.select("doc_id", toks.alias("t"), n.alias("n_tok"), n_chunks.alias("nc"))
    k = F.col("chunk_idx")
    start = (k * s).cast("int")
    end = F.least(start + w, F.col("n_tok"))
    return (
        base.select(
            "doc_id",
            "t",
            "n_tok",
            F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            start.alias("tok_start"),
            end.alias("tok_end"),
            (end - start).alias("n_tok_chunk"),
            F.md5(F.concat_ws(" ", F.slice(F.col("t"), start + 1, end - start))).alias(
                "chunk_md5"
            ),
        )
        .orderBy("doc_id", "chunk_idx")
    )


CHUNK_PLAN_ORACLE = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
),
nc AS (
  SELECT doc_id, t, n_tok,
         CASE WHEN n_tok <= {CHUNK_TOKENS} THEN 1
              ELSE 1 + (n_tok - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}
         END AS n_chunks
  FROM base
),
chunks AS (
  SELECT doc_id, t, n_tok, UNNEST(generate_series(0, n_chunks - 1)) AS chunk_idx
  FROM nc
)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(chunk_idx * {CHUNK_STRIDE} AS INT) AS tok_start,
       CAST(LEAST(chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n_tok) AS INT) AS tok_end,
       CAST(LEAST(chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n_tok)
            - chunk_idx * {CHUNK_STRIDE} AS INT) AS n_tok_chunk,
       md5(array_to_string(list_slice(t, chunk_idx * {CHUNK_STRIDE} + 1,
           LEAST(chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n_tok)), ' ')) AS chunk_md5
FROM chunks ORDER BY doc_id, chunk_idx
"""


# --- character-level entropy (perplexity proxy) ----------------------

LOW_ENTROPY_BITS = 2.0  # below this, text is repeated-char / binary junk


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the character unigram distribution per doc.

    The cheap perplexity proxy quality gates use before any model sees
    the data: repeated-char garbage and binary junk sit near 0 bits,
    natural language ~4 bits/char.

    Shape: explode chars -> codegen'd hash aggregate on (doc_id, char)
    -> per-doc fold via the identity H = log2(n) - (Σ k·log2 k)/n.
    One shuffle, keyed by doc_id prefix, map-side combined (the char
    stream collapses to ≤ |alphabet| rows per doc per task before it
    moves). Measured ~15x faster than the zero-shuffle higher-order-
    function formulation (per-distinct array filters are interpreted,
    O(distinct x n_chars) per row; a struct-accumulator run-length fold
    was slower still) — the shuffle is cheaper than the lambda tax.
    The k·log2 k sum runs over ≤ ~100 well-separated doubles, so
    engine-order variation sits ~1e-13 — far inside the round-6
    contract (verified value-identical to the sorted-order version on
    the full corpus).
    """
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 1)
    per_char = (
        d.select("doc_id", F.explode(F.split("text", "")).alias("c"))
        .groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    ent = (-F.col("s_klogk") / F.col("n")) + F.log2("n")
    return (
        per_char.groupBy("doc_id")
        .agg(
            F.sum("k").alias("n"),
            F.count(F.lit(1)).alias("nd"),
            F.sum(F.col("k") * F.log2("k")).alias("s_klogk"),
        )
        .select(
            "doc_id",
            F.col("n").cast("int").alias("n_chars"),
            F.col("nd").cast("int").alias("n_distinct_chars"),
            F.round(ent, 6).alias("char_entropy_bits"),
            (ent < LOW_ENTROPY_BITS).alias("is_low_entropy"),
        )
        .orderBy("doc_id")
    )


CHAR_ENTROPY_ORACLE = f"""
WITH pc AS (
  SELECT doc_id, c, COUNT(*) AS k
  FROM (
    SELECT doc_id, UNNEST(string_split(text, '')) AS c
    FROM documents WHERE LENGTH(text) >= 1
  ) GROUP BY doc_id, c
),
e AS (
  SELECT doc_id, SUM(k) AS n, COUNT(*) AS nd,
         SUM(k * log2(k::DOUBLE)) AS s_klogk
  FROM pc GROUP BY doc_id
)
SELECT doc_id, CAST(n AS INT) AS n_chars, CAST(nd AS INT) AS n_distinct_chars,
       ROUND((-s_klogk / n) + log2(n::DOUBLE), 6) AS char_entropy_bits,
       (-s_klogk / n) + log2(n::DOUBLE) < {LOW_ENTROPY_BITS} AS is_low_entropy
FROM e ORDER BY doc_id
"""


# --- mojibake repair (ftfy-style encoding fix) -----------------------------

# UTF-8 bytes decoded as latin-1/cp1252 leave characteristic two- and
# three-byte ghosts ('Ã©' for 'é', 'â€™' for a right single quote).
# The repair is a fixed mapping applied as literal replacements — the
# deterministic core of what ftfy does, expressible as a zero-shuffle
# column chain. Pairs are chosen with distinct prefixes so application
# order cannot cascade.
MOJIBAKE_FIXES = (
    ("Ã©", "é"),  # Ã© -> é
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã¯", "ï"),  # Ã¯ -> ï
    ("â", "’"),  # â€™ -> ’
    ("â", "“"),  # â€œ -> “
    ("â", "–"),  # â€“ -> –
)


def fix_mojibake(col: Column) -> Column:
    """Apply the fixed mojibake mapping as chained literal replaces."""
    for bad, good in MOJIBAKE_FIXES:
        col = F.replace(col, F.lit(bad), F.lit(good))
    return col


def count_mojibake(col: Column) -> Column:
    """Total occurrences of any known mojibake sequence."""
    out = F.lit(0)
    for bad, _ in MOJIBAKE_FIXES:
        out = out + (
            (F.length(col) - F.length(F.replace(col, F.lit(bad), F.lit(""))))
            / F.length(F.lit(bad))
        ).cast("long")
    return out


def _planted_mojibake() -> Column:
    """``text`` with deterministic doc_id-derived mojibake appended."""
    did = F.col("doc_id")
    a = F.when(
        did % 3 == 0, F.lit(" visit the cafÃ© and cafÃ© bar")
    ).otherwise(F.lit(""))
    b = F.when(did % 4 == 1, F.lit(" a naÃ¯ve plan")).otherwise(F.lit(""))
    c = F.when(
        did % 5 == 3, F.lit(" donât panic â yet")
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), a, b, c)


def text_encoding_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect and repair mojibake; certify nothing detectable survives.

    The ftfy pass every crawl corpus needs before tokenization, as a
    pure zero-shuffle column plan. ``mojibake_free`` re-counts every
    sequence on the repaired text — the in-query proof the fix chain
    caught what the detector sees.
    """
    d = load_table(spark, sf_dir, "documents")
    planted = _planted_mojibake()
    fixed = fix_mojibake(planted)
    return d.select(
        "doc_id",
        count_mojibake(planted).alias("n_mojibake"),
        F.md5(fixed).alias("fixed_md5"),
        F.length(fixed).alias("fixed_len"),
        (count_mojibake(fixed) == 0).alias("mojibake_free"),
    ).orderBy("doc_id")


def _mojibake_planted_sql() -> str:
    return (
        "text"
        " || CASE WHEN doc_id % 3 = 0 THEN ' visit the cafÃ© and cafÃ© bar' ELSE '' END"
        " || CASE WHEN doc_id % 4 = 1 THEN ' a naÃ¯ve plan' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 3 THEN ' donât panic â yet' ELSE '' END"
    )


def _mojibake_fix_sql(expr: str) -> str:
    for bad, good in MOJIBAKE_FIXES:
        expr = f"replace({expr}, '{bad}', '{good}')"
    return expr


def _mojibake_count_sql(expr: str) -> str:
    terms = [
        f"CAST((length({expr}) - length(replace({expr}, '{bad}', '')))"
        f" / {len(bad)} AS BIGINT)"
        for bad, _ in MOJIBAKE_FIXES
    ]
    return "(" + " + ".join(terms) + ")"


ENCODING_FIX_ORACLE = f"""
WITH planted AS (
  SELECT doc_id, {_mojibake_planted_sql()} AS p FROM documents
),
fixed AS (
  SELECT doc_id, p, {_mojibake_fix_sql("p")} AS f FROM planted
)
SELECT doc_id,
       {_mojibake_count_sql("p")} AS n_mojibake,
       md5(f) AS fixed_md5,
       LENGTH(f) AS fixed_len,
       {_mojibake_count_sql("f")} = 0 AS mojibake_free
FROM fixed ORDER BY doc_id
"""


QUERIES = [
    Query("text_pii_scrub",
          "PII detect/count/redact (email, IPv4, digit runs, phones) with "
          "an in-query nothing-survives certificate",
          text_pii_scrub, PII_SCRUB_ORACLE),
    Query("text_repetition_stats",
          "Gopher-style repetition: top-bigram and duplicate-5-gram "
          "fractions per document (docs >= 5 tokens)",
          text_repetition_stats, REPETITION_ORACLE),
    Query("doc_chunk_plan",
          "strided token-window chunk plan with slice-content hashes",
          doc_chunk_plan, CHUNK_PLAN_ORACLE),
    Query("text_char_entropy",
          "char-unigram Shannon entropy (perplexity-proxy quality gate)",
          text_char_entropy, CHAR_ENTROPY_ORACLE),
    Query("text_encoding_fix",
          "mojibake detect/repair (ftfy-style latin-1 ghost mapping) with "
          "an in-query nothing-survives certificate",
          text_encoding_fix, ENCODING_FIX_ORACLE),
]
