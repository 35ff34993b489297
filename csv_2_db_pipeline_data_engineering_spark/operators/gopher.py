"""Gopher-rules document quality gate (Rae et al. 2021, Appendix A).

The published MassiveWeb filtering heuristics as ONE map-only column
projection over ``documents`` — the standard pre-training keep/drop
gate a corpus passes before the dedup/curation stages. The family
neighbors cover fragments of this surface (stopword ratio in
``text.text_quality_score``, n-gram repetition in
``scrub.text_repetition_stats``, the frozen logit in
``boilerplate.text_quality_logit``); this operator is the complete
document-level rule set, each rule an output column so the oracle
value-checks every decision, not just the final verdict:

1.  word count in [50, 100_000]
2.  mean word length in [3, 10]
3.  symbol-to-word ratio ('#' and '...') <= 0.1
4.  lines starting with a bullet <= 90%
5.  lines ending with an ellipsis <= 30%
6.  words with >= 1 alphabetic char >= 80%
7.  >= 2 distinct required stopwords (the/be/to/of/and/that/have/with)
8.  duplicate-line fraction <= 30%
9.  duplicate-line character fraction <= 20%

Every threshold comparison is INTEGER arithmetic (``3*n <= sum_len``,
not ``sum_len/n >= 3.0``), so the booleans are exact and cannot drift
between Spark and DuckDB float rounding at the boundary.

Scale shape (100 TB): zero shuffles. Lines, words, and per-rule counts
are higher-order array expressions (``filter``/``aggregate``/
``array_distinct``) evaluated per row inside whole-stage codegen — no
explode, no groupBy, nothing moves but the demo ORDER BY. The
duplicate-line fractions come from the array identity
``dup = total - distinct`` (count and character-sum both), avoiding the
per-line shuffle the corpus-level line dedup family pays.

The synthetic corpus is single-line token soup (no symbols, bullets,
newlines, or English stopwords), so the gate plants one mutation per
``doc_id % 13`` residue — truncation, symbol spam, bulleting,
ellipsis spam, numeric-token dilution, stopword injection, and a
repeated-line chorus — identically in the Spark plan and the oracle
SQL. Each rule therefore fails (and rule 7 passes) on a known witness
subset with value-checked results at any SF.

Reference parity: the reference has no document-quality surface (its
quality gate is the five row rules, ref ``src/validator.py``); this is
part of the driver-mandated LLM-pipeline extension set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import Query
from ..sources.tables import load_table

# Gopher's required-stopword list (Appendix A1: "contains at least two
# of the following English words").
REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_HASH_SPAM = " # # # # # # # # # # # #"  # 12 symbol tokens
_NUM_SPAM = " " + " ".join(str(i) for i in range(30))  # 30 non-alpha tokens
_STOP_SPAM = " the of and that have with"

# (rule column, integer predicate) in Gopher's published order; the
# order fixes `first_fail`.
RULE_ORDER = (
    "r_word_count",
    "r_mean_word_len",
    "r_symbol_ratio",
    "r_bullet_lines",
    "r_ellipsis_lines",
    "r_alpha_words",
    "r_stopwords",
    "r_dup_lines",
    "r_dup_line_chars",
)


def _planted() -> Column:
    """``doc_id``-residue mutations (oracle builds identical strings)."""
    m = F.col("doc_id") % 13
    text = F.col("text")
    line40 = F.substring("text", 1, 40)
    return (
        F.when(m == 1, F.concat_ws(" ", F.slice(F.split("text", " "), 1, 5)))
        .when(m == 2, F.concat(text, F.lit(_HASH_SPAM)))
        .when(m == 3, F.concat(F.lit("- "), F.regexp_replace("text", " ", "\n- ")))
        .when(m == 4, F.concat(F.regexp_replace("text", " ", "...\n"), F.lit("...")))
        .when(m == 5, F.concat(text, F.lit(_NUM_SPAM)))
        .when(m == 6, F.concat(text, F.lit(_STOP_SPAM)))
        .when(m == 7, F.concat_ws("\n", line40, line40, line40, line40))
        .otherwise(text)
    )


_PLANTED_SQL = f"""CASE doc_id % 13
  WHEN 1 THEN array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')
  WHEN 2 THEN text || '{_HASH_SPAM}'
  WHEN 3 THEN '- ' || replace(text, ' ', chr(10) || '- ')
  WHEN 4 THEN replace(text, ' ', '...' || chr(10)) || '...'
  WHEN 5 THEN text || '{_NUM_SPAM}'
  WHEN 6 THEN text || '{_STOP_SPAM}'
  WHEN 7 THEN substring(text, 1, 40) || chr(10) || substring(text, 1, 40)
           || chr(10) || substring(text, 1, 40) || chr(10) || substring(text, 1, 40)
  ELSE text END"""


def _sumlen(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0), lambda acc, x: acc + F.length(x))


def gopher_rule_frame(docs: DataFrame, planted: Column | None = None) -> DataFrame:
    """Per-doc Gopher rule booleans + verdict for any ``doc_id, text`` frame."""
    p = planted if planted is not None else F.col("text")
    staged = docs.select(
        "doc_id",
        F.split(p, "\n").alias("lines"),
        F.split(F.translate(p, "\n", " "), " ").alias("words"),
        (F.length(p) - F.length(F.translate(p, "#", ""))).alias("n_hash"),
        (
            (F.length(p) - F.length(F.replace(p, F.lit("..."), F.lit("")))) / 3
        ).cast("int").alias("n_ellipsis"),
    ).select(
        "doc_id",
        "n_hash",
        "n_ellipsis",
        F.size("words").alias("n_words"),
        F.size("lines").alias("n_lines"),
        _sumlen(F.col("words")).alias("word_chars"),
        F.size(
            F.filter(F.col("words"), lambda w: w.rlike("[a-zA-Z]"))
        ).alias("n_alpha_words"),
        F.size(
            F.filter(
                F.array(*[F.lit(s) for s in REQUIRED_STOPWORDS]),
                lambda s: F.array_contains(F.col("words"), s),
            )
        ).alias("n_req_stopwords"),
        F.size(
            F.filter(F.col("lines"), lambda l: l.startswith("- "))
        ).alias("n_bullet_lines"),
        F.size(
            F.filter(F.col("lines"), lambda l: l.endswith("..."))
        ).alias("n_ellipsis_lines"),
        F.size(F.array_distinct("lines")).alias("n_distinct_lines"),
        _sumlen(F.col("lines")).alias("line_chars"),
        _sumlen(F.array_distinct("lines")).alias("distinct_line_chars"),
    )
    n_words, n_lines = F.col("n_words"), F.col("n_lines")
    rules = {
        "r_word_count": (n_words >= 50) & (n_words <= 100_000),
        "r_mean_word_len": (F.col("word_chars") >= 3 * n_words)
        & (F.col("word_chars") <= 10 * n_words),
        "r_symbol_ratio": (F.col("n_hash") + F.col("n_ellipsis")) * 10 <= n_words,
        "r_bullet_lines": F.col("n_bullet_lines") * 10 <= 9 * n_lines,
        "r_ellipsis_lines": F.col("n_ellipsis_lines") * 10 <= 3 * n_lines,
        "r_alpha_words": F.col("n_alpha_words") * 5 >= 4 * n_words,
        "r_stopwords": F.col("n_req_stopwords") >= 2,
        "r_dup_lines": (n_lines - F.col("n_distinct_lines")) * 10 <= 3 * n_lines,
        "r_dup_line_chars": (F.col("line_chars") - F.col("distinct_line_chars")) * 5
        <= F.col("line_chars"),
    }
    flagged = staged.select(
        "doc_id",
        "n_words",
        "n_lines",
        *[rules[r].alias(r) for r in RULE_ORDER],
    )
    first_fail = F.lit("none")
    for r in reversed(RULE_ORDER):
        first_fail = F.when(~F.col(r), F.lit(r)).otherwise(first_fail)
    n_failed = sum(
        (~F.col(r)).cast("int") for r in RULE_ORDER
    )
    keep = F.lit(True)
    for r in RULE_ORDER:
        keep = keep & F.col(r)
    return flagged.select(
        "*",
        n_failed.alias("n_failed"),
        first_fail.alias("first_fail"),
        keep.alias("keep"),
    )


#: The vocabulary-independent subset of the rule set — what a pipeline
#: can apply to ANY corpus (including the synthetic soup, which has no
#: English stopwords and a 10-99-word length distribution, so the
#: word-count floor and required-stopword rules are corpus-dependent
#: knobs rather than universal structure checks).
STRUCTURAL_RULES = (
    "r_mean_word_len",
    "r_symbol_ratio",
    "r_bullet_lines",
    "r_ellipsis_lines",
    "r_alpha_words",
    "r_dup_lines",
    "r_dup_line_chars",
)


def structural_fail(text: Column) -> Column:
    """True iff ``text`` fails any STRUCTURAL Gopher rule.

    Self-contained column expression (no staged frame) so pipeline
    gate cascades can splice it in map-side; the integer-exact
    comparisons match :func:`gopher_rule_frame` rule for rule.
    """
    lines = F.split(text, "\n")
    words = F.split(F.translate(text, "\n", " "), " ")
    n_words = F.size(words)
    n_lines = F.size(lines)
    word_chars = _sumlen(words)
    n_hash = F.length(text) - F.length(F.translate(text, "#", ""))
    n_ellipsis = (
        (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))) / 3
    ).cast("int")
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    n_bullet = F.size(F.filter(lines, lambda l: l.startswith("- ")))
    n_ell_lines = F.size(F.filter(lines, lambda l: l.endswith("...")))
    line_chars = _sumlen(lines)
    distinct_chars = _sumlen(F.array_distinct(lines))
    n_distinct = F.size(F.array_distinct(lines))
    ok = (
        (word_chars >= 3 * n_words)
        & (word_chars <= 10 * n_words)
        & ((n_hash + n_ellipsis) * 10 <= n_words)
        & (n_bullet * 10 <= 9 * n_lines)
        & (n_ell_lines * 10 <= 3 * n_lines)
        & (n_alpha * 5 >= 4 * n_words)
        & ((n_lines - n_distinct) * 10 <= 3 * n_lines)
        & ((line_chars - distinct_chars) * 5 <= line_chars)
    )
    return ~ok


def text_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Gopher quality gate over ``documents`` with planted witnesses."""
    d = load_table(spark, sf_dir, "documents")
    return gopher_rule_frame(d, _planted()).orderBy("doc_id")


_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in REQUIRED_STOPWORDS) + "]"

_RULE_SQL = {
    "r_word_count": "n_words >= 50 AND n_words <= 100000",
    "r_mean_word_len": "word_chars >= 3 * n_words AND word_chars <= 10 * n_words",
    "r_symbol_ratio": "(n_hash + n_ellipsis) * 10 <= n_words",
    "r_bullet_lines": "n_bullet_lines * 10 <= 9 * n_lines",
    "r_ellipsis_lines": "n_ellipsis_lines * 10 <= 3 * n_lines",
    "r_alpha_words": "n_alpha_words * 5 >= 4 * n_words",
    "r_stopwords": "n_req_stopwords >= 2",
    "r_dup_lines": "(n_lines - n_distinct_lines) * 10 <= 3 * n_lines",
    "r_dup_line_chars": "(line_chars - distinct_line_chars) * 5 <= line_chars",
}

_FIRST_FAIL_SQL = (
    "CASE "
    + " ".join(f"WHEN NOT {r} THEN '{r}'" for r in RULE_ORDER)
    + " ELSE 'none' END"
)

GOPHER_GATE_ORACLE = f"""
WITH planted AS (
  SELECT doc_id, {_PLANTED_SQL} AS p FROM documents
),
staged AS (
  SELECT doc_id,
         string_split(p, chr(10)) AS lines,
         string_split(replace(p, chr(10), ' '), ' ') AS words,
         len(p) - len(replace(p, '#', '')) AS n_hash,
         ((len(p) - len(replace(p, '...', ''))) / 3)::INT AS n_ellipsis
  FROM planted
),
counts AS (
  SELECT doc_id, n_hash, n_ellipsis,
         len(words) AS n_words,
         len(lines) AS n_lines,
         list_sum(list_transform(words, w -> len(w)))::BIGINT AS word_chars,
         len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]'))) AS n_alpha_words,
         len(list_filter({_STOP_SQL}, s -> list_contains(words, s))) AS n_req_stopwords,
         len(list_filter(lines, l -> starts_with(l, '- '))) AS n_bullet_lines,
         len(list_filter(lines, l -> ends_with(l, '...'))) AS n_ellipsis_lines,
         len(list_distinct(lines)) AS n_distinct_lines,
         list_sum(list_transform(lines, l -> len(l)))::BIGINT AS line_chars,
         list_sum(list_transform(list_distinct(lines), l -> len(l)))::BIGINT
           AS distinct_line_chars
  FROM staged
),
flagged AS (
  SELECT doc_id, n_words, n_lines,
         {", ".join(f"({_RULE_SQL[r]}) AS {r}" for r in RULE_ORDER)}
  FROM counts
)
SELECT doc_id, n_words, n_lines,
       {", ".join(RULE_ORDER)},
       {" + ".join(f"(CASE WHEN {r} THEN 0 ELSE 1 END)" for r in RULE_ORDER)}
         AS n_failed,
       {_FIRST_FAIL_SQL} AS first_fail,
       {" AND ".join(RULE_ORDER)} AS keep
FROM flagged
ORDER BY doc_id
"""


QUERIES = [
    Query(
        "text_gopher_gate",
        "complete Gopher/MassiveWeb document-quality rule set (9 rules, "
        "integer-exact thresholds, per-rule verdict columns) with planted "
        "witnesses per failure mode",
        text_gopher_gate,
        GOPHER_GATE_ORACLE,
    ),
]
