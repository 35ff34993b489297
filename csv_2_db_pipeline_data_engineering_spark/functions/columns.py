"""Reusable column-expression library (the engine's scalar-function layer).

The reference keeps its scalar logic as ad-hoc pandas snippets inside
stage modules (``src/transform.py:25-57``, ``src/validate.py:60-112``);
here the generic, engine-wide expression builders live in one place so
every plan composes the same vetted building blocks. Everything is a
pure ``Column`` expression — JVM-evaluated, whole-stage-codegen-able,
usable identically in batch and Structured Streaming plans.

Higher-order-function caveat at scale: ``F.aggregate``/``F.zip_with``
lambdas are evaluated per element *outside* codegen. They're the right
tool for array math over short arrays (embedding dims ~10²); for hot
scalar paths prefer the flat expressions in this module.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Canonical multi-format date parse lives with the transform surface;
# re-exported here so plans have one import point for scalar builders.
from ..operators.transform import parse_date_expr  # noqa: F401

__all__ = [
    "parse_date_expr",
    "null_or_blank",
    "money",
    "stable_id",
    "hash_bucket",
    "md5_sample",
    "word_ngrams",
    "jaccard_arrays",
    "dot_product",
    "cosine_sim",
]


def null_or_blank(col: Column | str) -> Column:
    """True where a string cell is NULL or whitespace-only (the
    reference's missingness predicate, ``src/validate.py:64-70``)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | (F.trim(c) == "")


def money(col: Column | str, scale: int = 2) -> Column:
    """Exact monetary rounding: decimal half-up, never float."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("decimal(18,6)"), scale).cast(f"decimal(18,{scale})")


def stable_id(*cols: Column | str) -> Column:
    """Deterministic 64-bit row id from any column combination.

    Shuffle-friendly surrogate key: computed map-side, no sequence/
    monotonically_increasing_id coordination, reproducible across runs.
    """
    return F.xxhash64(*cols)


def hash_bucket(col: Column | str, n_buckets: int) -> Column:
    """Stable bucket in [0, n_buckets) — salting, stratified splits,
    co-partitioning. ``pmod`` keeps negatives out of the range."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(n_buckets))


def md5_sample(col: Column | str, prefix: str = "0") -> Column:
    """Reproducible ~(16^-len(prefix)) sampling predicate.

    Unlike ``rand()``/TABLESAMPLE, the same rows are selected on every
    run and every engine (md5 of the value's decimal string), so sampled
    pipelines stay oracle-checkable end-to-end.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(c.cast("string")), 1, len(prefix)) == prefix


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Array of word n-grams (space-joined) from a space-tokenized text.

    Expression-only sliding window: sequence of start offsets ->
    transform -> concat_ws. For hot dedup paths prefer the hashed-gram
    pipeline in ``operators/dedup.py`` (stays in codegen); this builder
    is for readability-first plans and small-table feature prep.
    """
    w = F.split(F.col(col) if isinstance(col, str) else col, " ")
    return F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + k + 1) for k in range(n)]),
    )


def jaccard_arrays(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array columns (set semantics)."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(F.array_distinct(a)) + F.size(F.array_distinct(b)) - inter)


def dot_product(a: Column, b: Column) -> Column:
    """Dense dot product of two equal-length float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two dense float arrays (0 for zero vectors)."""
    na = F.sqrt(dot_product(a, a))
    nb = F.sqrt(dot_product(b, b))
    return F.when((na > 0) & (nb > 0), dot_product(a, b) / (na * nb)).otherwise(
        F.lit(0.0)
    )
