"""Property-based tests for the document-hygiene operators.

Chunk tiling is verified against first-principles invariants for
arbitrary token counts; PII redaction is verified idempotent and
leak-free for arbitrary compositions of clean words and planted PII.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.operators.scrub import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    pii_counts,
    redact_pii,
)

# --- generators ----------------------------------------------------------------

word_st = st.from_regex(r"[a-z]{1,8}", fullmatch=True)
PII_SAMPLES = (
    "a.user+tag@mail.example.net",
    "192.168.254.3",
    "4111111111111111",
    "555-123-9876",
    "999888777666555",
    "10.0.0.1",
)
pii_st = st.sampled_from(PII_SAMPLES)
token_st = st.one_of(word_st, pii_st)


def _chunk_model(n_tok: int) -> list[tuple[int, int]]:
    """Reference model of the chunk plan: [(start, end), ...]."""
    w, s = CHUNK_TOKENS, CHUNK_STRIDE
    if n_tok <= w:
        return [(0, n_tok)]
    n_chunks = 1 + -(-(n_tok - w) // s)  # ceil
    return [(k * s, min(k * s + w, n_tok)) for k in range(n_chunks)]


@given(n_tok=st.integers(min_value=1, max_value=5000))
def test_chunk_model_invariants(n_tok):
    chunks = _chunk_model(n_tok)
    w, s = CHUNK_TOKENS, CHUNK_STRIDE
    assert chunks[0][0] == 0 and chunks[-1][1] == n_tok
    for start, end in chunks:
        assert 0 < end - start <= w
    for (s0, e0), (s1, _) in zip(chunks, chunks[1:]):
        assert s1 == s0 + s  # strided starts
        assert s1 < e0  # overlap (w > s)
        assert e0 - s0 == w  # every non-final chunk is full width
    # token coverage with no holes: union of [start, end) == [0, n_tok)
    covered = set()
    for start, end in chunks:
        covered.update(range(start, end))
    assert covered == set(range(n_tok))


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(docs=st.lists(st.lists(token_st, min_size=1, max_size=30), min_size=1, max_size=8))
def test_redaction_idempotent_and_leak_free(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = redact_pii(F.col("text"))
    out = df.select(
        "doc_id",
        once.alias("red1"),
        redact_pii(once).alias("red2"),
        (sum(pii_counts(once).values())).alias("left"),
        (sum(pii_counts(F.col("text")).values())).alias("found"),
    ).collect()
    n_planted = sum(1 for toks in docs for t in toks if t in PII_SAMPLES)
    for r in out:
        # redaction is idempotent and self-certifying
        assert r["red1"] == r["red2"]
        assert r["left"] == 0
    # every planted PII token is detected (plain words never trip it)
    assert sum(r["found"] for r in out) == n_planted
