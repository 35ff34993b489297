"""Property-based differential tests (Hypothesis) for transform/validate.

Random dirty rows flow through the Spark transform + dead-letter split
and are compared against a pure-Python model of the pinned reference
semantics (SURVEY.md §2.8 F1-F7, §2.2 P1-P2). Invariants:

- clean + rejected == input (no silent drops, reference src/validate.py:53)
- per-row clean/rejected decision matches the model exactly
- normalization (trim/case/status-fill) matches the model on clean rows
"""

from __future__ import annotations

from datetime import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv_2_db_pipeline_data_engineering_spark.operators.transform import transform
from csv_2_db_pipeline_data_engineering_spark.operators.validate import validate_rows
from csv_2_db_pipeline_data_engineering_spark.schema import RAW_SCHEMA

# --- generators ----------------------------------------------------------------

_pad = st.sampled_from(["", " ", "  "])


def _padded(inner: st.SearchStrategy[str]) -> st.SearchStrategy[str]:
    return st.tuples(_pad, inner, _pad).map(lambda t: t[0] + t[1] + t[2])


tid_st = st.one_of(
    st.none(),
    st.just(""),
    st.just("   "),
    _padded(st.from_regex(r"[Tt][0-9]{1,4}", fullmatch=True)),
)
int_st = st.one_of(
    st.none(),
    st.just(""),
    st.just("abc"),
    st.integers(min_value=-5, max_value=5000).map(str),
)
price_st = st.one_of(
    st.none(),
    st.just("oops"),
    st.integers(min_value=-300, max_value=30000).map(lambda n: f"{n/100:.2f}"),
)
_date_values = st.dates(
    min_value=datetime(1990, 1, 1).date(), max_value=datetime(2030, 12, 28).date()
)
date_st = st.one_of(
    st.none(),
    st.just("not a date"),
    st.just("2024-02-31"),  # well-formed but invalid calendar date
    _date_values.map(lambda d: d.strftime("%Y-%m-%d")),
    _date_values.map(lambda d: d.strftime("%d/%m/%Y")),
    _date_values.map(lambda d: f"{d.strftime('%b')} {d.day} {d.year}"),
)
region_st = st.one_of(st.none(), _padded(st.sampled_from(["North", "SOUTH", "east"])))
status_st = st.one_of(
    st.none(),
    st.just(""),
    _padded(st.sampled_from(["Completed", "PENDING", "cancelled", "shipped", "unknown"])),
)
row_st = st.tuples(tid_st, int_st, st.just("Widget"), int_st, price_st, date_st, region_st, status_st)


# --- pure-Python model of the pinned semantics ---------------------------------

VALID = {"completed", "pending", "cancelled", "unknown"}


def _model_date(s: str | None):
    if s is None:
        return None
    s = s.strip()
    for fmt in ("%Y-%m-%d", "%d/%m/%Y", "%b %d %Y"):
        try:
            return datetime.strptime(s, fmt).date()
        except ValueError:
            continue
    return None


def _model_int(s: str | None):
    if s is None:
        return None
    try:
        return int(s.strip() or "x")
    except ValueError:
        return None


def _model_price(s: str | None):
    if s is None:
        return None
    try:
        return round(float(s), 2)
    except ValueError:
        return None


def model_row(r: tuple) -> dict:
    tid, cust, name, qty, price, date, region, status = r
    tid_n = (tid or "").strip().upper() or None
    qty_n = _model_int(qty)
    price_n = _model_price(price)
    date_n = _model_date(date)
    status_n = "unknown" if status is None else status.strip().lower()
    total = (
        round(qty_n * price_n, 2) if qty_n is not None and price_n is not None else None
    )
    reasons = []
    if tid_n is None:
        reasons.append("missing")
    if date_n is None:
        reasons.append("date")
    if price_n is None or price_n <= 0:
        reasons.append("price")
    if total is None:
        reasons.append("total")
    if status_n not in VALID:
        reasons.append("status")
    return {
        "tid": tid_n,
        "status": status_n,
        "region": None if region is None else region.strip().lower(),
        "clean": not reasons,
    }


# --- the differential property -------------------------------------------------


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=st.lists(row_st, min_size=1, max_size=25))
def test_split_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [tuple(r) for r in rows], schema=RAW_SCHEMA
    )
    clean, rejected = validate_rows(transform(df))
    clean_rows = clean.collect()
    rejected_rows = rejected.collect()

    # invariant: nothing dropped, nothing duplicated
    assert len(clean_rows) + len(rejected_rows) == len(rows)

    model = [model_row(r) for r in rows]
    assert len(clean_rows) == sum(m["clean"] for m in model)

    # normalization on clean rows matches the model (keyed comparison is
    # impossible with duplicate/blank ids, so compare as multisets)
    got = sorted((r.transaction_id, r.status, r.region) for r in clean_rows)
    want = sorted((m["tid"], m["status"], m["region"]) for m in model if m["clean"])
    assert got == want

    # every rejected row carries at least one reason
    assert all(r.rejection_reason for r in rejected_rows)


@given(
    nums=st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=30),
    den=st.integers(1, 10**5),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_round4_exact_matches_fraction_model(spark, nums, den):
    """_round4_exact == decimal half-away-from-zero rounding of num/den,
    modeled exactly with Fraction (no floats anywhere in the model)."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.boilerplate import (
        _round4_exact,
    )

    df = spark.createDataFrame([(n,) for n in nums], "num long")
    got = [
        r["r"]
        for r in df.select(
            _round4_exact(F.col("num"), F.lit(den)).alias("r")
        ).collect()
    ]
    for n, g in zip(nums, got):
        q = Fraction(abs(n) * 10000, den)
        mag = q.numerator // q.denominator
        if Fraction(q.numerator % q.denominator, q.denominator) >= Fraction(1, 2):
            mag += 1
        want = (-mag if n < 0 else mag) / 10000.0
        assert g == want, (n, den, g, want)


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    n_frames=st.integers(0, 5),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_y4m_round_trip_property(w, h, n_frames, seed):
    import random

    from csv_2_db_pipeline_data_engineering_spark.operators.media_codecs import (
        decode_y4m,
        encode_y4m,
    )

    rng = random.Random(seed)
    frames = [bytes(rng.randrange(256) for _ in range(w * h)) for _ in range(n_frames)]
    dw, dh, dec = decode_y4m(encode_y4m(w, h, frames))
    assert (dw, dh, dec) == (w, h, frames)


@given(seed=st.integers(0, 10**6))
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_url_canonicalization_is_idempotent(spark, seed):
    """Canonicalization must be a projection: applying it twice equals
    applying it once (otherwise dedup keys drift across passes)."""
    import random

    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.boilerplate import (
        canonicalize_url,
    )

    rng = random.Random(seed)
    urls = []
    for _ in range(8):
        scheme = rng.choice(["http://", "HTTP://", "https://", "HTTPS://"])
        host = rng.choice(["A.Example", "b.example", "Site9.Example"])
        port = rng.choice(["", ":80"])
        path = rng.choice(["/x", "/page/7", "/a/b"])
        params = rng.sample(
            ["utm_source=f", "ref=p", "utm_medium=m", "q=keep", "id=3"],
            rng.randrange(0, 4),
        )
        tail = ("?" + "&".join(params)) if params else ""
        urls.append(scheme + host + port + path + tail + rng.choice(["", "/"]))
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonicalize_url(F.col("url"))
    rows = df.select(once.alias("c1"), canonicalize_url(once).alias("c2")).collect()
    for r in rows:
        assert r["c1"] == r["c2"], r


def test_mojibake_fix_is_idempotent(spark):
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.scrub import fix_mojibake

    texts = [
        ("visit the cafÃ© and cafÃ© bar",),
        ("a naÃ¯ve plan",),
        ("plain ascii",),
        ("mixed cafÃ© naÃ¯ve cafÃ©",),
    ]
    df = spark.createDataFrame(texts, "t string")
    once = fix_mojibake(F.col("t"))
    rows = df.select(once.alias("f1"), fix_mojibake(once).alias("f2")).collect()
    for r in rows:
        assert r["f1"] == r["f2"]


@given(
    threshold=st.floats(min_value=0.1, max_value=0.9),
    recall=st.floats(min_value=0.9, max_value=0.999),
    budget_step=st.integers(min_value=0, max_value=3),
)
@settings(max_examples=60, deadline=None)
def test_minhash_banding_law_properties(threshold, recall, budget_step):
    """minhash_params_for_scale: the returned banding always meets the
    at-threshold recall contract within the hash budget, and growing
    the budget never increases the background-collision rate."""
    from csv_2_db_pipeline_data_engineering_spark.operators.dedup import (
        minhash_params_for_scale,
    )

    budgets = [64, 128, 256, 512, 1024]
    prev_bg = None
    for max_k in budgets[budget_step:]:
        try:
            rows, bands, k, bg = minhash_params_for_scale(
                threshold, recall, max_k=max_k
            )
        except ValueError:
            prev_bg = None
            continue
        assert 2 <= rows <= 8 and rows * bands == k <= max_k
        assert 1 - (1 - threshold**rows) ** bands >= recall - 1e-12
        if prev_bg is not None:
            assert bg <= prev_bg + 1e-18
        prev_bg = bg


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=20, deadline=None)
def test_pq_codebook_fit_is_deterministic_and_in_range(seed):
    """_pq_fit_codebook: same seed+sample -> identical centroids;
    centroids stay inside the sample's bounding box (means of sample
    subsets can never escape it)."""
    import numpy as np

    from csv_2_db_pipeline_data_engineering_spark.operators.similarity import (
        PQ_CODEBOOK_K,
        _pq_fit_codebook,
    )

    rng = np.random.RandomState(seed % 9973)
    samples = rng.randn(200, 8)
    a = _pq_fit_codebook(samples, seed=seed)
    b = _pq_fit_codebook(samples.copy(), seed=seed)
    assert (a == b).all()
    assert a.shape == (min(PQ_CODEBOOK_K, len(samples)), 8)
    assert (a >= samples.min(axis=0) - 1e-12).all()
    assert (a <= samples.max(axis=0) + 1e-12).all()


@given(
    a=st.sets(st.integers(1, 1 << 59), min_size=0, max_size=300),
    b=st.sets(st.integers(1, 1 << 59), min_size=0, max_size=300),
)
@settings(max_examples=60, deadline=None)
def test_kmv_merge_law_pure_model(a, b):
    """kmv_K(A ∪ B) == K-smallest(kmv_K(A) ∪ kmv_K(B)) for ALL set
    shapes — empty, disjoint, nested, overlapping — the property the
    Spark `merge_kmv` certificate relies on. Pure-Python model (no
    Spark session): the law is set algebra, not plan behavior."""
    from csv_2_db_pipeline_data_engineering_spark.operators.sketch import KMV_K

    def kmv(s):
        return sorted(s)[:KMV_K]

    merged = sorted(set(kmv(a)) | set(kmv(b)))[:KMV_K]
    assert merged == kmv(a | b)


@given(
    ws=st.lists(st.integers(1, 10**6), min_size=1, max_size=40),
    n=st.integers(1, 10),
)
@settings(max_examples=60, deadline=None)
def test_weighted_sample_key_ordering_model(ws, n):
    """The Efraimidis-Spirakis transform ln(u)/w is order-equivalent to
    the paper's u^(1/w) for u in (0,1): both pick the same top-N, for
    any weight profile (the substitution `corpus_weighted_sample`
    makes to stay in cross-engine-stable log space)."""
    import hashlib
    import math

    keys = []
    for i, w in enumerate(ws):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(1 << 60)
        keys.append((i, math.log(u) / w, u ** (1.0 / w)))
    top_log = sorted(keys, key=lambda t: (-t[1], t[0]))[:n]
    top_pow = sorted(keys, key=lambda t: (-t[2], t[0]))[:n]
    assert [t[0] for t in top_log] == [t[0] for t in top_pow]
