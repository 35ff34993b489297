"""Mergeable-sketch operators: count-min heavy hitters and a Bloom-filter
dedup pre-filter.

A corpus-scale pipeline cannot afford exact global state for every
frequency or membership question; the standard answers are fixed-size
mergeable sketches (Cormode & Muthukrishnan's count-min for frequency,
Bloom filters for membership).  Both operators here follow the repo's
certificate pattern: the query runs the REAL sketch path end-to-end and
emits exact engine-derivable columns alongside the sketch's answer plus
in-query guarantee booleans, so the driver value-checks the sketch, not
just row counts.

Scale design (100 TB):
- Both sketches aggregate to a FIXED-size state (``CMS_D``×``CMS_W``
  counters; ``BLOOM_M`` bits) regardless of input size.  The Spark shape
  is the mergeable-sketch shape: a map-side partial aggregate per
  partition (hash-bucket partial counts / distinct bit positions)
  followed by one tiny shuffle keyed on O(sketch-size) keys — the same
  pattern Spark uses internally for ``approx_count_distinct`` partials.
- The finished sketch is kilobytes, so the probe side is always a
  ``broadcast()`` hash join: estimating a candidate's frequency or
  testing a delta batch's membership never reshuffles the corpus.
- Hashing is the repo's engine-portable idiom — first 32 bits of md5,
  bit-identical in Spark and DuckDB (xxhash64 would be cheaper but has
  no DuckDB twin; see ``dedup.simhash_df``).

Reference parity note: the reference (pandas -> Postgres ETL,
``main.py:41-136``) has no sketch surface; this is part of the
driver-mandated large-scale-pipeline extension (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import Query
from ..sources.tables import load_table, load_table_spread
from .lifecycle import scoped_cache

# --- Count-min sketch over word 3-grams -----------------------------------

#: sketch depth (independent hash rows) and width (counters per row).
#: W=1024 against ~26k gram occurrences at sf0.01 keeps the sketch
#: genuinely lossy (avg ~25 colliding occurrences per counter), so the
#: overcount columns exercise the real estimate-vs-truth gap instead of
#: a vacuous zero.
CMS_D = 4
CMS_W = 1024
#: exact-frequency floor for the reported heavy-hitter candidates.
CMS_HH_MIN = 5


def _gram_stream(docs: DataFrame, *carry: str) -> DataFrame:
    """One row per word-3-gram OCCURRENCE: (*carry, gram). Codegen-only,
    ZERO shuffle: explode an ``arrays_zip`` of three shifted ``slice``
    views of the token array, then ``concat_ws`` per row.  ~7x faster at
    sf0.1 than a ``transform``+``element_at`` lambda (which runs on the
    interpreted higher-order path — the same lambda tax ``shingle_rows``
    paid before round 5) and shuffle-free unlike the window-lead shape
    (adjacency never leaves the row's own array).  Matches the oracle's
    list-comprehension shingling. ``carry`` names existing columns to
    thread through the explode (the ONE defining shingling form — the
    HLL split partials carry their is_delta flag through here instead
    of duplicating these expressions)."""
    w = F.split("text", " ")
    n3 = F.size(w) - F.lit(2)
    z = F.arrays_zip(F.slice(w, 1, n3), F.slice(w, 2, n3), F.slice(w, 3, n3))
    return (
        docs.filter(F.size(w) >= 3)
        .select(*carry, F.explode(z).alias("z"))
        .select(
            *carry,
            F.concat_ws(" ", F.col("z.0"), F.col("z.1"), F.col("z.2")).alias(
                "gram"
            ),
        )
    )


def _cms_buckets(key: Column) -> list[Column]:
    """All D counter indexes for ``key`` from ONE md5: the digest's four
    disjoint 32-bit quarters, each mod W (the one-hash/split-bits CMS
    construction — one hash invocation per distinct key instead of D)."""
    h = F.md5(key)
    return [
        F.pmod(
            F.conv(F.substring(h, 1 + 8 * d, 8), 16, 10).cast("long"), F.lit(CMS_W)
        )
        for d in range(CMS_D)
    ]


def text_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter word 3-grams with their count-min estimates.

    The C4/RefinedWeb boilerplate-detection question — "which n-grams
    are over-represented across the corpus?" — answered the way a
    100 TB pipeline has to: a fixed-size count-min sketch built in one
    pass (map-side partial counts into D×W counters, one tiny shuffle
    on O(D·W) keys), then candidate grams probed against the broadcast
    sketch.  The exact counts computed alongside exist to make the
    estimate checkable; at production scale the exact branch is
    replaced by the sketch alone (that is the point of the sketch).

    Output per gram with exact count >= CMS_HH_MIN: the exact count,
    the CMS estimate (min over the D rows), the overcount, and the two
    CMS guarantees as booleans — estimates never undercount, and (with
    high probability) overshoot by at most 2·N/W.

    Cost shape: ONE O(occurrences) aggregate compresses the stream to
    (gram, n); everything downstream — hashing (one md5 per DISTINCT
    gram, all D buckets from its four 32-bit quarters), the D×W partial
    sum, the candidate probe — runs on the distinct-gram frame, which
    Zipf keeps 1-2 orders smaller than the corpus.
    """
    grams = _gram_stream(load_table(spark, sf_dir, "documents"))
    gcounts = scoped_cache(
        grams.groupBy("gram").agg(F.count(F.lit(1)).alias("exact_n"))
    )
    buckets = _cms_buckets(F.col("gram"))

    # The sketch: weighted partial sums into D*W counters.
    ds = F.posexplode(F.array(*buckets)).alias("d", "bucket")
    cms = (
        gcounts.select(ds, "exact_n")
        .groupBy("d", "bucket")
        .agg(F.sum("exact_n").alias("cnt"))
    )

    total = gcounts.select(F.sum("exact_n").alias("n_total"))

    heavy = gcounts.filter(F.col("exact_n") >= CMS_HH_MIN)

    probed = (
        heavy.select("gram", "exact_n", ds)
        .join(F.broadcast(cms), ["d", "bucket"])
        .groupBy("gram", "exact_n")
        .agg(F.min("cnt").alias("est_n"))
    )
    return (
        probed.crossJoin(F.broadcast(total))
        .select(
            "gram",
            "exact_n",
            "est_n",
            (F.col("est_n") - F.col("exact_n")).alias("overcount"),
            (F.col("est_n") >= F.col("exact_n")).alias("ok_no_undercount"),
            (
                F.col("est_n") - F.col("exact_n")
                <= 2 * F.ceil(F.col("n_total") / F.lit(CMS_W))
            ).alias("within_2n_over_w"),
        )
        .orderBy(F.desc("exact_n"), "gram")
    )


HEAVY_HITTERS_CMS_ORACLE = f"""
WITH docs AS (SELECT string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3),
grams AS (
  SELECT unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                 for i in range(1, len(w) - 1)]) AS gram
  FROM docs
),
gcounts AS (SELECT gram, COUNT(*)::BIGINT AS exact_n FROM grams GROUP BY 1),
ds AS (SELECT unnest([{', '.join(map(str, range(CMS_D)))}]) AS d),
cms AS (
  SELECT d,
         ('0x' || substr(md5(gram), 1 + 8 * d, 8))::BIGINT % {CMS_W} AS bucket,
         SUM(exact_n)::BIGINT AS cnt
  FROM gcounts CROSS JOIN ds
  GROUP BY 1, 2
),
total AS (SELECT SUM(exact_n)::BIGINT AS n_total FROM gcounts),
heavy AS (SELECT gram, exact_n FROM gcounts WHERE exact_n >= {CMS_HH_MIN}),
probed AS (
  SELECT h.gram, h.exact_n, MIN(c.cnt) AS est_n
  FROM heavy h
  CROSS JOIN ds
  JOIN cms c
    ON c.d = ds.d
   AND c.bucket = ('0x' || substr(md5(h.gram), 1 + 8 * ds.d, 8))::BIGINT % {CMS_W}
  GROUP BY 1, 2
)
SELECT gram, exact_n, est_n,
       est_n - exact_n AS overcount,
       est_n >= exact_n AS ok_no_undercount,
       est_n - exact_n <= 2 * CEIL(n_total / {CMS_W}.0)::BIGINT AS within_2n_over_w
FROM probed CROSS JOIN total
ORDER BY exact_n DESC, gram
"""


# --- Mergeable CMS persistence (the O(delta) incremental path) -------------


def cms_rows(docs: DataFrame) -> DataFrame:
    """The count-min sketch of ``docs``' word-3-gram stream as rows
    (d, bucket, cnt).  Row form keeps the sketch a plain DataFrame —
    append-extendable per delta batch (``extend_cms_index``), mergeable
    by plain addition (``merge_cms``; count-min's defining property),
    broadcastable (bounded by D·W rows), and engine-portable for the
    oracles.  The same shape the signature/line/bloom indexes use."""
    gcounts = _gram_stream(docs).groupBy("gram").agg(F.count(F.lit(1)).alias("n"))
    ds = F.posexplode(F.array(*_cms_buckets(F.col("gram")))).alias("d", "bucket")
    return (
        gcounts.select(ds, "n")
        .groupBy("d", "bucket")
        .agg(F.sum("n").alias("cnt"))
    )


def merge_cms(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches by counter addition: the merged sketch
    is IDENTICAL to the sketch of the concatenated streams (not an
    approximation of it), so a 100 TB corpus can maintain one sketch as
    O(delta) per-batch appends and never rescan history."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def extend_cms_index(docs: DataFrame, path: str, tag: str) -> None:
    """Append ``docs``' sketch counters as the (overwrite-idempotent)
    ``delta=<tag>`` partition of a persisted CMS index — the count-min
    twin of the streaming fold's ``extend_bloom_index``: a crash-replay
    overwrites its own tag, so no batch is ever double-counted."""
    import os

    cms_rows(docs).write.mode("overwrite").parquet(
        os.path.join(path, f"delta={tag}")
    )


def compact_cms_index(spark: SparkSession, path: str) -> None:
    """Merge every visible delta partition into one base version — the
    ``lsm.compact`` crash-safe versioned commit for the persisted
    count-min sketch (the double-counting a naive in-namespace tmp
    write risks under a crash is fatal precisely here: doubled
    counters answer every estimate wrong with no error). Counter
    addition over tags IS the merge (the sketch's defining property),
    so the compacted index answers identically while bounding the
    per-read aggregation input back to D·W rows. Run on the
    maintenance cadence, amortized O(D·W) against many O(delta)
    extends.
    """
    from . import lsm

    lsm.compact(
        spark,
        path,
        {
            "": lambda df: df.groupBy("d", "bucket").agg(
                F.sum("cnt").alias("cnt")
            )
        },
    )


def read_cms_index(spark: SparkSession, path: str) -> DataFrame | None:
    """The merged counters across all visible delta tags (None if the
    index does not exist yet).  Addition over tags IS the merge, so the
    read is one O(D·W·tags -> D·W) aggregate, never a corpus rescan."""
    from . import lsm

    raw = lsm.read_visible(spark, path)
    if raw is None:
        return None
    return raw.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def text_heavy_hitters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental heavy hitters: a history sketch EXTENDED by a delta
    sketch must answer identically to a from-scratch rebuild.

    The persistence story for the 100 TB sketch path (VERDICT r8 #8):
    count-min is mergeable by counter addition, so the corpus sketch is
    maintained as O(delta) per-batch appends (``extend_cms_index``) and
    merged at read time (``read_cms_index``) — history is never
    rescanned.  This query runs the merge algebra in-plan on the repo's
    incremental convention (history = doc_id % 10 != 0, delta = % 10
    == 0) and certifies it: per heavy gram, the estimate from the
    MERGED history+delta sketch, the estimate from a full rebuild, and
    ``ok_merge_exact`` — merge_cms(h, d) ≡ cms(h ∪ d), exactly, not
    approximately (the from-scratch CMS guarantee ``ok_no_undercount``
    rides along).  The disk round trip of the same algebra is
    pytest-verified (``tests/test_sketch.py``).
    """
    # Spread before the gram scans (the single-file row-group-count
    # split bound — see text_distinct_hll): measured 38.2s -> 10.3s at
    # the 100x probe corpus.
    docs = load_table_spread(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    merged = merge_cms(cms_rows(history), cms_rows(delta))
    full = cms_rows(docs)

    gcounts = scoped_cache(
        _gram_stream(docs).groupBy("gram").agg(F.count(F.lit(1)).alias("exact_n"))
    )
    heavy = gcounts.filter(F.col("exact_n") >= CMS_HH_MIN)
    ds = F.posexplode(F.array(*_cms_buckets(F.col("gram")))).alias("d", "bucket")
    probed = (
        heavy.select("gram", "exact_n", ds)
        .join(F.broadcast(merged.withColumnRenamed("cnt", "cnt_m")), ["d", "bucket"])
        .join(F.broadcast(full.withColumnRenamed("cnt", "cnt_f")), ["d", "bucket"])
        .groupBy("gram", "exact_n")
        .agg(
            F.min("cnt_m").alias("est_merged"),
            F.min("cnt_f").alias("est_full"),
        )
    )
    return probed.select(
        "gram",
        "exact_n",
        "est_merged",
        "est_full",
        (F.col("est_merged") == F.col("est_full")).alias("ok_merge_exact"),
        (F.col("est_merged") >= F.col("exact_n")).alias("ok_no_undercount"),
    ).orderBy(F.desc("exact_n"), "gram")


HEAVY_HITTERS_INCREMENTAL_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
grams AS (
  SELECT doc_id,
         unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                 for i in range(1, len(w) - 1)]) AS gram
  FROM docs
),
gc_h AS (SELECT gram, COUNT(*)::BIGINT AS n FROM grams WHERE doc_id % 10 != 0 GROUP BY 1),
gc_d AS (SELECT gram, COUNT(*)::BIGINT AS n FROM grams WHERE doc_id % 10 = 0 GROUP BY 1),
gc AS (SELECT gram, COUNT(*)::BIGINT AS exact_n FROM grams GROUP BY 1),
ds AS (SELECT unnest([{', '.join(map(str, range(CMS_D)))}]) AS d),
cms_h AS (
  SELECT d, ('0x' || substr(md5(gram), 1 + 8 * d, 8))::BIGINT % {CMS_W} AS bucket,
         SUM(n)::BIGINT AS cnt
  FROM gc_h CROSS JOIN ds GROUP BY 1, 2
),
cms_d AS (
  SELECT d, ('0x' || substr(md5(gram), 1 + 8 * d, 8))::BIGINT % {CMS_W} AS bucket,
         SUM(n)::BIGINT AS cnt
  FROM gc_d CROSS JOIN ds GROUP BY 1, 2
),
merged AS (
  SELECT d, bucket, SUM(cnt)::BIGINT AS cnt
  FROM (SELECT * FROM cms_h UNION ALL SELECT * FROM cms_d) GROUP BY 1, 2
),
cms_full AS (
  SELECT d, ('0x' || substr(md5(gram), 1 + 8 * d, 8))::BIGINT % {CMS_W} AS bucket,
         SUM(exact_n)::BIGINT AS cnt
  FROM gc CROSS JOIN ds GROUP BY 1, 2
),
heavy AS (SELECT gram, exact_n FROM gc WHERE exact_n >= {CMS_HH_MIN}),
probed AS (
  SELECT h.gram, h.exact_n,
         MIN(m.cnt) AS est_merged, MIN(f.cnt) AS est_full
  FROM heavy h
  CROSS JOIN ds
  JOIN merged m
    ON m.d = ds.d
   AND m.bucket = ('0x' || substr(md5(h.gram), 1 + 8 * ds.d, 8))::BIGINT % {CMS_W}
  JOIN cms_full f
    ON f.d = ds.d
   AND f.bucket = ('0x' || substr(md5(h.gram), 1 + 8 * ds.d, 8))::BIGINT % {CMS_W}
  GROUP BY 1, 2
)
SELECT gram, exact_n, est_merged, est_full,
       est_merged = est_full AS ok_merge_exact,
       est_merged >= exact_n AS ok_no_undercount
FROM probed
ORDER BY exact_n DESC, gram
"""


# --- Bloom-filter dedup pre-filter -----------------------------------------

#: filter size in bits and hash count. M=65536 holds the sf0.1 history
#: (~4.5k keys × K=5 ≈ 22.5k set bits → 29% fill → ~0.2% fp); at
#: production scale M grows with the corpus or the filter shards by
#: key range — the 8 KiB bitset here is the broadcast-side story.
BLOOM_M = 65536
BLOOM_K = 5


def _content_key(docs: DataFrame) -> DataFrame:
    """(doc_id, key): md5 content digest, with deterministic planted
    duplicates so the delta-vs-history membership test is non-vacuous
    at every sf (the ``text_pii_scrub`` planted-witness pattern): docs
    with doc_id % 7 == 0 share a key whenever they agree mod 21, which
    guarantees cross-boundary duplicates (delta ids ≡ 0 mod 70 repeat
    history keys)."""
    key = F.when(
        F.col("doc_id") % 7 == 0,
        F.md5(F.concat(F.lit("planted:"), (F.col("doc_id") % 21).cast("string"))),
    ).otherwise(F.md5("text"))
    return docs.select("doc_id", key.alias("key"))


def _bloom_pos(k: Column, key: Column) -> Column:
    """Hash ``k``'s bit position for ``key``: first 32 md5 bits mod M."""
    h = F.md5(F.concat(k.cast("string"), F.lit(":"), key))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(BLOOM_M))


def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-batch membership test against a Bloom filter of history keys.

    The incremental-dedup accelerator: before the exact verify join
    (``dedup_incremental``'s signature index), a delta batch is probed
    against a fixed-size Bloom filter of every content key ever seen —
    rows the filter rejects are PROVABLY new and skip the expensive
    path entirely.  History = doc_id % 10 != 0, delta = % 10 == 0 (the
    repo's incremental convention).

    The filter is built as the distinct set-bit positions of the
    history keys (map-side distinct, one tiny shuffle bounded by M)
    and probed via broadcast: each delta key checks its K positions and
    is "maybe seen" only if all K bits are set.  Alongside, the exact
    answer (a semi-join on the key itself) makes two certificates
    checkable per delta row: Bloom filters never false-negative
    (``ok_no_false_negative`` must be universally true), and false
    positives are the bounded price (``false_positive``).
    """
    docs = _content_key(load_table(spark, sf_dir, "documents"))
    history = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)

    ks = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("k")
    bits = bloom_bit_rows(history, "key").withColumn("bit", F.lit(1))

    probe = (
        delta.select("doc_id", "key", ks)
        .withColumn("pos", _bloom_pos(F.col("k"), F.col("key")))
        .join(F.broadcast(bits), ["k", "pos"], "left")
        .groupBy("doc_id", "key")
        .agg(F.sum(F.coalesce("bit", F.lit(0))).alias("hits"))
    )

    seen_keys = history.select("key").distinct().withColumn("seen", F.lit(True))
    maybe = F.col("hits") == BLOOM_K
    actually = F.coalesce("seen", F.lit(False))
    return (
        probe.join(F.broadcast(seen_keys), "key", "left")
        .select(
            "doc_id",
            "hits",
            maybe.alias("maybe_seen"),
            actually.alias("actually_seen"),
            (maybe & ~actually).alias("false_positive"),
            (maybe | ~actually).alias("ok_no_false_negative"),
        )
        .orderBy("doc_id")
    )


def bloom_bit_rows(keys: DataFrame, key_col: str = "fingerprint") -> DataFrame:
    """The Bloom filter as rows: distinct (k, pos) set-bit coordinates of
    ``keys``.  Row form (instead of a packed bitset) keeps the filter a
    plain DataFrame — append-extendable per delta batch, unionable
    across shards, broadcastable (bounded by K·M rows regardless of
    corpus size), and engine-portable for the oracles."""
    ks = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("k")
    return (
        keys.select(F.col(key_col).alias("key"), ks)
        .select("k", _bloom_pos(F.col("k"), F.col("key")).alias("pos"))
        .distinct()
    )


def bloom_screen(candidates: DataFrame, bits: DataFrame) -> DataFrame:
    """Distinct candidate keys that MAY be members (all K bits set).

    Keys absent from the result are PROVABLY not in the indexed set (a
    Bloom filter cannot false-negative), so callers can skip the exact
    membership join for them entirely — the pre-filter contract.
    Robust to duplicate bit rows (crash-replayed appends, per-delta-tag
    unions): the probe is a semi-join, each (key, k) probes exactly
    once, and the bits are ``distinct()``-ed before the broadcast so
    the payload is capped at K·M rows no matter how many overlapping
    fold tags the streaming index has accumulated.

    ``candidates`` must have a ``key`` column.
    """
    ks = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("k")
    probe = (
        candidates.select("key")
        .distinct()
        .select("key", ks)
        .withColumn("pos", _bloom_pos(F.col("k"), F.col("key")))
    )
    hit = probe.join(F.broadcast(bits.distinct()), ["k", "pos"], "left_semi")
    return (
        hit.groupBy("key")
        .agg(F.count(F.lit(1)).alias("h"))
        .filter(F.col("h") == BLOOM_K)
        .select("key")
    )


BLOOM_PREFILTER_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN md5('planted:' || (doc_id % 21)::VARCHAR)
              ELSE md5(text) END AS key
  FROM documents
),
history AS (SELECT * FROM keyed WHERE doc_id % 10 != 0),
delta AS (SELECT * FROM keyed WHERE doc_id % 10 = 0),
ks AS (SELECT unnest([{', '.join(map(str, range(BLOOM_K)))}]) AS k),
bits AS (
  SELECT DISTINCT k,
         ('0x' || substr(md5(k::VARCHAR || ':' || key), 1, 8))::BIGINT % {BLOOM_M} AS pos
  FROM history CROSS JOIN ks
),
probe AS (
  SELECT d.doc_id, d.key,
         SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS hits
  FROM delta d
  CROSS JOIN ks
  LEFT JOIN bits b
    ON b.k = ks.k
   AND b.pos = ('0x' || substr(md5(ks.k::VARCHAR || ':' || d.key), 1, 8))::BIGINT % {BLOOM_M}
  GROUP BY 1, 2
),
seen AS (SELECT DISTINCT key FROM history)
SELECT p.doc_id, p.hits,
       p.hits = {BLOOM_K} AS maybe_seen,
       s.key IS NOT NULL AS actually_seen,
       (p.hits = {BLOOM_K}) AND s.key IS NULL AS false_positive,
       (p.hits = {BLOOM_K}) OR s.key IS NULL AS ok_no_false_negative
FROM probe p LEFT JOIN seen s ON s.key = p.key
ORDER BY p.doc_id
"""


# --- HyperLogLog distinct-gram cardinality ---------------------------------
#
# The third mergeable sketch, completing the trio of merge algebras the
# persisted-index convention supports: CMS merges by ADDITION, Bloom by
# OR, HyperLogLog (Flajolet et al. 2007) by register-wise MAX. The
# 100 TB question it answers — "how many DISTINCT n-grams / URLs /
# fingerprints does the corpus hold?" — is exactly the one an exact
# count pays a full shuffle of every distinct key for; the HLL state is
# 2^p registers regardless of input size, built map-side and merged
# with one O(registers)-key shuffle (the shape of Spark's own
# approx_count_distinct, re-derived here because its HLL++ bytes are
# not oracle-checkable across engines).
#
# Engine-portable construction: one md5 per distinct key; the digest's
# first 32 bits pick the register (mod 2^p), the next 60 bits (15 hex
# chars — kept under 2^63 so the BIGINT cast never wraps) feed rho =
# 61 - bit_length(w), with bit_length taken as the LENGTH OF THE BINARY
# STRING (Spark `conv(.., 16, 2)`, DuckDB `bin()`) — exact integer, no
# floating log2 near power-of-two boundaries. The harmonic sum folds
# per-register powers of two in sorted order (each term is an exact
# double; the fold order is pinned) before the integer zero-register
# mass joins in one final add, so the estimate is bit-identical across
# engines up to the shared alpha/ln constants, and rounded to 4
# decimals on both sides.

HLL_P = 10
HLL_M = 1 << HLL_P  # 1024 registers
HLL_RHO_ZERO = 61  # rho of an (astronomically unlikely) all-zero suffix
#: alpha_m for m >= 128 (Flajolet et al. Fig. 3), evaluated once in
#: Python and embedded as the SAME literal in the Spark plan and the
#: SQL text — no cross-engine constant drift.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
#: alpha_m * m^2, the estimate numerator — multiplied once in PYTHON so
#: both engines receive one identical double literal (DuckDB would
#: otherwise parse the alpha literal as DECIMAL and overflow the
#: product).
HLL_ALPHA_M2 = HLL_ALPHA * HLL_M * HLL_M
#: certificate tolerance: 3 standard errors = 3 * 1.04/sqrt(1024) ~ 9.8%.
HLL_ERR_PCT = 10


def _hll_reg_rho_frame(df: DataFrame, *carry: str) -> DataFrame:
    """(*carry, reg, rho) for a frame with a ``gram`` column.

    Value-identical to the defining forms (``reg = first 32 bits mod
    2^p``, ``rho = 61 - bit_length(w)``) but computed from the hex
    digits directly, in STAGED projections:

    - the r11 ``conv(hex, 16, 2)`` built a 60-char binary STRING per
      gram occurrence just to take its length — the single most
      expensive expression of the sketch scan at 100x data. reg now
      parses only the digest's 3 hex digits that survive the mod
      (16^3 is divisible by 2^p); rho strips leading zero hex digits
      and adds the lead digit's bit count to 4*(remaining - 1).
    - md5 and the stripped prefix each live in their OWN projection
      stage: one inline projection re-evaluates shared non-cheap
      subtrees per mention (codegen CSE does not reach across the
      when-branches — measured 69s vs 44s per scan on the 100x
      corpus); CollapseProject keeps the stages separate exactly
      because the shared expressions are non-cheap.
    """
    s1 = df.select(*carry, F.md5("gram").alias("_h"))
    s2 = s1.select(
        *carry,
        # first-32-bits mod 2^p == last-3-of-8-hex-digits mod 2^p
        F.pmod(
            F.conv(F.substring("_h", 6, 3), 16, 10).cast("long"), F.lit(HLL_M)
        ).alias("reg"),
        F.regexp_replace(F.substring("_h", 9, 15), "^0+", "").alias("_st"),
    )
    lead = F.substring("_st", 1, 1)
    lead_bits = (
        F.when(lead == "1", F.lit(1))
        .when(lead.isin("2", "3"), F.lit(2))
        .when(lead.isin("4", "5", "6", "7"), F.lit(3))
        .otherwise(F.lit(4))
    )
    bitlen = (F.length("_st") - F.lit(1)) * F.lit(4) + lead_bits
    rho = F.when(F.length("_st") == 0, F.lit(HLL_RHO_ZERO)).otherwise(
        F.lit(HLL_RHO_ZERO) - bitlen
    )
    return s2.select(*carry, "reg", rho.cast("long").alias("rho"))


def hll_rows(docs: DataFrame) -> DataFrame:
    """(reg, rho): the HLL register state for ``docs``' distinct
    3-grams — observed registers only (absent register = 0). Map-side
    max partials, one O(registers)-key shuffle."""
    return (
        _hll_reg_rho_frame(_gram_stream(docs))
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )


def merge_hll(*sketches: DataFrame) -> DataFrame:
    """Register-wise MAX merge — hll(h) ⊕ hll(d) ≡ hll(h ∪ d) exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("reg").agg(F.max("rho").alias("rho"))


def _hll_estimate(regs: DataFrame) -> DataFrame:
    """1-row (est, n_obs, sum_rho, max_rho) from observed registers.

    Harmonic mean over ALL HLL_M registers: the 2^p - n_obs absent
    registers contribute 2^0 = 1 each (one exact integer added after
    the sorted fold of the observed powers of two); the small-range
    linear-counting branch uses the same zero-register count."""
    terms = F.sort_array(F.collect_list(F.pow(F.lit(2.0), -F.col("rho"))))
    fold = F.aggregate(terms, F.lit(0.0), lambda a, x: a + x)
    agg = regs.agg(
        fold.alias("ssum_obs"),
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("rho").alias("sum_rho"),
        F.max("rho").alias("max_rho"),
    )
    ssum = F.col("ssum_obs") + (F.lit(HLL_M) - F.col("n_obs")).cast("double")
    e_raw = F.lit(HLL_ALPHA_M2) / ssum
    v = (F.lit(HLL_M) - F.col("n_obs")).cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v),
    ).otherwise(e_raw)
    return agg.select(
        F.round(est, 4).alias("est"), "n_obs", "sum_rho", "max_rho"
    )


def _hll_split_partials(docs: DataFrame) -> DataFrame:
    """(reg, is_delta, rho): per-register MAX for each incremental
    split (history = doc_id % 10 != 0, delta = % 10 == 0), from ONE
    gram scan and ONE md5 per gram occurrence. The r11 form built
    three independent sketches (full, history, delta), re-exploding
    and re-hashing the whole corpus each time — 3x the dominant
    per-byte work for states that max-associativity derives exactly
    from one (register, split) partial frame of <= 2 * 2^p rows."""
    g = _gram_stream(
        docs.withColumn("is_delta", F.col("doc_id") % 10 == 0), "is_delta"
    )
    return (
        _hll_reg_rho_frame(g, "is_delta")
        .groupBy("reg", "is_delta")
        .agg(F.max("rho").alias("rho"))
    )


def text_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 3-gram cardinality via HyperLogLog, with the exact
    count, the merge-exactness certificate, and the error-bound
    certificate in one hash-checked row.

    Runs the MAX-merge algebra in-plan on the incremental convention
    (history = doc_id % 10 != 0, delta = % 10 == 0): a register state
    mis-merged in ANY of the 1024 registers flips sum_rho/n_obs or the
    folded estimate, so the single output row pins the whole sketch.
    The full/history/delta states all derive from ONE eagerly-pinned
    (register, split) partial frame (``_hll_split_partials``); the
    ORACLE still builds r_full from scratch and r_merged from split
    partials independently, so the cross-engine hash match continues
    to prove merge == rebuild, not merely max-associativity.

    The corpus is spread to defaultParallelism before the gram scan:
    a single-file corpus splits into at most its row-group count
    (14 splits at the 100x probe), so the scan-fused explode+md5 —
    the dominant per-byte cost — ran on 14 of 32 cores. The
    repartition is the ``_spread`` lesson (operators/multimodal.py:142)
    applied to a text scan; measured 67.2s -> 22.2s at 100x. At
    production layout (many files) the scan parallelizes itself.
    """
    docs = load_table_spread(spark, sf_dir, "documents")
    parts = _hll_split_partials(docs).localCheckpoint(eager=True)
    full = parts.groupBy("reg").agg(F.max("rho").alias("rho"))
    merged = merge_hll(
        parts.filter(~F.col("is_delta")).select("reg", "rho"),
        parts.filter(F.col("is_delta")).select("reg", "rho"),
    )
    n_exact = _gram_stream(docs).agg(
        F.count_distinct(F.col("gram")).alias("n_exact")
    )
    ef = _hll_estimate(full).select(
        F.col("est").alias("est_full"),
        F.col("n_obs").alias("n_obs_full"),
        F.col("sum_rho").alias("sum_rho_full"),
        F.col("max_rho").alias("max_rho"),
    )
    em = _hll_estimate(merged).select(
        F.col("est").alias("est_merged"),
        F.col("n_obs").alias("n_obs_merged"),
        F.col("sum_rho").alias("sum_rho_merged"),
    )
    row = n_exact.crossJoin(F.broadcast(ef)).crossJoin(F.broadcast(em))
    ok_merge = (
        (F.col("est_merged") == F.col("est_full"))
        & (F.col("n_obs_merged") == F.col("n_obs_full"))
        & (F.col("sum_rho_merged") == F.col("sum_rho_full"))
    )
    ok_err = (
        F.abs(F.col("est_full") - F.col("n_exact")) * 100
        <= F.lit(HLL_ERR_PCT) * F.col("n_exact")
    )
    return row.select(
        "n_exact",
        "est_full",
        "est_merged",
        F.col("n_obs_full").alias("registers_used"),
        F.col("sum_rho_full").alias("sum_rho"),
        "max_rho",
        ok_merge.alias("ok_merge_exact"),
        ok_err.alias("ok_err_bound"),
    )


def extend_hll_index(docs: DataFrame, path: str, tag: str) -> None:
    """Append ``docs``' register state as the (overwrite-idempotent)
    ``delta=<tag>`` partition of a persisted HLL index."""
    import os

    hll_rows(docs).write.mode("overwrite").parquet(
        os.path.join(path, f"delta={tag}")
    )


def read_hll_index(spark: SparkSession, path: str) -> DataFrame | None:
    """The MAX-merged register state across all visible delta tags
    (None if the index does not exist yet)."""
    from . import lsm

    raw = lsm.read_visible(spark, path)
    if raw is None:
        return None
    return merge_hll(raw)


def compact_hll_index(spark: SparkSession, path: str) -> None:
    """Fold every visible delta tag into one base version — MAX over
    tags IS the merge, so the compacted index estimates identically
    while the per-read aggregation input drops back to <= HLL_M rows."""
    from . import lsm

    lsm.compact(
        spark,
        path,
        {"": lambda df: df.groupBy("reg").agg(F.max("rho").alias("rho"))},
    )


_HLL_GRAMS_SQL = """
docs AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
grams AS (
  SELECT doc_id,
         unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                 for i in range(1, len(w) - 1)]) AS gram
  FROM docs
)"""


def _hll_regs_sql(name: str, where: str) -> str:
    """CTE computing the (reg, rho) register state for a doc subset."""
    return f"""{name} AS (
  SELECT ('0x' || substr(md5(gram), 1, 8))::BIGINT % {HLL_M} AS reg,
         MAX(CASE WHEN ('0x' || substr(md5(gram), 9, 15))::BIGINT = 0
                  THEN {HLL_RHO_ZERO}
                  ELSE {HLL_RHO_ZERO}
                    - length(bin(('0x' || substr(md5(gram), 9, 15))::BIGINT))
             END)::BIGINT AS rho
  FROM grams {where} GROUP BY 1
)"""


def _hll_est_sql(name: str, src: str) -> str:
    """CTE reducing a register state to (est, n_obs, sum_rho, max_rho)."""
    e_raw = (
        f"CAST({HLL_ALPHA_M2!r} AS DOUBLE)"
        " / (list_reduce(list(pow(2.0, -rho) ORDER BY pow(2.0, -rho)),"
        " (a, x) -> a + x)"
        f" + ({HLL_M} - COUNT(*)))"
    )
    return f"""{name} AS (
  SELECT ROUND(CASE WHEN {e_raw} <= CAST({2.5 * HLL_M!r} AS DOUBLE)
                     AND {HLL_M} - COUNT(*) > 0
               THEN {HLL_M}.0 * ln({HLL_M}.0 / ({HLL_M} - COUNT(*)))
               ELSE {e_raw}
          END, 4) AS est,
         COUNT(*)::BIGINT AS n_obs,
         SUM(rho)::BIGINT AS sum_rho,
         MAX(rho)::BIGINT AS max_rho
  FROM {src}
)"""


DISTINCT_HLL_ORACLE = f"""
WITH {_HLL_GRAMS_SQL.lstrip()},
{_hll_regs_sql("r_full", "")},
{_hll_regs_sql("r_h", "WHERE doc_id % 10 != 0")},
{_hll_regs_sql("r_d", "WHERE doc_id % 10 = 0")},
r_merged AS (
  SELECT reg, MAX(rho)::BIGINT AS rho
  FROM (SELECT * FROM r_h UNION ALL SELECT * FROM r_d) GROUP BY reg
),
{_hll_est_sql("e_full", "r_full")},
{_hll_est_sql("e_merged", "r_merged")},
exact AS (SELECT COUNT(DISTINCT gram)::BIGINT AS n_exact FROM grams)
SELECT n_exact,
       e_full.est AS est_full,
       e_merged.est AS est_merged,
       e_full.n_obs AS registers_used,
       e_full.sum_rho AS sum_rho,
       e_full.max_rho AS max_rho,
       (e_merged.est = e_full.est AND e_merged.n_obs = e_full.n_obs
        AND e_merged.sum_rho = e_full.sum_rho) AS ok_merge_exact,
       (ABS(e_full.est - n_exact) * 100 <= {HLL_ERR_PCT} * n_exact)
         AS ok_err_bound
FROM exact, e_full, e_merged
"""


# --- HDR-histogram quantile sketch (the 4th mergeable algebra) --------------
#
# CMS merges by ADDITION, Bloom by OR, HLL by register-MAX; the
# order-statistics family completes the set: an HdrHistogram-style
# log-linear integer bucketing (Tene's HdrHistogram; the same
# bucket-count-addition merge DDSketch formalizes with a relative-error
# guarantee, VLDB 2019) over per-doc token counts. Bucket index is
# PURE INTEGER arithmetic — octave e = bit_length(x) plus a linear
# subdivision of the octave into HDR_M sub-buckets — so both engines
# compute bit-identical buckets (no log() boundary drift), the state
# is bounded (<= 64 * HDR_M buckets for any int64 value), and the
# merge is bucket-wise count addition: hist(h) + hist(d) = hist(h∪d)
# EXACTLY, certified in-plan. Counts are exact and the bucketing is
# monotone, so a quantile estimate is the lower bound of the bucket
# holding the true order statistic: est <= exact < est + octave/HDR_M,
# i.e. relative error < 1/HDR_M — the within_bound certificate column.
#
# 100 TB shape: the sketch build is a map-side partial count + one
# O(buckets)-key shuffle (the CMS pattern); quantile extraction walks
# the <= ~300-row histogram. The exact_tok column is the CERTIFICATE
# witness (an exact distributed order statistic the oracle can check)
# — production callers at scale read only the sketch estimates.

HDR_M = 16  # sub-buckets per octave -> relative error < 1/16
HDR_QS = (50, 90, 99)  # integer percents, exact rank arithmetic


def hdr_rows(vals: DataFrame) -> DataFrame:
    """(bucket, lo, cnt) histogram rows for a frame with long column
    ``x`` — the persisted/mergeable sketch state.

    Two algebraically-identical sub-bucket forms keep every
    intermediate inside int64 across the full long range: for octaves
    e >= 5, p = 2^(e-1) is divisible by HDR_M = 16, so
    ``((x-p)*M) div p`` == ``(x-p) div (p div M)`` — the division-first
    form never multiplies (the naive multiply wraps for e >= 61); tiny
    octaves (e < 5, x < 16) keep the multiply, whose operands are < 256.
    """
    sub = (
        f"CASE WHEN e >= 5 THEN (x - p) DIV (p DIV {HDR_M})"
        f" ELSE ((x - p) * {HDR_M}) DIV p END"
    )
    return (
        vals.selectExpr(
            "x", "CASE WHEN x <= 0 THEN 0 ELSE length(bin(x)) END AS e"
        )
        .selectExpr(
            "x", "e",
            "CASE WHEN e = 0 THEN CAST(0 AS BIGINT)"
            " ELSE shiftleft(CAST(1 AS BIGINT), e - 1) END AS p",
        )
        .selectExpr(
            f"CASE WHEN e = 0 THEN 0"
            f" ELSE e * {HDR_M} + CAST({sub} AS INT)"
            f" END AS bucket",
            f"CASE WHEN e = 0 THEN CAST(0 AS BIGINT)"
            f" WHEN e >= 5 THEN p + ({sub}) * (p DIV {HDR_M})"
            f" ELSE p + (({sub}) * p) DIV {HDR_M}"
            f" END AS lo",
        )
        .groupBy("bucket", "lo")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_hdr(*sketches: DataFrame) -> DataFrame:
    """Bucket-wise count addition — hist(h) ⊕ hist(d) ≡ hist(h ∪ d)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket", "lo").agg(F.sum("cnt").alias("cnt"))


def _doc_token_counts(docs: DataFrame) -> DataFrame:
    return docs.select(F.size(F.split("text", " ")).cast("long").alias("x"))


def _hdr_quantile_picks(hist: DataFrame, n_frame: DataFrame) -> DataFrame:
    """(q, est_tok) per HDR_QS percent: the lower bound of the first
    bucket whose exact cumulative count reaches rank ceil(q*N/100)."""
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    qs = cum.sparkSession.createDataFrame([(q,) for q in HDR_QS], "q int")
    return (
        cum.crossJoin(F.broadcast(n_frame))
        .crossJoin(F.broadcast(qs))
        .filter(F.col("cum") * 100 >= F.col("q") * F.col("n_docs"))
        .groupBy("q")
        .agg(F.min("lo").alias("est_tok"))
    )


def _exact_quantiles(vals: DataFrame, n_frame: DataFrame) -> DataFrame:
    """(q, exact_tok): the exact order statistic at rank ceil(q*N/100)
    from per-value counts (the certificate witness)."""
    per_val = vals.groupBy("x").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_val.withColumn("cum", F.sum("cnt").over(w))
    qs = cum.sparkSession.createDataFrame([(q,) for q in HDR_QS], "q int")
    return (
        cum.crossJoin(F.broadcast(n_frame))
        .crossJoin(F.broadcast(qs))
        .filter(F.col("cum") * 100 >= F.col("q") * F.col("n_docs"))
        .groupBy("q")
        .agg(F.min("x").alias("exact_tok"))
    )


def text_length_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count quantiles from the HDR sketch, with the exact order
    statistic, the relative-error certificate, and the merge-exactness
    certificate — one hash-checked row per quantile.

    Runs the addition-merge algebra in-plan on the incremental
    convention (history = doc_id % 10 != 0, delta = % 10 == 0): the
    quantiles are extracted from merge(hist(h), hist(d)) while the
    merge certificate compares it bucket-by-bucket against a
    from-scratch hist(h ∪ d) — a single mis-merged bucket flips
    ``merge_identical`` (and usually an estimate)."""
    docs = load_table(spark, sf_dir, "documents")
    vals = scoped_cache(_doc_token_counts(docs))
    full = hdr_rows(vals)
    merged = merge_hdr(
        hdr_rows(_doc_token_counts(docs.filter(F.col("doc_id") % 10 != 0))),
        hdr_rows(_doc_token_counts(docs.filter(F.col("doc_id") % 10 == 0))),
    )
    n_frame = vals.agg(F.count(F.lit(1)).alias("n_docs"))
    mism = (
        full.withColumnRenamed("cnt", "cnt_full")
        .join(merged.withColumnRenamed("cnt", "cnt_m"), ["bucket", "lo"], "full")
        .agg(
            F.sum(
                F.when(
                    F.coalesce("cnt_full", F.lit(-1))
                    != F.coalesce("cnt_m", F.lit(-2)),
                    1,
                ).otherwise(0)
            ).alias("n_mismatch"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )
    est = _hdr_quantile_picks(merged, n_frame)
    exact = _exact_quantiles(vals, n_frame)
    return (
        est.join(exact, "q")
        .crossJoin(F.broadcast(mism))
        .crossJoin(F.broadcast(n_frame))
        .select(
            "q",
            "est_tok",
            "exact_tok",
            # est = lo(bucket(exact)) <= exact < est + octave/M + 1
            (
                (F.col("est_tok") <= F.col("exact_tok"))
                & (
                    (F.col("exact_tok") - F.col("est_tok")) * F.lit(HDR_M)
                    <= F.col("exact_tok")
                )
            ).alias("within_bound"),
            (F.col("n_mismatch") == 0).alias("merge_identical"),
            "n_buckets",
            "n_docs",
        )
        .orderBy("q")
    )


def extend_hdr_index(docs: DataFrame, path: str, tag: str) -> None:
    """Append ``docs``' histogram partials as the (overwrite-idempotent)
    ``delta=<tag>`` partition of a persisted HDR index."""
    import os

    hdr_rows(_doc_token_counts(docs)).write.mode("overwrite").parquet(
        os.path.join(path, f"delta={tag}")
    )


def read_hdr_index(spark: SparkSession, path: str) -> DataFrame | None:
    """The merged histogram across all visible tags (None if empty)."""
    from . import lsm

    raw = lsm.read_visible(spark, path)
    if raw is None:
        return None
    return merge_hdr(raw)


def compact_hdr_index(spark: SparkSession, path: str) -> None:
    """Fold visible tags into one base version — addition over tags IS
    the merge (crash-safe versioned commit, single-compactor lock)."""
    from . import lsm

    lsm.compact(
        spark,
        path,
        {
            "": lambda df: df.groupBy("bucket", "lo").agg(
                F.sum("cnt").alias("cnt")
            )
        },
    )


def _hdr_hist_sql(name: str, where: str) -> str:
    sub = (
        f"CASE WHEN e >= 5 THEN (x - p) // (p // {HDR_M})"
        f" ELSE ((x - p) * {HDR_M}) // p END"
    )
    return f"""{name} AS (
  SELECT bucket, lo, COUNT(*) AS cnt FROM (
    SELECT CASE WHEN e = 0 THEN 0
                ELSE e * {HDR_M} + CAST({sub} AS INT)
           END AS bucket,
           CASE WHEN e = 0 THEN 0
                WHEN e >= 5 THEN p + ({sub}) * (p // {HDR_M})
                ELSE p + (({sub}) * p) // {HDR_M}
           END AS lo
    FROM (
      SELECT x, e,
             CASE WHEN e = 0 THEN 0
                  ELSE (CAST(1 AS BIGINT) << (e - 1)) END AS p
      FROM (
        SELECT x, CASE WHEN x <= 0 THEN 0
                       ELSE length(bin(x)) END AS e
        FROM vals {where}
      )
    )
  ) GROUP BY bucket, lo
)"""


HDR_QUANTILES_ORACLE = f"""
WITH vals AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS x
  FROM documents
),
{_hdr_hist_sql("hfull", "")},
{_hdr_hist_sql("hh", "WHERE doc_id % 10 != 0")},
{_hdr_hist_sql("hd", "WHERE doc_id % 10 = 0")},
hm AS (
  SELECT bucket, lo, SUM(cnt) AS cnt
  FROM (SELECT * FROM hh UNION ALL SELECT * FROM hd)
  GROUP BY bucket, lo
),
mism AS (
  SELECT SUM(CASE WHEN COALESCE(f.cnt, -1) != COALESCE(m.cnt, -2)
             THEN 1 ELSE 0 END) AS n_mismatch,
         COUNT(*) AS n_buckets
  FROM hfull f FULL OUTER JOIN hm m USING (bucket, lo)
),
n AS (SELECT COUNT(*) AS n_docs FROM vals),
qs AS (SELECT UNNEST({list(HDR_QS)}) AS q),
cum AS (
  SELECT bucket, lo,
         SUM(cnt) OVER (ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hm
),
est AS (
  SELECT q, MIN(lo) AS est_tok
  FROM cum CROSS JOIN n CROSS JOIN qs
  WHERE cum * 100 >= q * n_docs GROUP BY q
),
vcum AS (
  SELECT x, SUM(cnt) OVER (ORDER BY x
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM (SELECT x, COUNT(*) AS cnt FROM vals GROUP BY x)
),
exact AS (
  SELECT q, MIN(x) AS exact_tok
  FROM vcum CROSS JOIN n CROSS JOIN qs
  WHERE cum * 100 >= q * n_docs GROUP BY q
)
SELECT q, est_tok, exact_tok,
       (est_tok <= exact_tok
        AND (exact_tok - est_tok) * {HDR_M} <= exact_tok) AS within_bound,
       n_mismatch = 0 AS merge_identical,
       CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(n_docs AS BIGINT) AS n_docs
FROM est JOIN exact USING (q) CROSS JOIN mism CROSS JOIN n
ORDER BY q
"""


# --- KMV distinct-value sketch: cross-corpus overlap (5th algebra) ----------
#
# CMS merges by ADDITION, Bloom by OR, HLL by register-MAX, HDR by
# bucket-count addition; the k-minimum-values sketch (Beyer et al.,
# SIGMOD 2007, "On Synopses for Distinct Value Estimation") completes
# the set with the ORDER-STATISTIC merge: keep the K smallest distinct
# hash values of a set, and kmv(A ∪ B) == K-smallest(kmv(A) ∪ kmv(B))
# EXACTLY — certified in-plan below. Unlike HLL, a KMV sketch supports
# INTERSECTION: every member of the union sketch L that belongs to both
# A and B is necessarily in both per-slice sketches (A ⊆ U implies A's
# kth min ≥ U's kth min), so ĵ = |{v ∈ L : v ∈ A ∧ v ∈ B}| / K is an
# unbiased Jaccard estimator and |A ∩ B| ≈ ĵ · (K-1)/L_(K) — the
# standard answer to "how much do two corpus snapshots overlap?"
# WITHOUT joining them.
#
# 100 TB shape: the sketch build is SHUFFLE-FREE — one corpus scan with
# a per-partition top-``KMV_BUDGET`` (Spark's TakeOrderedAndProject:
# each task keeps a bounded heap; only ≤ BUDGET rows per partition ever
# leave the scan), then all three sketches, both estimators, and every
# certificate derive from that one ≤ BUDGET-row frame. The exact
# distinct counts are the CERTIFICATE WITNESS (one content-keyed
# aggregate, the same exact-twin cost ``text_distinct_hll`` pays for
# ``n_exact``) — production callers at scale read only the estimates.
#
# Determinism: the hash is the first 15 hex digits of md5(text) parsed
# as a 60-bit integer (exact in both engines); the TakeOrdered boundary
# is made set-exact by trimming the budget to h < max(h in budget)
# (every row of a surviving hash value sorts before the cut, so no
# hash's slice-membership flags are truncated); the estimator numerator
# (K-1)·2^60 is evaluated once in PYTHON and embedded as the same
# double literal in both engines (the HLL_ALPHA_M2 precedent).

KMV_K = 128
#: TakeOrdered budget: 4x the sketch size so each slice (1/2 and 2/3 of
#: the union by construction) still yields >= K distinct values among
#: the kept rows — certified by ok_budget, never assumed.
KMV_BUDGET = 4 * KMV_K
#: (K-1) * 2^60, the unbiased estimator numerator over the 60-bit hash
#: range — ONE Python-evaluated double literal shared by both engines.
KMV_NUM = float((KMV_K - 1) * (1 << 60))
#: 3 standard errors of the (K-1)/h_(K) estimator: CV ~ 1/sqrt(K-2).
KMV_ERR_PCT = 27  # ceil(300 / sqrt(126))
#: Jaccard gate: |ĵ - J| <= 3 * sqrt(J(1-J)/K) (binomial 3-sigma).
KMV_J_SIGMA = 3.0

#: The demo slices: two overlapping corpus snapshots drawn from the
#: shared documents table (A = doc_id % 3 != 0, B = doc_id % 2 != 0 —
#: the repo's % split convention), giving a content-space Jaccard of
#: ~0.4 so every estimator column is non-vacuous.
_KMV_IN_A = "doc_id % 3 != 0"
_KMV_IN_B = "doc_id % 2 != 0"


def _kmv_hash(col: Column) -> Column:
    """60-bit integer hash: first 15 hex digits of md5, exact in both
    engines (DuckDB twin: ``('0x' || substr(md5(x), 1, 15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def kmv_kept(docs: DataFrame) -> DataFrame:
    """The trimmed KMV candidate frame: (h, in_a, in_b), one row per
    distinct hash among the budget's smallest values, with per-CONTENT
    slice flags (a text present in both slices via different docs keeps
    both flags).

    Build: one shuffle-free TakeOrdered of the (h, doc_id) stream, then
    the boundary trim (keep h strictly below the budget's max h, unless
    the budget held the whole corpus) so no hash's flag rows are cut
    mid-group, then a <= BUDGET-row flag-OR group.
    """
    rows = docs.select(
        "doc_id",
        _kmv_hash(F.col("text")).alias("h"),
        F.expr(_KMV_IN_A).alias("in_a"),
        F.expr(_KMV_IN_B).alias("in_b"),
    ).filter(F.col("in_a") | F.col("in_b"))
    budget = (
        rows.orderBy("h", "doc_id")
        .limit(KMV_BUDGET)
        .localCheckpoint(eager=True)
    )
    hx = budget.agg(
        F.max("h").alias("hmax"), F.count(F.lit(1)).alias("n_rows")
    )
    return (
        budget.crossJoin(F.broadcast(hx))
        .filter((F.col("h") < F.col("hmax")) | (F.col("n_rows") < KMV_BUDGET))
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )


def merge_kmv(*sketches: DataFrame) -> DataFrame:
    """K-smallest of the distinct union — kmv(A) ⊕ kmv(B) ≡ kmv(A ∪ B)
    exactly (any of the K smallest of A ∪ B is among the K smallest of
    whichever set contains it)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    w = Window.orderBy("h")
    return (
        out.distinct()
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= KMV_K)
        .select("h")
    )


def corpus_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus overlap estimation via KMV sketches, with the exact
    witness, the merge-exactness certificate, and per-estimator error
    bounds in one hash-checked row.

    Estimates |A|, |B|, |A ∪ B|, Jaccard(A, B), and |A ∩ B| for two
    overlapping corpus slices in CONTENT space (distinct md5(text)),
    touching only the one TakeOrdered frame — the "how much does this
    snapshot overlap that one" question a 100 TB curation tier must
    answer without shuffling either corpus. The merge certificate
    re-derives the union sketch as K-smallest(kmv(A) ∪ kmv(B)) and
    pins set equality against the directly-built union sketch; the
    ORACLE re-derives everything independently in SQL, so the
    cross-engine hash match proves the algebra, not the plumbing.
    """
    docs = load_table_spread(spark, sf_dir, "documents")
    kept = kmv_kept(docs).localCheckpoint(eager=True)
    wh = Window.orderBy("h")
    lu = kept.withColumn("r", F.row_number().over(wh))
    sa = kept.filter("in_a").withColumn("r", F.row_number().over(wh))
    sb = kept.filter("in_b").withColumn("r", F.row_number().over(wh))
    counts = kept.agg(
        F.count(F.lit(1)).alias("n_u"),
        F.sum(F.col("in_a").cast("long")).alias("n_a"),
        F.sum(F.col("in_b").cast("long")).alias("n_b"),
    )
    kth = (
        lu.filter(F.col("r") == KMV_K)
        .select(F.col("h").alias("kth_u"))
        .crossJoin(sa.filter(F.col("r") == KMV_K).select(F.col("h").alias("kth_a")))
        .crossJoin(sb.filter(F.col("r") == KMV_K).select(F.col("h").alias("kth_b")))
    )
    l_k = lu.filter(F.col("r") <= KMV_K)
    kint = l_k.agg(
        F.sum((F.col("in_a") & F.col("in_b")).cast("long")).alias("k_int")
    )
    merged = merge_kmv(
        sa.filter(F.col("r") <= KMV_K).select("h"),
        sb.filter(F.col("r") <= KMV_K).select("h"),
    )
    mism = (
        l_k.select("h", F.lit(1).alias("_l"))
        .join(merged.select("h", F.lit(1).alias("_m")), "h", "full_outer")
        .agg(
            F.sum(
                (F.col("_l").isNull() | F.col("_m").isNull()).cast("long")
            ).alias("n_mismatch")
        )
    )
    contents = (
        docs.select(
            F.md5("text").alias("ck"),
            F.expr(_KMV_IN_A).alias("in_a"),
            F.expr(_KMV_IN_B).alias("in_b"),
        )
        .filter(F.col("in_a") | F.col("in_b"))
        .groupBy("ck")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    exact = contents.agg(
        F.count(F.lit(1)).alias("ex_u"),
        F.sum(F.col("in_a").cast("long")).alias("ex_a"),
        F.sum(F.col("in_b").cast("long")).alias("ex_b"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long")).alias("ex_i"),
    )
    row = (
        exact.crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(kth))
        .crossJoin(F.broadcast(kint))
        .crossJoin(F.broadcast(mism))
    )
    est_u = F.round(F.lit(KMV_NUM) / F.col("kth_u"), 4)
    est_a = F.round(F.lit(KMV_NUM) / F.col("kth_a"), 4)
    est_b = F.round(F.lit(KMV_NUM) / F.col("kth_b"), 4)
    j_raw = F.col("k_int") / F.lit(float(KMV_K))  # /2^7: exact double
    j_exact_raw = F.col("ex_i").cast("double") / F.col("ex_u")
    ok_err = (
        (F.abs(est_u - F.col("ex_u")) * 100 <= F.lit(KMV_ERR_PCT) * F.col("ex_u"))
        & (F.abs(est_a - F.col("ex_a")) * 100 <= F.lit(KMV_ERR_PCT) * F.col("ex_a"))
        & (F.abs(est_b - F.col("ex_b")) * 100 <= F.lit(KMV_ERR_PCT) * F.col("ex_b"))
    )
    ok_j = F.abs(F.round(j_raw, 4) - j_exact_raw) <= F.lit(KMV_J_SIGMA) * F.sqrt(
        j_exact_raw * (1.0 - j_exact_raw) / F.lit(float(KMV_K))
    )
    return row.select(
        F.col("ex_u").alias("exact_union"),
        F.col("ex_a").alias("exact_a"),
        F.col("ex_b").alias("exact_b"),
        F.col("ex_i").alias("exact_inter"),
        F.round(j_exact_raw, 4).alias("jaccard_exact"),
        est_u.alias("est_union"),
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        F.col("k_int").alias("k_intersect"),
        F.round(j_raw, 4).alias("jaccard_est"),
        F.round(j_raw * est_u, 4).alias("est_inter"),
        (
            (F.col("n_u") >= KMV_K)
            & (F.col("n_a") >= KMV_K)
            & (F.col("n_b") >= KMV_K)
        ).alias("ok_budget"),
        (F.col("n_mismatch") == 0).alias("ok_merge_exact"),
        ok_err.alias("ok_err_card"),
        ok_j.alias("ok_err_jaccard"),
    )


def kmv_sketch_rows(docs: DataFrame) -> DataFrame:
    """(h,): the KMV state for ``docs`` — the K smallest distinct
    content hashes. Per-partition top-K via TakeOrdered after a
    map-side-combined distinct."""
    return (
        docs.select(_kmv_hash(F.col("text")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
    )


def kmv_estimate(sketch: DataFrame) -> DataFrame:
    """1-row (est, kth_h, n_vals) distinct-cardinality estimate from a
    KMV state: (K-1)·2^60 / h_(K), or the exact n_vals when the state
    holds fewer than K values (the sketch IS the set then)."""
    w = Window.orderBy("h")
    ranked = sketch.withColumn("r", F.row_number().over(w))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_vals"),
        F.max(F.when(F.col("r") == KMV_K, F.col("h"))).alias("kth_h"),
    )
    est = F.when(
        F.col("n_vals") < KMV_K, F.col("n_vals").cast("double")
    ).otherwise(F.round(F.lit(KMV_NUM) / F.col("kth_h"), 4))
    return agg.select(est.alias("est"), "kth_h", "n_vals")


def extend_kmv_index(docs: DataFrame, path: str, tag: str) -> None:
    """Append ``docs``' KMV state as the (overwrite-idempotent)
    ``delta=<tag>`` partition of a persisted KMV index — O(delta) work,
    history partitions never rewritten (the shared LSM contract)."""
    import os

    kmv_sketch_rows(docs).write.mode("overwrite").parquet(
        os.path.join(path, f"delta={tag}")
    )


def read_kmv_index(spark: SparkSession, path: str) -> DataFrame | None:
    """The k-smallest-merged KMV state across all visible delta tags
    (None if the index does not exist yet). merge == rebuild exactly:
    kmv(∪ tags) is the K smallest of the union of per-tag sketches."""
    from . import lsm

    raw = lsm.read_visible(spark, path)
    if raw is None:
        return None
    return merge_kmv(raw.select("h"))


def compact_kmv_index(spark: SparkSession, path: str) -> None:
    """Fold every visible delta tag into one base version — k-smallest
    over tags IS the merge, so the compacted index estimates
    identically while the per-read input drops back to <= KMV_K rows."""
    from . import lsm

    w = Window.orderBy("h")
    lsm.compact(
        spark,
        path,
        {
            "": lambda df: (
                df.select("h")
                .distinct()
                .withColumn("r", F.row_number().over(w))
                .filter(F.col("r") <= KMV_K)
                .select("h")
            )
        },
    )


OVERLAP_KMV_ORACLE = f"""
WITH rows_ AS (
  SELECT doc_id,
         ('0x' || substr(md5(text), 1, 15))::BIGINT AS h,
         {_KMV_IN_A} AS in_a,
         {_KMV_IN_B} AS in_b
  FROM documents
  WHERE ({_KMV_IN_A}) OR ({_KMV_IN_B})
),
budget AS (SELECT * FROM rows_ ORDER BY h, doc_id LIMIT {KMV_BUDGET}),
hx AS (SELECT MAX(h) AS hmax, COUNT(*) AS n_rows FROM budget),
kept AS (
  SELECT h, BOOL_OR(in_a) AS in_a, BOOL_OR(in_b) AS in_b
  FROM budget, hx
  WHERE h < hmax OR n_rows < {KMV_BUDGET}
  GROUP BY h
),
lu AS (SELECT h, in_a, in_b, ROW_NUMBER() OVER (ORDER BY h) AS r FROM kept),
sa AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r FROM kept WHERE in_a),
sb AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r FROM kept WHERE in_b),
counts AS (
  SELECT COUNT(*) AS n_u,
         COUNT(*) FILTER (WHERE in_a) AS n_a,
         COUNT(*) FILTER (WHERE in_b) AS n_b
  FROM kept
),
kth AS (
  SELECT (SELECT h FROM lu WHERE r = {KMV_K}) AS kth_u,
         (SELECT h FROM sa WHERE r = {KMV_K}) AS kth_a,
         (SELECT h FROM sb WHERE r = {KMV_K}) AS kth_b
),
l_k AS (SELECT h, in_a, in_b FROM lu WHERE r <= {KMV_K}),
kint AS (SELECT COUNT(*) FILTER (WHERE in_a AND in_b) AS k_int FROM l_k),
merged AS (
  SELECT h FROM (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r
    FROM (SELECT h FROM sa WHERE r <= {KMV_K}
          UNION SELECT h FROM sb WHERE r <= {KMV_K})
  ) WHERE r <= {KMV_K}
),
mism AS (
  SELECT COUNT(*) FILTER (WHERE l_k.h IS NULL OR merged.h IS NULL)
           AS n_mismatch
  FROM l_k FULL OUTER JOIN merged ON l_k.h = merged.h
),
contents AS (
  SELECT md5(text) AS ck,
         BOOL_OR({_KMV_IN_A}) AS in_a,
         BOOL_OR({_KMV_IN_B}) AS in_b
  FROM documents
  WHERE ({_KMV_IN_A}) OR ({_KMV_IN_B})
  GROUP BY ck
),
exact AS (
  SELECT COUNT(*) AS ex_u,
         COUNT(*) FILTER (WHERE in_a) AS ex_a,
         COUNT(*) FILTER (WHERE in_b) AS ex_b,
         COUNT(*) FILTER (WHERE in_a AND in_b) AS ex_i
  FROM contents
)
SELECT CAST(ex_u AS BIGINT) AS exact_union,
       CAST(ex_a AS BIGINT) AS exact_a,
       CAST(ex_b AS BIGINT) AS exact_b,
       CAST(ex_i AS BIGINT) AS exact_inter,
       ROUND(ex_i::DOUBLE / ex_u, 4) AS jaccard_exact,
       ROUND(CAST({KMV_NUM!r} AS DOUBLE) / kth_u, 4) AS est_union,
       ROUND(CAST({KMV_NUM!r} AS DOUBLE) / kth_a, 4) AS est_a,
       ROUND(CAST({KMV_NUM!r} AS DOUBLE) / kth_b, 4) AS est_b,
       CAST(k_int AS BIGINT) AS k_intersect,
       ROUND(k_int / {KMV_K}.0, 4) AS jaccard_est,
       ROUND((k_int / {KMV_K}.0)
             * ROUND(CAST({KMV_NUM!r} AS DOUBLE) / kth_u, 4), 4) AS est_inter,
       (n_u >= {KMV_K} AND n_a >= {KMV_K} AND n_b >= {KMV_K}) AS ok_budget,
       n_mismatch = 0 AS ok_merge_exact,
       (ABS(ROUND(CAST({KMV_NUM!r} AS DOUBLE) / kth_u, 4) - ex_u) * 100
          <= {KMV_ERR_PCT} * ex_u
        AND ABS(ROUND(CAST({KMV_NUM!r} AS DOUBLE) / kth_a, 4) - ex_a) * 100
          <= {KMV_ERR_PCT} * ex_a
        AND ABS(ROUND(CAST({KMV_NUM!r} AS DOUBLE) / kth_b, 4) - ex_b) * 100
          <= {KMV_ERR_PCT} * ex_b) AS ok_err_card,
       ABS(ROUND(k_int / {KMV_K}.0, 4) - ex_i::DOUBLE / ex_u)
         <= {KMV_J_SIGMA!r} * sqrt((ex_i::DOUBLE / ex_u)
              * (1.0 - ex_i::DOUBLE / ex_u) / {float(KMV_K)!r}) AS ok_err_jaccard
FROM counts, kth, kint, mism, exact
"""


QUERIES = [
    Query(
        "text_heavy_hitters_cms",
        "count-min sketch heavy-hitter 3-grams with guarantee certificate",
        text_heavy_hitters_cms,
        HEAVY_HITTERS_CMS_ORACLE,
    ),
    Query(
        "dedup_bloom_prefilter",
        "Bloom-filter delta membership pre-filter with no-false-negative certificate",
        dedup_bloom_prefilter,
        BLOOM_PREFILTER_ORACLE,
    ),
    Query(
        "text_heavy_hitters_incremental",
        "incremental count-min: history sketch + delta sketch merged by "
        "addition, certified identical to a from-scratch rebuild",
        text_heavy_hitters_incremental,
        HEAVY_HITTERS_INCREMENTAL_ORACLE,
    ),
    Query(
        "text_distinct_hll",
        "HyperLogLog distinct-3-gram cardinality: fixed 2^10-register "
        "state, MAX-merge certified exact against a from-scratch build, "
        "estimate within the published error bound",
        text_distinct_hll,
        DISTINCT_HLL_ORACLE,
    ),
    Query(
        "text_length_hdr_quantiles",
        "HDR-histogram quantile sketch (4th mergeable algebra: "
        "bucket-count addition; pure-integer log-linear buckets): "
        "p50/p90/p99 token counts with exact-witness, relative-error "
        "and merge-exactness certificates",
        text_length_hdr_quantiles,
        HDR_QUANTILES_ORACLE,
    ),
    Query(
        "corpus_overlap_kmv",
        "KMV distinct-value sketch (5th mergeable algebra: k-smallest "
        "order statistic): cross-corpus union/intersection/Jaccard "
        "estimation from one shuffle-free TakeOrdered frame, with "
        "exact-witness, merge-exactness and 3-sigma error certificates",
        corpus_overlap_kmv,
        OVERLAP_KMV_ORACLE,
    ),
]
