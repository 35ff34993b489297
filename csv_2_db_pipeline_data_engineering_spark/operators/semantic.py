"""Semantic (embedding-space) clustering + dedup — the SemDeDup family.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) removes *semantic*
duplicates from web-scale corpora by k-means-clustering the embedding
space and keeping, per cluster, one representative of every group of
high-cosine neighbors — candidate pairs are only searched WITHIN a
cluster, so the pair search is keyed on the cluster id instead of an
all-pairs join.  This module implements that shape Spark-first:

- **k-means in exact integer arithmetic** (the ``embedding_pca_power``
  pattern): embeddings are quantized once (``floor(x*S + 0.5)`` — the
  identical IEEE ops on both engines), centroids live as scaled
  integers, and squared distances / dot products are integer sums whose
  value is independent of summation order.  Both engines therefore
  compute bit-identical assignments at every Lloyd iteration, which is
  what makes a *fixed-point iterative clustering algorithm* checkable
  by the DuckDB oracle gate at all.
- **Assignment is map-side**: the k centroids travel as ONE broadcast
  row (an array of (cid, vector) structs) and each vector picks
  ``array_min`` over the k integer distances — zero shuffle, no UDF,
  whole-stage codegen.  The update step is a ``posexplode`` +
  ``groupBy(cid, dim)`` partial aggregation (k*d = 512 groups), the
  textbook scalable k-means step: at 100 TB the map-side combine means
  the shuffle carries k*d partial sums per partition, never the
  vectors.
- **Dedup pairs are cluster-gated AND LSH-capped**: candidates come
  from threshold-matched sign-LSH buckets (linear hash mass) and must
  share a final cluster id, so no pair of vectors in different
  clusters is ever emitted (SemDeDup's express trade: recall bounded
  by clustering locality in exchange for work that scales) and the
  within-cluster verify never enumerates the Θ(n²/k) block pairs.
  Within-cluster cosine is verified exactly in integers:
  ``cos >= t``  ⇔  ``den²·dot² >= num²·|a|²·|b|²  ∧  dot > 0`` for
  ``t = num/den``.

The natural corpus has no high-cosine pairs (max ≈ 0.51), so the
registered dedup query plants the SAME deterministic twin vectors as
``dedup_embedding_cosine`` (``dedup._with_planted_twins``) on both
engines — the driver row value-checks ~20 recovered twin pairs instead
of vacuously agreeing on the empty set.

Reference parity note: the reference pipeline (pandas→Postgres ETL,
``main.py:41-136``) has no embedding surface at all; this family is
part of the driver-mandated LLM-data-pipeline extension (SURVEY.md
§2.11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import Query
from ..sources.tables import load_embeddings_spread, load_table
from .lifecycle import scoped_cache

#: quantization scale: |x| <= 0.56 on this corpus -> |xq| <= 560, so
#: dot products are <= 64 * 560² ≈ 2.0e7 and every comparison below
#: stays far inside int64 (worst term: 400·dot² ≈ 1.6e17 < 2⁶³).
SEM_SCALE = 1000
SEM_K = 8
SEM_ITERS = 2
#: cosine threshold as the exact rational 19/20 = 0.95
SEM_COS_NUM = 19
SEM_COS_DEN = 20
#: block-pair fan-out for the within-cluster self-join: joining on the
#: cluster id alone gives only k distinct shuffle keys (8 active tasks
#: on a 32-core box, and one hot cluster = one hot task at 100 TB).
#: Splitting each cluster into B id-derived blocks and enumerating the
#: B(B+1)/2 unordered block pairs turns the join key into
#: (cid, block_b) — k·B keys, balanced work per key — while producing
#: exactly the same pair set.
SEM_PAIR_BLOCKS = 8


def _sem_quantized(emb: DataFrame) -> DataFrame:
    """(vec_id, xq: array<long>) — embeddings quantized to scaled ints.

    ``floor(x*S + 0.5)`` instead of ``round``: the two engines disagree
    on round-half tie semantics but agree bit-for-bit on floor (the
    ``similarity._pca_xq`` precedent).
    """
    return emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * SEM_SCALE + F.lit(0.5)).cast("long"),
        ).alias("xq"),
    )


def _sem_init_centroids(q: DataFrame, k: int = SEM_K) -> DataFrame:
    """(cid, cq) — the k lowest-vec_id vectors, cid densely 0..k-1.

    Deterministic seeding (k-means++ randomness would diverge between
    engines); the single-partition window runs over exactly k rows.
    """
    ids = q.select("vec_id").orderBy("vec_id").limit(k)
    w = Window.orderBy("vec_id")
    ids = ids.select("vec_id", (F.row_number().over(w) - 1).cast("int").alias("cid"))
    return ids.join(q, "vec_id").select("cid", F.col("xq").alias("cq"))


def _sq_dist_q(a: Column, b: Column) -> Column:
    """Exact integer squared L2 distance between two long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product between two long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _sem_assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, xq, cid, dist_q): nearest centroid per vector.

    The centroid set is folded into ONE row (array of structs) and
    broadcast, so assignment is a map-side ``array_min`` over k exact
    integer distances — no shuffle, no UDF.  Ties break to the lowest
    cid via the struct's (dist, cid) lexicographic order.
    """
    cs = cents.agg(
        F.sort_array(F.collect_list(F.struct("cid", "cq"))).alias("cs")
    )
    best = F.array_min(
        F.transform(
            F.col("cs"),
            lambda c: F.struct(
                _sq_dist_q(F.col("xq"), c["cq"]).alias("dist_q"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return (
        q.crossJoin(F.broadcast(cs))
        .withColumn("best", best)
        .select("vec_id", "xq", F.col("best.cid").alias("cid"),
                F.col("best.dist_q").alias("dist_q"))
    )


def _sem_update(assigned: DataFrame) -> DataFrame:
    """New centroids: per-dimension floored mean, back in array form.

    ``floor(sum/n)`` through double division is exact here: |sum| and n
    are integers < 2⁵³, the true ratio is a rational with denominator n,
    and a correctly-rounded double quotient can only cross an integer
    boundary when the ratio IS that integer — so both engines floor to
    the same long (the contract ``tests/test_semantic.py`` pins).
    """
    per_dim = (
        assigned.select("cid", F.posexplode("xq").alias("dim", "x"))
        .groupBy("cid", "dim")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "cid", "dim",
            F.floor(F.col("s") / F.col("n")).cast("long").alias("cq_d"),
        )
    )
    return (
        per_dim.groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cq_d"))),
                lambda s: s["cq_d"],
            ).alias("cq")
        )
        # k-row iterate: eager checkpoint cuts the per-iteration replan
        # of the whole lineage below it (the PCA power-iteration pattern)
        .localCheckpoint(eager=True)
    )


def kmeans_assignments(
    emb: DataFrame, k: int = SEM_K, iters: int = SEM_ITERS
) -> DataFrame:
    """Final (vec_id, xq, cid, dist_q) after ``iters`` Lloyd rounds.

    Deterministic by construction: integer quantization + integer
    distances + floored-mean centroids, seeded from the k lowest
    vec_ids.  An empty cluster simply drops out of the centroid frame
    (both engines derive that from the same arithmetic).
    """
    q = scoped_cache(_sem_quantized(emb))
    cents = _sem_init_centroids(q, k)
    for _ in range(iters):
        cents = _sem_update(_sem_assign(q, cents))
    return _sem_assign(q, cents)


def embedding_kmeans_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered clustering query: cluster sizes + exact integer SSE
    after SEM_ITERS deterministic Lloyd iterations."""
    fin = kmeans_assignments(load_embeddings_spread(spark, sf_dir))
    return (
        fin.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("dist_q").alias("sse_q"),
        )
        .orderBy("cluster_id")
    )


def _pair_sides(
    fin: DataFrame, blocks: int = SEM_PAIR_BLOCKS
) -> tuple[DataFrame, DataFrame]:
    """The two self-join sides over a pinned assignment frame.

    The a-side fans out to every partner block >= its own (each
    unordered block pair enumerated once); the equi key becomes
    (cid, partner block) — k·B balanced keys instead of k hot ones.
    """
    a = fin.select(
        "cid", "blk", F.col("vec_id").alias("id_a"), F.col("xq").alias("xa"),
        F.col("n2").alias("na2"),
    ).withColumn("j", F.explode(F.sequence(F.col("blk"), F.lit(blocks - 1))))
    b = fin.select(
        "cid", F.col("blk").alias("j"), F.col("vec_id").alias("id_b"),
        F.col("xq").alias("xb"), F.col("n2").alias("nb2"),
    )
    return a, b


def _scored_candidate_pairs(a: DataFrame, b: DataFrame) -> DataFrame:
    """Candidate pairs with their exact integer dot, fold-free join.

    Same-block pairs order by id; cross-block pairs appear exactly once
    (i < j) and are canonicalized to (lo, hi) by the caller's output
    projection.
    """
    return (
        a.join(b, ["cid", "j"])
        .filter((F.col("blk") != F.col("j")) | (F.col("id_a") < F.col("id_b")))
        .select(
            "cid", "id_a", "id_b", "na2", "nb2",
            _dot_q("xa", "xb").alias("dot"),
        )
    )


def _verified_pairs_projection(scored: DataFrame) -> DataFrame:
    """Threshold filter + output projection over a scored-pairs frame
    carrying (cid, id_a, id_b, na2, nb2, dot).  The exact rational test
    ``den²·dot² >= num²·|a|²·|b|² ∧ dot > 0`` ⇔ cos >= num/den; the
    reported cosine is computed from the SAME integers on both engines
    (all < 2⁵³, so the doubles and the correctly-rounded sqrt / divide
    are bit-identical), rounded to 6 places."""
    return (
        scored.filter(
            (F.col("dot") > 0)
            & (
                F.lit(SEM_COS_DEN * SEM_COS_DEN) * F.col("dot") * F.col("dot")
                >= F.lit(SEM_COS_NUM * SEM_COS_NUM) * F.col("na2") * F.col("nb2")
            )
        )
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.col("cid").alias("cluster_id"),
            F.round(
                F.col("dot") / F.sqrt((F.col("na2") * F.col("nb2")).cast("double")),
                6,
            ).alias("cosine"),
        )
        .orderBy("id_a", "id_b")
    )


def semantic_dedup_pairs(
    emb: DataFrame, k: int = SEM_K, iters: int = SEM_ITERS
) -> DataFrame:
    """Within-cluster high-cosine pairs — SemDeDup with a FIXED cluster
    budget and an LSH-capped within-cluster verify (the r10-verdict
    re-scope; this is the REGISTERED form).

    Two quadratic traps bracket naive SemDeDup at scale, both measured
    in ``SCALE_PROBE_100X.json``: a fixed k makes the within-cluster
    all-pairs VERIFY Θ(n²/k), while the published k ∝ n configuration
    (constant cluster size; 11k clusters for 100M+ docs) moves the
    quadratic term into the exact ASSIGNMENT step, O(n·k) = O(n²/650) —
    DNF at 100× data (SemDeDup itself pays that term with GPU
    brute-force assignment).  This operator takes neither: k stays a
    small CONSTANT budget (assignment is O(n·k) ~ linear; the k
    centroids travel as one broadcast row) and the within-cluster pair
    search is routed through threshold-matched sign-LSH
    (``dedup.embedding_lsh_candidates`` at the 0.95 regime: 24 planes /
    64 tables via ``lsh_params_for_threshold``) instead of enumerating
    the Θ(n²/k) block pairs — candidate mass is Θ(n·L) hash rows plus a
    vanishing n²·L/2²⁴ false-bucket tail, the configuration measured
    ~linear (10.45× wall at 100× data) as ``dedup_semantic_lsh``.
    Candidates are verified with the exact integer-rational cosine AND
    must share a final cluster id, so the output keeps SemDeDup's
    express trade (recall bounded by clustering locality) and its
    cluster provenance column.

    Per-pair recall at the 0.95 threshold is the seeded-LSH contract
    ≥ 99.4% (≥ 1-1e-8 for SemDeDup-grade twins at cos ≈ 0.985);
    ``semantic_dedup_pairs_exhaustive`` keeps the exhaustive
    enumeration for the differential tests that pin it empirically.
    """
    fin = (
        kmeans_assignments(emb, k=k, iters=iters)
        .withColumn("n2", _dot_q("xq", "xq"))
        # pin the assignment: BOTH candidate-join sides read this small
        # materialized frame instead of re-running the Lloyd chain
        .localCheckpoint(eager=True)
    )
    # Score in a PROJECTION behind a checkpoint barrier: without the
    # barrier Catalyst folds the threshold filter back through the
    # project and pushes the 64-element integer fold INTO the join
    # condition, where it is evaluated up to three times per candidate
    # pair (once per comparison that mentions ``dot``).  The barrier
    # pins the plan to one fold per pair and drops the vectors before
    # anything wide; the checkpointed frame is O(candidate pairs) of
    # scalar columns.  (``_lsh_scored_pairs`` stays a separate function
    # so the plan test can assert the bucket-keyed fold-free join.)
    scored = _lsh_scored_pairs(emb, fin).localCheckpoint(eager=False)
    return _verified_pairs_projection(scored)


def _lsh_scored_pairs(emb: DataFrame, fin: DataFrame) -> DataFrame:
    """Candidate pairs from threshold-matched sign-LSH buckets, gated
    to same-cluster and scored with one exact integer dot per pair.

    A twin pair collides in ~n_tables buckets, so candidates are
    deduped BEFORE the id-keyed joins — the 64-element fold runs once
    per pair, on scalar columns only.
    """
    from .dedup import embedding_lsh_candidates, lsh_params_for_threshold

    dp, dt = lsh_params_for_threshold(SEM_COS_NUM / SEM_COS_DEN)
    cands = embedding_lsh_candidates(emb, dt, dp).distinct()
    a = fin.select(
        F.col("vec_id").alias("id_a"), F.col("cid").alias("cid"),
        F.col("xq").alias("xa"), F.col("n2").alias("na2"),
    )
    b = fin.select(
        F.col("vec_id").alias("id_b"), F.col("cid").alias("cid_b"),
        F.col("xq").alias("xb"), F.col("n2").alias("nb2"),
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("cid") == F.col("cid_b"))
        .select("cid", "id_a", "id_b", "na2", "nb2",
                _dot_q("xa", "xb").alias("dot"))
    )


def semantic_dedup_pairs_exhaustive(
    emb: DataFrame, k: int = SEM_K, iters: int = SEM_ITERS
) -> DataFrame:
    """The EXHAUSTIVE within-cluster pair enumeration (block-pair
    self-join keyed on (cid, block) — k·B balanced keys).  Recall is 1
    by construction within a cluster, but the pair mass is Θ(n²/k):
    this is the differential-test baseline the LSH-routed registered
    form is checked against, not a 100 TB path.
    (``_scored_candidate_pairs`` stays a separate function so the plan
    test can assert the fold-free join.)
    """
    blocks = SEM_PAIR_BLOCKS
    fin = (
        kmeans_assignments(emb, k=k, iters=iters)
        .withColumn("n2", _dot_q("xq", "xq"))
        .withColumn("blk", F.pmod("vec_id", F.lit(blocks)).cast("int"))
        .localCheckpoint(eager=True)
    )
    a, b = _pair_sides(fin, blocks)
    scored = _scored_candidate_pairs(a, b).localCheckpoint(eager=False)
    return _verified_pairs_projection(scored)


def dedup_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered SemDeDup query over corpus + planted deterministic
    twins (``dedup._with_planted_twins`` — the same closed form on both
    engines), so the driver row value-checks recovered twin pairs."""
    from .dedup import _with_planted_twins

    return semantic_dedup_pairs(
        _with_planted_twins(load_embeddings_spread(spark, sf_dir))
    )


def _keep_from_pairs(emb: DataFrame, pairs: DataFrame) -> DataFrame:
    """Close a (id_a, id_b) near-dup pair graph into keep decisions.

    Components by min-label propagation (``dedup.connected_components``
    — the shallow-graph iterative pattern); the component's lowest
    vec_id becomes every member's ``rep_id``; a vector is kept iff it IS
    its representative.  Singletons (no near-dup) keep themselves.
    """
    from .dedup import connected_components

    labels = connected_components(pairs, src="id_a", dst="id_b")
    rep = F.coalesce("grp_min", F.col("vec_id"))
    return (
        emb.select("vec_id")
        .join(
            labels.select(
                F.col("doc_id").alias("vec_id"),
                F.col("cluster_id").alias("grp_min"),
            ),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            rep.alias("rep_id"),
            (rep == F.col("vec_id")).alias("keep"),
        )
        .orderBy("vec_id")
    )


def semantic_keep_plan(emb: DataFrame) -> DataFrame:
    """SemDeDup's prune step: per near-dup group, keep ONE representative.

    The pair graph comes from ``semantic_dedup_pairs`` (fixed cluster
    budget + LSH-capped within-cluster search); this is the decision
    frame a curation pipeline anti-joins against the corpus — O(pairs)
    extra work on top of the candidate search.
    ``semantic_keep_plan_lsh`` is the cluster-free variant (no locality
    gate) the curation pipeline's semantic_dup gate consumes.
    """
    return _keep_from_pairs(emb, semantic_dedup_pairs(emb))


def dedup_semantic_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered SemDeDup keep/drop plan over corpus + planted twins:
    every twin group must collapse to its lowest id, everything else
    keeps itself — all 520 rows value-checked."""
    from .dedup import _with_planted_twins

    return semantic_keep_plan(
        _with_planted_twins(load_embeddings_spread(spark, sf_dir))
    )


def semantic_near_dup_lsh(
    emb: DataFrame, threshold: float = SEM_COS_NUM / SEM_COS_DEN
) -> DataFrame:
    """The semantic family's LINEAR 100 TB path: sign-LSH-routed
    near-dup pairs at the SemDeDup cosine threshold (0.95).

    Why this and not the k-means route at scale: SemDeDup's published
    configuration holds cluster size constant (k ∝ n), which keeps the
    within-cluster VERIFY linear but moves the quadratic term into the
    exact assignment step — O(n·k) = O(n²/650), measured DNF at 100x
    data (``SCALE_PROBE_100X.json``; SemDeDup itself pays that term
    with GPU brute-force assignment).  Sign-LSH routing replaces the
    clustering entirely: hashing is Θ(n · tables · planes) map-side
    work, candidates are bucket-keyed joins whose false-pair rate is
    2^-planes per table, and the threshold-matched sizing
    (``dedup.lsh_params_for_threshold``) gives the 0.95 angular gap 24
    planes / 64 tables — false-bucket mass ~n²/1.7e7, negligible at
    any realistic n, with per-pair recall ≥ 99.4% AT the threshold and
    ≥ 1-1e-8 for SemDeDup-grade twins (cos ≈ 0.985).  Measured 8.26x
    wall at 100x data — the family's ~linear scale regime.

    Output matches ``semantic_dedup_pairs``'s pair semantics (minus the
    cluster_id provenance column): every pair with cosine ≥ threshold,
    exact-verified on the original vectors.
    """
    from .dedup import embedding_near_dup_pairs

    return embedding_near_dup_pairs(emb, threshold=threshold)


def dedup_semantic_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered scale-safe semantic near-dup over corpus + planted
    twins (the ``dedup_embedding_cosine`` certificate pattern): every
    planted twin pair must be recovered through the full threshold-
    matched sign-LSH route with its exact cosine matching the all-pairs
    oracle."""
    from .dedup import _with_planted_twins

    return semantic_near_dup_lsh(
        _with_planted_twins(load_embeddings_spread(spark, sf_dir))
    )


def semantic_keep_plan_lsh(emb: DataFrame) -> DataFrame:
    """SemDeDup prune decisions over the LSH-routed pair graph — the
    keep-frame the curation pipeline's ``semantic_dup`` gate consumes
    at scale (same decision semantics as ``semantic_keep_plan``, pair
    search swapped for the linear-regime route)."""
    return _keep_from_pairs(emb, semantic_near_dup_lsh(emb))


# --- linear-probe classifier training (deterministic integer GD) ------------
#
# The quality-classifier TRAINING step of an LLM data pipeline
# (fastText-style: fit a lightweight linear scorer on embeddings +
# labels, then use it to score the corpus — the inference half already
# exists as ``boilerplate.quality_nscaled``). Trained Spark-first as
# full-batch gradient descent on the SQUARED loss in exact integer
# arithmetic (the ``embedding_kmeans_iter``/``graph_pagerank_trade``
# pattern): squared loss keeps the update polynomial — no sigmoid/exp,
# whose floating evaluation the two engines could disagree on — so
# every iterate is bit-identical and the driver can value-check a
# fixed-point ITERATIVE TRAINING LOOP, which is what makes distributed
# training oracle-checkable at all.
#
# Exactness argument: features quantize to xq = floor(x·S + 0.5)
# (|xq| <= 560 on this corpus), weights live as integers at scale
# SW = 1e5, so scores P = Σ wq·xq and errors e = P - y·SW·S are exact
# int64 (measured |e| <= 1.9e8, |g| <= 7.5e11 over the run — far under
# 2^53, so the engine-portable floor division below is exact). The
# gradient step wq -= floor_div(g, PROBE_LR_DIV) uses pmod-based floor
# division because Spark's `div` truncates toward zero while DuckDB's
# `//` floors — they disagree on negative gradients otherwise.

PROBE_WSCALE = 100_000
PROBE_LR_DIV = 20_000_000  # eta ~ 1/20 against the summed gradient
PROBE_ITERS = 3
PROBE_POS_LABELS = 5  # label < 5 -> +1, else -1


def _floor_div(col: Column, d: int) -> Column:
    """Exact floor division for possibly-negative int64 columns.

    ``col - pmod(col, d)`` is the largest multiple of ``d`` <= col;
    dividing an exact multiple is exact in double for |col| < 2^53
    (the ``_sem_update`` argument)."""
    return ((col - F.pmod(col, F.lit(d))) / F.lit(d)).cast("long")


def _probe_quantized(emb: DataFrame) -> DataFrame:
    """(vec_id, xq, y): quantized features + the binary target."""
    return emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * SEM_SCALE + F.lit(0.5)).cast("long"),
        ).alias("xq"),
        F.when(F.col("label") < PROBE_POS_LABELS, 1)
        .otherwise(-1)
        .cast("long")
        .alias("y"),
    )


def _probe_zero_weights(q: DataFrame) -> DataFrame:
    """Zero weight vector derived in-plan (no driver-side dim probe)."""
    return (
        q.limit(1)
        .select(F.transform("xq", lambda _: F.lit(0).cast("long")).alias("wq"))
        .localCheckpoint(eager=True)
    )


def _probe_scored(q: DataFrame, w: DataFrame) -> DataFrame:
    """(vec_id, xq, y, p, e): broadcast map-side scoring of the corpus
    against the 1-row weight frame — zero shuffle."""
    return (
        q.crossJoin(F.broadcast(w))
        .select(
            "vec_id", "xq", "y",
            _dot_q(F.col("xq"), F.col("wq")).alias("p"),
        )
        .withColumn(
            "e", F.col("p") - F.col("y") * F.lit(PROBE_WSCALE * SEM_SCALE)
        )
    )


def _probe_updated_weights(scored: DataFrame, w: DataFrame) -> DataFrame:
    """One GD step: posexplode + groupBy(dim) partial-aggregated
    gradient (d = 64 groups — the shuffle carries d partial sums per
    partition, never the vectors), folded into a new eagerly
    checkpointed weight frame (the k-means centroid pattern: lineage
    stays one iteration deep)."""
    g = (
        scored.select("e", F.posexplode("xq").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.sum(F.col("e") * F.col("x")).alias("g"))
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "g"))),
                lambda s: s["g"],
            ).alias("garr")
        )
    )
    return (
        w.crossJoin(F.broadcast(g))
        .select(
            F.zip_with(
                "wq", "garr", lambda wv, gv: wv - _floor_div(gv, PROBE_LR_DIV)
            ).alias("wq")
        )
        .localCheckpoint(eager=True)
    )


def trained_probe_weights(emb: DataFrame, iters: int = PROBE_ITERS) -> DataFrame:
    """The 1-row weight frame after ``iters`` GD steps — the artifact
    the SERVING side broadcasts."""
    q = scoped_cache(_probe_quantized(emb))
    w = _probe_zero_weights(q)
    for _ in range(iters):
        w = _probe_updated_weights(_probe_scored(q, w), w)
    return w


def embedding_probe_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered SERVING twin of the trainer: score every embedding
    with the trained weights (one broadcast map-side dot product — the
    shape a 100 TB corpus scoring pass takes) and emit the confusion
    counts per (true label, predicted label). Every cell depends on
    every trained weight, so the 4-row result value-checks the whole
    train-then-serve path."""
    emb = load_embeddings_spread(spark, sf_dir)
    w = trained_probe_weights(emb)
    q = _probe_quantized(emb)
    pred = F.when(
        _dot_q(F.col("xq"), F.col("wq")) > 0, 1
    ).otherwise(-1).cast("long")
    return (
        q.crossJoin(F.broadcast(w))
        .select("y", pred.alias("pred"))
        .groupBy("y", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("y", "pred")
    )


def linear_probe_metrics(emb: DataFrame, iters: int = PROBE_ITERS) -> DataFrame:
    """(iter, sse_q, n_correct) per GD iteration: the training curve.

    Per step: scores are a map-side broadcast dot product (the weight
    vector travels as ONE row — zero shuffle), the gradient is a
    ``posexplode`` + ``groupBy(dim)`` partial aggregation (d = 64
    groups — the map-side combine means the shuffle carries d partial
    sums per partition, never the vectors), and the new weight frame
    is eagerly checkpointed (the k-means centroid pattern) so the
    lineage stays one-iteration deep. SSE strictly decreasing across
    rows is the convergence certificate; a single wrong weight in any
    iteration shifts every later row.
    """
    q = scoped_cache(_probe_quantized(emb))
    w = _probe_zero_weights(q)
    metrics = []
    for t in range(iters + 1):
        scored = _probe_scored(q, w)
        pred = F.when(F.col("p") > 0, 1).otherwise(-1)
        metrics.append(
            scored.agg(
                F.lit(t).alias("iter"),
                F.sum(_floor_div(F.col("e") * F.col("e"), 1_000_000)).alias(
                    "sse_q"
                ),
                F.sum(
                    F.when(pred == F.col("y"), 1).otherwise(0)
                ).alias("n_correct"),
            )
        )
        if t == iters:
            break
        w = _probe_updated_weights(scored, w)
    out = metrics[0]
    for m in metrics[1:]:
        out = out.unionByName(m)
    return out.orderBy("iter")


def embedding_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered trainer query: the per-iteration training curve of
    the integer linear probe on the embeddings + labels table."""
    return linear_probe_metrics(load_embeddings_spread(spark, sf_dir))


def _linear_probe_sql(iters: int = PROBE_ITERS) -> str:
    """The identical GD loop unrolled as chained CTEs (the
    ``_kmeans_sql`` long form); every SUM casts back to BIGINT."""
    d = PROBE_LR_DIV
    target = PROBE_WSCALE * SEM_SCALE
    ctes = [
        "base AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)",
        "ql AS (SELECT vec_id, unnest(range(len(v))) AS dim,"
        f" unnest(list_transform(v, x -> CAST(floor(x * {SEM_SCALE} + 0.5)"
        " AS BIGINT))) AS xq FROM base)",
        f"yy AS (SELECT vec_id, CAST(CASE WHEN label < {PROBE_POS_LABELS}"
        " THEN 1 ELSE -1 END AS BIGINT) AS y FROM base)",
        "w0 AS (SELECT DISTINCT dim, CAST(0 AS BIGINT) AS wq FROM ql)",
    ]
    for t in range(iters + 1):
        ctes += [
            f"p{t} AS (SELECT q.vec_id, CAST(SUM(q.xq * w.wq) AS BIGINT) AS p"
            f" FROM ql q JOIN w{t} w USING (dim) GROUP BY q.vec_id)",
            f"e{t} AS (SELECT p.vec_id, p.p, y.y,"
            f" p.p - y.y * {target} AS e"
            f" FROM p{t} p JOIN yy y USING (vec_id))",
            f"m{t} AS (SELECT {t} AS iter,"
            f" CAST(SUM((e * e) // 1000000) AS BIGINT) AS sse_q,"
            f" CAST(SUM(CASE WHEN (CASE WHEN p > 0 THEN 1 ELSE -1 END) = y"
            f" THEN 1 ELSE 0 END) AS BIGINT) AS n_correct FROM e{t})",
        ]
        if t == iters:
            break
        ctes += [
            f"g{t} AS (SELECT q.dim, CAST(SUM(e.e * q.xq) AS BIGINT) AS g"
            f" FROM ql q JOIN e{t} e USING (vec_id) GROUP BY q.dim)",
            # pmod-based floor division (matches Spark's _floor_div)
            f"w{t + 1} AS (SELECT w.dim,"
            f" w.wq - (g.g - ((g.g % {d}) + {d}) % {d}) // {d} AS wq"
            f" FROM w{t} w JOIN g{t} g USING (dim))",
        ]
    union = "\nUNION ALL\n".join(f"SELECT * FROM m{t}" for t in range(iters + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + union + "\nORDER BY iter"


LINEAR_PROBE_ORACLE = _linear_probe_sql()


def _probe_confusion_sql(iters: int = PROBE_ITERS) -> str:
    """The trainer's unrolled chain up to ``w{iters}``, then one
    scoring pass: confusion counts per (y, pred)."""
    chain = _linear_probe_sql(iters)
    # keep the CTE chain, swap the final metrics union for the scoring
    # select (the chain defines p{iters}/e{iters} over the FINAL w)
    head = chain.split("\nSELECT * FROM m0")[0]
    return (
        head
        + f"""
SELECT e.y AS y,
       CAST(CASE WHEN e.p > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred,
       COUNT(*) AS n
FROM e{iters} e
GROUP BY 1, 2
ORDER BY y, pred"""
    )


PROBE_CONFUSION_ORACLE = _probe_confusion_sql()


# --- persisted embedding index: the streaming SemDeDup twin -----------------
#
# The incremental convention of the span/line/signature indexes applied
# to embeddings: each fold persists its KEPT docs' vectors plus their
# sign-LSH bucket rows as a new ``delta=<tag>`` partition (O(delta)
# write, history partitions never rewritten; same-tag replay overwrites
# idempotently), and an arriving batch probes history through the
# bucket rows — history vectors are hashed ONCE, at their own fold
# time, so per-fold hash work is O(batch), and the candidate join is
# keyed on (table, bucket), never all-pairs.


def emb_bucket_rows(
    emb: DataFrame,
    threshold: float = SEM_COS_NUM / SEM_COS_DEN,
    seed: int = 42,
) -> DataFrame:
    """(vec_id, t, bucket) sign-LSH rows at the threshold-matched
    sizing (``dedup.lsh_params_for_threshold`` — 24 planes / 64 tables
    at the SemDeDup 0.95 regime)."""
    from .dedup import lsh_params_for_threshold
    from .similarity import _table_buckets_seeded

    planes, tables = lsh_params_for_threshold(threshold)
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return _table_buckets_seeded(v, tables, planes, seed).select(
        "vec_id", "t", "bucket"
    )


def write_emb_index(
    emb: DataFrame,
    path: str,
    tag: str = "base",
    threshold: float = SEM_COS_NUM / SEM_COS_DEN,
) -> None:
    """Persist an embedding frame's index under ``<path>/{buckets,vecs}/
    delta=<tag>/``: the bucket rows the candidate join probes, and the
    raw vectors the exact-cosine verify reads back.

    ``threshold`` fixes the sign-LSH family the bucket rows are hashed
    with; every extend AND every probe (``semantic_cross_losers``) of
    one index must use the SAME threshold — mismatched plane counts
    would make the bucket join meaningless.
    """
    import os

    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    emb_bucket_rows(e, threshold).write.mode("overwrite").parquet(
        os.path.join(path, "buckets", f"delta={tag}")
    )
    e.write.mode("overwrite").parquet(os.path.join(path, "vecs", f"delta={tag}"))


def extend_emb_index(
    delta_emb: DataFrame,
    path: str,
    tag: str,
    threshold: float = SEM_COS_NUM / SEM_COS_DEN,
) -> None:
    """Fold a delta's kept embeddings INTO the persisted index: O(delta)."""
    write_emb_index(delta_emb, path, tag, threshold)


def read_emb_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame] | None:
    """(bucket rows, vectors) across all visible delta partitions (the
    ``lsm`` versioned view); None if the index does not exist yet."""
    from . import lsm

    buckets = lsm.read_visible(spark, path, "buckets")
    vecs = lsm.read_visible(spark, path, "vecs")
    if buckets is None or vecs is None:
        return None
    return buckets, vecs


def compact_emb_index(spark: SparkSession, path: str) -> None:
    """Merge every visible delta partition of both sub-tables into one
    base version — the ``lsm.compact`` crash-safe versioned commit for
    the embedding index. Rows are per-vector and immutable (bucket rows
    are a pure function of the stored vector under the seeded family),
    so compaction is a rewrite that bounds the partition count long
    streams accumulate.
    """
    from . import lsm

    lsm.compact(spark, path, {"buckets": None, "vecs": None})


def write_bucketed_emb_table(
    buckets: DataFrame, table: str, n_buckets: int = 64, path: str | None = None
) -> None:
    """Persist embedding bucket rows as a table bucketed on
    (t, bucket) — the embedding twin of
    ``spans.write_bucketed_shingle_table``: the cross-history candidate
    join's big side (history's LSH bucket rows) lives bucketed on
    exactly the join key, so each fold reads its buckets in place and
    shuffles ONLY the batch side into the bucket scheme — O(batch)
    network, zero movement of the stored rows regardless of history
    size."""
    w = buckets.write.bucketBy(n_buckets, "t", "bucket").sortBy("t", "bucket")
    if path is not None:
        w = w.option("path", path)
    w.mode("overwrite").saveAsTable(table)


def extend_bucketed_emb_table(
    buckets: DataFrame, table: str, n_buckets: int = 64
) -> None:
    """APPEND a delta's bucket rows (O(delta); the explicit
    ``refreshTable`` invalidates the session's cached file listing —
    the ``extend_banded_index_table`` lesson)."""
    buckets.write.bucketBy(n_buckets, "t", "bucket").sortBy(
        "t", "bucket"
    ).mode("append").saveAsTable(table)
    buckets.sparkSession.catalog.refreshTable(table)


def semantic_cross_losers(
    batch_emb: DataFrame,
    hist_buckets: DataFrame,
    hist_vecs: DataFrame,
    threshold: float = SEM_COS_NUM / SEM_COS_DEN,
) -> DataFrame:
    """Arriving vec_ids semantically duplicating COMMITTED history.

    History-first-seen wins (the span-index victim convention): every
    arrival with cosine ≥ threshold against any history vector drops,
    regardless of id order.  Candidates share an LSH bucket in any
    table (keyed join on (t, bucket) — history text/vectors never
    rescanned wholesale); the verify is exact cosine on the original
    vectors, so precision is exact and recall carries the seeded
    threshold-matched contract (~1e-8 miss for SemDeDup-grade twins).

    ``threshold`` must equal the threshold the index was WRITTEN with
    (``write_emb_index``): it selects the seeded hyperplane family for
    the batch side, and bucket ids from different families never
    match.
    """
    from .dedup import _dot

    d = emb_bucket_rows(batch_emb, threshold)
    cand = (
        d.alias("d")
        .join(
            hist_buckets.alias("h"),
            (F.col("d.t") == F.col("h.t"))
            & (F.col("d.bucket") == F.col("h.bucket")),
        )
        .select(
            F.col("d.vec_id").alias("doc_id"),
            F.col("h.vec_id").alias("hist_id"),
        )
        .distinct()
    )
    b = batch_emb.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("vb"),
    )
    h = hist_vecs.select(
        F.col("vec_id").alias("hist_id"),
        F.col("embedding").cast("array<double>").alias("vh"),
    )
    cos = _dot(F.col("vb"), F.col("vh")) / (
        F.sqrt(_dot(F.col("vb"), F.col("vb")))
        * F.sqrt(_dot(F.col("vh"), F.col("vh")))
    )
    return (
        cand.join(b, "doc_id")
        .join(h, "hist_id")
        .filter(cos >= threshold)
        .select("doc_id")
        .distinct()
    )


# --- DuckDB oracle ----------------------------------------------------------


def _twins_sql() -> str:
    from .dedup import PLANT_TWIN_EPS, PLANT_TWIN_ID_OFFSET, PLANT_TWIN_MOD

    return (
        f" UNION ALL SELECT vec_id + {PLANT_TWIN_ID_OFFSET} AS vec_id,"
        f" list_transform(range(0, len(v)),"
        f" j -> v[j + 1] + {PLANT_TWIN_EPS} * cos(j)) AS v FROM base"
        f" WHERE vec_id % {PLANT_TWIN_MOD} = 0"
    )


def _kmeans_sql(
    with_twins: bool, final_select: str, train_max: int | None = None
) -> str:
    """The identical iteration unrolled as chained CTEs (long form).

    Every SUM casts back to BIGINT (DuckDB widens to HUGEINT, which
    pandas would surface as float64 — the PCA dtype-drift precedent).

    ``train_max`` restricts the Lloyd TRAINING rows (seeds and update
    assignments) to ``vec_id < train_max`` — the frozen-sample model
    contract of the incremental IVF-PQ serve twin; the FINAL
    assignment (``afinal``/``d{T+1}``) always covers the whole corpus.
    ``None`` (every pre-r16 oracle) emits byte-identical SQL to the
    unparameterized form.
    """
    twins = _twins_sql() if with_twins else ""
    tw = f" WHERE q.vec_id < {train_max}" if train_max is not None else ""
    sw = f" WHERE vec_id < {train_max}" if train_max is not None else ""
    ctes = [
        "base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"corpus AS (SELECT * FROM base{twins})",
        "ql AS (SELECT vec_id,"
        " unnest(range(len(v))) AS dim,"
        f" unnest(list_transform(v,"
        f" x -> CAST(floor(x * {SEM_SCALE} + 0.5) AS BIGINT))) AS xq"
        " FROM corpus)",
        f"seed_ids AS (SELECT vec_id,"
        f" CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid"
        f" FROM (SELECT vec_id FROM corpus{sw} ORDER BY vec_id LIMIT {SEM_K}))",
        "c0 AS (SELECT i.cid, q.dim, q.xq AS cq"
        " FROM seed_ids i JOIN ql q USING (vec_id))",
    ]
    for t in range(1, SEM_ITERS + 1):
        ctes += [
            # assignment vs c{t-1}: exact integer distances, tie -> min cid
            f"d{t} AS (SELECT q.vec_id, c.cid,"
            f" CAST(SUM((q.xq - c.cq) * (q.xq - c.cq)) AS BIGINT) AS dist_q"
            f" FROM ql q JOIN c{t-1} c USING (dim){tw}"
            f" GROUP BY q.vec_id, c.cid)",
            f"a{t} AS (SELECT vec_id, cid, dist_q FROM d{t}"
            f" QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id"
            f" ORDER BY dist_q, cid) = 1)",
            # update: per-dimension floored mean (exact, see _sem_update)
            f"c{t} AS (SELECT a.cid, q.dim,"
            f" CAST(floor(CAST(SUM(q.xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cq"
            f" FROM a{t} a JOIN ql q USING (vec_id) GROUP BY a.cid, q.dim)",
        ]
    t = SEM_ITERS + 1
    ctes += [
        f"d{t} AS (SELECT q.vec_id, c.cid,"
        f" CAST(SUM((q.xq - c.cq) * (q.xq - c.cq)) AS BIGINT) AS dist_q"
        f" FROM ql q JOIN c{SEM_ITERS} c USING (dim) GROUP BY q.vec_id, c.cid)",
        f"afinal AS (SELECT vec_id, cid, dist_q FROM d{t}"
        f" QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id"
        f" ORDER BY dist_q, cid) = 1)",
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + final_select


KMEANS_ITER_ORACLE = _kmeans_sql(
    with_twins=False,
    final_select=(
        "SELECT cid AS cluster_id, COUNT(*) AS n_members,"
        " CAST(SUM(dist_q) AS BIGINT) AS sse_q\n"
        "FROM afinal GROUP BY cid ORDER BY cluster_id"
    ),
)

SEMANTIC_DEDUP_ORACLE = _kmeans_sql(
    with_twins=True,
    final_select=(
        "SELECT id_a, id_b, cluster_id,"
        " ROUND(dot / sqrt((na2 * nb2)::DOUBLE), 6) AS cosine\n"
        "FROM (\n"
        "  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cid AS cluster_id,\n"
        "         CAST(list_inner_product(qa.xs, qa.xs) AS BIGINT) AS na2,\n"
        "         CAST(list_inner_product(qb.xs, qb.xs) AS BIGINT) AS nb2,\n"
        "         CAST(list_inner_product(qa.xs, qb.xs) AS BIGINT) AS dot\n"
        "  FROM afinal a JOIN afinal b ON a.cid = b.cid AND a.vec_id < b.vec_id\n"
        "  JOIN (SELECT vec_id, list(xq ORDER BY dim) AS xs FROM ql GROUP BY vec_id) qa\n"
        "    ON qa.vec_id = a.vec_id\n"
        "  JOIN (SELECT vec_id, list(xq ORDER BY dim) AS xs FROM ql GROUP BY vec_id) qb\n"
        "    ON qb.vec_id = b.vec_id\n"
        ")\n"
        f"WHERE dot > 0 AND {SEM_COS_DEN * SEM_COS_DEN} * dot * dot >="
        f" {SEM_COS_NUM * SEM_COS_NUM} * na2 * nb2\n"
        "ORDER BY id_a, id_b"
    ),
)


def _semantic_keep_sql() -> str:
    """Close the semantic pair graph with a recursive CTE (the
    ``dedup_clusters`` oracle pattern); the pair query nests as a
    sub-``WITH`` inside the outer recursive chain."""
    from .dedup import PLANT_TWIN_ID_OFFSET, PLANT_TWIN_MOD

    pairs = SEMANTIC_DEDUP_ORACLE.replace("ORDER BY id_a, id_b", "")
    return f"""
WITH RECURSIVE
pr AS ({pairs}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pr
  UNION
  SELECT id_b, id_a FROM pr
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
),
labels AS (SELECT a AS vec_id, LEAST(a, MIN(b)) AS grp_min FROM reach GROUP BY a),
ids AS (
  SELECT vec_id FROM embeddings
  UNION ALL
  SELECT vec_id + {PLANT_TWIN_ID_OFFSET} FROM embeddings
  WHERE vec_id % {PLANT_TWIN_MOD} = 0
)
SELECT i.vec_id,
       COALESCE(l.grp_min, i.vec_id) AS rep_id,
       COALESCE(l.grp_min, i.vec_id) = i.vec_id AS keep
FROM ids i LEFT JOIN labels l USING (vec_id)
ORDER BY vec_id
"""


SEMANTIC_KEEP_ORACLE = _semantic_keep_sql()


def _semantic_lsh_oracle() -> str:
    """Exact all-pairs at the SemDeDup threshold over corpus + twins
    (``dedup.twinned_allpairs_oracle``) — the LSH route must recover
    every qualifying pair per the seeded recall contract (twin cosines
    ≈ 0.985, miss probability ~1e-8 under the threshold-matched
    sizing)."""
    from .dedup import twinned_allpairs_oracle

    return twinned_allpairs_oracle(SEM_COS_NUM / SEM_COS_DEN)


QUERIES = [
    Query(
        "embedding_kmeans_iter",
        "deterministic integer k-means (SemDeDup clustering step): "
        "cluster sizes + exact SSE after fixed Lloyd iterations",
        embedding_kmeans_iter,
        KMEANS_ITER_ORACLE,
    ),
    Query(
        "dedup_semantic_kmeans",
        "SemDeDup: within-k-means-cluster high-cosine pairs over corpus "
        "+ planted deterministic twins (fixed cluster budget, sign-LSH "
        "capped within-cluster candidates, integer cosine verify)",
        dedup_semantic_kmeans,
        SEMANTIC_DEDUP_ORACLE,
    ),
    Query(
        "dedup_semantic_keep",
        "SemDeDup prune: one lowest-id representative per semantic "
        "near-dup group, keep/drop decision per vector",
        dedup_semantic_keep,
        SEMANTIC_KEEP_ORACLE,
    ),
    Query(
        "embedding_linear_probe",
        "linear-probe classifier TRAINING on embeddings (full-batch "
        "integer gradient descent on squared loss, fixed iterations): "
        "per-iteration SSE + accuracy curve, bit-identical cross-engine",
        embedding_linear_probe,
        LINEAR_PROBE_ORACLE,
    ),
    Query(
        "embedding_probe_confusion",
        "linear-probe SERVING twin: corpus-wide scoring with the "
        "trained weights (broadcast map-side dot product), confusion "
        "counts per (true, predicted) label",
        embedding_probe_confusion,
        PROBE_CONFUSION_ORACLE,
    ),
    Query(
        "dedup_semantic_lsh",
        "scale-safe SemDeDup pair search: sign-LSH routed near-dup "
        "pairs at cos >= 0.95 (threshold-matched 24 planes / 64 "
        "tables; Theta(n) hash + bucket-keyed join — measured ~linear "
        "at 100x data) over corpus + planted twins",
        dedup_semantic_lsh,
        _semantic_lsh_oracle(),
    ),
]
