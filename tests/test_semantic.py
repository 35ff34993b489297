"""SemDeDup family: deterministic integer k-means + within-cluster dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.operators import lsm
from csv_2_db_pipeline_data_engineering_spark.operators.dedup import (
    PLANT_TWIN_ID_OFFSET,
    PLANT_TWIN_MOD,
    _with_planted_twins,
)
from csv_2_db_pipeline_data_engineering_spark.operators.semantic import (
    SEM_K,
    dedup_semantic_kmeans,
    embedding_kmeans_iter,
    kmeans_assignments,
    semantic_dedup_pairs,
)
from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_kmeans_partitions_the_corpus(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    fin = kmeans_assignments(emb)
    sizes = fin.groupBy("cid").count().collect()
    assert sum(r["count"] for r in sizes) == n  # every vector assigned once
    assert 1 <= len(sizes) <= SEM_K
    # isotropic corpus + deterministic seeding -> no degenerate cluster
    assert min(r["count"] for r in sizes) >= n // (SEM_K * 4)


def test_kmeans_is_deterministic(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    a = {r["vec_id"]: r["cid"] for r in kmeans_assignments(emb).collect()}
    b = {r["vec_id"]: r["cid"] for r in kmeans_assignments(emb).collect()}
    assert a == b


def test_semantic_dedup_recovers_planted_twins(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    pairs = dedup_semantic_kmeans(spark, SF_DIR).collect()
    planted = {
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") % PLANT_TWIN_MOD == 0).collect()
    }
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # every planted (orig, orig+OFFSET) twin must land in one cluster and
    # survive the exact cosine verify; nothing else crosses the threshold
    assert got == {(v, v + PLANT_TWIN_ID_OFFSET) for v in planted}
    assert all(r["cosine"] > 0.98 for r in pairs)


def test_semantic_pair_join_is_cluster_keyed(spark):
    # Plan-shape assertions are about OUR plan, not whatever session
    # state a previously-run suite left behind: (a) scoped caches from
    # earlier tests make the CacheManager substitute InMemoryRelations
    # whose RENDERED cached plans add extra `zip_with` strings to the
    # tree text (the full-suite-only failure this guard fixes — the
    # fold count read 5 with warm caches, 1 cold), so start cache-free;
    # (b) pin the planner knobs for the inspection.
    from csv_2_db_pipeline_data_engineering_spark.operators.lifecycle import (
        release_scoped_caches,
    )

    release_scoped_caches()
    spark.catalog.clearCache()
    saved = {
        k: spark.conf.get(k)
        for k in ("spark.sql.adaptive.enabled",
                  "spark.sql.autoBroadcastJoinThreshold")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        emb = _with_planted_twins(load_table(spark, SF_DIR, "embeddings"))
        explained = (
            semantic_dedup_pairs(emb)._jdf.queryExecution().executedPlan().toString()
        )
        # never a cartesian / nested-loop pair enumeration anywhere
        assert "CartesianProduct" not in explained
        assert "BroadcastNestedLoopJoin" not in explained

        # the PRE-barrier scored frame (what the checkpoint
        # materializes): candidates come from the bucket-keyed LSH
        # self-join and the 64-element integer fold lives in the
        # projection, not any join
        from csv_2_db_pipeline_data_engineering_spark.operators.semantic import (
            _dot_q,
            _lsh_scored_pairs,
            kmeans_assignments,
        )

        fin = (
            kmeans_assignments(emb)
            .withColumn("n2", _dot_q("xq", "xq"))
            .localCheckpoint(eager=True)
        )
        plan = (
            _lsh_scored_pairs(emb, fin)._jdf.queryExecution().executedPlan().toString()
        )
        assert "bucket" in plan  # the LSH bucket key reaches the join
        assert "CartesianProduct" not in plan
        join_lines = [
            l for l in plan.splitlines()
            if "SortMergeJoin" in l or "ShuffledHashJoin" in l
            or "BroadcastHashJoin" in l
        ]
        assert join_lines, "expected keyed joins in the scored plan"
        assert all("zip_with" not in l for l in join_lines)
        assert plan.count("zip_with") == 1  # exactly one fold site
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_registered_pairs_equal_exhaustive_within_cluster_pairs(spark):
    """Differential recall pin: the LSH-capped registered form must
    recover EXACTLY the pair set of the exhaustive within-cluster
    enumeration (recall-1 baseline) on corpus + planted twins."""
    from csv_2_db_pipeline_data_engineering_spark.operators.semantic import (
        semantic_dedup_pairs_exhaustive,
    )

    emb = _with_planted_twins(load_table(spark, SF_DIR, "embeddings"))
    got = {tuple(r) for r in semantic_dedup_pairs(emb).collect()}
    want = {tuple(r) for r in semantic_dedup_pairs_exhaustive(emb).collect()}
    assert got == want and got  # non-vacuous, exact agreement


def test_keep_plan_drops_exactly_the_twins(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.semantic import (
        dedup_semantic_keep,
    )

    rows = dedup_semantic_keep(spark, SF_DIR).collect()
    n = load_table(spark, SF_DIR, "embeddings").count()
    assert len(rows) == n + n // PLANT_TWIN_MOD  # corpus + planted twins
    dropped = {r["vec_id"]: r["rep_id"] for r in rows if not r["keep"]}
    # every twin collapses onto its original; nothing else is dropped
    assert dropped == {
        v + PLANT_TWIN_ID_OFFSET: v for v in range(0, n, PLANT_TWIN_MOD)
    }
    kept = [r for r in rows if r["keep"]]
    assert all(r["rep_id"] == r["vec_id"] for r in kept)


def test_pair_scoring_fold_stays_out_of_the_join(spark):
    """The integer dot fold must live in the post-join projection, not
    the join condition — Catalyst would otherwise inline it into every
    comparison that mentions it (up to 3 evaluations per candidate
    pair, the plan defect this pin guards against)."""
    from pyspark.sql import functions as SF
    from csv_2_db_pipeline_data_engineering_spark.operators.semantic import (
        SEM_PAIR_BLOCKS,
        _dot_q,
        _pair_sides,
        _scored_candidate_pairs,
        kmeans_assignments,
    )

    emb = _with_planted_twins(load_table(spark, SF_DIR, "embeddings"))
    fin = (
        kmeans_assignments(emb)
        .withColumn("n2", _dot_q("xq", "xq"))
        .withColumn("blk", SF.pmod("vec_id", SF.lit(SEM_PAIR_BLOCKS)).cast("int"))
        .localCheckpoint(eager=True)
    )
    a, b = _pair_sides(fin)
    plan = _scored_candidate_pairs(a, b)._jdf.queryExecution().executedPlan().toString()
    join_lines = [
        l for l in plan.splitlines()
        if "SortMergeJoin" in l or "ShuffledHashJoin" in l
        or "BroadcastHashJoin" in l  # planner's pick at tiny scale
    ]
    assert join_lines, "expected a keyed pair join in the plan"
    assert all("zip_with" not in l for l in join_lines)
    # exactly ONE fold site in the whole scored plan (the projection)
    assert plan.count("zip_with") == 1


def test_kmeans_iter_outputs_exact_ints(spark):
    rows = embedding_kmeans_iter(spark, SF_DIR).collect()
    assert all(isinstance(r["sse_q"], int) and r["sse_q"] > 0 for r in rows)
    assert [r["cluster_id"] for r in rows] == sorted(r["cluster_id"] for r in rows)


def test_lsh_route_agrees_with_kmeans_route_on_pairs_and_keeps(spark):
    """The scale-safe sign-LSH route (``dedup_semantic_lsh`` /
    ``semantic_keep_plan_lsh``) must produce the same pair set (modulo
    the cluster_id provenance column) and the same keep decisions as
    the k-means route on this corpus — both recover exactly the
    planted twin groups."""
    from csv_2_db_pipeline_data_engineering_spark.operators.semantic import (
        dedup_semantic_keep,
        dedup_semantic_lsh,
        semantic_keep_plan_lsh,
    )

    lsh_pairs = {
        (r["id_a"], r["id_b"]) for r in dedup_semantic_lsh(spark, SF_DIR).collect()
    }
    km_pairs = {
        (r["id_a"], r["id_b"]) for r in dedup_semantic_kmeans(spark, SF_DIR).collect()
    }
    assert lsh_pairs == km_pairs and lsh_pairs  # non-vacuous agreement

    lsh_keep = sorted(
        semantic_keep_plan_lsh(
            _with_planted_twins(load_table(spark, SF_DIR, "embeddings"))
        ).collect()
    )
    km_keep = sorted(dedup_semantic_keep(spark, SF_DIR).collect())
    assert lsh_keep == km_keep


def test_emb_index_fold_extend_compact_refold(spark, tmp_path):
    """The persisted embedding index (streaming SemDeDup twin) at the
    operator level: extends are O(delta) tagged partitions, cross-
    history losers are found through the bucket rows + exact-cosine
    verify, and compact_emb_index folds every tag into one base
    partition with identical results."""
    import os

    from csv_2_db_pipeline_data_engineering_spark.operators.semantic import (
        compact_emb_index,
        extend_emb_index,
        semantic_cross_losers,
        write_emb_index,
    )

    dim = 8
    e1 = [1.0] + [0.0] * (dim - 1)
    e2 = [0.0, 1.0] + [0.0] * (dim - 2)
    twin = [1.0, 0.05] + [0.0] * (dim - 2)
    e3 = [0.0, 0.0, 1.0] + [0.0] * (dim - 3)
    path = str(tmp_path / "emb_index")
    mk = lambda rows: spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    write_emb_index(mk([(1, e1)]), path, "batch0")
    extend_emb_index(mk([(2, e2)]), path, "batch1")

    def read(sub):
        return (
            spark.read.option("basePath", os.path.join(path, sub))
            .parquet(os.path.join(path, sub, "delta=*"))
            .drop("delta")
        )

    probe = mk([(10, twin), (12, e3)])
    pre = sorted(
        r["doc_id"]
        for r in semantic_cross_losers(probe, read("buckets"), read("vecs")).collect()
    )
    assert pre == [10]  # the twin matches history, the orthogonal one doesn't

    compact_emb_index(spark, path)
    for sub in ("buckets", "vecs"):
        tags = [
            t
            for t in os.listdir(os.path.join(path, sub))
            if t.startswith("delta=")
        ]
        assert tags == [f"delta={lsm.read_state(path)['base']}"], sub
    post = sorted(
        r["doc_id"]
        for r in semantic_cross_losers(probe, read("buckets"), read("vecs")).collect()
    )
    assert post == pre

    # extends keep folding on top of the compacted base
    extend_emb_index(mk([(3, e3)]), path, "batch2")
    post2 = sorted(
        r["doc_id"]
        for r in semantic_cross_losers(probe, read("buckets"), read("vecs")).collect()
    )
    assert post2 == [10, 12]  # the new history vector now catches doc 12


def test_linear_probe_training_curve_and_determinism(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.semantic import (
        embedding_linear_probe,
    )

    rows = embedding_linear_probe(spark, SF_DIR).collect()
    n = load_table(spark, SF_DIR, "embeddings").count()
    assert [r["iter"] for r in rows] == [0, 1, 2, 3]
    sses = [r["sse_q"] for r in rows]
    assert sses == sorted(sses, reverse=True) and len(set(sses)) == 4, (
        "squared loss must strictly decrease every GD step"
    )
    accs = [r["n_correct"] for r in rows]
    assert accs[-1] > accs[0], "training must beat the zero-weight baseline"
    assert all(0 <= a <= n for a in accs)
    assert all(isinstance(r["sse_q"], int) for r in rows)  # exact ints
    # bit-identical re-run (deterministic integer arithmetic)
    assert embedding_linear_probe(spark, SF_DIR).collect() == rows


def test_linear_probe_floor_div_matches_python_floor(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.semantic import (
        _floor_div,
    )
    from pyspark.sql import functions as SF

    vals = [-(10**12) - 7, -21, -20, -1, 0, 1, 19, 20, 10**12 + 7]
    df = spark.createDataFrame([(v,) for v in vals], "g long")
    got = [
        r["fd"]
        for r in df.select(_floor_div(SF.col("g"), 20).alias("fd"))
        .orderBy("g")
        .collect()
    ]
    assert got == [v // 20 for v in sorted(vals)]  # Python floor semantics


def test_probe_confusion_is_consistent_with_training_curve(spark):
    """The serving twin's confusion counts must reconcile exactly with
    the trainer's final-iteration accuracy (same weights, same data):
    sum of diagonal cells == n_correct at the last iter, all cells sum
    to the corpus size."""
    from csv_2_db_pipeline_data_engineering_spark.operators.semantic import (
        embedding_linear_probe,
        embedding_probe_confusion,
    )

    conf = embedding_probe_confusion(spark, SF_DIR).collect()
    n = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r["n"] for r in conf) == n
    assert {(r["y"], r["pred"]) for r in conf} <= {(1, 1), (1, -1), (-1, 1), (-1, -1)}
    diag = sum(r["n"] for r in conf if r["y"] == r["pred"])
    curve = embedding_linear_probe(spark, SF_DIR).collect()
    assert diag == curve[-1]["n_correct"]
