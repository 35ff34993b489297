"""ANN recall tests: approximate variants vs the exact brute-force baseline."""

from __future__ import annotations

from csv_2_db_pipeline_data_engineering_spark.operators.similarity import (
    TOP_K,
    ann_ivf,
    ann_ivf_neighbor_list,
    ann_ivfpq_neighbor_list,
    ann_lsh_bucketed,
    ann_lsh_neighbor_list,
    ann_topk_bruteforce,
)
from tests.conftest import SF_DIR


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.select("query_id", "neighbor_id").collect()}


def test_ann_lsh_recall(spark):
    exact = _pairs(ann_topk_bruteforce(spark, SF_DIR))
    approx = _pairs(ann_lsh_bucketed(spark, SF_DIR))
    recall = len(exact & approx) / len(exact)
    # L=16 x 5-plane sign LSH on weakly-clustered 64-d data: ~0.75 expected
    assert recall >= 0.55, f"LSH recall {recall:.2f}"
    # no self-matches
    assert all(q != n for q, n in approx)


def test_ann_ivf_recall(spark):
    exact = _pairs(ann_topk_bruteforce(spark, SF_DIR))
    approx = _pairs(ann_ivf(spark, SF_DIR))
    recall = len(exact & approx) / len(exact)
    # nprobe=4 of 16 clusters: high recall expected on clustered data
    assert recall >= 0.6, f"IVF recall {recall:.2f}"
    n_queries = len({q for q, _ in approx})
    assert all(q != n for q, n in approx)
    assert len(approx) == n_queries * TOP_K


def test_integer_lsh_neighbor_list_recall_matches_float_path(spark):
    """The oracle-checkable integer-quantized LSH variant must keep the
    float path's recall (quantization at scale 1000 perturbs angles by
    < 0.1 degrees) and the exact output contract."""
    exact = _pairs(ann_topk_bruteforce(spark, SF_DIR))
    approx = _pairs(ann_lsh_neighbor_list(spark, SF_DIR))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.55, f"integer-LSH recall {recall:.2f}"
    assert all(q != n for q, n in approx)


def test_integer_ivf_neighbor_list_recall(spark):
    exact = _pairs(ann_topk_bruteforce(spark, SF_DIR))
    approx = _pairs(ann_ivf_neighbor_list(spark, SF_DIR))
    recall = len(exact & approx) / len(exact)
    # nprobe=4 of k=8 integer k-means clusters: half the corpus probed
    assert recall >= 0.6, f"integer-IVF recall {recall:.2f}"
    n_queries = len({q for q, _ in approx})
    assert all(q != n for q, n in approx)
    assert len(approx) == n_queries * TOP_K


def test_ann_ivfpq_recall_certificate(spark):
    """Composed IVF-PQ (coarse routing + residual-PQ ADC shortlist +
    exact refine) must hold near-IVF recall: the ADC@IVFPQ_SHORTLIST
    stage keeps ~95% of the exact top-5 (measured sf0.001/sf0.01) and
    the refine re-ranks those exactly, so losses come only from coarse
    routing misses plus shortlist truncation."""
    exact = _pairs(ann_topk_bruteforce(spark, SF_DIR))
    approx = _pairs(ann_ivfpq_neighbor_list(spark, SF_DIR))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, f"IVF-PQ recall {recall:.2f}"
    n_queries = len({q for q, _ in approx})
    assert all(q != n for q, n in approx)
    assert len(approx) == n_queries * TOP_K


def test_seeded_kernel_buckets_match_driver_side_family(spark):
    # The in-kernel seeded hyperplane generation (no driver-side dim
    # probe) must produce bit-identical buckets to the explicit
    # hyperplanes() + _table_buckets path for the same seed.
    import numpy as np
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.similarity import (
        _table_buckets,
        _table_buckets_seeded,
        hyperplanes,
    )

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    tables = hyperplanes(dim=16, n_tables=6, n_planes=5, seed=99)
    a = {(r.vec_id, r.t): r.bucket for r in _table_buckets(df, tables).collect()}
    b = {
        (r.vec_id, r.t): r.bucket
        for r in _table_buckets_seeded(df, 6, 5, 99).collect()
    }
    assert a == b


def test_pca_power_finds_planted_dominant_direction(spark):
    """Vectors = strong component along dim 3 + weak noise: the integer
    power iteration must put its peak loading on dim 3."""
    import numpy as np

    from csv_2_db_pipeline_data_engineering_spark.operators.similarity import (
        PCA_SCALE,
        embedding_pca_power,
    )

    rng = np.random.default_rng(7)
    rows = []
    for i in range(200):
        v = rng.normal(0, 0.02, 8)
        v[3] += (1 if i % 2 == 0 else -1) * 0.4  # dominant +/- axis
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    out = embedding_pca_power(spark, d).collect()
    by_dim = {r["dim"]: r for r in out}
    peak = max(by_dim.values(), key=lambda r: abs(r["loading"]))
    assert peak["dim"] == 3 and abs(peak["loading"]) == PCA_SCALE
    # explained share of a 1-D dominated cloud is far above uniform 1/8
    assert by_dim[0]["explained_share"] > 0.5


def test_ann_index_extend_serve_equals_inplan_rebuild(spark, tmp_path):
    """The persisted ANN index contract: serve-from-disk equals the
    in-plan build over the same history, an extend changes results
    exactly as a rebuild over the grown history would, a crash-replayed
    extend does not double-serve, and compaction is invariant."""
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.similarity import (
        ann_index_frames,
        ann_serve_topk,
        compact_ann_index,
        extend_ann_index,
        read_ann_index,
    )
    from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    hist1 = emb.filter((F.col("vec_id") % 10 != 0) & (F.col("vec_id") % 3 != 0))
    hist2 = emb.filter((F.col("vec_id") % 10 != 0) & (F.col("vec_id") % 3 == 0))
    qs = emb.filter(F.col("vec_id") % 10 == 0).limit(10)
    path = str(tmp_path / "ann_idx")

    def serve(b, v):
        return sorted(
            tuple(r) for r in ann_serve_topk(qs, b, v).collect()
        )

    extend_ann_index(hist1, path, "base")
    got1 = serve(*read_ann_index(spark, path))
    want1 = serve(*ann_index_frames(hist1))
    assert got1 == want1 and got1  # disk == in-plan, non-vacuous

    extend_ann_index(hist2, path, "b1")
    got2 = serve(*read_ann_index(spark, path))
    want2 = serve(*ann_index_frames(hist1.unionByName(hist2)))
    assert got2 == want2  # extend == rebuild over grown history
    assert got2 != got1  # the new history actually changed neighbors

    extend_ann_index(hist2, path, "b1")  # crash replay: same tag
    assert serve(*read_ann_index(spark, path)) == want2

    compact_ann_index(spark, path)
    assert serve(*read_ann_index(spark, path)) == want2


def test_triplet_mining_hand_computed_fixture(spark, tmp_path):
    """Differential on a crafted labeled corpus where BOTH flag values
    occur: anchor 0 has a near-identical same-label twin (no violation);
    anchor 1's only positive is far while an impostor sits next to it
    (violation). Extrema, ids, margins, and counts recomputed by hand."""
    import math

    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.similarity import (
        embedding_triplet_mining,
    )

    dim = 4
    vecs = {
        0: ([1.0, 0.0, 0.0, 0.0], 0),
        1: ([0.0, 1.0, 0.0, 0.0], 1),
        2: ([0.9, 0.1, 0.0, 0.0], 0),   # anchor 0's close positive
        3: ([0.0, -1.0, 0.1, 0.0], 1),  # anchor 1's far positive
        4: ([0.1, 0.9, 0.0, 0.0], 0),   # impostor next to anchor 1
        5: ([0.0, 0.0, 1.0, 0.0], 2),
    }
    rows = [(i, [float(x) for x in v], lab) for i, (v, lab) in vecs.items()]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/embeddings.parquet")

    got = {r.anchor_id: r for r in embedding_triplet_mining(spark, sf).collect()}

    def cos(a, b):
        va, vb = vecs[a][0], vecs[b][0]
        num = sum(x * y for x, y in zip(va, vb))
        den = math.sqrt(sum(x * x for x in va)) * math.sqrt(sum(x * x for x in vb))
        return round(num / den, 6)

    # hand-computed expectations over the full candidate sets
    for anchor in (0, 1):
        lab = vecs[anchor][1]
        pos = [(cos(anchor, c), c) for c, (v, l) in vecs.items() if c != anchor and l == lab]
        neg = [(cos(anchor, c), c) for c, (v, l) in vecs.items() if c != anchor and l != lab]
        hp = min(pos)  # (cos ASC, id ASC)
        hn = max((c, -i) for c, i in neg)  # (cos DESC, id ASC)
        r = got[anchor]
        assert (r.hard_pos_cos, r.hard_pos_id) == hp
        assert (r.hard_neg_cos, r.hard_neg_id) == (hn[0], -hn[1])
        assert r.margin == round(r.hard_pos_cos - r.hard_neg_cos, 6)
        assert r.is_violation == (1 if r.margin < 0 else 0)
        assert r.n_pos == len(pos) and r.n_neg == len(neg)
    # both flag values occur on this fixture
    assert got[0].is_violation == 0, got[0]
    assert got[1].is_violation == 1, got[1]


def test_ivfpq_index_extend_serve_equals_inplan_rebuild(spark, tmp_path):
    """The persisted IVF-PQ index path: train the frozen model once,
    extend the on-disk index with the history and delta segments,
    read it back, serve — and match the registered in-plan serve
    query row-for-row (which itself hash-matches the full-rebuild
    oracle, closing merge == rebuild across disk too)."""
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.semantic import (
        SEM_ITERS,
        _sem_assign,
        _sem_init_centroids,
        _sem_quantized,
        _sem_update,
    )
    from csv_2_db_pipeline_data_engineering_spark.operators.similarity import (
        IVFPQ_ITERS,
        IVFPQ_TRAIN_MAX,
        N_QUERIES,
        _pq_assign_codes,
        _pq_init_codebooks,
        _pq_residual_subvecs,
        _pq_update_codebooks,
        ann_ivfpq_serve_incremental,
        extend_ivfpq_index,
        ivfpq_serve_topk,
        read_ivfpq_index,
    )
    from csv_2_db_pipeline_data_engineering_spark.sources.tables import (
        load_embeddings_spread,
    )
    from tests.conftest import SF_DIR

    q = _sem_quantized(load_embeddings_spread(spark, SF_DIR)).cache()
    train = q.filter(F.col("vec_id") < IVFPQ_TRAIN_MAX)
    cents = _sem_init_centroids(train)
    for _ in range(SEM_ITERS):
        cents = _sem_update(_sem_assign(train, cents))
    sub_t = _pq_residual_subvecs(_sem_assign(train, cents), cents).cache()
    cb = _pq_init_codebooks(sub_t)
    for _ in range(IVFPQ_ITERS):
        cb = _pq_update_codebooks(_pq_assign_codes(sub_t, cb))

    path = str(tmp_path / "ivfpq_index")
    extend_ivfpq_index(q.filter(F.col("vec_id") % 10 != 0), cents, cb, path, "base")
    extend_ivfpq_index(q.filter(F.col("vec_id") % 10 == 0), cents, cb, path, "d1")
    codes, vecs = read_ivfpq_index(spark, path)
    served = ivfpq_serve_topk(
        q.filter(F.col("vec_id") < N_QUERIES), cents, cb, codes, vecs
    )
    got = {tuple(r) for r in served.collect()}
    want = {tuple(r) for r in ann_ivfpq_serve_incremental(spark, SF_DIR).collect()}
    q.unpersist()
    sub_t.unpersist()
    assert got == want and len(want) == N_QUERIES * TOP_K


def test_sq8_neighbor_list_recall_and_compression(spark):
    """SQ8 flat serving must keep near-brute-force recall (8-bit spans
    perturb angles far less than the LSH 1000-scale quantization) and
    the exact output contract; codes must genuinely live in [0, 255]
    per dimension (the 8x compression claim)."""
    from csv_2_db_pipeline_data_engineering_spark.operators.lifecycle import (
        release_scoped_caches,
    )
    from csv_2_db_pipeline_data_engineering_spark.operators.similarity import (
        ann_sq8_neighbor_list,
    )

    exact = _pairs(ann_topk_bruteforce(spark, SF_DIR))
    approx = _pairs(ann_sq8_neighbor_list(spark, SF_DIR))
    release_scoped_caches()
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"SQ8 recall {recall:.2f}"
    assert all(q != n for q, n in approx)
    n_queries = len({q for q, _ in approx})
    assert len(approx) == n_queries * TOP_K


def test_mmr_rerank_matches_pure_python_greedy(spark):
    """Every MMR pick (order AND doc) must equal a from-scratch pure
    Python greedy run over the same integer-quantized vectors — the
    operator is exact, not heuristic; and a diversity witness: for at
    least one query the MMR order differs from the plain relevance
    order (otherwise the penalty term is vacuous at this sf)."""
    import math

    from csv_2_db_pipeline_data_engineering_spark.operators.lifecycle import (
        release_scoped_caches,
    )
    from csv_2_db_pipeline_data_engineering_spark.operators.similarity import (
        MMR_DEPTH,
        MMR_K,
        MMR_LAMBDA,
        N_QUERIES,
        retrieval_mmr_rerank,
    )

    rows = retrieval_mmr_rerank(spark, SF_DIR).collect()
    release_scoped_caches()
    emb = {
        r["vec_id"]: [math.floor(x * 1000 + 0.5) for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a)
        nb = sum(x * x for x in b)
        return d / math.sqrt(float(na * nb))

    expected = {}
    for qid in range(N_QUERIES):
        rel = {
            v: cos(emb[qid], emb[v]) for v in emb if v != qid
        }
        cand = sorted(rel, key=lambda v: (-rel[v], v))[:MMR_DEPTH]
        sel = [min(cand, key=lambda v: (-rel[v], v))]
        while len(sel) < MMR_K:
            avail = [v for v in cand if v not in sel]
            scores = {
                v: MMR_LAMBDA * rel[v]
                - (1.0 - MMR_LAMBDA) * max(cos(emb[v], emb[s]) for s in sel)
                for v in avail
            }
            sel.append(min(avail, key=lambda v: (-scores[v], v)))
        expected[qid] = sel
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], {})[r["pick"]] = r["doc_id"]
    for qid in range(N_QUERIES):
        picks = [got[qid][p] for p in sorted(got[qid])]
        assert picks == expected[qid], (qid, picks, expected[qid])
    # diversity witness: the MMR order must differ somewhere from the
    # pure-relevance order
    assert any(
        expected[qid]
        != sorted(
            expected[qid],
            key=lambda v: (-cos(emb[qid], emb[v]), v),
        )
        for qid in range(N_QUERIES)
    )
