"""BM25 retrieval: formula pin, ranking invariants, MaxScore safety."""

from __future__ import annotations

import math

from csv_2_db_pipeline_data_engineering_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    BM25_NQ,
    BM25_QTERMS,
    BM25_TOPK,
    text_bm25_maxscore,
    text_bm25_topk,
)

DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana banana banana durian"),
    (2, "cherry durian elderberry fig"),
    (3, "apple apple apple apple"),
    (4, "grape honeydew kiwi lemon"),
]


def _pure_python_bm25(docs):
    """Independent implementation of the registered scoring contract."""
    split = {i: t.split(" ") for i, t in docs}
    n = len(docs)
    avgdl = math.floor(1000 * sum(len(w) for w in split.values()) / n) / 1000.0
    tf = {
        (i, t): split[i].count(t) for i in split for t in set(split[i])
    }
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    queries = sorted(split)[:BM25_NQ]
    out = {}
    for q in queries:
        qterms = split[q][:BM25_QTERMS]
        qtf = {t: qterms.count(t) for t in set(qterms)}
        for i in split:
            s = 0.0
            hit = False
            for t, qt in qtf.items():
                if (i, t) not in tf:
                    continue
                hit = True
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                dl = len(split[i])
                tfn = (tf[(i, t)] * (BM25_K1 + 1.0)) / (
                    tf[(i, t)] + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
                )
                s += qt * idf * tfn
            if hit:
                out[(q, i)] = round(s, 6)
    return out


def _write(spark, tmp_path, docs):
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_bm25_matches_pure_python(spark, tmp_path):
    sf = _write(spark, tmp_path, DOCS)
    expected = _pure_python_bm25(DOCS)
    got = {
        (r.query_id, r.doc_id): r.score
        for r in text_bm25_topk(spark, sf).collect()
    }
    # every returned (query, doc) score must equal the reference formula
    for key, score in got.items():
        assert math.isclose(score, expected[key], rel_tol=0, abs_tol=1e-6), (
            key,
            score,
            expected[key],
        )
    # and the top hit for the all-apple query doc is the apple-heavy doc
    q3 = [(r.rnk, r.doc_id) for r in text_bm25_topk(spark, sf).collect()
          if r.query_id == 3]
    assert min(q3)[1] == 3  # rnk 1 -> doc 3 (itself: four apples)


def test_bm25_rank_invariants(spark, tmp_path):
    sf = _write(spark, tmp_path, DOCS)
    rows = text_bm25_topk(spark, sf).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= BM25_TOPK
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_maxscore_never_loses_topk(spark, tmp_path):
    sf = _write(spark, tmp_path, DOCS)
    rows = text_bm25_maxscore(spark, sf).collect()
    assert rows, "certificate must cover every query"
    for r in rows:
        assert r.topk_preserved, r
        assert 0 < r.n_pruned_survivors <= r.n_candidates


def test_maxscore_on_testdata(spark):
    rows = text_bm25_maxscore(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == BM25_NQ
    assert all(r.topk_preserved for r in rows)
    # pruning must be non-trivial somewhere on a real corpus: at least
    # one query's upper-bound gate excludes candidates
    assert any(r.n_pruned_survivors < r.n_candidates for r in rows)


def test_postings_index_extend_equals_rebuild_and_compact(spark, tmp_path):
    """Serve-from-disk against base+extend must equal both the in-plan
    incremental serve AND a from-scratch full-corpus serve; compaction
    must not change a single row (the merge == rebuild certificate)."""
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.retrieval import (
        bm25_serve_incremental,
        compact_postings_index,
        extend_postings_index,
        read_postings_index,
        serve_bm25_from_index,
        text_bm25_topk,
        write_postings_index,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    idx = str(tmp_path / "bm25_idx")
    write_postings_index(docs.filter(F.col("doc_id") % 10 != 0), idx, "base")
    extend_postings_index(docs.filter(F.col("doc_id") % 10 == 0), idx, "d1")

    toks = F.split(F.col("text"), " ")
    qterm = (
        docs.orderBy("doc_id").limit(16)
        .select(F.col("doc_id").alias("query_id"),
                F.explode(F.slice(toks, 1, 4)).alias("term"))
        .groupBy("query_id", "term").agg(F.count(F.lit(1)).alias("qtf"))
    )
    from_disk = [tuple(r) for r in serve_bm25_from_index(spark, idx, qterm).collect()]
    in_plan = [tuple(r) for r in bm25_serve_incremental(spark, sf).collect()]
    rebuild = [tuple(r) for r in text_bm25_topk(spark, sf).collect()]
    assert from_disk == in_plan == rebuild
    assert from_disk  # non-empty

    # stats partials: two tags merge to the exact full-corpus totals
    _, stats = read_postings_index(spark, idx)
    row = stats.collect()[0]
    n_docs = docs.count()
    total_dl = docs.select(F.sum(F.size(toks)).alias("t")).collect()[0].t
    assert (row.n_docs, row.total_dl) == (n_docs, total_dl)

    compact_postings_index(spark, idx)
    after = [tuple(r) for r in serve_bm25_from_index(spark, idx, qterm).collect()]
    assert after == from_disk


def test_rrf_fusion_invariants(spark):
    """Fused score must equal the reciprocal-rank sum of the two
    rankers' (possibly missing) ranks; ranks are contiguous per query;
    fused order is (score desc, doc_id asc)."""
    from csv_2_db_pipeline_data_engineering_spark.operators.retrieval import (
        RRF_FUSE_DEPTH,
        RRF_K,
        RRF_TOPK,
        retrieval_rrf_fusion,
    )

    rows = retrieval_rrf_fusion(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        got = r.rrf_score
        want = 0.0
        if r.rank_bm25 is not None:
            assert 1 <= r.rank_bm25 <= RRF_FUSE_DEPTH
            want += 1.0 / (RRF_K + r.rank_bm25)
        if r.rank_tfidf is not None:
            assert 1 <= r.rank_tfidf <= RRF_FUSE_DEPTH
            want += 1.0 / (RRF_K + r.rank_tfidf)
        assert r.rank_bm25 is not None or r.rank_tfidf is not None
        assert abs(got - round(want, 6)) < 1e-9, r
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= RRF_TOPK
        keys = [(-r.rrf_score, r.doc_id) for r in rs]
        assert keys == sorted(keys)


def test_two_stage_topk_equals_single_window(spark):
    """The salted two-stage top-k must equal the naive one-window
    ranking on adversarial inputs: heavy score ties (forcing the
    doc_id tie-break across salt boundaries) and queries with fewer
    candidates than k."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.retrieval import (
        _topk_per_query,
    )

    rng = random.Random(13)
    rows = []
    for q in range(6):
        n = rng.choice([1, 2, 3, 50, 400])
        for d in rng.sample(range(10_000), n):
            # coarse score grid -> many exact ties
            rows.append((q, d, round(rng.choice([0.1, 0.2, 0.3]), 6)))
    scored = spark.createDataFrame(
        rows, "query_id long, doc_id long, score double"
    )
    for k in (1, 5, 17):
        got = {
            (r.query_id, r.rnk, r.doc_id, r.score)
            for r in _topk_per_query(scored, k).collect()
        }
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        want = {
            (r.query_id, r.rnk, r.doc_id, r.score)
            for r in scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .collect()
        }
        assert got == want, k


def test_prf_expansion_matches_pure_python(spark, tmp_path):
    """Differential: the full two-round PRF pipeline against an
    independent pure-python twin on the hand fixture — round-1 top-k,
    new-terms-only exclusion, tf·idf expansion weights with the
    (w desc, term asc) tie-break, qtf-1 expansion, round-2 scores."""
    from csv_2_db_pipeline_data_engineering_spark.operators.retrieval import (
        PRF_EXP_TERMS,
        PRF_FB_DEPTH,
        retrieval_prf_expansion,
    )

    sf = _write(spark, tmp_path, DOCS)

    split = {i: t.split(" ") for i, t in DOCS}
    n = len(DOCS)
    avgdl = math.floor(1000 * sum(len(w) for w in split.values()) / n) / 1000.0
    tf = {(i, t): split[i].count(t) for i in split for t in set(split[i])}
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1

    def score(qtf, d):
        s, hit = 0.0, False
        for t, qt in qtf.items():
            if (d, t) not in tf:
                continue
            hit = True
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            dl = len(split[d])
            s += qt * idf * (tf[(d, t)] * (BM25_K1 + 1.0)) / (
                tf[(d, t)] + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            )
        return round(s, 6) if hit else None

    expected = {}
    for q in sorted(split)[:BM25_NQ]:
        qterms = split[q][:BM25_QTERMS]
        qtf = {t: qterms.count(t) for t in set(qterms)}
        r1 = sorted(
            ((s, d) for d in split if (s := score(qtf, d)) is not None),
            key=lambda x: (-x[0], x[1]),
        )
        fb = [d for _, d in r1[:PRF_FB_DEPTH]]
        w = {}
        for d in fb:
            for t in set(split[d]):
                if t in qtf:
                    continue
                w[t] = w.get(t, 0) + split[d].count(t)
        weights = sorted(
            ((round(c * math.log(n / df[t]), 6), t) for t, c in w.items()),
            key=lambda x: (-x[0], x[1]),
        )
        qtf2 = dict(qtf)
        for _, t in weights[:PRF_EXP_TERMS]:
            qtf2[t] = qtf2.get(t, 0) + 1
        r2 = sorted(
            ((s, d) for d in split if (s := score(qtf2, d)) is not None),
            key=lambda x: (-x[0], x[1]),
        )
        for rnk, (s, d) in enumerate(r2[: BM25_TOPK], start=1):
            expected[(q, rnk)] = (d, s)

    got = retrieval_prf_expansion(spark, sf).collect()
    assert got
    for r in got:
        want_d, want_s = expected[(r.query_id, r.rnk)]
        assert r.doc_id == want_d, (r, want_d)
        assert math.isclose(r.score_prf, want_s, rel_tol=0, abs_tol=1e-6), (
            r,
            want_s,
        )


def test_prf_serve_from_index_equals_in_plan_and_rebuild(spark, tmp_path):
    """The PRF serving tier: from-disk (base index + delta extend) and
    the in-plan segment twin must both equal the from-scratch
    full-corpus PRF — the two-round merge == rebuild certificate."""
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.retrieval import (
        extend_postings_index,
        prf_serve_incremental,
        retrieval_prf_expansion,
        serve_prf_from_index,
        write_postings_index,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    idx = str(tmp_path / "prf_idx")
    write_postings_index(docs.filter(F.col("doc_id") % 10 != 0), idx, "base")
    extend_postings_index(docs.filter(F.col("doc_id") % 10 == 0), idx, "d1")

    toks = F.split(F.col("text"), " ")
    qterm = (
        docs.orderBy("doc_id").limit(16)
        .select(F.col("doc_id").alias("query_id"),
                F.explode(F.slice(toks, 1, 4)).alias("term"))
        .groupBy("query_id", "term").agg(F.count(F.lit(1)).alias("qtf"))
    )
    from_disk = [
        tuple(r) for r in serve_prf_from_index(spark, idx, qterm).collect()
    ]
    in_plan = [tuple(r) for r in prf_serve_incremental(spark, sf).collect()]
    rebuild = [tuple(r) for r in retrieval_prf_expansion(spark, sf).collect()]
    assert from_disk == in_plan == rebuild
    assert from_disk  # non-empty


def test_prf_uplift_invariants(spark):
    """The uplift report's invariants on real data: per-ranker nDCG in
    [0, 1], uplift equal to the rounded difference of the rounded
    nDCGs, one row per served query, and the report is NON-VACUOUS
    (PRF moves at least one query on this corpus — a report that can
    only ever print zeros certifies nothing)."""
    from csv_2_db_pipeline_data_engineering_spark.operators.retrieval import (
        BM25_NQ,
        retrieval_prf_uplift,
    )

    rows = retrieval_prf_uplift(spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(rows) <= BM25_NQ
    assert len({r.query_id for r in rows}) == len(rows)
    for r in rows:
        assert 0.0 <= r.ndcg_bm25 <= 1.0 and 0.0 <= r.ndcg_prf <= 1.0
        assert r.ndcg_uplift == round(round(r.ndcg_prf, 6) - round(r.ndcg_bm25, 6), 6)
    assert any(r.ndcg_uplift != 0 for r in rows)


def test_eval_metrics_match_hand_computation(spark):
    """Differential: MRR / nDCG@k / recall@k recomputed in python from
    the served ranking + the planted relevance rule + the corpus."""
    from csv_2_db_pipeline_data_engineering_spark.operators.retrieval import (
        EVAL_REL_MOD_HI,
        EVAL_REL_MOD_LO,
        retrieval_eval_metrics,
    )

    sf = "/root/testdata/sf0.001"

    def rel(q, d):
        if (q + d) % EVAL_REL_MOD_HI == 0:
            return 2
        if (q + d) % EVAL_REL_MOD_LO == 0:
            return 1
        return 0

    top = text_bm25_topk(spark, sf).collect()
    doc_ids = [
        r.doc_id
        for r in spark.read.parquet(sf + "/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    by_q = {}
    for r in top:
        by_q.setdefault(r.query_id, []).append(r)
    rows = {r.query_id: r for r in retrieval_eval_metrics(spark, sf).collect()}
    assert set(rows) == set(by_q)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        rels = [rel(q, r.doc_id) for r in rs]
        mrr = round(
            max((1.0 / r.rnk for r, v in zip(rs, rels) if v > 0), default=0.0),
            6,
        )
        dcg = sum(
            (2.0 ** v - 1.0) / math.log2(r.rnk + 1.0) for r, v in zip(rs, rels)
        )
        all_rels = sorted((rel(q, d) for d in doc_ids), reverse=True)
        pos = [v for v in all_rels if v > 0]
        idcg = sum(
            (2.0 ** v - 1.0) / math.log2(i + 1.0)
            for i, v in enumerate(all_rels[: BM25_TOPK], start=1)
        )
        got = rows[q]
        assert math.isclose(got.mrr, mrr, abs_tol=1e-6), (q, got.mrr, mrr)
        assert math.isclose(
            got.ndcg_at_k, round(dcg / idcg, 6) if idcg > 0 else 0.0, abs_tol=1e-6
        ), q
        assert math.isclose(
            got.recall_at_k, round(sum(1 for v in rels if v > 0) / len(pos), 6),
            abs_tol=1e-6,
        ), q
        assert 0 <= got.ndcg_at_k <= 1 + 1e-9
        assert got.n_rel_at_k == sum(1 for v in rels if v > 0)


def test_hybrid_fusion_invariants(spark):
    """Hybrid fused score must equal the convex combination of the two
    min-max-normalized per-list scores (0 for a missing list); norms
    live in [0, 1] with each list's max at 1.0 and min at 0.0; no
    self-hits; fused order is (score desc, doc_id asc); both rankers
    and the full-outer (single-list) path are genuinely exercised."""
    from csv_2_db_pipeline_data_engineering_spark.operators.retrieval import (
        HYBRID_ALPHA,
        HYBRID_DEPTH,
        HYBRID_TOPK,
        retrieval_hybrid_fusion,
    )

    rows = retrieval_hybrid_fusion(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.doc_id != r.query_id, "self-hits must be excluded"
        ns = r.norm_sparse if r.norm_sparse is not None else 0.0
        nd = r.norm_dense if r.norm_dense is not None else 0.0
        assert 0.0 <= ns <= 1.0 and 0.0 <= nd <= 1.0
        want = HYBRID_ALPHA * ns + (1.0 - HYBRID_ALPHA) * nd
        # engines round HALF_UP at 6 dp (Python's round() is banker's);
        # accept either side of a half-ulp boundary.
        assert abs(r.hybrid_score - want) < 5.1e-7, r
        if r.rank_sparse is not None:
            assert 1 <= r.rank_sparse <= HYBRID_DEPTH
        if r.rank_dense is not None:
            assert 1 <= r.rank_dense <= HYBRID_DEPTH
        assert r.rank_sparse is not None or r.rank_dense is not None
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= HYBRID_TOPK
        keys = [(-r.hybrid_score, r.doc_id) for r in rs]
        assert keys == sorted(keys)
    # Non-vacuous: some served rows carry both ranks (lists agree on a
    # candidate) and some only one (the full-outer 0-contribution path).
    assert any(
        r.rank_sparse is not None and r.rank_dense is not None for r in rows
    )
    assert any(r.rank_sparse is None or r.rank_dense is None for r in rows)


def test_ql_dirichlet_matches_pure_python(spark, tmp_path):
    """Every served QL score must equal the reference formula computed
    independently in Python — INCLUDING the missing-term smoothing mass
    (a candidate matching only some query terms still pays
    qtf·ln(μP/(dl+μ)) for the ones it lacks)."""
    from csv_2_db_pipeline_data_engineering_spark.operators.retrieval import (
        BM25_NQ,
        BM25_QTERMS,
        QL_MU,
        text_ql_dirichlet,
    )

    sf = _write(spark, tmp_path, DOCS)
    split = {i: t.split(" ") for i, t in DOCS}
    total = float(sum(len(w) for w in split.values()))
    cf = {}
    for w in split.values():
        for t in w:
            cf[t] = cf.get(t, 0) + 1
    queries = sorted(split)[:BM25_NQ]
    expected = {}
    for q in queries:
        qterms = split[q][:BM25_QTERMS]
        qtf = {t: qterms.count(t) for t in set(qterms)}
        for d, w in split.items():
            if not any(t in w for t in qtf):
                continue  # candidate restriction: >=1 matching term
            s = 0.0
            for t, n in qtf.items():
                mu_p = QL_MU * cf[t] / total
                s += n * math.log((w.count(t) + mu_p) / (len(w) + QL_MU))
            expected[(q, d)] = round(s, 6)
    got = {
        (r.query_id, r.doc_id): r.score
        for r in text_ql_dirichlet(spark, sf).collect()
    }
    assert got, "served list must be non-empty"
    for key, score in got.items():
        assert math.isclose(score, expected[key], rel_tol=0, abs_tol=1e-6), (
            key, score, expected[key],
        )
    # witness: the doc lacking a query term ranks below one holding it
    # (the missing-term mass is genuinely negative)
    assert all(v < 0 for v in got.values())


def test_one_pass_corpus_index_matches_two_pass_derivation(spark):
    """r17: _corpus_index derives postings AND (n_docs, total_dl) from
    ONE sentinel-flagged corpus pass. Pin equivalence against the
    straightforward two-pass derivation on real testdata: identical tf
    rows (sentinel-only groups dropped), identical stats (every doc
    priced exactly once via its pos-0 flag)."""
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.retrieval import (
        _corpus_index,
        _query_frontier,
    )
    from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    frontier = _query_frontier(spark, SF_DIR)
    qvocab = frontier[0]
    tf, _qdf, stats = _corpus_index(spark, SF_DIR, frontier=frontier)

    d = load_table(spark, SF_DIR, "documents")
    toks = F.split(F.col("text"), " ")
    ref_tf = (
        d.select("doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term"))
        .filter(F.col("term").isin(qvocab))
        .groupBy("doc_id", "term")
        .agg(F.min("dl").alias("dl"), F.count(F.lit(1)).alias("tf"))
    )
    got = {tuple(r) for r in tf.select("doc_id", "term", "dl", "tf").collect()}
    want = {tuple(r) for r in ref_tf.collect()}
    assert got == want

    ref_stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("total_dl"),
    ).collect()[0]
    ref_avgdl = (1000 * ref_stats.total_dl // ref_stats.n_docs) / 1000.0
    s = stats.collect()[0]
    assert (s.n_docs, s.avgdl) == (ref_stats.n_docs, ref_avgdl)


def test_tokenized_corpus_builders_match_text_builders(spark):
    """r17: the cached multi-pass retrieval paths build postings/stats
    from a pre-tokenized (doc_id, toks) frame; pin row-identity with
    the text-based builders they mirror."""
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.retrieval import (
        _postings_from_toks,
        _stats_from_toks,
        bm25_postings,
        corpus_stats_partial,
    )
    from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    td = d.select("doc_id", F.split("text", " ").alias("toks"))
    got = {tuple(r) for r in _postings_from_toks(td).collect()}
    want = {tuple(r) for r in bm25_postings(d, spread=False).collect()}
    assert got == want
    assert _stats_from_toks(td).collect() == corpus_stats_partial(d).collect()
