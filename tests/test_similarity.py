"""ANN recall tests: approximate variants vs the exact brute-force baseline."""

from __future__ import annotations

from csv_2_db_pipeline_data_engineering_spark.operators.similarity import (
    TOP_K,
    ann_ivf,
    ann_lsh_bucketed,
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
