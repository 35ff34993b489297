"""Connected-components clustering vs a Python union-find (differential)."""

from __future__ import annotations

from csv_2_db_pipeline_data_engineering_spark.operators.dedup import (
    connected_components,
    dedup_minhash_lsh,
    dedup_minhash_lsh_scaled,
)
from tests.conftest import SF_DIR


def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize: every node points at its component minimum
    out = {}
    for x in parent:
        root = find(x)
        comp_min = min(y for y in parent if find(y) == root)
        out[x] = comp_min
    return out


def test_components_match_union_find_on_synthetic_graph(spark):
    # two chains and a triangle, plus an isolated pair
    edges = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (20, 21), (3, 4)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id for r in connected_components(df).collect()}
    want = _union_find(edges)
    assert got == want
    assert got[4] == 1 and got[12] == 10 and got[21] == 20


def test_components_match_union_find_on_real_pairs(spark):
    pairs_df = dedup_minhash_lsh(spark, SF_DIR)
    pairs = [(r.doc_a, r.doc_b) for r in pairs_df.collect()]
    assert pairs, "expected some near-dup pairs at this SF"
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs_df).collect()}
    assert got == _union_find(pairs)


def test_scaled_banding_recovers_identical_pairs(spark):
    """The scale-regime banding (r=3/b=84/k=252) must change candidate
    MASS only: after the exact-Jaccard verify, the surviving pair set —
    ids and rounded Jaccard values — is identical to the shipped r=2
    banding's (the regime-switch contract of dedup_clusters_lsh_scaled)."""
    shipped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    scaled = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_minhash_lsh_scaled(spark, SF_DIR).collect()
    }
    assert shipped, "expected some near-dup pairs at this SF"
    assert scaled == shipped
