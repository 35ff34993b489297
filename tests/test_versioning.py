"""Corpus lifecycle audits: snapshot diff + canary contamination scan."""

from __future__ import annotations

from csv_2_db_pipeline_data_engineering_spark.operators.versioning import (
    CANARY_MOD,
    N_CANARIES,
    SNAP_ADDED_RES,
    SNAP_MOD,
    canary_contamination_scan,
    corpus_snapshot_diff,
)
from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def test_snapshot_diff_partitions_the_corpus(spark):
    rows = {r["status"]: r for r in corpus_snapshot_diff(spark, SF_DIR).collect()}
    assert set(rows) == {"added", "removed", "changed", "unchanged"}
    n_docs = load_table(spark, SF_DIR, "documents").count()
    # every CURRENT doc is added/changed/unchanged; removed rows are extra
    assert (
        rows["added"]["n_docs"] + rows["changed"]["n_docs"] + rows["unchanged"]["n_docs"]
        == n_docs
    )
    # removed docs live on the synthetic negative-id range
    assert rows["removed"]["max_doc_id"] < 0
    # added = exactly the residue class the old snapshot lacked
    expected_added = (
        load_table(spark, SF_DIR, "documents")
        .filter(f"doc_id % {SNAP_MOD} = {SNAP_ADDED_RES}")
        .count()
    )
    assert rows["added"]["n_docs"] == expected_added


def test_snapshot_diff_compares_digests_not_bodies(spark):
    plan = (
        corpus_snapshot_diff(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # digests are computed below the join (project-then-join): the md5
    # appears in the plan, and the join itself is keyed, never cartesian
    assert "md5" in plan
    assert "FullOuter" in plan or "full_outer" in plan
    assert "CartesianProduct" not in plan


def test_canary_scan_reports_every_canary(spark):
    rows = canary_contamination_scan(spark, SF_DIR).collect()
    assert len(rows) == N_CANARIES
    assert [r["canary_id"] for r in rows] == list(range(N_CANARIES))
    planted_total = (
        load_table(spark, SF_DIR, "documents").filter(f"doc_id % {CANARY_MOD} = 0").count()
    )
    assert sum(r["n_docs"] for r in rows) == planted_total
    for r in rows:
        if r["n_docs"] > 0:
            assert r["min_doc_id"] % CANARY_MOD == 0
            assert r["min_doc_id"] % N_CANARIES == r["canary_id"]


def test_canary_scan_is_broadcast_map_only(spark):
    plan = (
        canary_contamination_scan(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
