"""Corpus lifecycle audits: snapshot diff and canary-string contamination.

Training corpora are rebuilt continuously; two audits every release
pipeline runs before shipping a new snapshot:

- **Snapshot diff** — classify every document as added / removed /
  changed / unchanged between the previous release and this one, so the
  release note (and the incremental dedup / re-embedding work queue) is
  derived from data, not hope.  This is the Delta-Lake-style CDF
  question answered with plain content digests.
- **Canary scan** — search the corpus for planted canary GUIDs (the
  BIG-bench / memorization-probe convention): any hit means evaluation
  or secret material leaked into training data and the affected docs
  must be quarantined.

Scale design (100 TB):
- The diff is ONE equi-join on ``doc_id``.  At production scale both
  snapshots are written bucketed by ``doc_id`` (``sinks/layout.py``), so
  the full-outer join is a zero-shuffle sort-merge over co-located
  buckets; comparison is on 16-byte md5 digests, never on document
  bodies, so the shuffle-free join moves O(rows · 24 B).
- The canary scan is a map-only pass: the canary list is tiny and
  broadcast, each partition scans its documents once with a codegen
  ``contains`` per canary, and the aggregate has O(|canaries|) keys
  with map-side combine.  Nothing about the corpus moves.

The driver testdata has a single static ``documents`` table, so both
queries derive the "other side" deterministically in-plan (previous
snapshot via doc_id-keyed rules, canaries planted on doc_id % 53 == 0)
— identically in Spark and the DuckDB oracle, the repo's planted-
witness pattern (see ``dedup._with_planted_twins``).

Reference parity note: the reference (pandas -> Postgres ETL,
``main.py:41-136``) has no versioning surface; this is part of the
driver-mandated large-scale-pipeline extension (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import Query
from ..sources.tables import load_table

# Previous-snapshot derivation rules (doc_id mod 11):
#   residue 3 -> absent from the old snapshot  => ADDED in the new one
#   residue 5 -> text differed in the old one  => CHANGED
#   residue 7 -> the old snapshot ALSO had a doc that the new one
#                dropped (mapped to a disjoint negative id) => REMOVED
SNAP_MOD = 11
SNAP_ADDED_RES = 3
SNAP_CHANGED_RES = 5
SNAP_REMOVED_RES = 7


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Added/removed/changed/unchanged summary between corpus snapshots.

    Output: one row per status with document count, total chars (from
    whichever side carries the doc), and the id range as a witness.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    res = F.col("doc_id") % SNAP_MOD

    new = docs.select(
        "doc_id", F.md5("text").alias("new_digest"), F.col("n_chars").alias("new_chars")
    )
    old_base = docs.filter(res != SNAP_ADDED_RES).select(
        "doc_id",
        F.md5(
            F.when(
                res == SNAP_CHANGED_RES, F.concat(F.col("text"), F.lit(" [rev1]"))
            ).otherwise(F.col("text"))
        ).alias("old_digest"),
        F.col("n_chars").alias("old_chars"),
    )
    old_removed = docs.filter(res == SNAP_REMOVED_RES).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.md5("text").alias("old_digest"),
        F.col("n_chars").alias("old_chars"),
    )
    old = old_base.unionByName(old_removed)

    joined = new.join(old, "doc_id", "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("new_digest") != F.col("old_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            status.alias("status"),
            "doc_id",
            F.coalesce("new_chars", "old_chars").alias("chars"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("chars").alias("n_chars_total"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("status")
    )


SNAPSHOT_DIFF_ORACLE = f"""
WITH new_snap AS (
  SELECT doc_id, md5(text) AS new_digest, n_chars AS new_chars FROM documents
),
old_snap AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % {SNAP_MOD} = {SNAP_CHANGED_RES}
                  THEN text || ' [rev1]' ELSE text END) AS old_digest,
         n_chars AS old_chars
  FROM documents WHERE doc_id % {SNAP_MOD} != {SNAP_ADDED_RES}
  UNION ALL
  SELECT -doc_id - 1, md5(text), n_chars
  FROM documents WHERE doc_id % {SNAP_MOD} = {SNAP_REMOVED_RES}
),
joined AS (
  SELECT CASE WHEN o.old_digest IS NULL THEN 'added'
              WHEN n.new_digest IS NULL THEN 'removed'
              WHEN n.new_digest != o.old_digest THEN 'changed'
              ELSE 'unchanged' END AS status,
         COALESCE(n.doc_id, o.doc_id) AS doc_id,
         COALESCE(n.new_chars, o.old_chars) AS chars
  FROM new_snap n FULL OUTER JOIN old_snap o USING (doc_id)
)
SELECT status, COUNT(*)::BIGINT AS n_docs, SUM(chars)::BIGINT AS n_chars_total,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM joined GROUP BY status ORDER BY status
"""


# Canary plant: every doc with doc_id % CANARY_MOD == 0 carries one of
# N_CANARIES canary GUIDs (md5 of a fixed label), selected by doc_id.
N_CANARIES = 4
CANARY_MOD = 53


def _canary_str(i) -> F.Column:  # Column-or-int accepted by concat/md5
    return F.md5(F.concat(F.lit("canary:"), F.lit(i) if isinstance(i, int) else i.cast("string")))


def canary_contamination_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-canary hit counts over the (deterministically planted) corpus.

    Output: one row per registered canary — canary_id, the GUID, how
    many documents contain it, and the id range of the hits (0-count
    canaries still appear: a clean corpus is an auditable result).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % CANARY_MOD == 0,
            F.concat(
                F.col("text"),
                F.lit(" canary-"),
                _canary_str(F.col("doc_id") % N_CANARIES),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    canaries = spark.range(N_CANARIES).select(
        F.col("id").alias("canary_id"), _canary_str(F.col("id")).alias("canary")
    )
    hits = (
        planted.crossJoin(F.broadcast(canaries))
        .filter(F.contains("text", F.col("canary")))
        .groupBy("canary_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )
    return (
        canaries.join(F.broadcast(hits), "canary_id", "left")
        .select(
            "canary_id",
            "canary",
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            "min_doc_id",
            "max_doc_id",
        )
        .orderBy("canary_id")
    )


CANARY_SCAN_ORACLE = f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % {CANARY_MOD} = 0
              THEN text || ' canary-' || md5('canary:' || (doc_id % {N_CANARIES})::VARCHAR)
              ELSE text END AS text
  FROM documents
),
canaries AS (
  SELECT i AS canary_id, md5('canary:' || i::VARCHAR) AS canary
  FROM range({N_CANARIES}) t(i)
),
hits AS (
  SELECT c.canary_id, COUNT(*)::BIGINT AS n_docs,
         MIN(p.doc_id) AS min_doc_id, MAX(p.doc_id) AS max_doc_id
  FROM planted p JOIN canaries c ON contains(p.text, c.canary)
  GROUP BY 1
)
SELECT c.canary_id, c.canary,
       COALESCE(h.n_docs, 0)::BIGINT AS n_docs, h.min_doc_id, h.max_doc_id
FROM canaries c LEFT JOIN hits h USING (canary_id)
ORDER BY c.canary_id
"""


QUERIES = [
    Query(
        "corpus_snapshot_diff",
        "added/removed/changed/unchanged between corpus snapshots (digest diff)",
        corpus_snapshot_diff,
        SNAPSHOT_DIFF_ORACLE,
    ),
    Query(
        "canary_contamination_scan",
        "per-canary GUID hit counts over the corpus (memorization-probe audit)",
        canary_contamination_scan,
        CANARY_SCAN_ORACLE,
    ),
]
