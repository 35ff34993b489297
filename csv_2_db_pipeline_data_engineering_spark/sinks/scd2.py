"""SCD Type-2 merge: keyed upsert that keeps full change history.

Extension of the reference's idempotent upsert (``src/load.py:87-95``,
last-write-wins, history-destroying): warehouse dimension tables usually
need *when was this row true*, so each key carries versioned rows with
``valid_from`` / ``valid_to`` / ``is_current``.

Merge semantics for a snapshot batch at ``batch_date``:

- new key            -> insert (valid_from=batch_date, open-ended, current)
- changed attributes -> close the current row (valid_to=batch_date,
                        not current) AND insert a new current row
- unchanged          -> carried through untouched
- closed history     -> carried through untouched
- re-running the same batch is a no-op (idempotent): the "new" version
  equals the current row, so no change is detected.

Plan shape (100 TB): one full-outer join of the *current slice* against
the batch on the key — a single hash shuffle; history rows bypass the
join entirely via a cheap filter-union. Attribute comparison is a
null-safe column expression (JVM codegen, no UDF). With the dimension
bucketed on the key the shuffle disappears.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(snapshot: DataFrame, batch_date: str) -> DataFrame:
    """Bootstrap an SCD2 table from a first snapshot."""
    return snapshot.select(
        "*",
        F.lit(batch_date).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def _changed(tracked: list[str]) -> F.Column:
    """Null-safe any-attribute-differs predicate between cur.* and inc.*."""
    diffs = [
        ~F.col(f"cur.{c}").eqNullSafe(F.col(f"inc.{c}")) for c in tracked
    ]
    return reduce(lambda a, b: a | b, diffs)


def scd2_merge(
    table: DataFrame,
    snapshot: DataFrame,
    key: str,
    batch_date: str,
) -> DataFrame:
    """Merge a new snapshot into an SCD2 table; returns the new table plan.

    ``table`` must carry the META_COLS (start from :func:`scd2_init`).
    ``snapshot`` carries business columns only. Keys absent from the
    snapshot are left open (treat-missing-as-unchanged; deletion
    tracking would close them instead — not part of the contract here).
    """
    business = [c for c in table.columns if c not in META_COLS]
    tracked = [c for c in business if c != key]
    if set(snapshot.columns) != set(business):
        raise ValueError(
            f"snapshot columns {sorted(snapshot.columns)} != table business "
            f"columns {sorted(business)}"
        )

    history = table.filter(~F.col("is_current"))
    current = table.filter(F.col("is_current")).alias("cur")
    inc = snapshot.alias("inc")

    joined = current.join(inc, F.col(f"cur.{key}") == F.col(f"inc.{key}"), "full_outer")
    is_new = F.col(f"cur.{key}").isNull()
    is_changed = F.col(f"cur.{key}").isNotNull() & F.col(f"inc.{key}").isNotNull() & _changed(tracked)

    # Current rows carried forward: unchanged, or key absent from batch.
    carried = joined.filter(~is_new & ~is_changed).select("cur.*")
    # Current rows whose attributes changed: close them out.
    closed = (
        joined.filter(is_changed)
        .select("cur.*")
        .withColumn("valid_to", F.lit(batch_date).cast("date"))
        .withColumn("is_current", F.lit(False))
    )
    # Fresh versions: brand-new keys + new versions of changed keys.
    fresh = (
        joined.filter(is_new | is_changed)
        .select("inc.*")
        .select(
            "*",
            F.lit(batch_date).cast("date").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    cols = business + list(META_COLS)
    return (
        history.select(*cols)
        .unionByName(carried.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(fresh.select(*cols))
    )


def scd2_current(table: DataFrame) -> DataFrame:
    """The as-of-now slice (what a plain dimension table would hold)."""
    return table.filter(F.col("is_current")).drop(*META_COLS)


def scd2_asof(table: DataFrame, as_of: str) -> DataFrame:
    """Point-in-time slice: rows valid at ``as_of`` (time-travel read)."""
    d = F.lit(as_of).cast("date")
    return table.filter(
        (F.col("valid_from") <= d)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
    ).drop(*META_COLS)
