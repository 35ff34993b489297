"""Crash-safe versioned-commit LSM compaction for the tagged indexes.

Shared by the signature / line / CMS / span / embedding indexes (one
implementation instead of five copies — the r10 review's ask). The
naive choreography (write the merged partition into the read
namespace, delete sources, rename into place) has two crash windows:

- after the merged write, before the deletes → glob readers see the
  sources AND the merge, silently DOUBLE-COUNTING every row (fatal for
  the count-bearing indexes: CMS counters, line df, span df partials);
- after the deletes, before coverage metadata lands → committed
  history becomes silently invisible.

Both close under a versioned commit: the merge is written under a NEW
base version (``delta=base_v<N+1>``) that readers ignore until one
atomic ``os.replace`` of the state file flips them over, and source
deletion happens strictly AFTER the commit — at every crash point the
visible tag set is exactly the old one or exactly the new one, never a
mix. A stale pending version from a crashed attempt is invisible (not
the active base) and is overwritten by the next attempt.

State file ``_BASE.json`` at the index root:
``{"v": N, "base": "base_vN", "folded": ["tag", ...]}`` — readers see
the active base version plus every extend tag NOT in ``folded``.
``folded`` is never pruned: a tag's dir may be re-created by a
crash-replayed extend after its rows were folded into the base, and
the exclusion is what keeps that replay idempotent instead of
double-counted.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_STATE = "_BASE.json"


def read_state(path: str) -> dict | None:
    p = os.path.join(path, _STATE)
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as fh:
        return json.load(fh)


def _write_state(path: str, state: dict) -> None:
    fd, tmp = tempfile.mkstemp(prefix="._base_", dir=path)
    with os.fdopen(fd, "w", encoding="utf-8") as fh:
        json.dump(state, fh)
    os.replace(tmp, os.path.join(path, _STATE))  # the atomic commit


def visible_tags(path: str, sub: str = "") -> list[str]:
    """Tag names (without ``delta=``) a reader should resolve: the
    active base version plus every extend tag not folded into it.
    Stale/pending base versions are never visible."""
    state = read_state(path)
    folded = set(state["folded"]) if state else set()
    base = state["base"] if state else None
    d = os.path.join(path, sub) if sub else path
    if not os.path.isdir(d):
        return []
    out = []
    for entry in sorted(os.listdir(d)):
        if not entry.startswith("delta="):
            continue
        tag = entry[len("delta=") :]
        if tag.startswith("base_v"):
            if tag == base:
                out.insert(0, tag)
            continue  # stale or uncommitted version
        if tag in folded:
            continue
        out.append(tag)
    return out


def index_paths(path: str, sub: str = "") -> list[str]:
    """Full ``delta=`` directory paths for a ``spark.read.parquet``."""
    d = os.path.join(path, sub) if sub else path
    return [os.path.join(d, f"delta={t}") for t in visible_tags(path, sub)]


def read_visible(
    spark: SparkSession, path: str, sub: str = ""
) -> DataFrame | None:
    """The visible tag set as one frame (None if the index is empty)."""
    paths = index_paths(path, sub)
    if not paths:
        return None
    d = os.path.join(path, sub) if sub else path
    return spark.read.option("basePath", d).parquet(*paths).drop("delta")


def compact(
    spark: SparkSession,
    path: str,
    subs: dict[str, Callable[[DataFrame], DataFrame] | None],
    only_tags: set[str] | None = None,
) -> None:
    """Fold the visible tags of every sub-table into one new base
    version and commit atomically.

    ``subs`` maps sub-table dir name ('' for a flat index) to an
    optional re-aggregation (for indexes whose tags hold mergeable
    PARTIALS — CMS counters, line/span document frequencies; None
    rewrites immutable rows as-is). All sub-tables share one tag set.
    ``only_tags`` restricts which extend tags fold (a stream passes its
    COMMITTED batch tags, leaving a crashed uncommitted tag alone); the
    current base always folds.
    """
    state = read_state(path)
    probe = next(iter(subs))
    tags = visible_tags(path, probe)
    fold = [
        t
        for t in tags
        if t.startswith("base_v") or only_tags is None or t in only_tags
    ]
    if not any(not t.startswith("base_v") for t in fold):
        return  # nothing new to fold
    n = (state["v"] + 1) if state else 1
    new_base = f"base_v{n}"
    for sub, agg in subs.items():
        d = os.path.join(path, sub) if sub else path
        src = [
            os.path.join(d, f"delta={t}")
            for t in fold
            if os.path.isdir(os.path.join(d, f"delta={t}"))
        ]
        df = spark.read.option("basePath", d).parquet(*src).drop("delta")
        if agg is not None:
            df = agg(df)
        # written OUTSIDE the visible set: base_v{n} != state's base
        df.write.mode("overwrite").parquet(os.path.join(d, f"delta={new_base}"))
    folded = sorted(
        (set(state["folded"]) if state else set())
        | {t for t in fold if not t.startswith("base_v")}
    )
    # COMMIT: one atomic state replace — readers flip from (old base +
    # folded tags) to (new base) in a single step
    _write_state(path, {"v": n, "base": new_base, "folded": folded})
    # cleanup strictly after the commit: everything deleted here is
    # already invisible, so a crash mid-delete changes nothing
    for sub in subs:
        d = os.path.join(path, sub) if sub else path
        for t in fold:
            shutil.rmtree(os.path.join(d, f"delta={t}"), ignore_errors=True)
        for entry in os.listdir(d):
            if entry.startswith("delta=base_v") and entry != f"delta={new_base}":
                shutil.rmtree(os.path.join(d, entry), ignore_errors=True)
        spark.catalog.refreshByPath(d)
