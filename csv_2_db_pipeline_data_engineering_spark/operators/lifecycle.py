"""Deferred-release lifecycle for caches scoped to one catalog query.

One-shot query builders cache intermediates that several downstream
branches consume (a gram stream feeding both the signature mins and the
collect_set, a shingle index feeding both sides of a self-join). The
cache must OUTLIVE the builder call — the returned DataFrame is lazy,
and the plan-shape tests pin the ``InMemoryTableScan`` reuse — but
without a release point every builder call leaks one cached frame for
the whole session (the round-6 advice finding on
``text_bigram_logprob`` and the ``dedup.py`` builders).

``scoped_cache`` caches and registers; ``release_scoped_caches``
unpersists everything registered. Consumers that materialize catalog
results in a loop (``tools/check_oracles.py``, ``bench.py``, the e2e
pipeline drivers) call release once the rows are collected, so a
session that runs the whole catalog ends with zero lingering cached
frames. Caches with a longer-lived explicit owner (the curation folds'
batch-scoped gram stream) keep their own lifecycle and do NOT register
here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


def scoped_cache(df: DataFrame) -> DataFrame:
    """Cache ``df`` and register it for the next ``release_scoped_caches``."""
    cached = df.cache()
    _SCOPED.append(cached)
    return cached


def release_scoped_caches() -> None:
    """Unpersist every registered scoped cache (idempotent, cheap when empty)."""
    while _SCOPED:
        _SCOPED.pop().unpersist()
