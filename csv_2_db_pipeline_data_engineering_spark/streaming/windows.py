"""Streaming window aggregations + custom stateful sessionization.

Batch twins of these live in ``plans/analytics.py``
(``events_hourly_window``, ``user_sessions``) and are DuckDB-oracle
checked; the streaming variants here add watermarks (bounded state under
late data) and an ``applyInPandasWithState`` sessionizer (the "custom
stateful operator" pattern for semantics Spark's built-in windows can't
express).

Scale: state is keyed by (window, event_type) / user_id and partitioned
across executors by the state-store; the watermark bounds how much of it
survives — without one, streaming aggregation state grows forever.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ._event_time import as_event_time

SESSION_GAP_SEC = 1800


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with a watermark.

    Works on both a streaming and a batch ``events`` DataFrame (the
    watermark is a no-op in batch mode) — same plan shape as the
    oracle-checked ``events_hourly_window``.
    """
    return (
        as_event_time(events).withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions via the BUILT-IN ``session_window`` — the
    idiomatic Spark shape when per-session output is (start, end,
    aggregates). The custom ``applyInPandasWithState`` sessionizer
    below stays for semantics this can't express (mid-stream emission,
    custom state transitions); for plain per-session aggregates this
    one keeps everything JVM-side with watermark-bounded state merge.

    Works on batch frames too (watermark no-ops) — the batch-twin test
    pins streaming output to the batch run over the same files.
    """
    ev = as_event_time(events)
    return (
        ev.withWatermark("ts", watermark_delay)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# GroupState payload: (session_start_us, last_ts_us, n_events)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap_sec: int = SESSION_GAP_SEC,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions per user via ``applyInPandasWithState``.

    Emits one row per *closed* session: a gap > ``gap_sec`` between a
    user's events closes one mid-stream, and the event-time timeout
    (watermark passing ``last_event + gap``) closes the final one —
    event-time, NOT processing-time, so a drain-and-stop run
    (``availableNow``) terminates instead of polling for wall-clock
    timeouts. The state per user is three longs — constant size
    regardless of session length, so 10⁹ users is just a wide
    state-store, not a memory blow-up.

    Requires columns ``user_id``, ``ts`` (event-time timestamp for the
    watermark) and ``ts_us`` (micros long — the engine's events loader
    provides both).
    """
    gap_us = gap_sec * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts = sorted(t for pdf in pdfs for t in pdf["ts_us"].tolist())
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((start_us, last_us, n))
                state.remove()
        elif ts:
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us, last_us, n = ts[0], ts[0], 0
            for t in ts:
                if n > 0 and t - last_us > gap_us:
                    closed.append((start_us, last_us, n))
                    start_us, n = t, 0
                last_us = max(last_us, t)
                n += 1
            state.update((start_us, last_us, n))
            # Close the open session once event time moves past last+gap.
            # Must be strictly above the current watermark or Spark rejects it.
            timeout_ms = max(
                last_us // 1000 + gap_sec * 1000, state.getCurrentWatermarkMs() + 1
            )
            state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return (
        as_event_time(events).withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
