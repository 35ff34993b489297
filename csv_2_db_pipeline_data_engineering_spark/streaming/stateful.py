"""Arbitrary stateful streaming on Spark 4's transformWithStateInPandas.

The successor API to ``applyInPandasWithState`` (which
``streaming/windows.py`` demonstrates): a ``StatefulProcessor`` object
owns named state handles (value/list/map state, optional TTL, timers)
instead of a single state tuple — the building block for long-running
per-key operators whose state must outlive any one micro-batch but
still be bounded.

:class:`RunningUserStats` keeps one value-state row per user (event
count + value sum) and emits the updated running aggregate every time
the key appears in a batch. State economics at 100 TB/day: exactly one
small row per active key in the state store, updated in place —
O(active keys), never O(history); a production deployment adds a TTL
config so dormant keys age out of the store entirely (the knob this
API adds over applyInPandasWithState's manual timeout bookkeeping).

The processor class lives at module scope ON PURPOSE: cloudpickle
serializes classes by reference, and the transform-with-state driver
worker is a separate Python process that must import this module (the
same constraint as the Arrow kernel functions the multimodal operators
reference).

Container limitation (honest, like PIL/ffmpeg for the codecs): the
transformWithState STATE PROTOCOL speaks protobuf between the JVM
state server and the Python worker
(``pyspark/sql/streaming/proto/StateMessage_pb2``), and this container
has no ``protobuf`` package — the query fails at pre-init with
``ImportError: google.protobuf``. The operator and its batch-twin
contract test run wherever protobuf is installed
(``tests/test_stateful.py`` skips here, the live-Postgres gate
pattern); ``applyInPandasWithState`` (``streaming/windows.py``) covers
custom stateful processing in-container.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

RUNNING_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)


class RunningUserStats(StatefulProcessor):
    """Per-user running (count, sum) over an unbounded event stream."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", "n BIGINT, total DOUBLE")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        prev = self._agg.get()
        n, total = (int(prev[0]), float(prev[1])) if prev else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._agg.update((n, total))
        yield pd.DataFrame(
            {"user_id": [int(key[0])], "n_events": [n], "value_sum": [total]}
        )

    def close(self) -> None:
        pass


def running_user_stats(events: DataFrame) -> DataFrame:
    """Updated per-user running aggregates, one row per (key, batch).

    Works on a streaming frame (each batch emits the keys it touched
    with their post-batch totals). The batch-twin contract tested in
    ``tests/test_stateful.py``: after draining a bounded stream, the
    LAST update per user equals the plain groupBy aggregate.
    """
    return events.select("user_id", "value").groupBy("user_id").transformWithStateInPandas(
        RunningUserStats(),
        outputStructType=RUNNING_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
