"""Streaming deduplication: exact-once event delivery over a stream.

The streaming twin of ``operators/dedup.dedup_exact_hash``: an at-least-
once source (file landing, Kafka redelivery, retried producers) is
reduced to exactly-once rows by keying on an id or a content hash.

Scale: ``dropDuplicatesWithinWatermark`` keeps one state entry per key
only until the watermark passes its event time + delay — bounded state,
unlike plain ``dropDuplicates`` on a stream, which retains every key
forever. At 100 TB/day the state store holds one hash per key per
watermark horizon, partitioned across executors by the dedup key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._event_time import as_event_time


def dedup_stream_exact(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Drop duplicate events within the watermark horizon.

    ``keys`` defaults to ``["event_id"]``. Works on both streaming and
    batch frames (batch: plain dropDuplicates semantics).
    """
    keys = keys or ["event_id"]
    wm = as_event_time(events).withWatermark("ts", watermark_delay)
    if wm.isStreaming:
        return wm.dropDuplicatesWithinWatermark(keys)
    return wm.dropDuplicates(keys)


def dedup_stream_content_hash(
    docs: DataFrame,
    text_col: str = "text",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Content-addressed streaming dedup: key on a map-side digest.

    The 16-byte md5 (not the document body) is what enters the state
    store and the shuffle — same design as the batch
    ``dedup_exact_hash`` (SURVEY.md §2.11 scale note).
    """
    hashed = as_event_time(docs).withColumn("content_hash", F.md5(F.col(text_col)))
    wm = hashed.withWatermark("ts", watermark_delay)
    if wm.isStreaming:
        return wm.dropDuplicatesWithinWatermark(["content_hash"])
    return wm.dropDuplicates(["content_hash"])
