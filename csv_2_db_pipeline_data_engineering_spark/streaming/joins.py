"""Stream-stream and stream-static joins with watermark-bounded state.

Completes the streaming surface (SURVEY.md §2 extension): the batch
catalog's join family (plans/analytics.py) re-expressed for unbounded
inputs. Batch-equivalence is the correctness contract — each builder
runs identically on bounded frames (watermarks are no-ops in batch), and
the tests pin streaming output to the batch twin's.

Scale notes (100 TB/day streams):
- A stream-stream inner join buffers BOTH sides in the state store
  keyed by join key; without time bounds that state grows forever. The
  interval condition + watermarks below let Spark evict rows older than
  ``watermark - interval`` — state is O(rate x window), not O(history).
- The time-interval predicate must appear in the JOIN condition (not a
  post-filter) for the state-eviction analysis to see it.
- Stream-static joins keep NO state for the static side per-batch; the
  static frame is re-resolved each micro-batch (picks up dimension
  updates) and broadcast when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._event_time import as_event_time


def enrich_stream_static(events: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static broadcast enrichment (dimension join).

    ``events`` may be streaming; ``dim`` is a bounded frame re-read per
    micro-batch. Broadcast keeps the stream side shuffle-free.
    """
    return events.join(F.broadcast(dim), key, "left")


def join_event_pairs(
    clicks: DataFrame,
    views: DataFrame,
    max_gap: str = "10 minutes",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join: click attributed to a prior view by the
    same user within ``max_gap``.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so the state store holds only ``watermark + max_gap`` worth
    of rows per side. Output columns are stable for the batch-twin test.
    """
    v = (
        as_event_time(views).withWatermark("ts", watermark_delay)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    c = (
        as_event_time(clicks).withWatermark("ts", watermark_delay)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"interval {max_gap}"))
    )
    return v.join(c, cond).select(
        F.col("c_user").alias("user_id"),
        "view_id",
        "click_id",
        (F.col("click_ts").cast("long") - F.col("view_ts").cast("long")).alias(
            "gap_sec"
        ),
    )


def join_event_pairs_outer(
    clicks: DataFrame,
    views: DataFrame,
    max_gap: str = "10 minutes",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Stream-stream LEFT OUTER join: every view, with its attributed
    click or NULLs if none arrived in time.

    The semantics the inner join can't express: an unmatched view must
    still be EMITTED (with null click columns) — which a streaming
    engine can only do once the watermark proves no matching click can
    still arrive. State economics are identical to the inner join
    (watermark + interval bound both buffers); the extra behavior is
    the null emission on state expiry, pinned by the batch-twin test
    (in batch, watermarks are no-ops and this is a plain left join).
    """
    v = (
        as_event_time(views).withWatermark("ts", watermark_delay)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    c = (
        as_event_time(clicks).withWatermark("ts", watermark_delay)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"interval {max_gap}"))
    )
    return v.join(c, cond, "leftOuter").select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        (F.col("click_ts").cast("long") - F.col("view_ts").cast("long")).alias(
            "gap_sec"
        ),
    )
