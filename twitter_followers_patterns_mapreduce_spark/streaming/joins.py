"""Stream-stream event-time joins — the last Structured Streaming
operator class in the engine's streaming surface (windowed aggs:
``windows.py``; stateful sessions: ``stateful.py``; dedup:
``dedup.py``; stream-static enrich: ``windows.segment_window_stream``).

The reference is batch-only (SURVEY.md §2.7); the batch twin of this
operator is ``operators/temporal.py::range_attribution``, and the
batch-equivalence test pins the two together.

Scale/state model (public Structured Streaming semantics): BOTH sides
buffer rows in the state store keyed by ``user_id``; the watermark plus
the event-time interval condition lets Spark evict a buffered row once
no future input can match it — without both, state grows unboundedly.
Inner-join matches emit as soon as both rows have arrived (no watermark
wait on emission; the watermark only bounds retention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "4 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming purchase→click attribution: every (click, purchase)
    pair for the same user with the purchase inside
    ``[click_ts, click_ts + window)`` — the stream-stream interval
    inner join.

    Both inputs must be streaming DataFrames with ``event_id``, ``ts``,
    ``user_id`` columns.  The join key is the ``user_id`` equi-condition
    (state is hash-partitioned on it; skewed users are the hot-state
    analogue of a skewed shuffle key) and the interval predicate both
    filters matches and bounds state eviction.
    """
    c = clicks.select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr(f"INTERVAL {window}"))
    )
    return c.join(p, cond).select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts", "purchase_value"
    )


def attribution_stream_join_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "4 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER form of :func:`attribution_stream_join` — every click
    row eventually emits, matched or not: the unattributed-click audit
    as a stream (batch twin: the same join with ``how='left'``).

    Outer semantics are WATERMARK-DRIVEN (public Structured Streaming
    contract): a click can only emit with nulls once the watermark
    proves no future purchase can still match it (click_ts + window <
    watermark), so null rows trail the data by watermark + window, and
    a drain needs at least one micro-batch AFTER the batch that
    advanced the watermark (emission happens when state is evicted,
    which is evaluated at the START of a batch).  State/eviction model
    is identical to the inner form — the outer flag changes only what
    happens to evicted-unmatched rows (emit-null vs drop).
    """
    c = clicks.select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr(f"INTERVAL {window}"))
    )
    return c.join(p, cond, "leftOuter").select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts", "purchase_value"
    )
