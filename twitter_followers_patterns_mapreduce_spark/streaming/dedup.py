"""Streaming deduplication — the streaming form of the exact-dedup
family in ``operators/dedup.py``.

``dropDuplicatesWithinWatermark`` keeps dedup state only for the
watermark horizon: a duplicate arriving within the horizon is dropped,
and state for keys older than the watermark is evicted — bounded
memory on an unbounded stream.  Plain ``dropDuplicates`` on a stream
would grow state forever (every key seen since the epoch); the
watermarked form is the only shape that survives at 100 TB/day ingest.

Batch/stream parity: on a replayed bounded input whose duplicates all
arrive within the horizon, the output key-set equals batch
``dropDuplicates`` — pinned by tests/test_streaming_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exact streaming dedup on ``event_id`` within the watermark
    horizon.  First arrival wins; later duplicates inside the horizon
    are dropped; state is evicted as the watermark advances."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])
