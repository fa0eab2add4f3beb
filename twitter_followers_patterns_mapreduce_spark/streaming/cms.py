"""Streaming count-min sketch — the CMS counter grid maintained as
Structured Streaming aggregate state (eleventh gated streaming class).

The batch operator (``operators/stats.py::cms_frequency_profile``)
builds the d×w grid in one pass; here the SAME grid is the streaming
aggregation ``groupBy(j, bucket).count()`` — COUNT is
self-maintainable under inserts, so the executor state store IS the
sketch (d·w keys, fixed-size state regardless of stream length: the
whole point of a sketch as streaming state — per-key exact counting
would grow with the key universe).  Each micro-batch increments the
cells its rows hash to; ``complete`` output re-emits the current grid.

Parity is by construction: the hash fan (md5-h64 + affine rows,
``functions/hashing.py``) is the same expression text as the batch
build, so the drained grid equals the batch grid cell-for-cell and
the registered query's probe readout hash-gates against the batch CMS
oracle — streaming maintenance == one-shot batch == DuckDB rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from twitter_followers_patterns_mapreduce_spark.functions.hashing import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_bucket_sql,
    h64_sql,
)


def cms_grid_stream(events: DataFrame, key_col: str = "user_id", w: int = CMS_WIDTH) -> DataFrame:
    """CMS cell counts over a streaming key column — the grid as
    aggregate state.  No watermark: the grid is cumulative over the
    whole stream (sketches summarize everything seen; eviction would
    change the answer), and state is bounded at d·w cells by
    construction, not by time."""
    h = h64_sql(f"CAST(CAST({key_col} AS BIGINT) AS STRING)", "spark")
    stack_args = ", ".join(f"{j}, {cms_bucket_sql('h', j, w)}" for j in range(CMS_DEPTH))
    return (
        events.selectExpr(f"{h} AS h")
        .selectExpr(f"stack({CMS_DEPTH}, {stack_args}) AS (j, bucket)")
        .groupBy("j", "bucket")
        .count()
        .withColumnRenamed("count", "cell_n")
    )
