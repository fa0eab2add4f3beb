"""Structured-streaming surface: event-time window aggregations with
watermarks (``windows.py``), batch-equivalent by construction with
``operators/events.py``."""

from twitter_followers_patterns_mapreduce_spark.streaming.windows import (  # noqa: F401
    events_file_stream,
    run_available_now,
    sliding_window_stream,
    tumbling_hourly_stream,
)
