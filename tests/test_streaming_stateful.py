"""applyInPandasWithState sessionize: closed sessions emitted by the
streaming operator must match the batch sessionize for the same data
(open sessions stay in state — only gap-closed ones compare)."""

from __future__ import annotations

import datetime as dt

import pytest

from twitter_followers_patterns_mapreduce_spark.operators.events import sessionize
from twitter_followers_patterns_mapreduce_spark.streaming.stateful import sessionize_stream
from twitter_followers_patterns_mapreduce_spark.streaming.windows import EVENT_STREAM_SCHEMA

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def at(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def rows():
    # user 1: sessions [0,10], [50,55] (40-min gap), open tail at 120
    # user 2: one session [5,20], open tail at 180
    return [
        (1, at(0), 1, "click", 1.0, "{}"),
        (2, at(10), 1, "click", 1.0, "{}"),
        (3, at(50), 1, "view", 1.0, "{}"),
        (4, at(55), 1, "view", 1.0, "{}"),
        (5, at(120), 1, "click", 1.0, "{}"),
        (6, at(5), 2, "view", 1.0, "{}"),
        (7, at(20), 2, "view", 1.0, "{}"),
        (8, at(180), 2, "click", 1.0, "{}"),
    ]


def test_stateful_sessionize_matches_batch_closed_sessions(spark, tmp_path, rows):
    path = str(tmp_path / "events")
    df = spark.createDataFrame(rows, schema=EVENT_STREAM_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(path)

    stream = spark.readStream.schema(EVENT_STREAM_SCHEMA).parquet(path)
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"].strftime("%Y-%m-%d %H:%M:%S")): (
            r["n_events"],
            r["duration_sec"],
        )
        for r in spark.table("sessions_stream").collect()
    }

    batch = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["duration_sec"])
        for r in sessionize(df).collect()
    }
    # sessions still open at end-of-input stay in state: drop the last
    # session per user from the batch result before comparing
    open_starts = {
        (1, "2024-01-01 02:00:00"),
        (2, "2024-01-01 03:00:00"),
    }
    closed_batch = {k: v for k, v in batch.items() if k not in open_starts}
    assert got == closed_batch
    assert len(got) == 3  # user1 × 2 closed + user2 × 1 closed


def test_sessionize_user_late_event_never_shrinks_session():
    """Regression: a late (within-watermark) event older than the stored
    session end must not move the end backwards — the session extent
    only grows."""
    import pandas as pd

    from twitter_followers_patterns_mapreduce_spark.streaming.stateful import (
        _sessionize_user,
    )

    class FakeState:
        def __init__(self, value):
            self._v = value
            self.hasTimedOut = False
            self.updated = None
            self.timeout = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.updated = v

        def remove(self):
            self._v = None

        def setTimeoutTimestamp(self, ms):
            self.timeout = ms

    # open session: start=100s, last=200s, 5 events; late event at 150s
    # (state is integer epoch-µs)
    state = FakeState((100_000_000, 200_000_000, 5))
    late = pd.DataFrame({"ts": [pd.Timestamp("1970-01-01 00:02:30")]})  # 150 s
    list(_sessionize_user((1,), [late], state))
    start, last, n = state.updated
    assert (start, last, n) == (100_000_000, 200_000_000, 6)
    assert state.timeout == 200_000 + 30 * 60 * 1000
