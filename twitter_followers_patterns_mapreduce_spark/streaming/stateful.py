"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` — the escape hatch for semantics Spark's
built-in window aggregations cannot express (a session ends on
INACTIVITY GAP, not on a fixed boundary).

Batch twin: ``operators/events.py::sessionize`` (lag + running sum).
Streaming needs explicit state because a session's end is only known
when a later event (or a timeout) arrives; state per user is one open
session (constant size), evicted on EVENT-TIME timeout driven by the
stream's watermark.

Flow per micro-batch, per user key:
  * merge new events into the open session while gaps ≤ ``gap``
  * EMIT every session closed by a too-large gap
  * keep the still-open session in state with an event-time timeout at
    ``last_event + gap``; when the watermark passes it, emit the session

NB: ``GroupStateTimeout.EventTimeTimeout`` (+ watermark) — the
ProcessingTimeTimeout variant hard-crashes the Python worker in
pyspark 4.1.2, and event time is the semantically right clock for
session expiry anyway.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SEC = 30 * 60

#: emitted rows — same shape as the batch sessionize output
SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("duration_sec", T.LongType()),
    ]
)

#: state per user: open session (start, last event) as epoch MICROSECONDS.
#: Integer µs, never float seconds: float64 epoch seconds quantize at
#: ~0.5 µs for current epochs, so real microsecond timestamps round to
#: ns-unaligned values that fail Arrow's safe cast to timestamp[us]
#: (and would silently corrupt session bounds even where the cast
#: happened to pass).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_US = 1_000_000
GAP_US = SESSION_GAP_SEC * _US


def _emit(user_id: int, sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": pd.to_datetime([s[0] for s in sessions], unit="us"),
            "n_events": [s[2] for s in sessions],
            "duration_sec": [(s[1] - s[0]) // _US for s in sessions],
        }
    )


def _sessionize_user(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield _emit(user_id, [(start_us, last_us, n)])
        return

    ts = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
    # Timestamp.value is ns regardless of the frame's physical unit
    # (Arrow may hand back datetime64[us] or [ns] depending on version —
    # an astype('int64') would silently change scale); // 1000 → exact µs
    micros = [pd.Timestamp(t).value // 1000 for t in ts]
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us = last_us = micros[0]
        n = 0

    closed: list[tuple[int, int, int]] = []
    for s in micros:
        if n == 0:
            start_us = last_us = s
        elif s - last_us > GAP_US:
            closed.append((start_us, last_us, n))
            start_us, last_us, n = s, s, 0
        else:
            # late (within-watermark, cross-batch) events can precede the
            # stored bounds — a session's extent only ever GROWS.  A bare
            # `last_us = s` here once moved the session end backwards,
            # shrinking duration and re-arming the timeout too early.
            start_us = min(start_us, s)
            last_us = max(last_us, s)
        n += 1
    state.update((start_us, last_us, n))
    # expire the open session when the WATERMARK passes last + gap
    state.setTimeoutTimestamp(last_us // 1000 + SESSION_GAP_SEC * 1000)

    if closed:
        yield _emit(user_id, closed)


def sessionize_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming per-user sessionization.  Arrow-batched state function;
    state is one open session per user, O(|active users|) total, evicted
    by event-time timeout as the watermark advances."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_user,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
