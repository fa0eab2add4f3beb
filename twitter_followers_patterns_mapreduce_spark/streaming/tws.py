"""``transformWithStateInPandas`` — Spark 4's general stateful
streaming operator (the successor API to ``applyInPandasWithState``
used in ``stateful.py``): typed named state handles, TTL, timers.

Runtime dependency: the TWS Python driver worker speaks protobuf to
the JVM state server — environments without ``google.protobuf`` (this
container) cannot RUN it, so the accumulate-across-batches test skips
there and ``stateful.py``'s ``applyInPandasWithState`` remains the
exercised stateful path.  The operator itself is pure public API.

Operator here: per-user RUNNING totals maintained across micro-batches
in a ``ValueState`` — the canonical incremental-aggregation shape where
the state is a bounded O(1)-per-key accumulator, never a buffer of raw
rows.  Each batch emits one updated row per user seen in that batch
(Update output mode).

Scale/state model: state lives in the state store hash-partitioned by
the group key (user_id), so hot users are the hot-state analogue of a
skewed shuffle key; the accumulator is two numbers per user regardless
of event volume — the property that makes this run forever.  TTL (not
set here) is the eviction knob for key churn.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

_STATE_SCHEMA = "n_events LONG, sum_value DOUBLE"
_OUTPUT_SCHEMA = "user_id LONG, n_events LONG, sum_value DOUBLE"


class RunningUserTotals(StatefulProcessor):
    """ValueState accumulator: (n_events, sum_value) per user."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, sv = (0, 0.0)
        if self._totals.exists():
            prev = self._totals.get()
            n, sv = int(prev[0]), float(prev[1])
        for pdf in rows:
            n += len(pdf)
            sv += float(pdf["value"].sum())
        self._totals.update((n, sv))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [sv]}
        )

    def close(self) -> None:
        pass


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals via transformWithStateInPandas
    (Update mode, processing-time)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningUserTotals(),
        outputStructType=_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
