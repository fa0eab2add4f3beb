"""TWS processor semantics WITHOUT the protobuf runtime — see
test_streaming_tws.py for the env-gated end-to-end drain.  This module
has no skip: RunningUserTotals is pure pandas over the public
StatefulProcessor interface, so a fake state handle executes the exact
per-key accumulate path the TWS runtime would drive."""

from __future__ import annotations
# --- runs WITHOUT protobuf: the processor's accumulator semantics ----------
# The TWS *runtime* (JVM state server <-> Python worker) needs protobuf,
# but RunningUserTotals itself is pure pandas over the public
# StatefulProcessor interface.  Driving it with a fake handle executes
# the exact per-key accumulate path the runtime would, so the only
# thing the environment gate skips is the wire protocol.


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _FakeValueState())


def test_tws_processor_accumulates_with_fake_handle():
    import pandas as pd

    from twitter_followers_patterns_mapreduce_spark.streaming.tws import RunningUserTotals

    proc = RunningUserTotals()
    handle = _FakeHandle()
    proc.init(handle)
    (out1,) = proc.handleInputRows(
        (7,), iter([pd.DataFrame({"value": [1.0, 2.0]}), pd.DataFrame({"value": [3.0]})]), None
    )
    assert out1.iloc[0].to_dict() == {"user_id": 7, "n_events": 3, "sum_value": 6.0}
    # second micro-batch: state carries, totals are cumulative
    (out2,) = proc.handleInputRows((7,), iter([pd.DataFrame({"value": [4.0]})]), None)
    assert out2.iloc[0].to_dict() == {"user_id": 7, "n_events": 4, "sum_value": 10.0}
    proc.close()
