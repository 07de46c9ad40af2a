"""X63 — transformWithState session finalizer.

The runtime path is environment-blocked (no google.protobuf in the image;
see the SessionFinalizer docstring), so coverage here is:
  * kernel semantics against a fake StatefulProcessorHandle (the
    processor is plain Python — fold, in-batch split, timer re-arm,
    timer expiry, empty-input no-op);
  * streaming plan construction: idle_sessions must build an unresolved
    TWS plan with the right output schema over a watermarked stream.
"""

from __future__ import annotations

import pandas as pd

from nginx_analytics_spark.streaming.stateful import (
    SESSION_OUT_SCHEMA,
    SessionFinalizer,
)


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class FakeHandle:
    def __init__(self):
        self.state = FakeValueState()
        self.timers: list[int] = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state

    def registerTimer(self, ts):
        self.timers.append(ts)

    def deleteTimer(self, ts):
        self.timers.remove(ts)

    def listTimers(self):
        return list(self.timers)


def _events(ms_list):
    # kernel reads integer-ns 'ts' (pandas datetime64[ns] astype int64)
    return iter([pd.DataFrame({"ts": pd.Series(ms_list, dtype="int64") * 1_000_000})])


def _mk(gap_ms=300_000):
    p = SessionFinalizer(gap_ms)
    h = FakeHandle()
    p.init(h)
    return p, h


def test_fold_and_timer_rearm():
    p, h = _mk()
    out = list(p.handleInputRows((1,), _events([1000, 11_000, 21_000]), None))
    assert out == []  # session still open
    assert h.state.get() == (1000, 21_000, 3)
    assert h.timers == [321_000]  # last + gap
    # second batch within the gap extends and RE-ARMS (old timer deleted)
    out = list(p.handleInputRows((1,), _events([100_000]), None))
    assert out == []
    assert h.state.get() == (1000, 100_000, 4)
    assert h.timers == [400_000]


def test_in_batch_gap_splits_and_emits_inline():
    p, h = _mk(gap_ms=5_000)
    out = list(p.handleInputRows((7,), _events([0, 1_000, 60_000]), None))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row.user_id, row.session_start_ms, row.session_end_ms, row.n_events) == (
        7, 0, 1_000, 2,
    )
    assert h.state.get() == (60_000, 60_000, 1)  # new open session
    assert h.timers == [65_000]


def test_timer_expiry_finalizes_and_clears():
    p, h = _mk()
    list(p.handleInputRows((3,), _events([5_000]), None))
    out = list(p.handleExpiredTimer((3,), None, None))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row.user_id, row.session_start_ms, row.session_end_ms, row.n_events) == (
        3, 5_000, 5_000, 1,
    )
    assert not h.state.exists()
    # spurious second expiry: no state, no output
    assert list(p.handleExpiredTimer((3,), None, None)) == []


def test_empty_batch_is_noop():
    p, h = _mk()
    assert list(p.handleInputRows((1,), iter([]), None)) == []
    assert not h.state.exists() and h.timers == []


def test_idle_sessions_plan_builds(spark):
    """The streaming plan must construct (watermark -> groupBy -> TWS)
    with the declared output schema — the part of the runtime contract
    this environment CAN check."""
    from pyspark.sql.types import StructType

    from nginx_analytics_spark.sources.readers import events_stream
    from nginx_analytics_spark.streaming.stateful import idle_sessions

    stream = events_stream(spark, "/root/testdata/sf0.001")
    out = idle_sessions(stream.select("event_id", "ts", "user_id"), 300)
    assert out.isStreaming
    assert StructType.fromJson(out.schema.jsonValue()) == SESSION_OUT_SCHEMA
