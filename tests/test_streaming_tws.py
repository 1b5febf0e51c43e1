"""The transformWithStateInPandas twin (streaming/stateful_tws.py).

The TWS runtime needs protobuf (absent here, no pip), so certification is
split the live-Kafka-smoke way:
- the PROCESSOR's state machine runs in-process against fakes that
  implement the documented ListState / timer API verbatim — the golden
  scenarios from ``test_streaming_stateful.py`` re-certified on the new
  API's code path;
- the end-to-end query test runs only where protobuf exists.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from kafka_streams_join_spark.streaming.stateful_tws import (
    TimeoutJoinProcessor,
    tws_available,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
T0_MS = int(T0.timestamp() * 1000)
KEY = "0f1f53a0-44f5-4b84-9699-fe853c90ed1c"
OTHER_KEY = "9750c569-44c2-49e6-854e-01e0eae04bb6"
DISPLAY = '{"type":"display"}'
CLICK = '{"type":"click"}'
W_MS = 1000


class FakeListState:
    def __init__(self):
        self.rows = []

    def get(self):
        return iter(list(self.rows))

    def put(self, new):
        self.rows = list(new)

    def appendValue(self, row):
        self.rows.append(row)

    def clear(self):
        self.rows = []


class FakeHandle:
    def __init__(self):
        self.states = {}
        self.timers = []

    def getListState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeListState())

    def registerTimer(self, ts_ms):
        if ts_ms not in self.timers:
            self.timers.append(ts_ms)


class FakeExpiredTimerInfo:
    def __init__(self, ts_ms):
        self._t = ts_ms

    def getExpiryTimeInMs(self):
        return self._t


def _pdf(rows):
    return pd.DataFrame(
        {
            "side": [s for s, _, _ in rows],
            "value": [v for _, v, _ in rows],
            "ts": pd.to_datetime([t for _, _, t in rows], unit="ms"),
        }
    )


def _drive(batches, watermark_ms):
    """Feed input batches, then fire every registered timer <= watermark
    in order — exactly the TWS runtime's contract."""
    proc = TimeoutJoinProcessor(W_MS)
    handle = FakeHandle()
    proc.init(handle)
    for batch in batches:
        list(proc.handleInputRows((KEY,), iter([_pdf(batch)]), None))
    out = []
    for t in sorted(handle.timers):
        if t <= watermark_ms:
            for pdf in proc.handleExpiredTimer(
                (KEY,), None, FakeExpiredTimerInfo(t)
            ):
                out.extend(
                    (r["key"], r["value"], r["ts"].to_pydatetime())
                    for _, r in pdf.iterrows()
                )
    return proc, handle, out


def test_tws_scenario1_click_inside_window_cancels():
    _, _, out = _drive(
        [[("display", DISPLAY, T0_MS), ("click", CLICK, T0_MS + 500)]],
        watermark_ms=T0_MS + 10_000,
    )
    assert out == []


def test_tws_scenario2_click_outside_window_emits():
    proc, handle, out = _drive(
        [[("display", DISPLAY, T0_MS), ("click", CLICK, T0_MS + 2000)]],
        watermark_ms=T0_MS + 10_000,
    )
    assert out == [(KEY, DISPLAY, T0)]
    # the display registered ITS OWN timer at ts + W — the multi-timer
    # upgrade over the single re-armed GroupState timeout
    assert T0_MS + W_MS in handle.timers


def test_tws_scenario3_unrelated_key_is_separate_state():
    """Grouping is the key predicate: the other key's click lives in a
    different processor invocation, so this key's display still fires."""
    _, _, out = _drive(
        [[("display", DISPLAY, T0_MS)]], watermark_ms=T0_MS + 10_000
    )
    assert out == [(KEY, DISPLAY, T0)]


def test_tws_out_of_order_click_before_display():
    """A click arriving a batch BEFORE its display still cancels — the
    expired-timer path re-applies the cancel predicate against the click
    buffer before emitting."""
    _, _, out = _drive(
        [
            [("click", CLICK, T0_MS + 500)],
            [("display", DISPLAY, T0_MS)],
        ],
        watermark_ms=T0_MS + 10_000,
    )
    assert out == []


def test_tws_click_only_key_self_evicts():
    """A click-only key registers a cleanup timer and clears all state
    once it fires — the unbounded-state guard the GroupState path also
    certifies."""
    proc, handle, out = _drive(
        [[("click", CLICK, T0_MS)]], watermark_ms=T0_MS + 10_000
    )
    assert out == []
    assert handle.timers == [T0_MS + W_MS]
    assert handle.states["pending"].rows == []
    assert handle.states["clicks"].rows == []


def test_tws_multi_display_multi_timer():
    """Two displays at different times → two timers, two independent
    emissions, each with its own event time."""
    _, handle, out = _drive(
        [[("display", DISPLAY, T0_MS), ("display", DISPLAY, T0_MS + 5000)]],
        watermark_ms=T0_MS + 60_000,
    )
    assert [t for t in sorted(handle.timers)] == [
        T0_MS + W_MS,
        T0_MS + 5000 + W_MS,
    ]
    assert out == [
        (KEY, DISPLAY, T0),
        (KEY, DISPLAY, T0 + dt.timedelta(seconds=5)),
    ]


@pytest.mark.skipif(
    not tws_available(),
    reason="transformWithStateInPandas needs protobuf (absent; no pip)",
)
def test_tws_end_to_end_golden(spark, tmp_path):
    """Full-query twin of test_streaming_stateful scenario 2 — runs where
    the TWS protobuf runtime exists."""
    from kafka_streams_join_spark.streaming.harness import (
        FileStream,
        read_until,
        start_memory_sink,
    )
    from kafka_streams_join_spark.streaming.stateful_tws import (
        stream_timeout_timer_tws,
    )

    def ts(delta_s):
        return (T0 + dt.timedelta(seconds=delta_s)).strftime(
            "%Y-%m-%dT%H:%M:%S.%f"
        )

    d = str(tmp_path)
    displays = FileStream(spark, d, "displays")
    clicks = FileStream(spark, d, "clicks")
    displays.add_batch([{"key": KEY, "value": DISPLAY, "ts": ts(0)}])
    clicks.add_batch([{"key": KEY, "value": CLICK, "ts": ts(2.0)}])
    for n, off in ((1, 3600.0), (2, 7200.0), (3, 10800.0)):
        displays.add_batch([{"key": f"flush-{n}", "value": "{}", "ts": ts(off)}])
        clicks.add_batch([{"key": f"flush-{n}", "value": "{}", "ts": ts(off)}])
    missed = stream_timeout_timer_tws(
        displays.df(), clicks.df(), window="1 second"
    )
    q, sink = start_memory_sink(missed, checkpoint_root=d)
    try:
        q.processAllAvailable()
        rows = read_until(spark, sink, expect=1, wait_s=30.0)
    finally:
        q.stop()
    assert [(r["key"], r["value"], r["ts"]) for r in rows if r["key"] == KEY] == [
        (KEY, DISPLAY, T0)
    ]
