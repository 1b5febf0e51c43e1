"""``transformWithStateInPandas`` twin of the timeout join (round 6).

``streaming/stateful.py`` implements the per-key event-time timeout with
``applyInPandasWithState`` (one GroupState timeout per key — the operator
tracks the MINIMUM pending expiry and re-arms). SURVEY §2.6 names Spark
4.x's ``transformWithStateInPandas`` as the successor API; this module is
that twin, exercising what the new API actually adds:

- **multi-timer support**: one timer PER pending display expiry
  (``handle.registerTimer`` per record) instead of the single re-armed
  timeout — ``handleExpiredTimer`` fires once per due display, so no
  min-tracking state machine;
- **typed, named state**: two ``ListState``s (pending displays, recent
  clicks) instead of one packed tuple;
- it also composes under a downstream streaming aggregation, which
  removes the two-chained-queries workaround the anomaly monitor needs
  (``streaming/anomaly.py:20`` — Spark rejects ``applyInPandasWithState``
  under a streaming agg).

CONTAINER LIMIT: the TWS Python worker speaks protobuf to the JVM state
server (``pyspark/sql/streaming/proto/StateMessage_pb2.py`` imports
``google.protobuf``), and this environment has no protobuf and no pip.
The operator is therefore certified two ways, the live-Kafka pattern
(tests/test_kafka_smoke.py):
- ``tests/test_streaming_tws.py`` drives the PROCESSOR's state machine
  in-process through the same golden scenarios as the GroupState path
  (the processor is plain Python over the documented State/Timer API —
  fakes implement that API verbatim), which certifies the semantics;
- the end-to-end query test runs wherever protobuf exists and skips
  here (``tws_available()``).

Scale notes match stateful.py: state is per-key, watermark-evicted, so
bounded by (arrival-rate × W) per key; timers live in the state store
(RocksDB on a real cluster) — per-record timers are the store's intended
load, not driver state.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .stateful import OUTPUT_SCHEMA, window_to_ms

if TYPE_CHECKING:  # pragma: no cover
    pass

_ROW_SCHEMA = "value string, ts_ms bigint"


def tws_available() -> bool:
    """True iff the transformWithState runtime can actually run here:
    the protobuf wire dependency loads AND the installed pyspark exposes
    ``GroupedData.transformWithStateInPandas`` (a Spark 4.x API — on a
    protobuf-equipped 3.x box the e2e would otherwise fail with
    AttributeError instead of skipping; ADVICE round 6)."""
    try:  # pragma: no cover - environment probe
        import google.protobuf  # noqa: F401
        from pyspark.sql.group import GroupedData

        return hasattr(GroupedData, "transformWithStateInPandas")
    except ImportError:
        return False


class TimeoutJoinProcessor(StatefulProcessor):
    """Per-key timeout join as a StatefulProcessor: buffer displays,
    cancel on in-window clicks, emit un-clicked displays when their OWN
    timer (registered at ts + W) expires past the watermark."""

    def __init__(self, window_ms: int):
        self.window_ms = window_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.pending = handle.getListState("pending", _ROW_SCHEMA)
        self.clicks = handle.getListState("clicks", _ROW_SCHEMA)

    # -- pure helpers (unit-testable without the state server) ----------
    @staticmethod
    def _cancel(pending: list, click_ts: list, window_ms: int) -> list:
        """The J3 predicate: drop displays with a click in [ts, ts + W]."""
        return [
            (v, t)
            for v, t in pending
            if not any(t <= ct <= t + window_ms for ct in click_ts)
        ]

    def handleInputRows(
        self, key: Any, rows: Iterator["pd.DataFrame"], timerValues: TimerValues
    ) -> Iterator["pd.DataFrame"]:
        pending = [(v, t) for v, t in self.pending.get()]
        clicks = [(v, t) for v, t in self.clicks.get()]
        for pdf in rows:
            if len(pdf) == 0:
                continue
            ts_ms = pdf["ts"].astype("datetime64[ms]").astype("int64").tolist()
            for side, value, t in zip(pdf["side"], pdf["value"], ts_ms):
                if side == "display":
                    pending.append((value, t))
                    # the multi-timer upgrade: each display owns its timer
                    self.handle.registerTimer(t + self.window_ms)
                else:
                    clicks.append((value, t))
                    # cleanup timer: a click-only key must self-evict once
                    # the click can no longer cancel anything (ts + W)
                    self.handle.registerTimer(t + self.window_ms)
        pending = self._cancel(
            pending, [t for _, t in clicks], self.window_ms
        )
        self.pending.put(pending)
        self.clicks.put(clicks)
        return iter(())

    def handleExpiredTimer(
        self,
        key: Any,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator["pd.DataFrame"]:
        expiry = expiredTimerInfo.getExpiryTimeInMs()
        pending = [(v, t) for v, t in self.pending.get()]
        clicks = [(v, t) for v, t in self.clicks.get()]
        # late cross-batch clicks may have landed since the timer was set
        pending = self._cancel(pending, [t for _, t in clicks], self.window_ms)
        due = [(v, t) for v, t in pending if t + self.window_ms <= expiry]
        pending = [(v, t) for v, t in pending if t + self.window_ms > expiry]
        clicks = [(v, t) for v, t in clicks if t + self.window_ms > expiry]
        self.pending.put(pending)
        self.clicks.put(clicks)
        if not pending and not clicks:
            self.pending.clear()
            self.clicks.clear()
        if due:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(due),
                    "value": [v for v, _ in due],
                    "ts": pd.to_datetime([t for _, t in due], unit="ms"),
                }
            )

    def close(self) -> None:  # pragma: no cover - lifecycle hook
        pass


def stream_timeout_timer_tws(
    displays: DataFrame,
    clicks: DataFrame,
    window: str = "1 second",
    watermark_delay: str | None = None,
) -> DataFrame:
    """J3 with the 4.x multi-timer API: tag + union the two streams, group
    by key, run :class:`TimeoutJoinProcessor` under event-time timers.
    Same output contract as ``stream_timeout_timer`` (key, value, ts of
    every display with no same-key click in [ts, ts + W])."""
    tagged = (
        displays.select("key", "value", "ts", F.lit("display").alias("side"))
        .unionByName(
            clicks.select("key", "value", "ts", F.lit("click").alias("side"))
        )
        .withWatermark("ts", watermark_delay or window)
    )
    return tagged.groupBy("key").transformWithStateInPandas(
        statefulProcessor=TimeoutJoinProcessor(window_to_ms(window)),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
