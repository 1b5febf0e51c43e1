"""Emission-timing tests for streaming windowed aggregations: append mode
emits a window exactly once, after the watermark passes its end. Values are
covered by the oracle-checked batch twins; these pin the streaming runtime
behavior (watermark finalization, per-key session splitting).
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_streams_join_spark.streaming.harness import (
    FileStream,
    read_until,
    start_memory_sink,
)
from kafka_streams_join_spark.streaming.windows import (
    stream_session_agg,
    stream_tumbling_agg,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(delta_s: float = 0.0) -> str:
    return (T0 + dt.timedelta(seconds=delta_s)).strftime("%Y-%m-%dT%H:%M:%S.%f")


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_windows_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_tumbling_agg_emits_finalized_windows(spark, tmpdir):
    src = FileStream(spark, tmpdir, "input")
    src.add_batch(
        [
            {"key": "a", "value": "1", "ts": _ts(5)},
            {"key": "a", "value": "2", "ts": _ts(30)},
            {"key": "b", "value": "3", "ts": _ts(70)},
        ]
    )
    src.add_batch([{"key": "flush", "value": "{}", "ts": _ts(3600)}])
    src.add_batch([{"key": "flush2", "value": "{}", "ts": _ts(7200)}])

    agg = stream_tumbling_agg(
        src.df(),
        window="1 minute",
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    q, sink = start_memory_sink(agg, checkpoint_root=tmpdir)
    try:
        q.processAllAvailable()
        rows = read_until(spark, sink, expect=2, wait_s=3.0)
    finally:
        q.stop()
    got = {
        (r["key"], r["win_start"], r["win_end"], r["n"])
        for r in rows
        if r["key"] in {"a", "b"}
    }
    assert got == {
        ("a", T0, T0 + dt.timedelta(minutes=1), 2),
        ("b", T0 + dt.timedelta(minutes=1), T0 + dt.timedelta(minutes=2), 1),
    }


def test_session_agg_splits_on_gap(spark, tmpdir):
    """Events 10s apart fuse into one session; a 60s silence splits it."""
    src = FileStream(spark, tmpdir, "input")
    src.add_batch(
        [
            {"key": "a", "value": "1", "ts": _ts(0)},
            {"key": "a", "value": "2", "ts": _ts(10)},
            {"key": "a", "value": "3", "ts": _ts(100)},
        ]
    )
    src.add_batch([{"key": "flush", "value": "{}", "ts": _ts(3600)}])
    src.add_batch([{"key": "flush2", "value": "{}", "ts": _ts(7200)}])

    agg = stream_session_agg(src.df(), gap="30 seconds")
    q, sink = start_memory_sink(agg, checkpoint_root=tmpdir)
    try:
        q.processAllAvailable()
        rows = read_until(spark, sink, expect=2, wait_s=3.0)
    finally:
        q.stop()
    got = {
        (r["win_start"], r["win_end"], r["n"]) for r in rows if r["key"] == "a"
    }
    assert got == {
        (T0, T0 + dt.timedelta(seconds=40), 2),
        (T0 + dt.timedelta(seconds=100), T0 + dt.timedelta(seconds=130), 1),
    }


def test_error_listener_observes_lifecycle(spark, tmpdir, caplog):
    """The L3 listener sees start and clean termination of a query."""
    import logging

    from kafka_streams_join_spark.streaming.listener import (
        install_error_listener,
    )

    listener = install_error_listener(spark)
    try:
        src = FileStream(spark, tmpdir, "input")
        src.add_batch([{"key": "a", "value": "1", "ts": _ts(0)}])
        agg = stream_tumbling_agg(src.df(), window="1 minute")
        with caplog.at_level(logging.INFO, logger="kafka_streams_join_spark.streaming.listener"):
            q, _ = start_memory_sink(agg, checkpoint_root=tmpdir)
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(10)
        msgs = [r.getMessage() for r in caplog.records]
        assert any("started" in m for m in msgs)
    finally:
        spark.streams.removeListener(listener)


def test_window_helpers_emit_unique_columns(spark):
    """The flattened output must contain each column exactly once — a
    duplicated key column makes any downstream by-name reference ambiguous.
    (withWatermark + window() are no-ops on a batch frame, so schema can be
    checked without running a query.)"""
    from kafka_streams_join_spark.streaming.windows import stream_sliding_agg

    df = spark.createDataFrame(
        [("k1", dt.datetime(2024, 1, 1, 0, 0, 30), 1.0)], "key string, ts timestamp, v double"
    )
    for out in (
        stream_tumbling_agg(df, window="1 minute"),
        stream_sliding_agg(df, window="1 minute", slide="30 seconds"),
        stream_session_agg(df, gap="30 seconds"),
    ):
        assert len(out.columns) == len(set(out.columns)), out.columns
        assert out.columns[:2] == ["win_start", "win_end"]
        # by-name reference must resolve (raises AMBIGUOUS_REFERENCE if dup'd)
        out.select("key", "n")
