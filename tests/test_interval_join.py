"""Batch-twin unit tests of the reference's golden scenarios (FIXTURES.md).

The 3 TimeoutJoinTest scenarios (`TimeoutJoinTest.scala:106-164`) expressed
on tiny in-memory frames: same W=1s window, same keys/values, same expected
outputs — minus the broker and the sleeps.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_streams_join_spark.functions.payload import join_payload
from kafka_streams_join_spark.operators.interval_join import (
    JoinWindow,
    interval_join,
    missed_join,
    shift_event_time,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
KEY = "0f1f53a0-44f5-4b84-9699-fe853c90ed1c"
OTHER_KEY = "9750c569-44c2-49e6-854e-01e0eae04bb6"
DISPLAY = '{"type":"display"}'
CLICK = '{"type":"click"}'
SCHEMA = "key string, value string, ts timestamp"


def _clicked(spark, displays, clicks):
    """J1: click at t joins displays in [t-W, t] (TimeoutJoinTest.scala:75-79)."""
    d = spark.createDataFrame(displays, SCHEMA)
    c = spark.createDataFrame(clicks, SCHEMA)
    j = interval_join(
        c, d, on="key", window=JoinWindow(before="1 second"),
        left_prefix="c_", right_prefix="d_",
    )
    return j.select(
        F.col("c_key").alias("key"),
        join_payload(F.col("d_value"), F.col("c_value")).alias("value"),
    ).collect()


def _missed(spark, displays, clicks):
    """J3: displays with no same-key click in [t, t+W] (:82-92)."""
    d = spark.createDataFrame(displays, SCHEMA)
    c = spark.createDataFrame(clicks, SCHEMA)
    return (
        missed_join(d, c, on="key", window=JoinWindow(after="1 second"))
        .select("key", "value")
        .collect()
    )


def test_scenario1_click_inside_window(spark):
    """TimeoutJoinTest.scala:106-125 — join fires, byte-exact payload."""
    displays = [(KEY, DISPLAY, T0)]
    clicks = [(KEY, CLICK, T0 + dt.timedelta(milliseconds=500))]
    clicked = _clicked(spark, displays, clicks)
    assert [(r["key"], r["value"]) for r in clicked] == [
        (KEY, '{"display":{"type":"display"},"click":{"type":"click"}}')
    ]
    assert _missed(spark, displays, clicks) == []


def test_scenario2_click_outside_window(spark):
    """TimeoutJoinTest.scala:127-144 — late click: no join, display missed."""
    displays = [(KEY, DISPLAY, T0)]
    clicks = [(KEY, CLICK, T0 + dt.timedelta(seconds=2))]
    assert _clicked(spark, displays, clicks) == []
    missed = _missed(spark, displays, clicks)
    assert [(r["key"], r["value"]) for r in missed] == [(KEY, DISPLAY)]


def test_scenario3_unrelated_click(spark):
    """TimeoutJoinTest.scala:146-164 — key equality is part of the predicate."""
    displays = [(KEY, DISPLAY, T0)]
    clicks = [(OTHER_KEY, CLICK, T0 + dt.timedelta(milliseconds=500))]
    assert _clicked(spark, displays, clicks) == []
    missed = _missed(spark, displays, clicks)
    assert [(r["key"], r["value"]) for r in missed] == [(KEY, DISPLAY)]


def test_window_boundaries_inclusive(spark):
    """JoinWindows bounds are inclusive on both ends."""
    displays = [
        (KEY, "at-lower", T0),
        (KEY, "at-upper", T0 + dt.timedelta(seconds=1)),
        (KEY, "past-upper", T0 + dt.timedelta(seconds=1, milliseconds=1)),
    ]
    clicks = [(KEY, CLICK, T0 + dt.timedelta(seconds=1))]
    d = spark.createDataFrame(displays, SCHEMA)
    c = spark.createDataFrame(clicks, SCHEMA)
    j = interval_join(
        c, d, on="key", window=JoinWindow(before="1 second"),
        left_prefix="c_", right_prefix="d_",
    )
    assert sorted(r["d_value"] for r in j.collect()) == ["at-lower", "at-upper"]


def test_shift_event_time(spark):
    """T1 batch twin (TopicShifter.scala:22-37): ts+Δ, key/value verbatim."""
    df = spark.createDataFrame([(KEY, DISPLAY, T0)], SCHEMA)
    out = shift_event_time(df, "1 second").collect()
    assert out == [
        (KEY, DISPLAY, T0 + dt.timedelta(seconds=1))
    ] or [(r["key"], r["value"], r["ts"]) for r in out] == [
        (KEY, DISPLAY, T0 + dt.timedelta(seconds=1))
    ]


def test_semi_anti_partition(spark):
    """J4/J3: semi ∪ anti == all displays, disjoint."""
    displays = [(KEY, "d1", T0), (OTHER_KEY, "d2", T0)]
    clicks = [(KEY, CLICK, T0 + dt.timedelta(milliseconds=100))]
    d = spark.createDataFrame(displays, SCHEMA)
    c = spark.createDataFrame(clicks, SCHEMA)
    w = JoinWindow(after="1 second")
    semi = interval_join(d, c, on="key", window=w, how="left_semi").collect()
    anti = interval_join(d, c, on="key", window=w, how="left_anti").collect()
    assert {r["key"] for r in semi} == {KEY}
    assert {r["key"] for r in anti} == {OTHER_KEY}
    assert len(semi) + len(anti) == len(displays)
