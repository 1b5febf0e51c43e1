"""Randomized cross-check: ``interval_join`` / ``missed_join`` against an
independent O(n²) in-memory reference over seeded random event sets — the
property layer on top of the fixed golden scenarios and the DuckDB oracle
(both of which share SQL semantics; this one shares nothing with either).
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

from kafka_streams_join_spark.operators.interval_join import (
    JoinWindow,
    interval_join,
    missed_join,
)

T0 = dt.datetime(2024, 1, 1)
WINDOW_S = 60


def _random_events(seed: int, n: int, n_keys: int, span_s: int):
    rng = random.Random(seed)
    return [
        {
            "key": f"k{rng.randrange(n_keys)}",
            "ts": T0 + dt.timedelta(seconds=rng.uniform(0, span_s)),
            "id": i,
        }
        for i in range(n)
    ]


def _expected_pairs(lefts, rights):
    """left ⋈ right where right.ts ∈ [left.ts - W, left.ts], same key."""
    out = set()
    for l in lefts:
        for r in rights:
            if r["key"] == l["key"] and (
                l["ts"] - dt.timedelta(seconds=WINDOW_S) <= r["ts"] <= l["ts"]
            ):
                out.add((l["id"], r["id"]))
    return out


@pytest.mark.parametrize("seed", [7, 42, 1337])
def test_interval_join_matches_bruteforce(spark, seed):
    lefts = _random_events(seed, 80, 6, 300)
    rights = _random_events(seed + 1, 80, 6, 300)
    ldf = spark.createDataFrame(lefts).select("key", "ts", "id")
    rdf = spark.createDataFrame(rights).select("key", "ts", "id")
    j = interval_join(ldf, rdf, on="key", window=JoinWindow(before=f"{WINDOW_S} seconds"))
    got = {(r["l_id"], r["r_id"]) for r in j.collect()}
    assert got == _expected_pairs(lefts, rights)


@pytest.mark.parametrize("seed", [11, 99])
def test_missed_join_matches_bruteforce(spark, seed):
    """missed = displays with NO click in [ts, ts + W] — the anti complement
    of the forward-window pairs."""
    displays = _random_events(seed, 60, 5, 300)
    clicks = _random_events(seed + 1, 60, 5, 300)
    ddf = spark.createDataFrame(displays).select("key", "ts", "id")
    cdf = spark.createDataFrame(clicks).select("key", "ts", "id")
    m = missed_join(ddf, cdf, on="key", window=JoinWindow(after=f"{WINDOW_S} seconds"))
    got = {r["id"] for r in m.collect()}
    matched = {
        d["id"]
        for d in displays
        for c in clicks
        if c["key"] == d["key"]
        and d["ts"] <= c["ts"] <= d["ts"] + dt.timedelta(seconds=WINDOW_S)
    }
    assert got == {d["id"] for d in displays} - matched
