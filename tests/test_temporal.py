"""Temporal wave (queries/temporal.py, registered round 8): semantic
brute-force pins + plan gates.

Each query's oracle hash certifies engine parity; these tests certify
the SEMANTICS against an independent pure-Python reimplementation on the
sf0.001 corpus (arbitrary-precision ints, no Spark, no DuckDB), so a
shared misreading of the contract between the Spark plan and its oracle
SQL cannot slip through.
"""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F

from kafka_streams_join_spark.plans import (
    assert_no_cartesian,
    assert_no_single_partition_window_over,
    assert_read_schema_pruned,
    explain_str,
)
from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE

_HOLD_US = 900 * 1_000_000
_HOUR_US = 3600 * 1_000_000
_DAY_US = 86_400 * 1_000_000


def _events(spark):
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("t"),
            F.expr("cast(round(value * 100) as bigint)").alias("value_c"),
            F.expr("cast(round(value * 1000) as bigint)").alias("value_m"),
        )
        .collect()
    )
    return rows


def _truncdiv(a: int, b: int) -> int:
    """Truncation-toward-zero division on exact ints (Spark div ≡ DuckDB
    // on BIGINT/DECIMAL — both truncate)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# --------------------------------------------------------------------------
# semantics vs pure-Python brute force
# --------------------------------------------------------------------------


def test_max_concurrency_matches_bruteforce(spark):
    rows = _events(spark)
    bounds = defaultdict(list)
    for r in rows:
        bounds[r.event_type].append((r.t, 1))
        bounds[r.event_type].append((r.t + _HOLD_US, -1))
    expect = {}
    for et, bs in bounds.items():
        bs.sort()  # (t, delta): -1 before +1 at equal t — half-open interval
        cur = best = 0
        best_at = None
        for t, d in bs:
            cur += d
            if d == 1 and (cur > best or (cur == best and best_at is None)):
                if cur > best:
                    best, best_at = cur, t
        expect[et] = (best, best_at)
    got = {
        r.event_type: (r.max_concurrent, r.at_us)
        for r in QUERIES["events_max_concurrency"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_time_weighted_avg_matches_bruteforce(spark):
    rows = _events(spark)
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append((r.t, r.event_id, r.value_c))
    expect = {}
    for uid, evs in per_user.items():
        evs.sort()
        segs = [
            (evs[i + 1][0] - evs[i][0]) // 1_000_000
            for i in range(len(evs) - 1)
        ]
        if not segs:
            continue
        total = sum(segs)
        wsum = sum(evs[i][2] * segs[i] for i in range(len(segs)))
        expect[uid] = (
            len(segs),
            total,
            _truncdiv(wsum, total) if total > 0 else None,
        )
    got = {
        r.user_id: (r.n_segments, r.total_s, r.twap_centi)
        for r in QUERIES["events_time_weighted_avg"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_cusum_changepoint_matches_bruteforce(spark):
    rows = _events(spark)
    hourly = defaultdict(lambda: defaultdict(int))
    for r in rows:
        hourly[r.event_type][r.t // _HOUR_US] += r.value_c
    expect = {}
    for et, hs in hourly.items():
        seq = sorted(hs.items())
        n, tot = len(seq), sum(x for _, x in seq)
        s = 0
        best = None  # (score, -h) maximize, tie → earlier hour
        for i, (h, x) in enumerate(seq, start=1):
            s += x
            score = abs(s * n - i * tot)
            if best is None or score > best[0]:
                best = (score, h)
        expect[et] = (n, best[1], best[0])
    got = {
        r.event_type: (r.n_hours, r.cp_hour, r.score)
        for r in QUERIES["events_cusum_changepoint"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_trend_ols_matches_bruteforce(spark):
    rows = _events(spark)
    daily = defaultdict(lambda: defaultdict(set))
    for r in rows:
        daily[r.event_type][r.t // _DAY_US].add(r.user_id)
    expect = {}
    for et, ds in daily.items():
        d0 = min(ds)
        pts = sorted((d - d0, len(u)) for d, u in ds.items())
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        maxx = max(x for x, _ in pts)
        slope = _truncdiv((n * sxy - sx * sy) * 1_000_000, n * sxx - sx * sx)
        intercept = _truncdiv(sy * 1_000_000 - slope * sx, n)
        expect[et] = (n, slope, intercept, intercept + slope * (maxx + 1))
    got = {
        r.event_type: (
            r.n_days,
            r.slope_micro,
            r.intercept_micro,
            r.forecast_next_micro,
        )
        for r in QUERIES["events_trend_ols"](spark, SF_SMOKE).collect()
    }
    assert got == expect


# --------------------------------------------------------------------------
# plan gates
# --------------------------------------------------------------------------


def test_max_concurrency_two_phase_prefix_sum(spark):
    """The sweep-line's running sum must NOT window a data-sized frame in
    one partition: the within-bucket window partitions by (type, bucket)
    and the offset frame is calendar-bounded. The props payload never
    loads (2-column scan)."""
    df = QUERIES["events_max_concurrency"](spark, SF_SMOKE)
    assert_no_cartesian(df)
    assert_no_single_partition_window_over(df, "event_id")
    assert_read_schema_pruned(df, max_columns=2)
    # the offset frame joins broadcast — no data-sized shuffle join needed
    assert "BroadcastHashJoin" in explain_str(df)


def test_twap_single_window_then_hash_agg(spark):
    """TWAP: one lead() window partitioned by user_id, one hash
    aggregate — no joins at all, 4-column scan."""
    df = QUERIES["events_time_weighted_avg"](spark, SF_SMOKE)
    plan = explain_str(df)
    for bad in ("Join", "CartesianProduct", "BatchEvalPython", "MapInPandas"):
        assert bad not in plan, plan[:1500]
    assert_read_schema_pruned(df, max_columns=4)


def test_cusum_and_ols_window_aggregates_not_events(spark):
    """CUSUM/OLS window over the calendar-bounded per-type rollup, never
    the raw events: the partial aggregate must appear BELOW the first
    window in the plan, and no per-row id crosses a window."""
    for name in ("events_cusum_changepoint", "events_trend_ols"):
        df = QUERIES[name](spark, SF_SMOKE)
        assert_no_cartesian(df)
        assert_no_single_partition_window_over(df, "event_id")
        assert_no_single_partition_window_over(df, "user_id")
        plan = explain_str(df, "simple")
        assert plan.index("HashAggregate") > plan.index("Window") or (
            "partial" in plan.lower()
        ), plan[:1500]
