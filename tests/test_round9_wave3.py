"""Round-9 wave 3: Holt linear-trend forecast and seasonality-adjusted
MAD anomalies — semantic pins against independent pure-Python
reimplementations on the sf0.001 corpus, plus plan gates. Same
independence contract as the other round-9 pin files.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyspark.sql.functions as F

from kafka_streams_join_spark.plans import (
    assert_no_cartesian,
    assert_read_schema_pruned,
)
from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _round_half_up(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _median_cont(xs):
    s = sorted(xs)
    n = len(s)
    mid = n // 2
    return float(s[mid]) if n % 2 else (s[mid - 1] + s[mid]) / 2.0


def test_holt_linear_matches_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per: dict[str, list] = defaultdict(list)
    for r in rows:
        per[r.event_type].append((r.d, r.n))
    expect = {}
    for et, days in per.items():
        ns = [n for _, n in sorted(days)]
        # Python // IS floor division — the semantics both engines spell
        # as floor(x/4.0); this walk is the definitional reference
        level, trend = ns[0], 0
        for n in ns[1:]:
            l2 = (n + 3 * (level + trend)) // 4
            trend = (l2 - level + 3 * trend) // 4
            level = l2
        expect[et] = (len(ns), level, trend, level + trend, level + 7 * trend)
    df = QUERIES["events_holt_linear"](spark, SF_SMOKE)
    got = {
        r.event_type: (r.n_days, r.level_, r.trend, r.forecast_1, r.forecast_7)
        for r in df.collect()
    }
    assert got == expect
    # the corpus is ~flat: levels near the daily mean, small trends
    for et, (n_days, level, trend, f1, f7) in got.items():
        assert n_days >= 28, et
        assert abs(trend) <= max(2, level), et
        assert f7 - f1 == 6 * trend, et
    assert_no_cartesian(df)
    assert_read_schema_pruned(df, 2)


def test_seasonal_anomaly_mad_matches_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.expr("unix_timestamp(ts)").alias("sec"),
            F.expr("cast(round(value * 1000) as bigint)").alias("xm"),
        )
        .collect()
    )
    by_bucket: dict[tuple, list[int]] = defaultdict(list)
    by_type: dict[str, list[tuple]] = defaultdict(list)
    for r in rows:
        dow = (r.sec // 86400 + 3) % 7
        hr = (r.sec // 3600) % 24
        by_bucket[(r.event_type, dow, hr)].append(r.xm)
        by_type[r.event_type].append((dow, hr, r.xm))
    base = {k: sum(v) // len(v) for k, v in by_bucket.items()}
    expect = {}
    for et, evs in by_type.items():
        resid = [xm - base[(et, dow, hr)] for dow, hr, xm in evs]
        med = _median_cont(resid)
        devs = [abs(x - med) for x in resid]
        mad = _median_cont(devs)
        mad2 = _round_half_up(2 * mad)
        n_out = sum(
            1 for d in devs if 10000 * _round_half_up(2 * d) > 44478 * mad2
        )
        expect[et] = (
            len(evs),
            _round_half_up(2 * med),
            mad2,
            n_out,
            n_out * 1_000_000 // len(evs),
        )
    df = QUERIES["events_seasonal_anomaly_mad"](spark, SF_SMOKE)
    got = {
        r.event_type: (
            r.n_events,
            r.med_resid_halfm,
            r.mad_halfm,
            r.n_outliers,
            r.outlier_ppm,
        )
        for r in df.collect()
    }
    assert got == expect
    # residual medians hug zero (the baseline removed the structure) and
    # the gate still finds genuine tail events somewhere
    assert all(abs(v[1]) < 2000 * 2 for v in got.values())
    assert sum(v[3] for v in got.values()) > 0
    assert_read_schema_pruned(df, 3)
