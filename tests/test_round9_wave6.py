"""Round-9 wave 6: privacy/governance audits — semantic pins against
independent pure-Python reimplementations on the sf0.001 corpus, plus
mechanism property checks and plan gates."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pyspark.sql.functions as F

from kafka_streams_join_spark.plans import (
    assert_no_cartesian,
    assert_read_schema_pruned,
)
from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE

_K = 5


def _round_half_up(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_k_anonymity_matches_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", F.expr("unix_timestamp(ts)").alias("sec"))
        .collect()
    )
    groups = Counter(
        (r.event_type, (r.sec // 86400 + 3) % 7, ((r.sec // 3600) % 24) // 6)
        for r in rows
    )
    sizes = list(groups.values())
    n_rows = sum(sizes)
    at_risk = sum(s for s in sizes if s < _K)
    expect = (
        len(sizes),
        n_rows,
        min(sizes),
        sum(1 for s in sizes if s < _K),
        at_risk,
        at_risk * 1_000_000 // n_rows,
    )
    df = QUERIES["dq_k_anonymity"](spark, SF_SMOKE)
    [r] = df.collect()
    assert (
        r.n_groups,
        r.n_rows,
        r.min_group_size,
        r.n_violating_groups,
        r.rows_at_risk,
        r.rows_at_risk_ppm,
    ) == expect
    # the audit covers every event exactly once
    assert r.n_rows == len(rows)
    # the quasi-identifier lattice is bounded: |types| * 7 dow * 4 bands
    n_types = len({row.event_type for row in rows})
    assert r.n_groups <= n_types * 7 * 4
    assert_no_cartesian(df)
    assert_read_schema_pruned(df, 2)


def test_dp_noisy_counts_matches_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "events").select("event_type").collect()
    )
    counts = Counter(r.event_type for r in rows)
    expect = {}
    for et, n in counts.items():
        h = int(hashlib.md5(f"dp1_{et}".encode()).hexdigest()[:15], 16)
        ud = h / float(1 << 60) - 0.5
        lap = -math.copysign(1.0, ud) * math.log(
            max(1 - 2 * abs(ud), 1e-12)
        )
        expect[et] = (
            n,
            1000,
            _round_half_up(1000 * lap),
            n + _round_half_up(lap),
        )
    df = QUERIES["dq_dp_noisy_counts"](spark, SF_SMOKE)
    got = {
        r.event_type: (
            r.true_count,
            r.epsilon_milli,
            r.noise_milli,
            r.noisy_count,
        )
        for r in df.collect()
    }
    assert got == expect
    # mechanism properties: noise is bounded by the clamped inverse CDF's
    # range for b=1 (|noise| <= ln(1/1e-12) ≈ 27.6), and at least one
    # released count actually differs from truth (the noise is not a
    # silent no-op)
    for et, (n, _, noise_m, noisy) in got.items():
        assert abs(noise_m) <= 28_000, et
        assert abs(noisy - n) <= 28, et
    assert any(v[3] != v[0] for v in got.values())


def test_dp_noise_sign_symmetry():
    """The inverse CDF must map u<0.5 to positive noise and u>0.5 to
    negative (or vice versa consistently) — a sign error halves the
    distribution. Pure-Python check over a grid of uniforms."""
    for u in (0.01, 0.2, 0.49, 0.51, 0.8, 0.99):
        ud = u - 0.5
        lap = -math.copysign(1.0, ud) * math.log(
            max(1 - 2 * abs(ud), 1e-12)
        )
        # ln(1-2|u|) < 0, so -sgn(u)·ln(...) carries u's own sign: draws
        # above the median add, below subtract
        assert (lap > 0) == (ud > 0)
        # symmetric: u and 1-u give opposite noise of equal magnitude
        ud2 = (1 - u) - 0.5
        lap2 = -math.copysign(1.0, ud2) * math.log(
            max(1 - 2 * abs(ud2), 1e-12)
        )
        assert abs(lap + lap2) < 1e-12
