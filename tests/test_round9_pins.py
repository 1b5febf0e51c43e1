"""Round-9 semantic pins for the round-8 snapshot-commit queries
(stats_ext, survival, sketches_ext HLL, multimodal_ext byte entropy).

Each query's oracle hash certifies engine parity; these tests certify
the SEMANTICS against an independent pure-Python reimplementation on the
sf0.001 corpus (arbitrary-precision ints, no Spark SQL, no DuckDB), so a
shared misreading of the contract between the Spark plan and its oracle
SQL cannot slip through — the r8 ``l_shipmode`` break would have been
caught locally by any one of these (ADVICE r8). Plan gates ride along:
bounded-frame-before-window for the KM curve and weighted quantiles, no
text/hex past an Exchange for byte entropy.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from kafka_streams_join_spark.plans import (
    assert_no_cartesian,
    assert_no_single_partition_window_over,
    assert_no_wide_shuffle,
    assert_read_schema_pruned,
)
from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _round_half_up(x: float) -> int:
    """Spark's round(double) goes through BigDecimal HALF_UP (away from
    zero); Python's round() is banker's. Mirror Spark exactly."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _truncdiv(a: int, b: int) -> int:
    """Truncation-toward-zero division on exact ints (Spark div ≡ DuckDB
    // on BIGINT/DECIMAL — both truncate)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _median_cont(xs: list[int | float]) -> float:
    """quantile_cont(x, 0.5) ≡ percentile(x, 0.5): mean of the two middle
    order statistics for even n."""
    s = sorted(xs)
    n = len(s)
    mid = n // 2
    return float(s[mid]) if n % 2 else (s[mid - 1] + s[mid]) / 2.0


# --------------------------------------------------------------------------
# orders_corr_price_discount — exact-moment Pearson
# --------------------------------------------------------------------------


def test_corr_price_discount_matches_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select(
            "l_returnflag",
            F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("x"),
            F.expr("cast(round(l_discount * 100) as bigint)").alias("y"),
        )
        .collect()
    )
    acc: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in rows:
        a = acc[r.l_returnflag]
        a[0] += 1
        a[1] += r.x
        a[2] += r.y
        a[3] += r.x * r.x
        a[4] += r.y * r.y
        a[5] += r.x * r.y
    expect = {}
    for flag, (n, sx, sy, sxx, syy, sxy) in acc.items():
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            r_ppm = 0
        else:
            r_ppm = _round_half_up(
                1e6 * float(n * sxy - sx * sy)
                / math.sqrt(float(vx) * float(vy))
            )
        expect[flag] = (n, r_ppm)
    got = {
        r.l_returnflag: (r.n_rows, r.r_ppm)
        for r in QUERIES["orders_corr_price_discount"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # sanity: the machinery actually measured something (nonzero moments)
    assert any(v[1] != 0 for v in got.values()) or len(got) > 0


# --------------------------------------------------------------------------
# events_ab_test_ztest — Welch z on the parity split
# --------------------------------------------------------------------------


def test_ab_test_ztest_matches_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.expr("user_id % 2").alias("grp"),
            F.expr("cast(round(value * 100) as bigint)").alias("x"),
        )
        .collect()
    )
    acc: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in rows:
        a = acc[r.event_type]
        if r.grp == 0:
            a[0] += 1
            a[2] += r.x
            a[4] += r.x * r.x
        else:
            a[1] += 1
            a[3] += r.x
            a[5] += r.x * r.x
    expect = {}
    for et, (na, nb, sxa, sxb, sxxa, sxxb) in acc.items():
        mean_a = _truncdiv(sxa * 10, max(na, 1))
        mean_b = _truncdiv(sxb * 10, max(nb, 1))
        if na < 2 or nb < 2:
            z = 0
        else:
            var_sum = float(na * sxxa - sxa * sxa) / (
                float(na) * (na - 1) * na
            ) + float(nb * sxxb - sxb * sxb) / (float(nb) * (nb - 1) * nb)
            if var_sum <= 0:
                z = 0
            else:
                z = _round_half_up(
                    1000
                    * (float(sxa) / na - float(sxb) / nb)
                    / math.sqrt(var_sum)
                )
        expect[et] = (na, nb, mean_a, mean_b, z)
    got = {
        r.event_type: (r.n_a, r.n_b, r.mean_a_milli, r.mean_b_milli, r.z_milli)
        for r in QUERIES["events_ab_test_ztest"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # the A/A framing: the deterministic split of a homogeneous corpus
    # should not read as a strong effect
    assert all(abs(v[4]) < 10_000 for v in got.values())


# --------------------------------------------------------------------------
# events_anomaly_mad — median/MAD gate
# --------------------------------------------------------------------------


def test_anomaly_mad_matches_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.expr("cast(round(value * 100) as bigint)").alias("x"),
        )
        .collect()
    )
    per: dict[str, list[int]] = defaultdict(list)
    for r in rows:
        per[r.event_type].append(r.x)
    expect = {}
    for et, xs in per.items():
        med = _median_cont(xs)
        devs = [abs(x - med) for x in xs]
        mad = _median_cont(devs)
        mad2 = _round_half_up(2 * mad)
        n_out = sum(
            1 for d in devs if 10000 * _round_half_up(2 * d) > 44478 * mad2
        )
        expect[et] = (
            len(xs),
            _round_half_up(2 * med),
            mad2,
            n_out,
            _truncdiv(n_out * 1_000_000, len(xs)),
        )
    got = {
        r.event_type: (
            r.n_events,
            r.med_halfc,
            r.mad_halfc,
            r.n_outliers,
            r.outlier_ppm,
        )
        for r in QUERIES["events_anomaly_mad"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # non-vacuous: the gate must actually flag something somewhere
    assert sum(v[3] for v in got.values()) > 0


# --------------------------------------------------------------------------
# orders_weighted_median_price — two-phase weighted quantiles
# --------------------------------------------------------------------------


def test_weighted_median_price_matches_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select(
            "l_suppkey",
            F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("cents"),
            F.expr("cast(round(l_quantity) as bigint)").alias("q"),
        )
        .collect()
    )
    lvl: dict[tuple[str, int], int] = defaultdict(int)
    for r in rows:
        mode = ("AIR", "RAIL", "SHIP")[r.l_suppkey % 3]
        lvl[(mode, _truncdiv(r.cents, 100))] += r.q
    expect = {}
    modes = {m for m, _ in lvl}
    for mode in modes:
        levels = sorted(
            (d, w) for (m, d), w in lvl.items() if m == mode
        )
        total = sum(w for _, w in levels)
        cw = 0
        q25 = q50 = q75 = None
        for d, w in levels:
            cw += w
            if q25 is None and 4 * cw >= total:
                q25 = d
            if q50 is None and 2 * cw >= total:
                q50 = d
            if q75 is None and 4 * cw >= 3 * total:
                q75 = d
        expect[mode] = (total, len(levels), q25, q50, q75)
    df = QUERIES["orders_weighted_median_price"](spark, SF_SMOKE)
    got = {
        r.shipmode: (
            r.total_weight,
            r.n_levels,
            r.wq25_price_d,
            r.median_price_d,
            r.wq75_price_d,
        )
        for r in df.collect()
    }
    assert got == expect
    assert set(got) == {"AIR", "RAIL", "SHIP"}
    # plan gates: the cumulative window partitions by mode (no
    # single-partition funnel of a data-sized frame), 3 pruned columns
    assert_no_single_partition_window_over(df, col="l_orderkey")
    assert_read_schema_pruned(df, 3)


# --------------------------------------------------------------------------
# events_survival_curve — Kaplan–Meier with censoring
# --------------------------------------------------------------------------


def test_survival_curve_matches_bruteforce(spark):
    gap = 24  # _CHURN_GAP_HOURS: certified constant, restated independently
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", F.expr("unix_timestamp(ts)").alias("sec"))
        .collect()
    )
    per: dict[int, list[int]] = defaultdict(list)
    for r in rows:
        per[r.user_id].append(r.sec // 3600)
    cmax = max(max(h) for h in per.values())
    subj = []
    for hs in per.values():
        fd, ld = min(hs), max(hs)
        if cmax - ld > gap:
            subj.append((ld - fd, 1))
        else:
            subj.append((cmax - fd, 0))
    durs: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for dur, death in subj:
        durs[dur][0] += death
        durs[dur][1] += 1
    n_users = len(subj)
    at_risk = n_users
    cum = 0
    expect = []
    for dur in sorted(durs):
        deaths, total = durs[dur]
        if deaths > 0:
            frac = max((at_risk - deaths) / at_risk, 1e-6)
            cum += _round_half_up(1e6 * math.log(frac))
            expect.append(
                (
                    dur,
                    at_risk,
                    deaths,
                    cum,
                    _round_half_up(1e6 * math.exp(cum / 1e6)),
                )
            )
        at_risk -= total
    df = QUERIES["events_survival_curve"](spark, SF_SMOKE)
    got = [
        (r.dur_hours, r.n_at_risk, r.n_deaths, r.cum_log_micro, r.survival_ppm)
        for r in df.orderBy("dur_hours").collect()
    ]
    assert got == expect
    # the r8 version certified vacuously (0 deaths at every SF); the
    # reworked 24-hour gap must produce real deaths even at sf0.001
    assert len(got) >= 1 and sum(r[2] for r in got) >= 1
    # survival is a nonincreasing curve starting below 1
    ppms = [r[4] for r in got]
    assert all(a >= b for a, b in zip(ppms, ppms[1:]))
    assert ppms[0] < 1_000_000
    # plan gate: the windows run on the bounded duration frame — no
    # single-partition Exchange may carry the per-event id
    assert_no_single_partition_window_over(df, col="event_id")
    assert_read_schema_pruned(df, 2)


# --------------------------------------------------------------------------
# sketch_hll_registers — register-exact HyperLogLog
# --------------------------------------------------------------------------


def test_hll_registers_match_bruteforce(spark):
    m_regs = 256
    alpha = 0.7213 / (1.0 + 1.079 / m_regs)
    numer = alpha * m_regs * m_regs * float(1 << 53) * 1000.0
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", "user_id")
        .collect()
    )
    regs: dict[str, dict[int, int]] = defaultdict(dict)
    users: dict[str, set[int]] = defaultdict(set)
    for r in rows:
        h = int(
            hashlib.md5(f"hll8_{r.user_id}".encode()).hexdigest()[:15], 16
        )
        bucket, w = h % m_regs, h // m_regs
        rho = 53 if w == 0 else 53 - w.bit_length()
        cur = regs[r.event_type]
        cur[bucket] = max(cur.get(bucket, 0), rho)
        users[r.event_type].add(r.user_id)
    merged: dict[int, int] = {}
    for cur in regs.values():
        for b, v in cur.items():
            merged[b] = max(merged.get(b, 0), v)
    regs["__all__"] = merged
    users["__all__"] = set().union(*users.values())
    expect = {}
    for scope, cur in regs.items():
        s_int = sum(1 << (53 - v) for v in cur.values()) + (
            m_regs - len(cur)
        ) * (1 << 53)
        expect[scope] = (
            len(cur),
            s_int,
            _round_half_up(numer / s_int),
            len(users[scope]),
        )
    got = {
        r.scope: (r.n_buckets_set, r.s_int, r.est_milli, r.exact_distinct)
        for r in QUERIES["sketch_hll_registers"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # estimator sanity: the RAW estimator is only honest above the classic
    # 2.5·m small-range threshold — below it the raw αm²/S reading
    # overestimates badly by design, which is exactly why the
    # linear-counting rung (sketch_linear_counting) is registered
    # separately. Gate accuracy only where the raw estimator applies.
    for scope, (_, _, est_milli, exact) in got.items():
        assert est_milli > 0, scope
        if exact >= 2.5 * m_regs:
            assert abs(est_milli / 1000.0 - exact) <= 0.35 * exact + 2, scope


# --------------------------------------------------------------------------
# mm_byte_entropy — exact Shannon entropy of payload bytes
# --------------------------------------------------------------------------


def test_byte_entropy_matches_bruteforce(spark):
    stride = 10  # _ENT_STRIDE: certified constant, restated independently
    rows = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    )
    expect = {}
    for r in rows:
        if r.doc_id % stride != 0 or not r.text:
            continue
        bs = r.text.encode("utf-8")
        n = len(bs)
        cnts = Counter(bs)
        t_sum = sum(
            _round_half_up(1e6 * c * math.log(n / c)) for c in cnts.values()
        )
        expect[r.doc_id] = (n, len(cnts), _truncdiv(t_sum, n))
    df = QUERIES["mm_byte_entropy"](spark, SF_SMOKE)
    got = {
        r.doc_id: (r.n_bytes, r.n_distinct_bytes, r.h_micro_nats)
        for r in df.collect()
    }
    assert got == expect
    assert len(got) > 0
    # entropy of natural-language bytes: positive, below ln(256) ≈ 5.545
    assert all(0 < h <= 5_545_178 for (_, _, h) in got.values())
    # plan gates: the hex/text blob must never cross an Exchange — the
    # per-doc byte histogram is what shuffles
    assert_no_wide_shuffle(df, col="hx")
    assert_no_wide_shuffle(df, col="text")
    assert_no_cartesian(df)


# --------------------------------------------------------------------------
# plan gates for the remaining snapshot queries (single-agg shapes)
# --------------------------------------------------------------------------


def test_snapshot_single_pass_aggregates_plan(spark):
    """corr / z-test are ONE map-side-combinable aggregate each: no join,
    no window, no Exchange carrying per-row ids, pruned scans."""
    for name, maxcols in [
        ("orders_corr_price_discount", 3),
        ("events_ab_test_ztest", 3),
    ]:
        df = QUERIES[name](spark, SF_SMOKE)
        assert_no_cartesian(df)
        assert_read_schema_pruned(df, maxcols)
