"""Round-9 wave: rank statistics (Mann–Whitney U, Kendall tau-b,
Spearman rho), stratified Kaplan–Meier, and the HLL small-range
correction rung — semantic pins against independent pure-Python/numpy
reimplementations on the sf0.001 corpus, plus plan gates.

Independence contract: every INTEGER in the pin (ranks, pair counts,
tie terms, registers, at-risk counts) is derived by direct
sorting/counting — not by the level-frame prefix decomposition the
queries use — so a misreading shared by the Spark plan and its oracle
SQL cannot survive. The one final float expression (z/tau/rho) mirrors
the engines' exact expression shape over those independently-derived
integers, so the pin is bit-stable at the rounding boundary.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import numpy as np
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


def _round_half_up(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _avg_ranks(xs: list[int]) -> dict[int, float]:
    """value -> average rank (1-based), computed by direct sorting."""
    s = sorted(xs)
    first: dict[int, int] = {}
    for i, v in enumerate(s):
        first.setdefault(v, i)
    cnt = Counter(s)
    return {v: first[v] + (cnt[v] + 1) / 2 for v in cnt}


# --------------------------------------------------------------------------
# events_mann_whitney_utest
# --------------------------------------------------------------------------


def test_mann_whitney_matches_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.expr("user_id % 2").alias("grp"),
            F.expr("cast(round(value * 100) as bigint)").alias("x"),
        )
        .collect()
    )
    per: dict[str, tuple[list[int], list[int]]] = defaultdict(
        lambda: ([], [])
    )
    for r in rows:
        per[r.event_type][r.grp].append(r.x)
    expect = {}
    for et, (xa, xb) in per.items():
        na, nb = len(xa), len(xb)
        n = na + nb
        ranks = _avg_ranks(xa + xb)
        r_a = sum(ranks[v] for v in xa)
        r2a = round(2 * r_a)  # doubled rank-sum, exact
        mean_rank_milli = r2a * 500 // max(na, 1)
        a_term = r2a - na * (na + 1) - na * nb  # 2(U_a − E[U])
        tie = sum(c**3 - c for c in Counter(xa + xb).values())
        varnum = n * (n - 1) * (n + 1) - tie
        if na < 1 or nb < 1 or varnum <= 0:
            z = 0
        else:
            z = _round_half_up(
                1000
                * float(a_term)
                / (
                    2
                    * math.sqrt(
                        float(na)
                        * float(nb)
                        * float(varnum)
                        / float(12 * n * (n - 1))
                    )
                )
            )
        expect[et] = (na, nb, mean_rank_milli, z)
    got = {
        r.event_type: (r.n_a, r.n_b, r.mean_rank_a_milli, r.z_milli)
        for r in QUERIES["events_mann_whitney_utest"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # A/A sanity: a deterministic split of one population shouldn't scream
    assert all(abs(v[3]) < 10_000 for v in got.values())


# --------------------------------------------------------------------------
# orders_kendall_tau / orders_spearman_rho
# --------------------------------------------------------------------------


def _qd_by_flag(spark):
    rows = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select(
            "l_returnflag",
            F.expr("cast(round(l_quantity) as bigint)").alias("q"),
            F.expr("cast(round(l_discount * 100) as bigint)").alias("d"),
        )
        .collect()
    )
    per: dict[str, tuple[list[int], list[int]]] = defaultdict(
        lambda: ([], [])
    )
    for r in rows:
        per[r.l_returnflag][0].append(r.q)
        per[r.l_returnflag][1].append(r.d)
    return per


def test_kendall_tau_matches_bruteforce(spark):
    per = _qd_by_flag(spark)
    expect = {}
    for flag, (qs, ds) in per.items():
        q = np.asarray(qs, dtype=np.int64)
        d = np.asarray(ds, dtype=np.int64)
        n = len(q)
        # O(n²) vectorized pair census — definitionally concordant pairs,
        # no contingency decomposition anywhere
        sq = np.sign(q[:, None] - q[None, :])
        sd = np.sign(d[:, None] - d[None, :])
        prod = sq * sd
        iu = np.triu_indices(n, k=1)
        c = int((prod[iu] > 0).sum())
        dis = int((prod[iu] < 0).sum())
        tx2 = sum(v * (v - 1) for v in Counter(qs).values())
        ty2 = sum(v * (v - 1) for v in Counter(ds).values())
        n0x2 = n * (n - 1)
        if n0x2 - tx2 <= 0 or n0x2 - ty2 <= 0:
            tau = 0
        else:
            tau = _round_half_up(
                1_000_000
                * 2
                * float(c - dis)
                / math.sqrt(float(n0x2 - tx2) * float(n0x2 - ty2))
            )
        expect[flag] = (n, len(set(qs)), len(set(ds)), tau)
    df = QUERIES["orders_kendall_tau"](spark, SF_SMOKE)
    got = {
        r.l_returnflag: (r.n_rows, r.n_q_levels, r.n_d_levels, r.tau_ppm)
        for r in df.collect()
    }
    assert got == expect
    # TPC-H quantity and discount are independent draws: |tau| must be tiny
    assert all(abs(v[3]) < 100_000 for v in got.values())
    assert_no_cartesian(df)
    assert_read_schema_pruned(df, 3)


def test_spearman_rho_matches_bruteforce(spark):
    per = _qd_by_flag(spark)
    expect = {}
    for flag, (qs, ds) in per.items():
        n = len(qs)
        rq = _avg_ranks(qs)
        rd = _avg_ranks(ds)
        # centered doubled ranks are exact ints: 2r is integral, n+1 shifts
        cx = [round(2 * rq[v]) - (n + 1) for v in qs]
        cy = [round(2 * rd[v]) - (n + 1) for v in ds]
        assert sum(cx) == 0 and sum(cy) == 0  # centering is exact
        sxy = sum(a * b for a, b in zip(cx, cy))
        sxx = sum(a * a for a in cx)
        syy = sum(b * b for b in cy)
        if sxx <= 0 or syy <= 0:
            rho = 0
        else:
            rho = _round_half_up(
                1_000_000 * float(sxy) / math.sqrt(float(sxx) * float(syy))
            )
        expect[flag] = (n, rho)
    df = QUERIES["orders_spearman_rho"](spark, SF_SMOKE)
    got = {r.l_returnflag: (r.n_rows, r.rho_ppm) for r in df.collect()}
    assert got == expect
    assert all(abs(v[1]) < 100_000 for v in got.values())
    assert_no_cartesian(df)
    assert_read_schema_pruned(df, 3)


def test_rank_windows_run_on_bounded_frames(spark):
    """The rank/level windows must partition (by event_type / flag): no
    single-partition Exchange may carry a per-row id, and no window input
    is the raw corpus."""
    for name, marker in [
        ("events_mann_whitney_utest", "event_id"),
        ("orders_spearman_rho", "l_orderkey"),
    ]:
        df = QUERIES[name](spark, SF_SMOKE)
        assert_no_single_partition_window_over(df, col=marker)


# --------------------------------------------------------------------------
# events_survival_by_type
# --------------------------------------------------------------------------


def test_survival_by_type_matches_bruteforce(spark):
    gap = 24
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type", "user_id", F.expr("unix_timestamp(ts)").alias("sec")
        )
        .collect()
    )
    per: dict[tuple[str, int], list[int]] = defaultdict(list)
    for r in rows:
        per[(r.event_type, r.user_id)].append(r.sec // 3600)
    cmax: dict[str, int] = {}
    for (et, _), hs in per.items():
        cmax[et] = max(cmax.get(et, 0), max(hs))
    subj: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for (et, _), hs in per.items():
        fd, ld = min(hs), max(hs)
        if cmax[et] - ld > gap:
            subj[et].append((ld - fd, 1))
        else:
            subj[et].append((cmax[et] - fd, 0))
    expect = []
    for et in subj:
        durs: dict[int, list[int]] = defaultdict(lambda: [0, 0])
        for dur, death in subj[et]:
            durs[dur][0] += death
            durs[dur][1] += 1
        at_risk = len(subj[et])
        cum = 0
        for dur in sorted(durs):
            deaths, total = durs[dur]
            if deaths > 0:
                frac = max((at_risk - deaths) / at_risk, 1e-6)
                cum += _round_half_up(1e6 * math.log(frac))
                expect.append(
                    (
                        et,
                        dur,
                        at_risk,
                        deaths,
                        cum,
                        _round_half_up(1e6 * math.exp(cum / 1e6)),
                    )
                )
            at_risk -= total
    df = QUERIES["events_survival_by_type"](spark, SF_SMOKE)
    got = [
        (
            r.event_type,
            r.dur_hours,
            r.n_at_risk,
            r.n_deaths,
            r.cum_log_micro,
            r.survival_ppm,
        )
        for r in df.orderBy("event_type", "dur_hours").collect()
    ]
    assert got == sorted(expect)
    # non-vacuous in at least one stratum, and curves only step down
    assert sum(r[3] for r in got) >= 1
    by_type: dict[str, list[int]] = defaultdict(list)
    for r in got:
        by_type[r[0]].append(r[5])
    for ppms in by_type.values():
        assert all(a >= b for a, b in zip(ppms, ppms[1:]))
    # plan gate: fully partitioned windows — no single-partition Exchange
    # anywhere in the plan at all
    assert "Exchange SinglePartition" not in explain_str(df)
    assert_read_schema_pruned(df, 3)


# --------------------------------------------------------------------------
# sketch_hll_bias_corrected
# --------------------------------------------------------------------------


def test_hll_bias_corrected_matches_bruteforce(spark):
    m_regs = 256
    alpha = 0.7213 / (1.0 + 1.079 / m_regs)
    numer = alpha * m_regs * m_regs * float(1 << 53) * 1000.0
    small_milli = int(2.5 * m_regs) * 1000
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
    for cur in list(regs.values()):
        for b, v in cur.items():
            merged[b] = max(merged.get(b, 0), v)
    regs["__all__"] = merged
    users["__all__"] = set().union(*users.values())
    expect = {}
    for scope, cur in regs.items():
        n_empty = m_regs - len(cur)
        s_int = sum(1 << (53 - v) for v in cur.values()) + n_empty * (
            1 << 53
        )
        raw = _round_half_up(numer / s_int)
        if raw <= small_milli and n_empty > 0:
            method = "linear_counting"
            est = _round_half_up(1000 * m_regs * math.log(m_regs / n_empty))
        else:
            method = "raw"
            est = raw
        expect[scope] = (n_empty, raw, method, est, len(users[scope]))
    got = {
        r.scope: (
            r.n_empty,
            r.est_raw_milli,
            r.method,
            r.est_milli,
            r.exact_distinct,
        )
        for r in QUERIES["sketch_hll_bias_corrected"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # at sf0.001 every scope is deep in the small range: the rung must
    # actually fire, and the corrected estimate must beat the raw one
    for scope, (_, raw, method, est, exact) in got.items():
        assert method == "linear_counting", scope
        assert abs(est / 1000.0 - exact) < abs(raw / 1000.0 - exact), scope
        # linear counting at this occupancy is accurate to a few percent
        assert abs(est / 1000.0 - exact) <= 0.1 * exact + 1, scope
