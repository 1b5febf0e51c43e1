"""Round-9 wave 2: distribution tests (KS, chi-square), Simpson
diversity, price elasticity — semantic pins against independent
pure-Python reimplementations on the sf0.001 corpus, plus plan gates.
Same independence contract as test_round9_wave.py: integers derived by
direct sorting/counting, only the final float expression mirrored.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from kafka_streams_join_spark.plans import (
    assert_no_cartesian,
    assert_no_single_partition_window_over,
    assert_read_schema_pruned,
)
from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _round_half_up(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


# --------------------------------------------------------------------------
# events_ks_test
# --------------------------------------------------------------------------


def test_ks_test_matches_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.expr("user_id % 2").alias("grp"),
            F.expr("cast(round(value * 100) as bigint)").alias("x"),
        )
        .collect()
    )
    per: dict[str, tuple[list[int], list[int]]] = defaultdict(lambda: ([], []))
    for r in rows:
        per[r.event_type][r.grp].append(r.x)
    expect = {}
    for et, (xa, xb) in per.items():
        na, nb = len(xa), len(xb)
        ca, cb = Counter(xa), Counter(xb)
        cum_a = cum_b = 0
        dmax, d_at = -1, None
        # walk the merged support directly — the definition, not the
        # level-frame window decomposition
        for x in sorted(set(xa) | set(xb)):
            cum_a += ca.get(x, 0)
            cum_b += cb.get(x, 0)
            dnum = abs(cum_a * nb - cum_b * na)
            if dnum > dmax:
                dmax, d_at = dnum, x
        d_ppm = _round_half_up(1_000_000 * float(dmax) / (float(na) * nb))
        expect[et] = (na, nb, d_at, d_ppm)
    df = QUERIES["events_ks_test"](spark, SF_SMOKE)
    got = {
        r.event_type: (r.n_a, r.n_b, r.d_at_x, r.d_ppm) for r in df.collect()
    }
    assert got == expect
    # A/A: the split's CDFs must not differ grossly anywhere
    assert all(v[3] < 500_000 for v in got.values())
    # and the statistic is non-vacuous: some gap exists at finite samples
    assert any(v[3] > 0 for v in got.values())
    assert_no_single_partition_window_over(df, col="event_id")
    assert_read_schema_pruned(df, 3)


# --------------------------------------------------------------------------
# events_chi2_type_split
# --------------------------------------------------------------------------


def test_chi2_matches_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", F.expr("user_id % 2").alias("grp"))
        .collect()
    )
    cells: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for r in rows:
        cells[r.event_type][r.grp] += 1
    ta = sum(v[0] for v in cells.values())
    tb = sum(v[1] for v in cells.values())
    n = ta + tb
    chi2_micro = 0
    for oa, ob in cells.values():
        rt = oa + ob
        for obs, ct in ((oa, ta), (ob, tb)):
            num = obs * n - rt * ct
            den = n * rt * ct
            chi2_micro += _round_half_up(
                1_000_000 * float(num) * float(num) / float(den)
            )
    df = QUERIES["events_chi2_type_split"](spark, SF_SMOKE)
    [row] = df.collect()
    assert (row.n_types, row.dof, row.chi2_micro) == (
        len(cells),
        len(cells) - 1,
        chi2_micro,
    )
    # A/A: chi2 should be within a sane multiple of its dof
    assert row.chi2_micro < 20_000_000 * max(row.dof, 1)


# --------------------------------------------------------------------------
# text_simpson_diversity
# --------------------------------------------------------------------------


def test_simpson_diversity_matches_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "documents")
        .select("lang", "text")
        .collect()
    )
    per: dict[str, Counter] = defaultdict(Counter)
    for r in rows:
        if r.text is None or not r.text.strip():
            continue
        toks = " ".join(r.text.strip().split()).split(" ")
        per[r.lang].update(toks)
    expect = {}
    for lang, cnt in per.items():
        n = sum(cnt.values())
        s2 = sum(c * (c - 1) for c in cnt.values())
        gini = (
            0
            if n < 2
            else _round_half_up(
                1_000_000 * float(n * (n - 1) - s2) / float(n * (n - 1))
            )
        )
        inv = (
            0
            if s2 + n <= 0
            else _round_half_up(1000 * float(n * n) / float(s2 + n))
        )
        expect[lang] = (n, len(cnt), gini, inv)
    df = QUERIES["text_simpson_diversity"](spark, SF_SMOKE)
    got = {
        r.lang: (r.n_tokens, r.n_types, r.gini_simpson_ppm, r.inv_simpson_milli)
        for r in df.collect()
    }
    assert got == expect
    for lang, (n, types, gini, inv) in got.items():
        # effective vocabulary can't exceed the real one (÷1000 for milli)
        assert inv <= types * 1000 + 1000, lang
        assert 0 < gini < 1_000_000, lang
    assert_no_cartesian(df)
    assert_read_schema_pruned(df, 2)


# --------------------------------------------------------------------------
# orders_price_elasticity
# --------------------------------------------------------------------------


def test_price_elasticity_matches_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select(
            "l_returnflag",
            F.expr("cast(round(l_extendedprice * 100) as bigint)").alias(
                "cents"
            ),
            F.expr("cast(round(l_quantity) as bigint)").alias("q"),
        )
        .collect()
    )
    acc: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in rows:
        xm = _round_half_up(1e6 * math.log(r.cents)) - 10_000_000
        ym = _round_half_up(1e6 * math.log(max(r.q, 1)))
        a = acc[r.l_returnflag]
        a[0] += 1
        a[1] += xm
        a[2] += ym
        a[3] += xm * xm
        a[4] += ym * ym
        a[5] += xm * ym
    expect = {}
    for flag, (n, sx, sy, sxx, syy, sxy) in acc.items():
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        cov = n * sxy - sx * sy
        el = 0 if vx <= 0 else _round_half_up(1_000_000 * float(cov) / float(vx))
        r_ = (
            0
            if vx <= 0 or vy <= 0
            else _round_half_up(
                1_000_000 * float(cov) / math.sqrt(float(vx) * float(vy))
            )
        )
        expect[flag] = (n, el, r_)
    df = QUERIES["orders_price_elasticity"](spark, SF_SMOKE)
    got = {
        r.l_returnflag: (r.n_rows, r.elasticity_ppm, r.r_ppm)
        for r in df.collect()
    }
    assert got == expect
    # TPC-H: quantity independent of price — |elasticity| must be small
    assert all(abs(v[1]) < 200_000 for v in got.values())
    assert_no_cartesian(df)
    assert_read_schema_pruned(df, 3)
