"""Round-14 sketch-family additions: Count-Min point queries and equi-width
histogram quantiles (``queries/sketches_cm.py``).

Three layers per the §5.2 checklist: pure-Python semantic replays of the
frozen hash/bin contracts (exact, no tolerance), the sketch-theoretic
invariants (CM never underestimates; the histogram read-off overshoots by
less than one bin width), and the 100-TB plan gates (pruned scans, the
constant-size sketch broadcast on every read path, top-k via
TakeOrderedAndProject, no cartesian)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from kafka_streams_join_spark.plans import (
    assert_read_schema_pruned,
    explain_str,
)
from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.queries.sketches_cm import (
    _CM_D,
    _CM_EPS_PPM,
    _CM_TOPK,
    _CM_W,
    _HQ_B,
    _HQ_HI,
    _HQ_LO,
    _HQ_QS,
    _HQ_W,
)
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _py_tokens(spark):
    """The registered whitespace token contract, replayed in Python."""
    rows = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    toks = []
    for r in rows:
        t = re.sub(r"\s+", " ", r["text"].strip())
        toks.extend(w for w in t.split(" ") if w != "")
    return toks


def _cm_bucket(j: int, token: str) -> int:
    return int(hashlib.md5(f"cm{j}_{token}".encode()).hexdigest()[:15], 16) % _CM_W


def test_countmin_matches_pure_python_replay(spark):
    """Exact replay: same md5 buckets, same additive cells, same min-over-
    rows point queries, same integer ppm — no tolerance anywhere."""
    toks = _py_tokens(spark)
    exact = Counter(toks)
    n_total = sum(exact.values())
    sketch = Counter()
    for token, cnt in exact.items():
        for j in range(_CM_D):
            sketch[(j, _cm_bucket(j, token))] += cnt
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:_CM_TOPK]

    got = {
        r["token"]: r
        for r in QUERIES["sketch_countmin_point_error"](spark, SF_SMOKE).collect()
    }
    assert set(got) == {t for t, _ in top}
    assert math.ceil(math.e / _CM_W * 1_000_000) == _CM_EPS_PPM
    for token, cnt in top:
        est = min(sketch[(j, _cm_bucket(j, token))] for j in range(_CM_D))
        r = got[token]
        assert r["exact_cnt"] == cnt
        assert r["cm_est"] == est
        assert r["overest"] == est - cnt
        assert r["err_ppm"] == (est - cnt) * 1_000_000 // max(n_total, 1)
        assert r["eps_bound_ppm"] == _CM_EPS_PPM


def test_countmin_never_underestimates(spark):
    """The defining CM inequality: every point estimate >= the exact count
    (counters are sums over colliding tokens; min can't dip below)."""
    for r in QUERIES["sketch_countmin_point_error"](spark, SF_SMOKE).collect():
        assert r["overest"] >= 0, r


def test_countmin_plan(spark):
    """Scan pruned to the text column; the d*w sketch is read via broadcast
    (constant-size state, never shuffled against the queries); top-k is
    TakeOrderedAndProject; no cartesian anywhere."""
    df = QUERIES["sketch_countmin_point_error"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert_read_schema_pruned(df, max_columns=1)
    assert "BroadcastHashJoin" in plan  # point queries join the broadcast sketch
    assert "TakeOrderedAndProject" in plan
    # the only nested-loop is the 1-row total fanned onto the 20-row report;
    # a true CartesianProduct (data x data) must never appear
    assert "CartesianProduct" not in plan


def test_histogram_quantiles_match_pure_python_replay(spark):
    """Exact replay of the frozen clamp/bin/read-off contract."""
    rows = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_extendedprice")
        .collect()
    )
    vs = [
        min(_HQ_HI - 1, max(_HQ_LO, int(math.floor(r["l_extendedprice"]))))
        for r in rows
    ]
    n = len(vs)
    vs.sort()
    got = {
        r["q"]: r
        for r in QUERIES["sketch_histogram_quantiles"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(_HQ_QS)
    hist = Counter(v // _HQ_W for v in vs)
    for q in _HQ_QS:
        target = (q * n + 99) // 100
        exact = vs[target - 1]  # lower quantile: first v with cum count >= target
        cum = 0
        est_bin = None
        for b in sorted(hist):
            cum += hist[b]
            if cum >= target:
                est_bin = b
                break
        r = got[q]
        assert r["n_rows"] == n
        assert r["target_rank"] == target
        assert r["est_bin"] == est_bin
        assert r["est_value"] == (est_bin + 1) * _HQ_W - 1
        assert r["exact_value"] == exact
        assert r["overest"] == r["est_value"] - exact
        assert r["bin_width"] == _HQ_W


def test_histogram_quantile_bound(spark):
    """The sketch guarantee the query exists to certify: the exact lower
    quantile lands inside the chosen bin, so 0 <= overest < bin_width."""
    for r in QUERIES["sketch_histogram_quantiles"](spark, SF_SMOKE).collect():
        assert 0 <= r["overest"] < r["bin_width"], r
    assert _HQ_B * _HQ_W == _HQ_HI - _HQ_LO


def test_histogram_quantiles_plan(spark):
    """Query-time scans read the staged (v, cnt) value table only — 2
    narrow columns, domain-bounded rows (the l_extendedprice-only corpus
    scan pruning now lives in the one-time ``_hq_vals`` stage build);
    cumulative windows run over the frozen value domain (<= 131072 rows
    at any corpus size) — never over per-row ids (registry meta-gate
    re-checks); targets broadcast."""
    df = QUERIES["sketch_histogram_quantiles"](spark, SF_SMOKE)
    assert_read_schema_pruned(df, max_columns=2)
    plan = explain_str(df)
    # the range read-offs (cum >= target) broadcast the 3-row target frame
    # onto bounded value-domain frames; data x data cartesians never appear
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_histogram_bins_sweep_matches_pure_python_replay(spark):
    """The B-sweep read-off replayed exactly: per B in {64,256,1024} and
    q in {50,90,99}, the first-bin-reaching-target rule at that B's width,
    certified against the same exact lower quantile."""
    from kafka_streams_join_spark.queries.sketches_cm import _HQS_BS

    rows = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_extendedprice")
        .collect()
    )
    vs = sorted(
        min(_HQ_HI - 1, max(_HQ_LO, int(math.floor(r["l_extendedprice"]))))
        for r in rows
    )
    n = len(vs)
    got = {
        (r["n_bins"], r["q"]): r
        for r in QUERIES["sketch_histogram_bins_sweep"](spark, SF_SMOKE).collect()
    }
    assert set(got) == {(b, q) for b in _HQS_BS for q in _HQ_QS}
    for b in _HQS_BS:
        width = (_HQ_HI - _HQ_LO) // b
        hist = Counter(v // width for v in vs)
        for q in _HQ_QS:
            target = (q * n + 99) // 100
            exact = vs[target - 1]
            cum = 0
            est_bin = None
            for bin_ in sorted(hist):
                cum += hist[bin_]
                if cum >= target:
                    est_bin = bin_
                    break
            r = got[(b, q)]
            assert r["bin_width"] == width
            assert r["est_value"] == (est_bin + 1) * width - 1
            assert r["exact_value"] == exact
            assert r["overest"] == r["est_value"] - exact
            assert 0 <= r["overest"] < width, r


def test_histogram_bins_sweep_error_shrinks_with_bins(spark):
    """The dial the sweep exists to show: for each q, the overestimate
    BOUND halves as bins double; the measured overestimate never grows
    beyond the wider bound (monotone bound, not monotone point error)."""
    rows = QUERIES["sketch_histogram_bins_sweep"](spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["n_bins"])
        widths = [r["bin_width"] for r in rs]
        assert widths == sorted(widths, reverse=True)
        for r in rs:
            assert r["overest"] < r["bin_width"]


def test_histogram_bins_sweep_plan(spark):
    """Query-time scans read the staged (v, cnt) value table only (the
    1-column corpus scan lives in the ``_hq_vals`` stage build); the
    9-row (B, q) grid is a single VALUES literal frame (no
    CartesianProduct — a 32x32-partition literal cartesian cost ~34 s
    of task overhead before the round-14 fix, and the VALUES form is a
    1-partition JVM LocalRelation); sketch-side joins broadcast."""
    df = QUERIES["sketch_histogram_bins_sweep"](spark, SF_SMOKE)
    assert_read_schema_pruned(df, max_columns=2)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
