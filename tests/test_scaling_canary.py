"""Canary over the checked-in scale-stress ledger (VERDICT r12 item 1).

``tools/bench_scaling.py`` measures each heavy query's growth from sf0.1
to an amplified sf1 and records the exponent against its documented
complexity bound in SCALING.json. This canary fails the suite if any
checked-in row exceeds its bound — a super-linear outlier can't ride a
green round — and pins the ledger's integrity (every row has both scale
points, positive times, and the quadratic baseline is the only row
allowed a bound above the linear band).
"""

from __future__ import annotations

import json
import os

import pytest

LEDGER = os.path.join(os.path.dirname(os.path.dirname(__file__)), "SCALING.json")
LEDGER2 = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "SCALING2.json"
)


@pytest.fixture(scope="module")
def ledger():
    if not os.path.exists(LEDGER):
        pytest.skip("SCALING.json not generated yet (run tools/bench_scaling.py)")
    with open(LEDGER) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def ledger2():
    if not os.path.exists(LEDGER2):
        pytest.skip(
            "SCALING2.json not generated yet "
            "(run tools/bench_scaling.py --decade2)"
        )
    with open(LEDGER2) as f:
        return json.load(f)


def test_no_superlinear_outliers(ledger):
    bad = [r for r in ledger["rows"] if not r["pass"]]
    assert not bad, f"scaling exponent over bound: {bad}"
    assert ledger["n_fail"] == 0


def test_ledger_shape(ledger):
    rows = ledger["rows"]
    assert len(rows) >= 34
    for r in rows:
        assert r["t_sf01"] > 0 and r["t_sf1"] > 0
        assert r["exponent"] <= r["bound"]
    over_linear_band = [r for r in rows if r["bound"] > 1.5]
    assert {r["query"] for r in over_linear_band} == {"dedup_embedding_cosine"}


def test_second_decade_no_superlinear(ledger2):
    """Round 14: the sf1→sf10 decade binds the top-10 heaviest entries —
    where fixed overhead has faded, so a super-linear plan can no longer
    hide behind startup cost."""
    bad = [r for r in ledger2["rows"] if not r["pass"]]
    assert not bad, f"second-decade exponent over bound: {bad}"
    assert ledger2["n_fail"] == 0
    assert len(ledger2["rows"]) == 10
    for r in ledger2["rows"]:
        assert r["t_sf01"] > 0 and r["t_sf1"] > 0 and r["t_sf10"] > 0
        assert r["exponent_d2"] <= r["bound"]


def test_second_decade_drift_accounted(ledger2):
    """Any |drift| > the declared threshold between decades must be listed
    in the artifact's drift_notes (explained) — silence is not allowed."""
    thr = ledger2["drift_explain_threshold"]
    drifted = [r["query"] for r in ledger2["rows"] if abs(r["drift"]) > thr]
    notes = ledger2.get("drift_notes", {})
    unexplained = [q for q in drifted if q not in notes]
    assert not unexplained, (
        f"second-decade drift >|{thr}| without an explanation in "
        f"SCALING2.json drift_notes: {unexplained}"
    )
