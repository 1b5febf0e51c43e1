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


@pytest.fixture(scope="module")
def ledger():
    if not os.path.exists(LEDGER):
        pytest.skip("SCALING.json not generated yet (run tools/bench_scaling.py)")
    with open(LEDGER) as f:
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
