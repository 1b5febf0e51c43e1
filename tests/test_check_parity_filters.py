"""check_parity.py name filters are plain substrings, one per argv. A single
"a|b|c" argument is not a regex and selects nothing — which used to print a
vacuous ALL PASS (observed in round 7: a filtered verification sweep that
verified nothing). The CLI must instead refuse (exit 2) when any filter
matches no registered query, BEFORE paying the Spark session startup."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

_TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "check_parity.py",
)


def _load():
    spec = importlib.util.spec_from_file_location("check_parity_cli", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pipe_joined_filter_refused(monkeypatch, capsys):
    mod = _load()
    monkeypatch.setattr(
        sys, "argv", [_TOOL, "/root/testdata/sf0.001", "j1|j2|agg_pricing"]
    )
    assert mod.main() == 2
    out = capsys.readouterr().out
    assert "match no registered query" in out
    assert "ALL PASS" not in out


def test_typo_filter_refused_even_next_to_valid_one(monkeypatch, capsys):
    mod = _load()
    monkeypatch.setattr(
        sys, "argv", [_TOOL, "/root/testdata/sf0.001", "j1", "no_such_query_xyz"]
    )
    assert mod.main() == 2
    assert "no_such_query_xyz" in capsys.readouterr().out


def test_valid_filters_pass_the_guard():
    mod = _load()
    from kafka_streams_join_spark.queries import QUERIES

    # The guard itself: every one of these substrings selects >=1 query, so
    # the dead-filter check must be empty (the full CLI run is the verify
    # skill's job, not this unit test's).
    for f in ("j1", "agg_pricing", "dedup_exact"):
        assert any(f in n for n in QUERIES), f


@pytest.mark.parametrize("flt", ["j1", "interval"])
def test_substring_semantics_documented(flt):
    from kafka_streams_join_spark.queries import QUERIES

    sel = [n for n in QUERIES if flt in n]
    assert sel, f"substring {flt!r} must keep selecting queries"
