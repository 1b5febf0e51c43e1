"""The bench canary's round-over-round baseline must be noise-robust: the
previous round's per-query MIN across ALL its history lines at the same sf,
not whichever line happened to be written last. Round 7 recorded two
same-round sf0.1 runs where bursty co-tenant load inflated DISJOINT query
subsets 2-5x each — a last-line baseline would both fire spurious WARNINGs
(query slow in the current run only) and mask real regressions (query slow
in the baseline line only)."""

from __future__ import annotations

from bench import prev_round_baseline


def _line(rnd, sf, queries):
    return {"round": rnd, "sf": sf, "queries": queries}


def test_min_across_previous_rounds_lines():
    lines = [
        _line(6, 0.1, {"a": 1.0, "b": 5.0}),
        _line(7, 0.1, {"a": 2.0, "b": 0.5}),  # noisy on a
        _line(7, 0.1, {"a": 0.4, "b": 4.0}),  # noisy on b
    ]
    rnd, base = prev_round_baseline(lines, 0.1, cur_round=8)
    assert rnd == 7
    assert base == {"a": 0.4, "b": 0.5}


def test_only_newest_previous_round_contributes():
    lines = [
        _line(5, 0.1, {"a": 0.1}),  # older round must not leak in
        _line(6, 0.1, {"a": 3.0}),
    ]
    rnd, base = prev_round_baseline(lines, 0.1, cur_round=7)
    assert rnd == 6
    assert base == {"a": 3.0}


def test_sf_filter_and_current_round_excluded():
    lines = [
        _line(6, 0.01, {"a": 0.2}),  # wrong sf
        _line(7, 0.1, {"a": 0.3}),  # current round: not a baseline for itself
    ]
    rnd, base = prev_round_baseline(lines, 0.1, cur_round=7)
    assert rnd is None and base == {}


def test_queries_missing_from_one_line_still_covered():
    lines = [
        _line(6, 0.1, {"a": 1.0}),
        _line(6, 0.1, {"b": 2.0}),  # partial line (e.g. truncated run)
    ]
    rnd, base = prev_round_baseline(lines, 0.1, cur_round=7)
    assert rnd == 6
    assert base == {"a": 1.0, "b": 2.0}
