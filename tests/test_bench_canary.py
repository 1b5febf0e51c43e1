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


def test_broken_registration_does_not_abort_bench(monkeypatch, capsys):
    """Round-8 regression: one AnalysisException registration aborted the
    whole driver bench after the headline was measured but before any JSON
    was emitted, losing the round's entire bench evidence. The contract is
    fail-LOUD: a red ``errors`` entry, both JSON lines still emitted, and a
    nonzero exit — never silence."""
    import json

    import bench
    from kafka_streams_join_spark.queries import QUERIES

    def broken(spark, sf_dir):
        from kafka_streams_join_spark.sources.parquet import load_table

        return load_table(spark, sf_dir, "lineitem").select("no_such_column")

    monkeypatch.setitem(QUERIES, "zz_broken_canary", broken)
    monkeypatch.setattr(bench, "HEADLINE", ["j1_interval_join_inner"])
    monkeypatch.setattr(bench, "EXTRA", [])
    monkeypatch.setattr(bench, "COVERAGE", ["zz_broken_canary", "dedup_exact"])
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_STREAMING", "0")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_NO_HISTORY", "1")
    # dedicated trimmed-registry declaration (ADVICE r11): NO_HISTORY only
    # suppresses the ledger append; TRIMMED is what relaxes the
    # headline-name-in-registry incompleteness guard
    monkeypatch.setenv("SPARK_GRAFT_BENCH_TRIMMED", "1")

    rc = bench.main()
    out = capsys.readouterr().out
    json_lines = [json.loads(l) for l in out.splitlines() if l.startswith("{")]

    assert rc != 0
    assert len(json_lines) == 2  # compact summary + full contract line
    compact, full = json_lines
    assert compact["n_errors"] == 1
    assert "UNRESOLVED_COLUMN" in full["errors"]["zz_broken_canary"]
    # the healthy queries were still measured and reported
    assert "j1_interval_join_inner" in full["queries"]
    assert "dedup_exact" in full["queries"]
    assert "zz_broken_canary" not in full["queries"]


def test_headline_is_subset_of_registry():
    """A HEADLINE name absent from the registry means a headline query was
    renamed or retired without updating bench.py — in a production run the
    sum would be silently deflated and a file diff would misread the drop
    as a speedup (ADVICE r10). Fail loudly at test time instead."""
    import bench
    from kafka_streams_join_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"HEADLINE names not in registry: {missing}"
