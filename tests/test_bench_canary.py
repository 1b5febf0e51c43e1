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


def _hline(rnd, sf, value):
    return {"round": rnd, "sf": sf, "metric": "headline_total", "value": value}


def test_headline_band_edges():
    """Round-14 noise-floor contract: the headline comparison is against
    BAND EDGES of the previous round's best, never the point value — a
    move inside the declared band is run noise by definition."""
    from bench import NOISE_BAND, headline_band

    lines = [
        _hline(12, 0.1, 7.05),
        _hline(12, 0.1, 5.886),  # round best
        _hline(13, 0.1, 8.388),
        _hline(13, 0.1, 6.427),  # round best
    ]
    prev_best, lo, hi = headline_band(lines, 0.1, cur_round=14)
    assert prev_best == 6.427
    assert lo == round(6.427 * (1 - NOISE_BAND), 3)
    assert hi == round(6.427 * (1 + NOISE_BAND), 3)
    # in-band value: noise. out-of-band: a finding.
    assert lo < 6.427 * 1.1 < hi
    assert 6.427 * 1.4 > hi  # a genuine 1.4x move lands outside the band
    # null-value (failed-headline) lines never poison the baseline
    lines.append(_hline(13, 0.1, None))
    assert headline_band(lines, 0.1, cur_round=14)[0] == 6.427
    # no previous round -> no band
    assert headline_band([], 0.1, cur_round=14) == (None, None, None)


def test_headline_band_ignores_other_sf_and_future_rounds():
    from bench import headline_band

    lines = [
        _hline(13, 0.01, 1.0),  # wrong sf
        _hline(14, 0.1, 9.0),  # current round is not its own baseline
        _hline(12, 0.1, 6.0),
    ]
    prev_best, lo, hi = headline_band(lines, 0.1, cur_round=14)
    assert prev_best == 6.0


def test_streaming_floor_breaches_best_of_round():
    """The streaming floor binds the BEST run of a round: one co-tenant
    dip (r13 measured 1,549 rows/s next to a 4,385 line) must not fire;
    a round where every run is under the floor must."""
    from bench import streaming_floor_breaches

    def sline(rnd, rps_a, rps_b):
        return {
            "round": rnd,
            "sf": 0.1,
            "streaming": {
                "stream_interval_join": {"rps": rps_a},
                "stream_timeout_join": {"rps": rps_b},
            },
        }

    healthy = [sline(14, 1549, 1211), sline(14, 4385, 4303)]
    assert streaming_floor_breaches(healthy, 14) == {}
    regressed = [sline(14, 900, 4303), sline(14, 1100, 4400)]
    assert streaming_floor_breaches(regressed, 14) == {
        "stream_interval_join": 1100
    }
    # other rounds' lines don't contribute
    assert streaming_floor_breaches(healthy, 13) == {}


def test_streaming_floor_history_latest_round():
    """Live canary over the checked-in ledger: the newest round with
    streaming lines must clear the declared floors on its best run."""
    import json
    import os

    from bench import streaming_floor_breaches

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_HISTORY.jsonl")
    records = []
    with open(path) as f:
        for line in f:
            try:
                records.append(json.loads(line))
            except ValueError:
                continue
    rounds = sorted(
        {
            r["round"]
            for r in records
            if isinstance(r.get("round"), int) and r.get("streaming")
        }
    )
    assert rounds, "ledger has no streaming lines"
    breaches = streaming_floor_breaches(records, rounds[-1])
    assert breaches == {}, (
        f"round {rounds[-1]} best-of-round streaming rps under floor: "
        f"{breaches}"
    )


def test_headline_is_subset_of_registry():
    """A HEADLINE name absent from the registry means a headline query was
    renamed or retired without updating bench.py — in a production run the
    sum would be silently deflated and a file diff would misread the drop
    as a speedup (ADVICE r10). Fail loudly at test time instead."""
    import bench
    from kafka_streams_join_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"HEADLINE names not in registry: {missing}"
