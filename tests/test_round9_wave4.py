"""Round-9 wave 4: tokenizer fertility, script mix, Haar wavelet
energy — semantic pins against independent pure-Python
reimplementations on the sf0.001 corpus, plus plan gates."""

from __future__ import annotations

import re
from collections import defaultdict

import pyspark.sql.functions as F

from kafka_streams_join_spark.plans import (
    assert_no_cartesian,
    assert_read_schema_pruned,
    explain_str,
)
from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE

_BPE = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")


def _docs(spark):
    return (
        load_table(spark, SF_SMOKE, "documents")
        .select("lang", "text")
        .collect()
    )


def test_tokenizer_fertility_matches_bruteforce(spark):
    acc: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for r in _docs(spark):
        if r.text is None or not r.text.strip():
            continue
        a = acc[r.lang]
        a[0] += 1
        a[1] += len(" ".join(r.text.strip().split()).split(" "))
        a[2] += len(_BPE.findall(r.text))
        a[3] += len(r.text)
    expect = {
        lang: (
            n,
            ws,
            bpe,
            ch,
            bpe * 1000 // max(ws, 1),
            ch * 1000 // max(bpe, 1),
        )
        for lang, (n, ws, bpe, ch) in acc.items()
    }
    df = QUERIES["pipeline_tokenizer_fertility"](spark, SF_SMOKE)
    got = {
        r.lang: (
            r.n_docs,
            r.ws_tokens,
            r.bpe_tokens,
            r.n_chars,
            r.fertility_milli,
            r.chars_per_bpe_milli,
        )
        for r in df.collect()
    }
    assert got == expect
    # this corpus is pure space-separated words, so fertility is exactly
    # 1.0 — the CORRECT reading here (punctuation/digits would raise it);
    # the structural invariant is bpe >= ws always
    for lang, (_, ws, bpe, *_rest) in got.items():
        assert bpe >= ws, lang
    assert_no_cartesian(df)
    assert_read_schema_pruned(df, 2)


def test_script_mix_matches_bruteforce(spark):
    classes = {
        "latin": re.compile(r"[A-Za-z]"),
        "digit": re.compile(r"[0-9]"),
        "space": re.compile(r"[ \t\n\r]"),
        "non_ascii": re.compile(r"[^ -~\t\n\r]"),
    }
    acc: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for r in _docs(spark):
        if not r.text:
            continue
        a = acc[r.lang]
        a["n"] += len(r.text)
        for k, rx in classes.items():
            a[k] += len(rx.findall(r.text))
    expect = {}
    for lang, a in acc.items():
        n = a["n"]
        other = n - a["latin"] - a["digit"] - a["space"] - a["non_ascii"]
        expect[lang] = (
            n,
            a["latin"] * 1_000_000 // n,
            a["digit"] * 1_000_000 // n,
            a["space"] * 1_000_000 // n,
            other * 1_000_000 // n,
            a["non_ascii"] * 1_000_000 // n,
        )
    df = QUERIES["text_script_mix"](spark, SF_SMOKE)
    got = {
        r.lang: (
            r.n_chars,
            r.latin_ppm,
            r.digit_ppm,
            r.space_ppm,
            r.other_ascii_ppm,
            r.non_ascii_ppm,
        )
        for r in df.collect()
    }
    assert got == expect
    # the five classes partition the text: shares sum to ~1e6 (truncation
    # loses at most 4 ppm)
    for lang, (_, *shares) in got.items():
        assert 1_000_000 - 5 <= sum(shares) <= 1_000_000, lang
    assert_no_cartesian(df)


def test_wavelet_energy_matches_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per: dict[str, list] = defaultdict(list)
    for r in rows:
        per[r.event_type].append((r.d, r.n))
    expect = []
    for et, days in per.items():
        ns = [n for _, n in sorted(days)]
        n_days = len(ns)
        arr = (ns + [0] * 32)[:32]
        energies = []
        for _level in range(5):
            sums, diffs = [], []
            for i in range(0, len(arr), 2):
                sums.append(arr[i] + arr[i + 1])
                diffs.append(arr[i] - arr[i + 1])
            energies.append(sum(d * d for d in diffs))
            arr = sums
        te = sum(energies)
        for lvl, e in enumerate(energies, start=1):
            expect.append(
                (et, n_days, lvl, e * 1_000_000 // max(te, 1))
            )
    df = QUERIES["events_wavelet_energy"](spark, SF_SMOKE)
    got = sorted(
        (r.event_type, r.n_days, r.level, r.energy_share_ppm)
        for r in df.collect()
    )
    assert got == sorted(expect)
    # shares per type sum to ~1e6; day-to-day jitter dominates a
    # white-noise-ish volume series (level 1 carries the most energy
    # under the unnormalized transform)
    by_type: dict[str, dict[int, int]] = defaultdict(dict)
    for et, _, lvl, share in got:
        by_type[et][lvl] = share
    for et, shares in by_type.items():
        assert 1_000_000 - 5 <= sum(shares.values()) <= 1_000_000, et
        assert len(shares) == 5, et
    # row-local pyramid: no window, no join, no single-partition funnel
    plan = explain_str(df)
    assert "Exchange SinglePartition" not in plan
    assert_no_cartesian(df)
    assert_read_schema_pruned(df, 2)
