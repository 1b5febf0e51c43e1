"""Round-9 wave 5: Burrows' Delta stylometric distance — semantic pin
against an independent pure-Python reimplementation on the sf0.001
corpus, plus plan gates."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from itertools import combinations

from kafka_streams_join_spark.plans import (
    assert_read_schema_pruned,
    explain_str,
)
from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE

_W_TOP = 50


def _round_half_up(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_burrows_delta_matches_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "documents")
        .select("source", "text")
        .collect()
    )
    cnt: dict[str, Counter] = defaultdict(Counter)
    for r in rows:
        if r.text is None or not r.text.strip():
            continue
        cnt[r.source].update(" ".join(r.text.strip().split()).split(" "))
    total: Counter = Counter()
    for c in cnt.values():
        total.update(c)
    topw = [
        t for t, _ in sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:_W_TOP]
    nsrc = {s: sum(c.values()) for s, c in cnt.items()}
    fppm = {
        (s, t): cnt[s].get(t, 0) * 1_000_000 // nsrc[s]
        for s in cnt
        for t in topw
    }
    sources = sorted(cnt)
    S = len(sources)
    zm: dict[tuple, int] = {}
    for t in topw:
        fs = [fppm[(s, t)] for s in sources]
        sf, sff = sum(fs), sum(v * v for v in fs)
        varnum = S * sff - sf * sf
        for s, fv in zip(sources, fs):
            if varnum <= 0:
                zm[(s, t)] = 0
            else:
                zm[(s, t)] = _round_half_up(
                    1000
                    * float(S * fv - sf)
                    * math.sqrt((S - 1) / (S * float(varnum)))
                )
    expect = {}
    for a, b in combinations(sources, 2):
        diffs = [abs(zm[(a, t)] - zm[(b, t)]) for t in topw]
        expect[(a, b)] = (len(diffs), sum(diffs) // len(diffs))
    df = QUERIES["text_burrows_delta"](spark, SF_SMOKE)
    got = {
        (r.source_a, r.source_b): (r.n_words, r.delta_milli)
        for r in df.collect()
    }
    assert got == expect
    # all source pairs compared, each over the full word set
    assert len(got) == S * (S - 1) // 2
    # the synthetic corpus' vocabulary can be smaller than the top-W cap
    n_expected_words = min(_W_TOP, len(total))
    assert all(v[0] == n_expected_words for v in got.values())
    # z-scores are centered per word, so Delta is bounded well below the
    # theoretical max and strictly positive on distinct sources
    assert all(0 < v[1] < 10_000 for v in got.values())
    # plan gates: the top-word selection must be the distributed top-k
    # merge, not a single-partition rank window over the vocabulary
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan
    # the deliberate nsrc × top-words crossJoin is a broadcast of two
    # bounded side frames (sources × 50) — BNLJ there is the documented-ok
    # pattern, so gate only the truly fatal shape
    assert "CartesianProduct" not in plan
    assert_read_schema_pruned(df, 2)
