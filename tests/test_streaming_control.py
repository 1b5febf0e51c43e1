"""Streaming control rules: prequential Shewhart/WE monitoring with
cross-batch state — the stateful twin of the batch
``events_control_rules`` query.

Certifies (a) the stateful operator against a pure-Python replay of the
same hour counts through the shared ``score_hour`` rule, (b) that state
persists across micro-batches (an hour in batch 2 is tested against
moments and a run streak accumulated in batch 1), (c) that a rule-4 run
flags on exactly the 8th consecutive same-side hour and is broken by an
on-the-mean hour, and (d) the batch-twin moment equivalence: once the
stream drains, the monitor's final (k, s, q) state equals the exact
moments the batch query's center line is built from on the same rows.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from kafka_streams_join_spark.streaming.control_rules import (
    RUN_LEN,
    score_hour,
    stream_control_rules,
)
from kafka_streams_join_spark.streaming.harness import (
    FileStream,
    start_memory_sink,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_control_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _h(i: int) -> str:
    return f"2024-01-01T{i:02d}:00:00"


# batch 1: seven calm-but-rising clicks (all above the running mean from
# hour 2 on) and two views; batch 2 continues the click run to 8 (rule 4)
# and adds a 10x spike (rule 1) scored against batch-1 state
BATCH1 = [
    {"event_type": "click", "hour": _h(i), "c": 100 + 2 * i}
    for i in range(7)
] + [
    {"event_type": "view", "hour": _h(0), "c": 10},
    {"event_type": "view", "hour": _h(1), "c": 10},
]
BATCH2 = [
    {"event_type": "click", "hour": _h(7), "c": 120},
    {"event_type": "click", "hour": _h(8), "c": 1000},
    {"event_type": "view", "hour": _h(2), "c": 10},
]


def _reference(rows):
    """Replay hour counts per type through the shared score_hour rule."""
    state: dict[str, tuple[int, int, int, int, int]] = {}
    out = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["hour"])):
        k, s, q, prev_side, run_len = state.get(
            r["event_type"], (0, 0, 0, 0, 0)
        )
        rule1, side, run_len, rule4 = score_hour(
            k, s, q, prev_side, run_len, r["c"]
        )
        out[(r["event_type"], r["hour"])] = (
            rule1,
            side,
            run_len,
            rule4,
            k,
        )
        state[r["event_type"]] = (
            k + 1,
            s + r["c"],
            q + r["c"] * r["c"],
            side,
            run_len,
        )
    return out, state


def test_stream_control_matches_reference_across_batches(spark, tmpdir):
    src = FileStream(
        spark,
        tmpdir,
        "hourly",
        schema="event_type string, hour string, c long",
    )
    src.add_batch(BATCH1)

    scored = stream_control_rules(src.df())
    assert scored.isStreaming
    q, sink = start_memory_sink(scored, checkpoint_root=tmpdir)
    try:
        q.processAllAvailable()
        src.add_batch(BATCH2)
        q.processAllAvailable()
        got = {
            (r.event_type, r.hour): (
                r.rule1,
                r.side,
                r.run_len,
                r.rule4,
                r.n_prior_hours,
            )
            for r in spark.table(sink).collect()
        }
    finally:
        q.stop()

    expect, final_state = _reference(BATCH1 + BATCH2)
    assert got == expect

    # the spike hour was tested against BATCH-1 + earlier-batch-2 state
    # (8 prior hours) and tripped rule 1 — state crossed the boundary
    assert got[("click", _h(8))][0] == 1
    assert got[("click", _h(8))][4] == 8

    # rising clicks sit strictly above the running mean from hour 1 on:
    # the streak is 7 at hour 7 (fed by batch-1 run state) and reaches
    # RUN_LEN at hour 8, flagging rule 4 on the same hour rule 1 fires
    assert got[("click", _h(7))][2] == RUN_LEN - 1
    assert got[("click", _h(7))][3] == 0
    assert got[("click", _h(8))][2] == RUN_LEN
    assert got[("click", _h(8))][3] == 1

    # batch-twin equivalence: final streaming moments == the exact
    # moments the batch query's retrospective center line uses
    clicks = [r["c"] for r in BATCH1 + BATCH2 if r["event_type"] == "click"]
    k, s, qq, _, _ = final_state["click"]
    assert (k, s, qq) == (
        len(clicks),
        sum(clicks),
        sum(c * c for c in clicks),
    )


def test_score_hour_rule():
    """The shared rule, pinned on hand-computed integers."""
    # no priors: no side, no rule 1
    assert score_hour(0, 0, 0, 0, 0, 5) == (0, 0, 0, 0)
    # one prior (mean 10): side defined, rule 1 still gated off
    assert score_hour(1, 10, 100, 0, 0, 17) == (0, 1, 1, 0)
    # priors 10, 20 (mean 15, sigma 5): 35 is exactly 4 sigma -> rule 1
    assert score_hour(2, 30, 500, 1, 1, 35) == (1, 1, 2, 0)
    # 31 would be 3.2 sigma -> rule 1; 30 is exactly 3 sigma -> NOT (>)
    assert score_hour(2, 30, 500, 0, 0, 31)[0] == 1
    assert score_hour(2, 30, 500, 0, 0, 30)[0] == 0
    # an exactly-on-the-mean hour breaks a streak (side 0 resets to 0)
    assert score_hour(4, 40, 400, 1, 6, 10) == (0, 0, 0, 0)
    # the 8th consecutive same-side hour flags rule 4
    assert score_hour(9, 90, 1000, 1, 7, 11)[3] == 1
    # a side FLIP restarts the streak at 1
    assert score_hour(9, 90, 1000, -1, 7, 11) == (0, 1, 1, 0)
