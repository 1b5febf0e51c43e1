"""Streaming funnel monitor: cross-batch anchor state — the stateful
twin of the batch ``events_funnel_conversion`` query.

Certifies (a) the emitted stage rows EXACTLY against a pure-Python
replay through the shared ``funnel_step`` automaton, (b) that anchors
persist across micro-batches (a click in batch 2 anchors against a view
from batch 1; an out-of-order later view never re-anchors), (c) strict
ordering (a click at the exact view timestamp does not count — the
batch query's `>` contract), and (d) batch-twin equivalence on the real
sf0.001 corpus: the drained monitor's stage set equals
events_funnel_conversion's stages, and the emitted gaps evaluated at
every window reproduce events_funnel_window_sweep's counts.
"""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pytest

from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.streaming.funnel import (
    funnel_step,
    stream_funnel_monitor,
)
from kafka_streams_join_spark.streaming.harness import (
    FileStream,
    start_memory_sink,
)
from tests.conftest import SF_SMOKE

_BASE = datetime.datetime(2024, 1, 1)


def _r(uid, et, sec, eid):
    return {
        "ts": (_BASE + datetime.timedelta(seconds=sec)).isoformat(),
        "event_id": eid,
        "user_id": uid,
        "event_type": et,
    }


# user 1 walks the whole funnel across the batch boundary; user 2's
# click arrives at the SAME instant as their view (must not count) and
# converts later; user 3 purchases before ever clicking (stays stage 1)
BATCH1 = [
    _r(1, "view", 10, 1),
    _r(2, "view", 20, 2),
    _r(2, "click", 20, 3),  # same timestamp as the view: strict > fails
    _r(3, "view", 30, 4),
    _r(3, "purchase", 40, 5),  # no click anchor yet: ignored
    _r(1, "click", 50, 6),
]
BATCH2 = [
    _r(1, "view", 5, 7),  # later-arriving earlier view: must NOT re-anchor
    _r(1, "purchase", 100, 8),
    _r(2, "click", 120, 9),
    _r(2, "purchase", 150, 10),
]


def _replay(batches):
    state: dict = {}
    emitted = []
    for batch in batches:
        per_user: dict = {}
        for r in batch:
            per_user.setdefault(r["user_id"], []).append(
                (r["ts"], r["event_id"], r["event_type"])
            )
        for uid, rows in per_user.items():
            st = state.get(uid, (0, 0, 0))
            for ts, _eid, et in sorted(rows):
                us = (
                    datetime.datetime.fromisoformat(ts)
                    - datetime.datetime(1970, 1, 1)
                ) // datetime.timedelta(microseconds=1)
                st, reached = funnel_step(st, et, us)
                if reached is not None:
                    prev = {1: None, 2: st[0], 3: st[1]}[reached]
                    emitted.append(
                        (uid, reached, us,
                         us - prev if prev is not None else None)
                    )
            state[uid] = st
    return emitted, state


def _run_stream(spark, tmpdir, batches, schema):
    src = FileStream(spark, tmpdir, "events", schema=schema)
    src.add_batch(batches[0])
    out = stream_funnel_monitor(src.df())
    assert out.isStreaming
    q, sink = start_memory_sink(out, checkpoint_root=tmpdir)
    try:
        q.processAllAvailable()
        for b in batches[1:]:
            src.add_batch(b)
            q.processAllAvailable()
        return spark.table(sink).collect()
    finally:
        q.stop()


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_funnel_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SCHEMA = "ts timestamp, event_id long, user_id long, event_type string"


def test_stream_funnel_matches_replay_across_batches(spark, tmpdir):
    rows = _run_stream(spark, tmpdir, [BATCH1, BATCH2], SCHEMA)
    got = {(r.user_id, r.stage): (r.anchor_us, r.gap_us) for r in rows}
    emitted, state = _replay([BATCH1, BATCH2])
    assert got == {
        (uid, stage): (us, gap) for uid, stage, us, gap in emitted
    }
    # strictness: user 2's same-instant click did NOT count in batch 1 —
    # their stage-2 anchor is the batch-2 click at t=120
    us = lambda s: (
        (_BASE + datetime.timedelta(seconds=s))
        - datetime.datetime(1970, 1, 1)
    ) // datetime.timedelta(microseconds=1)
    assert got[(2, 2)][0] == us(120)
    # cross-batch: user 1's purchase gap measures from the BATCH-1 click
    assert got[(1, 3)] == (us(100), (100 - 50) * 1_000_000)
    # the late-arriving earlier view did not re-anchor user 1
    assert got[(1, 1)][0] == us(10)
    # user 3 never clicked: purchase ignored, stage 1 only
    assert (3, 2) not in got and (3, 3) not in got
    # final anchors match the replay state
    assert state[1][2] == us(100) and state[3] == (us(30), 0, 0)


def test_stream_funnel_equals_batch_on_corpus(spark, tmpdir):
    """Drain the real sf0.001 events through the monitor in two
    micro-batches split mid-corpus; the reached-stage set must equal the
    batch funnel query and the gap evaluations the window sweep."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{SF_SMOKE}/events.parquet",
        columns=["ts", "event_id", "user_id", "event_type"],
    ).to_pydict()
    rows = [
        {
            "ts": ts.isoformat(),
            "event_id": eid,
            "user_id": uid,
            "event_type": et,
        }
        for ts, eid, uid, et in zip(
            t["ts"], t["event_id"], t["user_id"], t["event_type"]
        )
    ]
    rows.sort(key=lambda r: (r["ts"], r["event_id"]))  # arrival = event time
    mid = len(rows) // 2
    got = _run_stream(spark, tmpdir, [rows[:mid], rows[mid:]], SCHEMA)
    top_stage: dict = {}
    gaps: dict = {}
    for r in got:
        top_stage[r.user_id] = max(top_stage.get(r.user_id, 0), r.stage)
        gaps.setdefault(r.user_id, {})[r.stage] = r.gap_us
    batch = {
        r["user_id"]: r["stage"]
        for r in QUERIES["events_funnel_conversion"](spark, SF_SMOKE).collect()
    }
    # the batch query's stage is bounded by its 24h window; the monitor
    # emits unbounded stages — they agree exactly on users whose gaps fit
    # the window, which is what the sweep cross-check certifies:
    sweep = {
        r["window_h"]: (r["n_stage2"], r["n_stage3"])
        for r in QUERIES["events_funnel_window_sweep"](spark, SF_SMOKE).collect()
    }
    b = 24 * 3_600_000_000
    s2 = sum(
        1 for u, g in gaps.items() if g.get(2) is not None and g[2] <= b
    )
    s3 = sum(
        1
        for u, g in gaps.items()
        if g.get(2) is not None and g.get(3) is not None
        and g[2] <= b and g[3] <= b
    )
    assert (s2, s3) == sweep[24]
    # every view-reaching user appears with stage >= 1 in both worlds
    assert set(top_stage) == set(batch)
