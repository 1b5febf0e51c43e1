"""Streaming Misra–Gries heavy hitters: cross-batch counter state — the
stateful twin of the batch ``sketch_misra_gries_topk`` query.

Certifies (a) the automaton state EXACTLY against a pure-Python replay
of the same (ts, event_id)-ordered key sequence through the shared
``mg_step`` (not just within the error bound), (b) that counters
persist across micro-batches (a key surviving batch 1 keeps its count
into batch 2; decrement storms in batch 2 erode batch-1 counters),
(c) the Misra–Gries guarantee on the merged summary —
est ≤ exact ≤ est + Σe, every key with true count > Σe present — and
(d) that a uniform key flood (the adversarial MG input) never evicts a
true heavy hitter.
"""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pytest

from kafka_streams_join_spark.streaming.harness import (
    FileStream,
    start_memory_sink,
)
from kafka_streams_join_spark.streaming.heavy_hitters import (
    MG_K,
    mg_step,
    stream_heavy_hitters,
)

SHARDS = 2  # tiny shard count so each shard sees real contention


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_hh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(seq, start_eid):
    base = datetime.datetime(2024, 1, 1)
    return [
        {
            "ts": (base + datetime.timedelta(seconds=i)).isoformat(),
            "event_id": start_eid + i,
            "user_id": uid,
        }
        for i, uid in enumerate(seq)
    ]


def _replay(batches):
    """Pure-Python replay: per shard, the same (ts, event_id)-ordered
    sequence through the shared mg_step; returns the final per-shard
    (counters, e, n_seen)."""
    state = {s: ({}, 0, 0) for s in range(SHARDS)}
    for batch in batches:
        per_shard: dict[int, list] = {}
        for r in batch:
            per_shard.setdefault(r["event_id"] % SHARDS, []).append(
                (r["ts"], r["event_id"], r["user_id"])
            )
        for s, rows in per_shard.items():
            counters, e, n = state[s]
            for _ts, _eid, uid in sorted(rows):
                e = mg_step(counters, MG_K, uid, e)
                n += 1
            state[s] = (counters, e, n)
    return state


# batch 1: user 7 is hot (12 hits), users 100.. are one-off noise;
# batch 2: user 9 becomes hot, more noise erodes surviving counters
BATCH1 = _rows([7] * 12 + list(range(100, 130)), start_eid=0)
BATCH2 = _rows([9] * 15 + [7] * 4 + list(range(200, 240)), start_eid=1000)


def test_stream_mg_matches_replay_across_batches(spark, tmpdir):
    src = FileStream(
        spark,
        tmpdir,
        "events",
        schema="ts timestamp, event_id long, user_id long",
    )
    src.add_batch(BATCH1)
    out = stream_heavy_hitters(src.df(), shards=SHARDS)
    assert out.isStreaming
    q, sink = start_memory_sink(out, checkpoint_root=tmpdir)
    try:
        q.processAllAvailable()
        src.add_batch(BATCH2)
        q.processAllAvailable()
        snaps = spark.table(sink).collect()
    finally:
        q.stop()

    # latest snapshot per shard = the final automaton state
    last_seq = {}
    for r in snaps:
        last_seq[r.shard] = max(last_seq.get(r.shard, 0), r.batch_seq)
    got = {s: ({}, 0, 0) for s in range(SHARDS)}
    for r in snaps:
        if r.batch_seq == last_seq[r.shard]:
            counters, _, _ = got[r.shard]
            counters[r.user_id] = r.est
            got[r.shard] = (counters, r.e_shard, r.n_seen)

    expect = _replay([BATCH1, BATCH2])
    for s in range(SHARDS):
        ec, ee, en = expect[s]
        gc, ge, gn = got[s]
        assert gc == ec, (s, gc, ec)
        assert (ge, gn) == (ee, en)

    # cross-batch state: batch-1 snapshots equal a replay of batch 1
    # ALONE (noise decrements erode u7 below its 12 raw hits — that's
    # MG working), and u7's batch-2 estimate builds ON that carried
    # state: strictly more than its 4 batch-2 hits could ever yield
    # from fresh state
    b1_expect = _replay([BATCH1])
    b1 = {
        (r.shard, r.user_id): r.est for r in snaps if r.batch_seq == 1
    }
    assert b1 == {
        (s, u): c
        for s, (counters, _e, _n) in b1_expect.items()
        for u, c in counters.items()
    }
    b2_u7 = sum(
        r.est for r in snaps if r.batch_seq == 2 and r.user_id == 7
    )
    assert b2_u7 > 4

    # the MG guarantee on the merged summary: est <= exact <= est + sum(e)
    exact: dict[int, int] = {}
    for r in BATCH1 + BATCH2:
        exact[r["user_id"]] = exact.get(r["user_id"], 0) + 1
    merged: dict[int, int] = {}
    err = 0
    for s in range(SHARDS):
        counters, e, _n = got[s]
        err += e
        for u, c in counters.items():
            merged[u] = merged.get(u, 0) + c
    for u, est in merged.items():
        assert est <= exact[u] <= est + err, (u, est, exact[u], err)
    # every key with true count > total error bound must survive
    for u, c in exact.items():
        if c > err:
            assert u in merged, (u, c, err)
    # and the two engineered heavy hitters did
    assert 7 in merged and 9 in merged


def test_mg_step_automaton():
    """The shared automaton, pinned by hand."""
    c: dict[int, int] = {}
    e = 0
    for _ in range(3):
        e = mg_step(c, 2, 1, e)
    assert (c, e) == ({1: 3}, 0)
    e = mg_step(c, 2, 2, e)  # second counter opens
    assert (c, e) == ({1: 3, 2: 1}, 0)
    e = mg_step(c, 2, 3, e)  # full: everyone decrements, 2 drops out
    assert (c, e) == ({1: 2}, 1)
    e = mg_step(c, 2, 3, e)  # 3 takes the free slot
    assert (c, e) == ({1: 2, 3: 1}, 1)
