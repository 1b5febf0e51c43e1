"""Streaming KMV distinct monitor: cross-batch minima state — the
stateful twin of the batch ``sketch_kmv_distinct_sweep`` query.

Certifies (a) the per-shard minima state EXACTLY against a pure-Python
replay through the shared ``kmv_insert`` and the registered md5 hash
contract, (b) that minima persist and tighten across micro-batches
(batch-2 keys with smaller hashes evict batch-1 minima), and (c) KMV's
defining MERGEABILITY property: merging the final per-shard sketches
(k smallest of the union of held minima) and applying the batch
estimator formula reproduces the estimate a single global KMV over the
same keys yields — shard-count-independent, which is why the sketch
distributes.
"""

from __future__ import annotations

import datetime
import hashlib
import shutil
import tempfile

import pytest

from kafka_streams_join_spark.streaming.harness import (
    FileStream,
    start_memory_sink,
)
from kafka_streams_join_spark.streaming.kmv import (
    KMV_K,
    kmv_insert,
    stream_kmv_distinct,
)

SHARDS = 2


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_kmv_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _h60(uid: int) -> int:
    """The registered 60-bit contract: first 15 hex chars of
    md5('hll8_' || uid)."""
    return int(hashlib.md5(f"hll8_{uid}".encode()).hexdigest()[:15], 16)


def _rows(uids, start_eid):
    base = datetime.datetime(2024, 1, 1)
    return [
        {
            "ts": (base + datetime.timedelta(seconds=i)).isoformat(),
            "event_id": start_eid + i,
            "user_id": uid,
        }
        for i, uid in enumerate(uids)
    ]


def _replay(batches):
    state = {s: ([], 0) for s in range(SHARDS)}
    for batch in batches:
        for r in batch:
            s = r["event_id"] % SHARDS
            minima, n = state[s]
            kmv_insert(minima, KMV_K, _h60(r["user_id"]))
            state[s] = (minima, n + 1)
    return state


# batch 1: 90 distinct users with repeats; batch 2: 120 more (some
# overlap with batch 1 — duplicates must not re-enter the minima)
BATCH1 = _rows(list(range(0, 90)) + [5, 17, 5], start_eid=0)
BATCH2 = _rows(list(range(60, 180)) + [5, 99], start_eid=1000)


def test_stream_kmv_matches_replay_and_merges(spark, tmpdir):
    src = FileStream(
        spark,
        tmpdir,
        "events",
        schema="ts timestamp, event_id long, user_id long",
    )
    src.add_batch(BATCH1)
    out = stream_kmv_distinct(src.df(), shards=SHARDS)
    assert out.isStreaming
    q, sink = start_memory_sink(out, checkpoint_root=tmpdir)
    try:
        q.processAllAvailable()
        src.add_batch(BATCH2)
        q.processAllAvailable()
        snaps = spark.table(sink).collect()
    finally:
        q.stop()

    expect = _replay([BATCH1, BATCH2])
    last = {}
    for r in snaps:
        if r.batch_seq > last.get(r.shard, (0, None))[0]:
            last[r.shard] = (r.batch_seq, r)
    assert set(last) == set(range(SHARDS))
    for s, (_seq, r) in last.items():
        minima, n = expect[s]
        assert r.n_held == len(minima)
        assert r.kth_min == minima[-1]
        assert r.n_seen == n

    # cross-batch: batch-1 snapshots equal a replay of batch 1 alone,
    # and the k-th minimum can only TIGHTEN (shrink) across batches
    b1_expect = _replay([BATCH1])
    for r in snaps:
        if r.batch_seq == 1:
            minima, n = b1_expect[r.shard]
            assert (r.n_held, r.kth_min, r.n_seen) == (
                len(minima), minima[-1], n,
            )
    for s, (_seq, r2) in last.items():
        r1_kth = next(
            x.kth_min for x in snaps if x.shard == s and x.batch_seq == 1
        )
        assert r2.kth_min <= r1_kth

    # mergeability: k smallest of the union of final shard minima ==
    # a single global KMV over all keys; estimator formula agrees
    union = sorted(set(expect[0][0]) | set(expect[1][0]))[:KMV_K]
    global_minima: list[int] = []
    for r in BATCH1 + BATCH2:
        kmv_insert(global_minima, KMV_K, _h60(r["user_id"]))
    assert union == global_minima
    exact = len({r["user_id"] for r in BATCH1 + BATCH2})
    if len(union) == KMV_K:
        est = (KMV_K - 1) * (1 << 60) // union[-1]
        assert abs(est - exact) < exact  # sane single-draw bound
    else:
        assert len(union) == exact  # small rung: sketch IS the set


def test_kmv_insert_invariants():
    """kmv_insert: sorted, deduped, bounded at k, keeps the smallest."""
    import random

    rng = random.Random(13)
    vals = [rng.randrange(1 << 60) for _ in range(500)] * 2  # with dups
    minima: list[int] = []
    for v in vals:
        kmv_insert(minima, 32, v)
        assert minima == sorted(set(minima))
        assert len(minima) <= 32
    assert minima == sorted(set(vals))[:32]