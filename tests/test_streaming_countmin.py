"""Streaming Count-Min monitor: cross-batch grid state — the stateful
twin of the batch ``agg_count_min_sketch`` query.

Certifies (a) the per-shard grid EXACTLY against a pure-Python replay of
the registered md5 bucket contract, (b) that grids accumulate across
micro-batches (batch-1 snapshots equal a batch-1-only replay; counts
never decrease), (c) Count-Min's defining ADDITIVITY: cell-wise summing
the final shard grids reproduces the single global grid over the same
rows EXACTLY — shard-count-independent, which is why the sketch
distributes — and (d) the one-sided point-query guarantee (est >= exact
for every key) on the merged grid, with the estimate equal to the batch
query's min-over-rows formula.
"""

from __future__ import annotations

import datetime
import hashlib
import shutil
import tempfile
from collections import Counter

import pytest

from kafka_streams_join_spark.streaming.countmin import (
    CM_D,
    CM_W,
    cm_point_query,
    stream_countmin,
)
from kafka_streams_join_spark.streaming.harness import (
    FileStream,
    start_memory_sink,
)

SHARDS = 2


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_cm_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _bucket(j: int, uid: int) -> int:
    """The registered batch contract: 60-bit md5 of '{j}:{uid}' mod w."""
    return int(hashlib.md5(f"{j}:{uid}".encode()).hexdigest()[:15], 16) % CM_W


def _buckets(uid: int) -> list[int]:
    return [_bucket(j, uid) for j in range(1, CM_D + 1)]


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
    state = {s: ([0] * (CM_D * CM_W), 0) for s in range(SHARDS)}
    for batch in batches:
        for r in batch:
            s = r["event_id"] % SHARDS
            grid, n = state[s]
            for j, b in enumerate(_buckets(r["user_id"])):
                grid[j * CM_W + b] += 1
            state[s] = (grid, n + 1)
    return state


# Zipf-ish skew: user 7 dominates, a mid tier repeats, a long tail is
# unique; batch 2 re-hits batch-1 keys so accumulation is observable
BATCH1 = _rows([7] * 40 + [11, 13, 17] * 5 + list(range(100, 140)), start_eid=0)
BATCH2 = _rows([7] * 25 + [13] * 10 + list(range(140, 200)), start_eid=1000)


def test_stream_countmin_matches_replay_and_merges(spark, tmpdir):
    src = FileStream(
        spark,
        tmpdir,
        "events",
        schema="ts timestamp, event_id long, user_id long",
    )
    src.add_batch(BATCH1)
    out = stream_countmin(src.df(), shards=SHARDS)
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
        grid, n = expect[s]
        assert list(r.grid) == grid
        assert r.n_seen == n

    # cross-batch: batch-1 snapshots equal a replay of batch 1 alone,
    # and cells only grow (counters are additive, never decremented)
    b1_expect = _replay([BATCH1])
    for r in snaps:
        if r.batch_seq == 1:
            grid, n = b1_expect[r.shard]
            assert list(r.grid) == grid
            assert r.n_seen == n
    for s, (_seq, r2) in last.items():
        g1 = b1_expect[s][0]
        assert all(c2 >= c1 for c1, c2 in zip(g1, r2.grid))

    # additivity: cell-wise sum of the final shard grids == one global
    # grid built over all rows (the distributed-merge contract)
    merged = [
        sum(expect[s][0][i] for s in range(SHARDS))
        for i in range(CM_D * CM_W)
    ]
    global_grid = [0] * (CM_D * CM_W)
    for r in BATCH1 + BATCH2:
        for j, b in enumerate(_buckets(r["user_id"])):
            global_grid[j * CM_W + b] += 1
    assert merged == global_grid

    # point-query guarantee on the merged grid: never an underestimate,
    # and the min-over-rows formula is the batch query's estimator
    exact = Counter(r["user_id"] for r in BATCH1 + BATCH2)
    for uid, n in exact.items():
        est = cm_point_query(merged, _buckets(uid))
        assert est >= n
    # the dominant key's estimate is tight relative to eps*N = e/w * N
    import math

    n_total = sum(exact.values())
    assert cm_point_query(merged, _buckets(7)) - exact[7] <= math.ceil(
        math.e / CM_W * n_total
    )


def test_cm_point_query_reads_min_over_rows():
    grid = [0] * (CM_D * CM_W)
    buckets = [3, 5, 7, 9]
    for j, b in enumerate(buckets):
        grid[j * CM_W + b] = 10 + j
    # a colliding key inflates row 0 only; min picks the clean rows
    grid[0 * CM_W + 3] += 100
    assert cm_point_query(grid, buckets) == 11
