"""Streaming frozen-domain histogram monitor: cross-batch grid state —
the stateful twin of the batch ``sketch_histogram_quantiles`` query.

Certifies (a) the per-shard grid and snapshot read-offs EXACTLY against a
pure-Python replay of the frozen clamp/bin rule, (b) cross-batch
accumulation (batch-1 snapshots equal a batch-1-only replay; cells only
grow), (c) the defining ADDITIVITY: cell-wise summing the final shard
grids reproduces the single global grid EXACTLY — no range negotiation,
the axis the frozen domain exists for — and (d) the quantile bound: the
read-off over the merged grid is >= the exact lower quantile of every
value seen and within one bin width of it, for each q.
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
from kafka_streams_join_spark.streaming.histogram import (
    HB,
    HW,
    H_QS,
    hist_bin,
    hist_quantile_est,
    stream_histogram,
)

SHARDS = 2


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_hist_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(values, start_eid):
    base = datetime.datetime(2024, 1, 1)
    return [
        {
            "ts": (base + datetime.timedelta(seconds=i)).isoformat(),
            "event_id": start_eid + i,
            "value": v,
        }
        for i, v in enumerate(values)
    ]


def _replay(batches):
    state = {s: ([0] * HB, 0) for s in range(SHARDS)}
    for batch in batches:
        for r in batch:
            s = r["event_id"] % SHARDS
            grid, n = state[s]
            grid[hist_bin(r["value"])] += 1
            state[s] = (grid, n + 1)
    return state


# skewed latencies: a dense low mode, a mid tail, clamped outliers
# (negative and beyond-domain values exercise the edge bins)
BATCH1 = _rows(
    [120] * 30 + list(range(0, 5000, 250)) + [70000, 140000, -5], start_eid=0
)
BATCH2 = _rows(
    [130] * 20 + list(range(5000, 60000, 2500)) + [131071, 200000], start_eid=1000
)


def test_stream_histogram_matches_replay_and_merges(spark, tmpdir):
    src = FileStream(
        spark,
        tmpdir,
        "events",
        schema="ts timestamp, event_id long, value long",
    )
    src.add_batch(BATCH1)
    out = stream_histogram(src.df(), shards=SHARDS)
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
        for qq in H_QS:
            assert r[f"p{qq}_est"] == hist_quantile_est(grid, qq)

    # cross-batch: batch-1 snapshots equal a batch-1-only replay; cells
    # only grow (counters are additive)
    b1_expect = _replay([BATCH1])
    for r in snaps:
        if r.batch_seq == 1:
            grid, n = b1_expect[r.shard]
            assert list(r.grid) == grid and r.n_seen == n
    for s, (_seq, r2) in last.items():
        g1 = b1_expect[s][0]
        assert all(c2 >= c1 for c1, c2 in zip(g1, r2.grid))

    # additivity: cell-wise sum of shard grids == global grid over all rows
    merged = [
        sum(expect[s][0][i] for s in range(SHARDS)) for i in range(HB)
    ]
    global_grid = [0] * HB
    all_vals = [r["value"] for r in BATCH1 + BATCH2]
    for v in all_vals:
        global_grid[hist_bin(v)] += 1
    assert merged == global_grid

    # quantile bound on the merged grid: est >= exact lower quantile of
    # the CLAMPED values and within one bin width
    clamped = sorted(min(131071, max(0, v)) for v in all_vals)
    n = len(clamped)
    for qq in H_QS:
        est = hist_quantile_est(merged, qq)
        exact = clamped[(qq * n + 99) // 100 - 1]
        assert est >= exact
        assert est - exact < HW


def test_hist_readoff_helpers():
    """Unit pins: empty grid -> None; a single-cell grid reads that
    cell's upper edge at every q; clamping routes out-of-domain values to
    the edge bins."""
    assert hist_quantile_est([0] * HB, 50) is None
    g = [0] * HB
    g[7] = 5
    for qq in H_QS:
        assert hist_quantile_est(g, qq) == 8 * HW - 1
    assert hist_bin(-100) == 0
    assert hist_bin(10**9) == HB - 1
