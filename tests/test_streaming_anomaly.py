"""Streaming anomaly z-score: prequential scoring with cross-batch state.

Certifies (a) the stateful operator against a pure-Python Welford-style
reference replaying the same day counts in order, (b) that state persists
across micro-batches (a day in batch 2 is scored against moments
accumulated in batch 1), and (c) that the final running moments equal the
batch aggregate's — so the streaming monitor and the retrospective
``events_anomaly_zscore`` audit agree on the distribution once the stream
is drained.
"""

from __future__ import annotations

import math
import shutil
import tempfile

import pytest

from kafka_streams_join_spark.streaming.anomaly import (
    score_day,
    stream_anomaly_zscore,
)
from kafka_streams_join_spark.streaming.harness import (
    FileStream,
    start_memory_sink,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_anomaly_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


BATCH1 = [
    {"event_type": "click", "day": "2024-01-01", "n": 100},
    {"event_type": "click", "day": "2024-01-02", "n": 104},
    {"event_type": "click", "day": "2024-01-03", "n": 96},
    {"event_type": "view", "day": "2024-01-01", "n": 10},
    {"event_type": "view", "day": "2024-01-02", "n": 10},
]
BATCH2 = [
    # a 5x spike after three calm days — must flag against batch-1 state
    {"event_type": "click", "day": "2024-01-04", "n": 500},
    {"event_type": "view", "day": "2024-01-03", "n": 10},
]


def _reference(rows):
    """Replay day counts per type through the shared score_day rule."""
    state: dict[str, tuple[int, float, float]] = {}
    out = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["day"])):
        k, s, ss = state.get(r["event_type"], (0, 0.0, 0.0))
        z, flag = score_day(k, s, ss, r["n"])
        out[(r["event_type"], r["day"])] = (z, flag, k)
        state[r["event_type"]] = (k + 1, s + r["n"], ss + float(r["n"]) ** 2)
    return out, state


def test_stream_anomaly_matches_reference_across_batches(spark, tmpdir):
    src = FileStream(
        spark, tmpdir, "daily", schema="event_type string, day string, n long"
    )
    src.add_batch(BATCH1)

    scored = stream_anomaly_zscore(src.df())
    assert scored.isStreaming
    q, sink = start_memory_sink(scored, checkpoint_root=tmpdir)
    try:
        q.processAllAvailable()
        src.add_batch(BATCH2)
        q.processAllAvailable()
        got = {
            (r.event_type, r.day): (r.zscore, r.is_anomaly, r.n_prior_days)
            for r in spark.table(sink).collect()
        }
    finally:
        q.stop()

    expect, final_state = _reference(BATCH1 + BATCH2)
    assert set(got) == set(expect)
    for key, (z, flag, k) in expect.items():
        gz, gflag, gk = got[key]
        assert abs(gz - z) < 1e-9, (key, gz, z)
        assert gflag == flag
        assert gk == k

    # the spike day was scored against BATCH-1 state (3 prior days) and
    # flagged — state crossed the micro-batch boundary
    assert got[("click", "2024-01-04")][1] == 1
    assert got[("click", "2024-01-04")][2] == 3

    # final running moments == the batch aggregate's moments
    clicks = [r["n"] for r in BATCH1 + BATCH2 if r["event_type"] == "click"]
    k, s, ss = final_state["click"]
    assert k == len(clicks) and s == sum(clicks)
    mu = s / k
    sd = math.sqrt(ss / k - mu * mu)
    ref_mu = sum(clicks) / len(clicks)
    ref_sd = math.sqrt(sum((c - ref_mu) ** 2 for c in clicks) / len(clicks))
    assert abs(mu - ref_mu) < 1e-9 and abs(sd - ref_sd) < 1e-6


def test_score_day_rule():
    """The shared rule: no score until 2 prior days; zero variance → 0."""
    assert score_day(0, 0.0, 0.0, 5) == (0.0, 0)
    assert score_day(1, 5.0, 25.0, 7) == (0.0, 0)
    assert score_day(3, 30.0, 300.0, 10) == (0.0, 0)  # constant 10s: sd = 0
    z, flag = score_day(2, 30.0, 500.0, 35)  # days 10, 20 → mu 15, sd 5
    assert z == 4.0 and flag == 1


def test_full_chain_windowed_counts_into_anomaly(spark, tmpdir):
    """The production topology end-to-end, as TWO chained streaming
    queries: (1) raw events → watermarked 1-day tumbling counts, append
    mode (a day emits only once the watermark closes it) → a durable JSON
    feed; (2) the stateful prequential scorer reading that feed. Spark
    rejects ``applyInPandasWithState`` downstream of a streaming
    aggregation in one query (AnalysisException, by design) — the
    supported and deployed shape IS the two-query chain through a
    replayable sink, which this test certifies."""
    import os

    from pyspark.sql import functions as F

    # 4 calm days then a spike; a final far-future event advances the
    # watermark so every interesting day closes
    rows = []
    for day, n in [(1, 10), (2, 12), (3, 8), (4, 10), (5, 300)]:
        rows += [
            {"key": "click", "value": f"e{day}_{i}", "ts": f"2024-01-0{day}T06:00:{i % 60:02d}"}
            for i in range(n)
        ]
    flush = [{"key": "click", "value": "flush", "ts": "2024-02-01T00:00:00"}]

    src = FileStream(spark, tmpdir, "events")
    src.add_batch(rows)
    src.add_batch(flush)

    ev = src.df().select(
        F.col("key").alias("event_type"), F.col("ts").cast("timestamp").alias("ts")
    )
    daily = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            F.col("n").cast("long").alias("n"),
        )
    )
    feed = os.path.join(tmpdir, "daily_feed")
    q1 = (
        daily.writeStream.format("json")
        .option("path", feed)
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt_counts"))
        .outputMode("append")
        .start()
    )
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()

    # No maxFilesPerTrigger throttle here: the sink wrote one part file per
    # shuffle partition with near-identical mtimes, so one-file-per-trigger
    # replays them in ARBITRARY order and violates the scorer's in-day-order
    # contract (observed: day 4 folding before day 2 shifts every
    # prequential z). Reading all available files per trigger lets the
    # scorer's within-batch day sort establish the order; cross-batch state
    # is certified by test_stream_anomaly_matches_reference_across_batches.
    counts_stream = spark.readStream.schema(
        "event_type string, day string, n long"
    ).json(feed)
    scored = stream_anomaly_zscore(counts_stream)
    q, sink = start_memory_sink(scored, checkpoint_root=tmpdir)
    try:
        q.processAllAvailable()
        got = {
            r.day: (r.n, r.zscore, r.is_anomaly)
            for r in spark.table(sink).collect()
        }
    finally:
        q.stop()

    # the 5 real days all closed (the flush event advanced the watermark
    # past them); the spike day flags against the 4 calm prior days
    assert set(got) == {f"2024-01-0{d}" for d in range(1, 6)}
    counts = {f"2024-01-0{d}": n for d, n in [(1, 10), (2, 12), (3, 8), (4, 10), (5, 300)]}
    for day, (n, _, _) in got.items():
        assert n == counts[day]
    ref, _ = _reference(
        [{"event_type": "click", "day": d, "n": n} for d, n in counts.items()]
    )
    for day, (n, z, flag) in got.items():
        rz, rflag, _ = ref[("click", day)]
        assert abs(z - rz) < 1e-9 and flag == rflag
    assert got["2024-01-05"][2] == 1
