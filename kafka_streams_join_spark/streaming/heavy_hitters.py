"""Streaming Misra–Gries heavy hitters: the stateful twin of the batch
``sketch_misra_gries_topk`` query (queries/heavy_hitters.py).

The batch query builds per-shard summaries OFFLINE (top-k by exact shard
count, decremented by the (k+1)-th — the Agarwal-et-al mergeable form);
this is the monitor that maintains the summary WHILE keys arrive: the
classic one-pass Misra–Gries counter automaton per shard —

  key in counters         → counter += 1
  else if < k counters    → new counter at 1
  else                    → ALL counters −= 1 (drop zeros), e_shard += 1

— with the counters as explicit state across micro-batches. Both forms
satisfy the same deterministic guarantee, certified by the tests on the
merged summary: ``est ≤ exact ≤ est + Σ_s e_s`` for every surviving
key, with every key whose true count exceeds Σe guaranteed present.

Determinism: the automaton is order-sensitive, so within a batch rows
are processed in (ts, event_id) order (the repo's event ordering
contract) and the cross-batch order is arrival order — the test's
pure-Python replay processes the identical sequence and must match the
state EXACTLY, not just within the bound.

State per shard is (keys[], counts[], e, n_seen) — ≤ k counters, so
O(shards·k) total state, watermark-free. Each batch APPENDS a summary
snapshot (one row per surviving counter, stamped with the shard's
batch sequence number) so a downstream consumer reads the latest
snapshot per shard and merges shards by counter addition — exactly the
batch query's merge step.

At scale the shard key is the stream's natural partition (Kafka
partition / event_id % S here): state stays per-shard-bounded no
matter the key cardinality, which is the entire point of a
heavy-hitter sketch.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

MG_K = 8  # counters per shard (the batch query's _HH_K)

OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("batch_seq", LongType()),
        StructField("user_id", LongType()),
        StructField("est", LongType()),
        StructField("e_shard", LongType()),
        StructField("n_seen", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("e", LongType()),
        StructField("n_seen", LongType()),
        StructField("batch_seq", LongType()),
    ]
)


def mg_step(
    counters: dict[int, int], k: int, key: int, e: int
) -> int:
    """One Misra–Gries automaton step on ``counters`` (mutated in
    place, |counters| ≤ k invariant); returns the new decrement total
    e. Shared by the operator and the tests' reference replay."""
    if key in counters:
        counters[key] += 1
    elif len(counters) < k:
        counters[key] = 1
    else:
        for kk in list(counters):
            counters[kk] -= 1
            if counters[kk] == 0:
                del counters[kk]
        e += 1
    return e


def _mg_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        keys, counts, e, n_seen, batch_seq = state.get
        counters = dict(zip((int(x) for x in keys), (int(c) for c in counts)))
    else:
        counters, e, n_seen, batch_seq = {}, 0, 0, 0
    rows: list[tuple] = []
    for pdf in pdfs:
        rows.extend(
            zip(
                (int(t) for t in pdf["ts_us"]),
                (int(i) for i in pdf["event_id"]),
                (int(u) for u in pdf["user_id"]),
            )
        )
    rows.sort()  # (ts, event_id) — the repo's event ordering contract
    for _ts, _eid, uid in rows:
        e = mg_step(counters, MG_K, uid, e)
        n_seen += 1
    batch_seq += 1
    state.update(
        (list(counters.keys()), list(counters.values()), e, n_seen, batch_seq)
    )
    snap = sorted(counters.items())
    # A decrement storm can legally empty the summary (k counters at 1
    # plus one unseen key decrements all to 0). An empty list would build
    # an object-dtype frame that Arrow must coerce to the long OUTPUT
    # schema — emit nothing for an empty snapshot instead.
    if snap:
        yield pd.DataFrame(
            [(key[0], batch_seq, uid, c, e, n_seen) for uid, c in snap],
            columns=[
                "shard", "batch_seq", "user_id", "est", "e_shard", "n_seen",
            ],
        )


def stream_heavy_hitters(events: DataFrame, shards: int = 16) -> DataFrame:
    """Maintain per-shard Misra–Gries summaries over a stream of events
    (needs ts, event_id, user_id). Emits a summary snapshot per shard
    per micro-batch; the latest snapshot per shard merges by counter
    addition into the global heavy-hitter estimate (the batch query's
    merge). Module docstring has the automaton, determinism, and
    O(shards·k) state contracts."""
    from pyspark.sql import functions as F

    keyed = events.select(
        (F.col("event_id") % shards).alias("shard"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        "user_id",
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _mg_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
