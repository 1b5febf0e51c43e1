"""Streaming KMV distinct monitor: the stateful twin of the batch
``sketch_kmv_distinct_sweep`` (queries/kmv_sweep.py).

The batch query ranks the full corpus's distinct hashes offline; this is
the monitor that maintains the k-minimum-values set WHILE keys arrive:
per shard, the state is the (at most) k smallest DISTINCT 60-bit hashes
seen so far — insert if new and smaller than the current k-th (or the set
is underfull), else drop. Each micro-batch APPENDS a snapshot row per
shard (batch sequence, held count, the k-th minimum, rows seen), and the
union of the latest per-shard snapshots merges into the global sketch by
simply taking the k smallest of the held minima — KMV's defining property
(exact mergeability) is what the sharding exercises: a merged KMV over
shards equals the KMV of the union, which the tests certify against the
batch estimator formula on the same rows.

Hash contract: the REGISTERED 60-bit md5 contract (``hll8_`` prefix,
first 15 hex chars — ``sketches_ext._H60_SPARK``), computed JVM-side as a
column before the stateful stage, so the Python state logic only ever
compares longs and the tests' pure-Python replay (hashlib md5) matches
bit-for-bit.

Determinism: the KMV state after a drained batch is ORDER-INSENSITIVE
(it is a set function of the seen keys), so unlike Misra–Gries no
within-batch ordering contract is needed; the replay test asserts EXACT
state equality anyway. State is ≤ k longs per shard — O(shards·k) total,
watermark-free, the bound that makes a distinct monitor deployable on an
unbounded key space.
"""

from __future__ import annotations

import bisect
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from ..queries.sketches_ext import _H60_SPARK

KMV_K = 64  # minima per shard

OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("batch_seq", LongType()),
        StructField("n_held", LongType()),
        StructField("kth_min", LongType()),
        StructField("n_seen", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("minima", ArrayType(LongType())),
        StructField("n_seen", LongType()),
        StructField("batch_seq", LongType()),
    ]
)


def kmv_insert(minima: list[int], k: int, h: int) -> None:
    """One KMV step on the SORTED minima list (mutated in place,
    len ≤ k invariant): insert h if it is new and belongs among the k
    smallest. Shared by the operator and the tests' reference replay."""
    i = bisect.bisect_left(minima, h)
    if i < len(minima) and minima[i] == h:
        return
    if len(minima) < k:
        minima.insert(i, h)
    elif h < minima[-1]:
        minima.insert(i, h)
        minima.pop()


def _kmv_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        minima_raw, n_seen, batch_seq = state.get
        minima = [int(x) for x in minima_raw]
    else:
        minima, n_seen, batch_seq = [], 0, 0
    for pdf in pdfs:
        for h in pdf["h"]:
            kmv_insert(minima, KMV_K, int(h))
            n_seen += 1
    batch_seq += 1
    state.update((list(minima), n_seen, batch_seq))
    if minima:
        yield pd.DataFrame(
            [(key[0], batch_seq, len(minima), minima[-1], n_seen)],
            columns=["shard", "batch_seq", "n_held", "kth_min", "n_seen"],
        ).astype("int64")


def stream_kmv_distinct(events: DataFrame, shards: int = 8) -> DataFrame:
    """Maintain per-shard KMV minima over a stream of events (needs
    event_id, user_id). Emits one snapshot row per shard per micro-batch;
    the latest snapshots merge by taking the k smallest of the union of
    held minima (the tests drive the merge). Module docstring has the
    hash, mergeability, and O(shards·k) state contracts."""
    keyed = events.select(
        (F.col("event_id") % shards).alias("shard"),
        F.expr(_H60_SPARK).alias("h"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _kmv_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
