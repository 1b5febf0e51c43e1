"""Streaming Count-Min frequency monitor: the stateful twin of the batch
``agg_count_min_sketch`` (queries/sketches.py) and the ADDITIVE complement
of the Misra–Gries monitor (``streaming/heavy_hitters.py``).

Misra–Gries keeps k exact-ish counters and answers "who is heavy"; Count-
Min keeps a d×w counter GRID and answers "how often is X" for any X, at
the cost of a one-sided ε·N overestimate. The grid is what makes the
streaming form trivial to distribute: cells are sums, so per-shard grids
maintained independently merge into the global sketch by CELL-WISE
ADDITION — exactly (not approximately), which the tests certify. That is
the property a 1000-executor deployment leans on: each task folds its
partition into a local grid, a tree of vector adds produces the corpus
sketch, and historical grids (per hour, per day) roll up the same way.

Hash contract: the REGISTERED batch contract (``sketches._cms_h_spark`` —
60-bit md5 of ``'{row}:{user_id}'`` mod w), computed JVM-side as d bucket
columns BEFORE the stateful stage, so the Python state logic only ever
increments integers and the tests' hashlib replay matches bit-for-bit.

Determinism: the grid after a drained batch is ORDER-INSENSITIVE (each
cell is a count of matching rows), so like KMV — and unlike Misra–Gries —
no within-batch ordering contract is needed; the replay test asserts
EXACT grid equality anyway. State is d·w longs per shard (256 at the
registered parameters), watermark-free, independent of both stream length
and key cardinality — the bound that makes a frequency monitor deployable
on an unbounded key space.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
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

from ..queries.sketches import _CMS_DEPTH, _CMS_WIDTH, _cms_h_spark

CM_D = _CMS_DEPTH
CM_W = _CMS_WIDTH

OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("batch_seq", LongType()),
        StructField("n_seen", LongType()),
        StructField("grid", ArrayType(LongType())),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("grid", ArrayType(LongType())),
        StructField("n_seen", LongType()),
        StructField("batch_seq", LongType()),
    ]
)


def cm_point_query(grid: list[int], buckets: list[int]) -> int:
    """Point estimate from a (possibly merged) grid: min over hash rows of
    the addressed cells. Shared by the tests' reference replay."""
    return min(grid[j * CM_W + b] for j, b in enumerate(buckets))


def _cm_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        grid_raw, n_seen, batch_seq = state.get
        grid = np.asarray(grid_raw, dtype=np.int64)
    else:
        grid = np.zeros(CM_D * CM_W, dtype=np.int64)
        n_seen, batch_seq = 0, 0
    for pdf in pdfs:
        for j in range(CM_D):
            counts = np.bincount(
                pdf[f"b{j + 1}"].to_numpy(dtype=np.int64), minlength=CM_W
            )
            grid[j * CM_W : (j + 1) * CM_W] += counts
        n_seen += len(pdf)
    batch_seq += 1
    state.update(([int(x) for x in grid], n_seen, batch_seq))
    yield pd.DataFrame(
        {
            "shard": pd.array([int(key[0])], dtype="int64"),
            "batch_seq": pd.array([batch_seq], dtype="int64"),
            "n_seen": pd.array([n_seen], dtype="int64"),
            "grid": [[int(x) for x in grid]],
        }
    )


def stream_countmin(events: DataFrame, shards: int = 8) -> DataFrame:
    """Maintain per-shard Count-Min grids over a stream of events (needs
    event_id, user_id). Emits one snapshot row per shard per micro-batch
    carrying the full d·w grid; shard grids merge into the global sketch
    by cell-wise addition (the tests drive the merge and the point-query
    guarantee). Module docstring has the hash, additivity, and O(d·w)
    state contracts."""
    cols = [(F.col("event_id") % shards).alias("shard")]
    for j in range(1, CM_D + 1):
        cols.append(F.expr(_cms_h_spark(str(j), "user_id")).alias(f"b{j}"))
    keyed = events.select(*cols)
    return keyed.groupBy("shard").applyInPandasWithState(
        _cm_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
