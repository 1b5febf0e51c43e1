"""Streaming frozen-domain histogram monitor: the stateful twin of the
batch ``sketch_histogram_quantiles`` (queries/sketches_cm.py) and the
fourth rung of the mergeable-monitor family (Misra–Gries "who is heavy",
KMV "how many distinct", Count-Min "how often is X", histogram "how is X
DISTRIBUTED" — the streaming-latency-quantile dashboard everyone runs).

The frozen domain is what makes the streaming form trivial: bins are
fixed a priori ([0, 131072) in 256 × 512-wide cells, clamped edges), so
per-shard counter arrays maintained independently merge into the global
histogram by CELL-WISE ADDITION — exactly, with no range negotiation
(the coordination a data-adaptive sketch like t-digest cannot avoid).
Each micro-batch snapshot also carries the shard-local integer
lower-quantile read-offs (p50/p90/p99: the first bin whose cumulative
count reaches ceil(q·n/100), reported as the bin's inclusive upper
edge), and the tests certify that the same read-off over the MERGED grid
lands within one bin width of the exact quantile of everything seen.

Bin contract: the batch query's frozen rule (``sketches_cm._HQ_*``),
computed JVM-side as a bin column BEFORE the stateful stage, so the
Python state logic only ever increments integers. Determinism: the grid
after a drained batch is ORDER-INSENSITIVE (cells are counts), like CM
and KMV. State is B longs per shard — independent of stream length and
value distribution, the bound that makes a quantile monitor deployable.
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

from ..queries.sketches_cm import _HQ_B, _HQ_HI, _HQ_LO, _HQ_QS, _HQ_W

HB = _HQ_B
HW = _HQ_W
H_QS = _HQ_QS

OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("batch_seq", LongType()),
        StructField("n_seen", LongType()),
        StructField("grid", ArrayType(LongType())),
    ]
    + [StructField(f"p{q}_est", LongType()) for q in H_QS]
)

STATE_SCHEMA = StructType(
    [
        StructField("grid", ArrayType(LongType())),
        StructField("n_seen", LongType()),
        StructField("batch_seq", LongType()),
    ]
)


def hist_bin(v: int) -> int:
    """The batch query's frozen clamp/bin rule, shared with the tests'
    reference replay."""
    return min(_HQ_HI - 1, max(_HQ_LO, v)) // HW


def hist_quantile_est(grid: list[int], q: int) -> int | None:
    """Integer lower-quantile read-off over a (possibly merged) grid:
    first bin whose cumulative count reaches ceil(q·n/100), reported as
    the bin's inclusive upper edge. None on an empty grid."""
    n = sum(grid)
    if n == 0:
        return None
    target = (q * n + 99) // 100
    cum = 0
    for b, c in enumerate(grid):
        cum += c
        if cum >= target:
            return (b + 1) * HW - 1
    return HB * HW - 1


def _hist_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        grid_raw, n_seen, batch_seq = state.get
        grid = np.asarray(grid_raw, dtype=np.int64)
    else:
        grid = np.zeros(HB, dtype=np.int64)
        n_seen, batch_seq = 0, 0
    for pdf in pdfs:
        counts = np.bincount(
            pdf["bin"].to_numpy(dtype=np.int64), minlength=HB
        )
        grid += counts
        n_seen += len(pdf)
    batch_seq += 1
    glist = [int(x) for x in grid]
    state.update((glist, n_seen, batch_seq))
    row = {
        "shard": pd.array([int(key[0])], dtype="int64"),
        "batch_seq": pd.array([batch_seq], dtype="int64"),
        "n_seen": pd.array([n_seen], dtype="int64"),
        "grid": [glist],
    }
    for q in H_QS:
        row[f"p{q}_est"] = pd.array(
            [hist_quantile_est(glist, q)], dtype="int64"
        )
    yield pd.DataFrame(row)


def stream_histogram(events: DataFrame, shards: int = 8) -> DataFrame:
    """Maintain per-shard frozen-domain histograms over a stream of
    events (needs event_id and a numeric ``value`` column; doubles floor-bin
    exactly like the batch rule). Emits one
    snapshot row per shard per micro-batch carrying the B-cell grid and
    the shard-local p50/p90/p99 read-offs; shard grids merge by cell-wise
    addition (the tests drive the merge and the one-bin bound). Module
    docstring has the bin, additivity, and O(B) state contracts."""
    # the batch query's exact rule, floor-first so DOUBLE value columns
    # (the corpus's events.value) bin identically to longs
    keyed = events.select(
        (F.col("event_id") % shards).alias("shard"),
        F.expr(
            f"least({_HQ_HI - 1}, greatest({_HQ_LO},"
            f" cast(floor(value) as bigint))) div {HW}"
        ).alias("bin"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _hist_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
