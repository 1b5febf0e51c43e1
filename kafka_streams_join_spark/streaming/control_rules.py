"""Streaming statistical process control: the stateful twin of the batch
``events_control_rules`` query (queries/control_charts.py).

The batch query audits the hourly volume series RETROSPECTIVELY — every
hour is tested against the full series' center line. The streaming twin
is the monitor that runs while data arrives: per event type it maintains
running integer moments (hours seen k, sum of counts s, sum of squared
counts q) across micro-batches and tests each newly finalized hour
PREQUENTIALLY — against the moments of the hours seen BEFORE it — then
folds the hour in. Prequential scoring is the standard one-pass contract
(every observation is evaluated before training on it; the
``streaming/anomaly.py`` precedent); it deliberately differs from the
batch retrospective flags, and the cross-check test certifies this
operator against a pure-Python replay AND its final state against the
batch query's exact moments on the same rows.

Exactness discipline (the control_charts no-float contract, kept intact
in flight): rule 1 is the exact-integer inequality
``(c·k − s)² > 9·(k·q − s²)`` evaluated in arbitrary-precision Python
ints (no widening cliff in state: k, s, q are int64 — q ≤ hours·c_max²
stays under 2⁶³ through ~10⁹ hourly counts); rule 4 tracks the SIGN of
the exact deviation ``c·k − s`` — the 8th+ consecutive hour strictly one
side of the running mean flags, no threshold float anywhere.

State is five integers per event type — O(#types), watermark-free — and
the only ordering requirement is that finalized hour counts arrive per
type in hour order (guaranteed by the upstream watermarked windowed
count, exactly the ``streaming/anomaly.py`` two-query topology:
``applyInPandasWithState`` cannot sit downstream of a streaming
aggregation inside one query, so the windowed-count stage and this
monitor chain through a replayable sink).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# WE rule 4: the run length at which "consecutive hours strictly one
# side of the center line" flags — 8, the classic Western Electric value
# (shared with the batch query's 8-row rolling sign window).
RUN_LEN = 8

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("hour", StringType()),
        StructField("c", LongType()),
        StructField("rule1", IntegerType()),
        StructField("side", IntegerType()),
        StructField("run_len", LongType()),
        StructField("rule4", IntegerType()),
        StructField("n_prior_hours", LongType()),
    ]
)

# running exact moments + run-rule state:
# k hours seen, s = sum(c), q = sum(c^2), prev_side in {-1, 0, +1},
# run_len = length of the current strictly-one-side streak
STATE_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("s", LongType()),
        StructField("q", LongType()),
        StructField("prev_side", IntegerType()),
        StructField("run_len", LongType()),
    ]
)


def score_hour(
    k: int, s: int, q: int, prev_side: int, run_len: int, c: int
) -> tuple[int, int, int, int]:
    """Prequential Shewhart/WE decision for one finalized hour count
    ``c`` against prior exact moments (k, s, q): returns
    (rule1, side, new_run_len, rule4). Pure integers throughout —
    ``(c·k − s)² > 9·(k·q − s²)`` is |dev| > 3σ multiplied through by
    k², and ``side`` is the sign of the exact deviation. No rule-1 call
    until 2 prior hours (σ undefined below that, matching the batch
    n ≥ 2 effective behavior); side/runs need 1 prior hour (a mean to
    be on one side OF). Shared by the streaming operator and the test's
    reference replay — one definition, two uses."""
    dd = c * k - s  # exact deviation * k
    side = 0 if k < 1 else (1 if dd > 0 else (-1 if dd < 0 else 0))
    rule1 = int(k >= 2 and dd * dd > 9 * (k * q - s * s))
    new_run = run_len + 1 if (side != 0 and side == prev_side) else (
        1 if side != 0 else 0
    )
    rule4 = int(new_run >= RUN_LEN)
    return rule1, side, new_run, rule4


def _control_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    k, s, q, prev_side, run_len = (
        state.get if state.exists else (0, 0, 0, 0, 0)
    )
    rows: list[tuple[str, int]] = []
    for pdf in pdfs:
        for hour, c in zip(pdf["hour"], pdf["c"]):
            rows.append((str(hour), int(c)))
    # within a batch, hours score in chronological order (ISO strings sort)
    rows.sort()
    out = []
    for hour, c in rows:
        rule1, side, run_len, rule4 = score_hour(
            k, s, q, prev_side, run_len, c
        )
        out.append((key[0], hour, c, rule1, side, run_len, rule4, k))
        k, s, q, prev_side = k + 1, s + c, q + c * c, side
    state.update((k, s, q, prev_side, run_len))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "event_type",
                "hour",
                "c",
                "rule1",
                "side",
                "run_len",
                "rule4",
                "n_prior_hours",
            ],
        )


def stream_control_rules(hourly_counts: DataFrame) -> DataFrame:
    """Monitor a stream of finalized (event_type, hour, c) hourly counts
    with prequential Shewhart rule 1 and Western Electric rule 4. Input
    columns: event_type (string), hour (ISO string), c (long) — the
    shape the watermarked windowed-count stage emits once its watermark
    closes an hour."""
    return hourly_counts.groupBy("event_type").applyInPandasWithState(
        _control_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
