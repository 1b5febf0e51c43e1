"""Streaming volume-anomaly detection: the stateful twin of the batch
``events_anomaly_zscore`` query.

The batch query scores each (event_type, day) count against the type's
FULL daily distribution — a retrospective audit. The streaming twin is the
monitor that runs while data arrives: per event type it maintains running
(count, sum, sum-of-squares) moments across micro-batches and scores each
newly finalized day PREQUENTIALLY — against the moments of the days seen
BEFORE it — then folds the day in. Prequential scoring is the standard
one-pass contract (every observation is evaluated before training on it);
it deliberately differs from the batch retrospective z-score, and the
cross-check test certifies both this operator against a pure-Python
Welford reference AND the final state against the batch moments.

State is three numbers per event type — O(#types), watermark-free, the
smallest stateful footprint in the repo — so at production scale the only
constraint is that finalized day counts arrive per type in day order
(guaranteed by the upstream windowed count with watermark emission).

Topology note: Spark rejects ``applyInPandasWithState`` DOWNSTREAM of a
streaming aggregation inside one query (AnalysisException, by design), so
the windowed-count stage and this scorer deploy as TWO chained queries
through a replayable sink (files/Kafka) — the shape
tests/test_streaming_anomaly.py certifies end-to-end.
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("day", StringType()),
        StructField("n", LongType()),
        StructField("zscore", DoubleType()),
        StructField("is_anomaly", IntegerType()),
        StructField("n_prior_days", LongType()),
    ]
)

# running moments: days seen, sum of counts, sum of squared counts
STATE_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("s", DoubleType()),
        StructField("ss", DoubleType()),
    ]
)


def score_day(k: int, s: float, ss: float, n: int) -> tuple[float, int]:
    """Prequential z of a day count ``n`` against prior moments (k, s, ss):
    z = (n − mean) / population-std of the PRIOR days; 0 while fewer than
    2 prior days or zero variance. Shared by the streaming operator and
    the test's reference implementation — one definition, two uses."""
    if k < 2:
        return 0.0, 0
    mu = s / k
    var = max(ss / k - mu * mu, 0.0)
    sd = math.sqrt(var)
    if sd == 0.0:
        return 0.0, 0
    z = (n - mu) / sd
    return round(z, 4) + 0.0, int(abs(z) >= 2)


def _anomaly_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    k, s, ss = state.get if state.exists else (0, 0.0, 0.0)
    rows: list[tuple[str, int]] = []
    for pdf in pdfs:
        for day, n in zip(pdf["day"], pdf["n"]):
            rows.append((str(day), int(n)))
    # within a batch, days score in chronological order (ISO strings sort)
    rows.sort()
    out = []
    for day, n in rows:
        z, flag = score_day(k, s, ss, n)
        out.append((key[0], day, n, z, flag, k))
        k, s, ss = k + 1, s + n, ss + float(n) * n
    state.update((k, s, ss))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "event_type",
                "day",
                "n",
                "zscore",
                "is_anomaly",
                "n_prior_days",
            ],
        )


def stream_anomaly_zscore(daily_counts: DataFrame) -> DataFrame:
    """Score a stream of finalized (event_type, day, n) daily counts with
    prequential z-scores. Input columns: event_type (string), day (ISO
    string), n (long) — the shape the windowed-count stage emits after its
    watermark closes a day."""
    return daily_counts.groupBy("event_type").applyInPandasWithState(
        _anomaly_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
