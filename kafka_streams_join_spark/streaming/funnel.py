"""Streaming funnel monitor: the stateful twin of the batch
``events_funnel_conversion`` query (queries/events_analytics.py).

The batch query computes funnel stages retrospectively; this is the
monitor that tracks each user's stage WHILE events arrive: per user it
keeps the first-view / first-click-after-view / first-purchase-after-
click anchor timestamps as explicit state across micro-batches and
emits a row the moment a stage is REACHED (stage, the anchoring event
time, and the exact microsecond gap from the previous anchor) — the
shape a real-time conversion dashboard consumes, where "purchase
within the window" alerts fire from the emitted gaps rather than a
nightly rescan.

Semantics: anchors are FIRSTS with strict ordering (a click counts
only strictly after the first view, a purchase only strictly after
that click), and within a micro-batch rows are processed in
(ts, event_id) order. The monitor anchors UNBOUNDED firsts — the
drained anchors equal an unbounded-window sweep over the same rows
(this is what the tests certify), whereas the batch
``events_funnel_conversion`` query bounds its click/purchase anchors
to a 24h attribution window: batch v_ts/c_ts/p_ts equality therefore
holds exactly for the users whose stage gaps fit that window, and the
emitted gaps evaluated at any attribution window reproduce
``events_funnel_window_sweep``'s counts.

State is three int64 microsecond anchors per user — O(#users),
watermark-free; reached stages never retract, so output is append-only
by construction. At scale the group key is the stream's user
partition; state size is the active-funnel population, which is the
number every funnel monitor already holds.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", IntegerType()),
        StructField("anchor_us", LongType()),
        StructField("gap_us", LongType()),
    ]
)

# first-view / first-click-after-view / first-purchase-after-click
# anchors in epoch microseconds; 0 = not reached
STATE_SCHEMA = StructType(
    [
        StructField("v_us", LongType()),
        StructField("c_us", LongType()),
        StructField("p_us", LongType()),
    ]
)


def funnel_step(
    state: tuple[int, int, int], et: str, us: int
) -> tuple[tuple[int, int, int], int | None]:
    """One event through the funnel automaton: returns (new_state,
    reached_stage or None). Anchors are firsts with strict ordering —
    identical to the batch anchor-join semantics. Shared by the
    operator and the tests' replay."""
    v, c, p = state
    if et == "view" and v == 0:
        return (us, c, p), 1
    if et == "click" and v != 0 and c == 0 and us > v:
        return (v, us, p), 2
    if et == "purchase" and c != 0 and p == 0 and us > c:
        return (v, c, us), 3
    return state, None


def _funnel_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    st = tuple(state.get) if state.exists else (0, 0, 0)
    rows: list[tuple[int, int, str]] = []
    for pdf in pdfs:
        rows.extend(
            zip(
                (int(t) for t in pdf["ts_us"]),
                (int(i) for i in pdf["event_id"]),
                (str(e) for e in pdf["event_type"]),
            )
        )
    rows.sort()  # (ts, event_id) — the repo's event ordering contract
    out = []
    for us, _eid, et in rows:
        st, reached = funnel_step(st, et, us)
        if reached is not None:
            prev = {1: None, 2: st[0], 3: st[1]}[reached]
            out.append(
                (
                    key[0],
                    reached,
                    us,
                    us - prev if prev is not None else None,
                )
            )
    state.update(st)
    if out:
        df = pd.DataFrame(
            out, columns=["user_id", "stage", "anchor_us", "gap_us"]
        )
        # stage-1 rows carry a NULL gap: keep the column nullable-int64
        # (plain None in a pandas int column silently degrades to float64)
        df["gap_us"] = pd.array([r[3] for r in out], dtype="Int64")
        yield df


def stream_funnel_monitor(events: DataFrame) -> DataFrame:
    """Track view→click→purchase funnel stages per user over a stream
    (needs ts, event_id, user_id, event_type); emits (user_id, stage,
    anchor_us, gap_us) the moment each stage is first reached. Module
    docstring has the batch-equivalence and O(#users) state
    contracts."""
    from pyspark.sql import functions as F

    keyed = events.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        "event_type",
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _funnel_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
