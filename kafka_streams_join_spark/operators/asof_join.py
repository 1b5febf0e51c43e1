"""As-of join — nearest-match-in-time completion of the interval-join family.

The reference's ``JoinWindows`` joins (``TimeoutJoinTest.scala:75-85``) emit
*every* band match; the as-of join emits exactly **one** — the nearest right
record at-or-before (backward) / at-or-after (forward) each left record's
event time, per key. This is pandas ``merge_asof`` / kdb+ ``aj`` / DuckDB
``ASOF JOIN`` semantics, the natural "which display preceded this click"
query the reference's topology approximates with a band.

Scale design (100 TB): the naive formulation — interval join then
``row_number() = 1`` — materializes every band match before discarding all
but one, i.e. O(|matches|) intermediate rows; on a dense stream the band
blowup dwarfs the output. This implementation instead UNIONs both sides,
shuffles **once** on the key, sorts each partition by event time, and
carries the most recent right row forward with ``last(..., ignorenulls)``
over a running window — O(n log n) per partition, zero join blowup, one
Exchange total. The right row's columns travel as a single struct so all of
them come from the *same* matched row even when some are NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STRUCT = "__asof_right"
_SIDE = "__asof_side"
_TS = "__asof_ts"
_TB = "__asof_tb"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str | None = None,
    direction: str = "backward",
    right_tiebreak: str | None = None,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the single nearest right row with equal ``on``.

    - ``direction="backward"``: greatest ``right_ts <= left_ts`` (inclusive).
    - ``direction="forward"``: least ``right_ts >= left_ts`` (inclusive).
    - ``tolerance``: SQL interval string; matches further than this from the
      left timestamp are nulled out (left row still emitted — left-outer).
    - ``right_tiebreak``: right column ordered ascending to break equal-``ts``
      ties deterministically (the max wins, matching an
      ``ORDER BY ts DESC, tiebreak DESC ... ROW_NUMBER() = 1`` oracle).

    Output: every left column prefixed ``l_``, every right column prefixed
    ``r_`` (all NULL when no match) — same shape as ``interval_join``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    lp = left.select(
        [F.col(c).alias(f"{left_prefix}{c}") for c in left.columns]
        + [
            F.col(left_ts).alias(_TS),
            F.lit(1).alias(_SIDE),
            F.lit(None).cast("long").alias(_TB),
        ]
    )
    rp = right.select(
        [
            F.struct(*[F.col(c).alias(c) for c in right.columns]).alias(_STRUCT),
            F.col(right_ts).alias(_TS),
            F.lit(0).alias(_SIDE),
            (
                F.col(right_tiebreak).cast("long")
                if right_tiebreak
                else F.lit(0).cast("long")
            ).alias(_TB),
            F.col(on).alias(f"{left_prefix}{on}"),
        ]
    )
    unioned = lp.unionByName(rp, allowMissingColumns=True)

    if direction == "backward":
        # Right rows sort before the left row at equal ts (side 0 < 1), so
        # an exact-ts match is inside the running frame; among equal-ts right
        # rows the tiebreak's max is last, hence picked by last().
        order = [F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_TB).asc()]
    else:
        order = [F.col(_TS).desc(), F.col(_SIDE).asc(), F.col(_TB).asc()]
    w = (
        Window.partitionBy(f"{left_prefix}{on}")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        _STRUCT, F.last(_STRUCT, ignorenulls=True).over(w)
    ).filter(F.col(_SIDE) == 1)

    if tolerance is not None:
        gap = F.expr(f"INTERVAL {tolerance}")
        m_ts = F.col(_STRUCT)[right_ts]
        in_tol = (
            (m_ts >= F.col(_TS) - gap)
            if direction == "backward"
            else (m_ts <= F.col(_TS) + gap)
        )
        matched = matched.withColumn(
            _STRUCT, F.when(in_tol, F.col(_STRUCT)).otherwise(F.lit(None))
        )

    out_cols = [F.col(f"{left_prefix}{c}") for c in left.columns] + [
        F.col(_STRUCT)[c].alias(f"{right_prefix}{c}") for c in right.columns
    ]
    return matched.select(out_cols)
