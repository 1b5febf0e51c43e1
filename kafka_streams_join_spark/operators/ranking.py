"""Distributed global ranking — the two-phase rank that replaces
single-partition ``Window.orderBy`` over data-sized frames.

An unpartitioned rank window funnels its entire input through ONE task
(Spark plans ``Exchange SinglePartition`` + sort) — the canonical
driver-adjacent bottleneck at 100 TB. When the ordering column has
bounded cardinality (a rounded score, a bucketed level — true for every
ranking this repo does, because scores are rounded BEFORE ranking as the
engine-parity contract), the global row_number decomposes exactly:

1. per-LEVEL counts — a hash aggregate, bounded by the level cardinality,
   not the corpus;
2. exclusive cumulative offsets over that bounded level frame (the one
   unpartitioned window, running over model-sized input);
3. a window PARTITIONED by level ranks ids within each level;
4. global rank = level offset + within-level rank.

The data-sized frame crosses only hash exchanges — gated by
``plans.assert_no_single_partition_window_over``.

First used by ``pipeline_importance_resample`` (round 5, replacing the
round-4 weak); ``pipeline_curriculum_order`` ranks through the same
helper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def two_phase_rank(
    df: DataFrame,
    level_col: str,
    id_col: str,
    rank_col: str = "rank",
    ascending: bool = True,
    allow_null_levels: bool = False,
) -> DataFrame:
    """Append ``rank_col`` = global ``row_number() OVER (ORDER BY
    level_col [desc], id_col)`` without a single-partition sort of ``df``.

    ``level_col`` must be bounded-cardinality (rounded score / bucket) —
    that bound, not the row count, sizes the one unpartitioned window.
    Ties within a level break ascending on ``id_col`` (the repo's
    engine-stable ordering contract).

    The rank is BIGINT: ``__lvl_off`` is a long sum, so an int cast would
    overflow (ANSI: throw) past 2^31-1 rows — exactly the scale this
    operator exists for. Integer canonicalization in the oracle compare is
    width-insensitive (``str(v)``), so oracles may keep ``row_number()``'s
    native type.

    NULL levels: Spark orders NULL FIRST ascending / LAST descending, but
    DuckDB defaults to NULLS LAST for BOTH directions — a caller with a
    DuckDB oracle and nullable ``level_col`` would silently diverge on the
    NULL-level rows. ENFORCED (ADVICE round 6): by default a NULL level
    value fails the job loudly at run time (``coalesce`` short-circuits
    past the ``raise_error`` arm on every non-null row, so the guard is a
    codegen null check, not a second pass); Spark-only callers that want
    the documented null-safe placement opt in with
    ``allow_null_levels=True``."""
    if not allow_null_levels:
        df = df.withColumn(
            level_col,
            F.coalesce(
                F.col(level_col),
                F.raise_error(
                    F.lit(
                        f"two_phase_rank: NULL {level_col} violates the "
                        "oracle NULL-ordering contract (pass "
                        "allow_null_levels=True for Spark-only ranking)"
                    )
                ).cast(df.schema[level_col].dataType),
            ),
        )
    lvl_order: Column = F.col(level_col).asc() if ascending else F.col(level_col).desc()
    off_w = Window.orderBy(lvl_order).rowsBetween(Window.unboundedPreceding, -1)
    levels = (
        df.groupBy(level_col)
        .agg(F.count(F.lit(1)).alias("__lvl_n"))
        .select(
            F.col(level_col).alias("__lvl_key"),
            F.coalesce(F.sum("__lvl_n").over(off_w), F.lit(0)).alias("__lvl_off"),
        )
    )
    in_lvl = Window.partitionBy(level_col).orderBy(F.col(id_col).asc())
    # NULL-SAFE join back: groupBy keeps a NULL level group (counted in the
    # offsets), so a plain equi-join would silently drop NULL-level rows
    # while every later rank stayed shifted by their count (review finding,
    # round 5). With <=> the NULL level ranks where the offsets window
    # placed it (Spark null ordering: FIRST ascending, LAST descending).
    return (
        df.join(
            F.broadcast(levels),
            F.col(level_col).eqNullSafe(F.col("__lvl_key")),
        )
        .withColumn(
            rank_col,
            (F.col("__lvl_off") + F.row_number().over(in_lvl)).cast("bigint"),
        )
        .drop("__lvl_key", "__lvl_off")
    )
