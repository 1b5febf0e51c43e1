"""Bucketed range join — point-in-interval joins WITHOUT an equi key.

The interval joins in operators/interval_join.py ride their band predicate on
a key equality (the reference's Kafka-key semantics, TimeoutJoinTest.scala:78),
so Catalyst gets a hash join. Drop the key — "purchases during any outage
window" — and a bare theta join leaves Spark only BroadcastNestedLoopJoin /
CartesianProduct: O(|L|·|R|) comparisons that no cluster survives at 100 TB.

The fix is the standard range-bucketing rewrite (what Databricks' range-join
hint does under the hood): quantize the time axis into fixed buckets; a point
row maps to exactly ONE bucket, an interval row is exploded to every bucket
it overlaps; equi-join on the bucket id, then re-check the exact predicate.
Each (point, interval) match meets in precisely the point's bucket, so the
rewrite emits no duplicates and needs no post-dedup. Cost: the interval side
grows by ~(interval_len / bucket) rows — pick the bucket near the typical
interval length; comparisons collapse from |L|·|R| to colliding-bucket pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def _bucket_of(ts: Column, bucket_seconds: int) -> Column:
    return (ts.cast("long") / bucket_seconds).cast("long")


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    interval_start: str,
    interval_end: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
    point_prefix: str = "p_",
    interval_prefix: str = "i_",
) -> DataFrame:
    """Join point rows to interval rows with ``start <= ts < end``.

    Intervals are half-open (start inclusive, end exclusive) — the

    convention that makes back-to-back windows non-overlapping. ``how`` ∈
    inner / left_semi / left_anti (semi/anti return point columns only:
    "points inside ≥1 interval" / "points inside none").
    """
    pp = points.select(
        [F.col(c).alias(f"{point_prefix}{c}") for c in points.columns]
        + [_bucket_of(F.col(point_ts), bucket_seconds).alias(_BUCKET)]
    )
    ip = intervals.select(
        [F.col(c).alias(f"{interval_prefix}{c}") for c in intervals.columns]
        + [
            F.explode(
                F.sequence(
                    _bucket_of(F.col(interval_start), bucket_seconds),
                    # end is exclusive: a bucket is joined only if the
                    # interval actually reaches into it.
                    _bucket_of(
                        F.col(interval_end) - F.expr("INTERVAL 1 MICROSECOND"),
                        bucket_seconds,
                    ),
                )
            ).alias(_BUCKET)
        ]
    )
    exact = (F.col(f"{point_prefix}{point_ts}") >= F.col(f"{interval_prefix}{interval_start}")) & (
        F.col(f"{point_prefix}{point_ts}") < F.col(f"{interval_prefix}{interval_end}")
    )
    if how in ("left_semi", "leftsemi", "left_anti", "leftanti"):
        # A point owns exactly one bucket, so semi/anti need no dedup.
        joined = pp.join(ip, (pp[_BUCKET] == ip[_BUCKET]) & exact, how)
        return joined.select(
            [F.col(f"{point_prefix}{c}").alias(c) for c in points.columns]
        )
    return (
        pp.join(ip, (pp[_BUCKET] == ip[_BUCKET]) & exact, how)
        .drop(_BUCKET)
    )
