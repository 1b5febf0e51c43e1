"""Skyline / Pareto-frontier query (round 6, wave 4).

The classic dominance query (Börzsönyi ICDE'01): the set of points no
other point beats on every dimension at once. For two dimensions
(minimize price, maximize size) the frontier has an exact sweep-line
form — sort by (price asc, size desc) and keep a point iff its size
strictly exceeds the running max over all predecessors — which this
module decomposes two-phase so no data-sized frame ever crosses a
single-partition window:

1. distinct (price, size) points (an exact-dedup hash aggregate — the
   frontier is a property of the point SET, and the collapse also
   resolves the duplicate-point tie rule: equal points don't dominate
   each other, so all parts at a frontier point survive);
2. per-price-bucket max size, then the exclusive cumulative max over
   the value-range-bounded bucket frame (the one unpartitioned window,
   running over ~price-range/bucket rows — the documented bounded-frame
   exemption, same as the KMV global min-K);
3. a within-bucket running max PARTITIONED by bucket;
4. keep iff size > greatest(bucket offset max, local running max).

Correctness of the decomposition: bucket = price div width is strictly
monotone across buckets, so every cross-bucket predecessor is strictly
cheaper (covered by the offset max), and within a bucket the
(price asc, size desc) order makes "runmax >= size" exactly the
"some predecessor dominates me" predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_SKY_BUCKET_CENTS = 1000  # $10 price buckets for the two-phase sweep


@register(
    "orders_pareto_frontier",
    oracle="""
    WITH pts AS (
      SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
             CAST(p_size AS INT) AS p_size,
             CAST(count(*) AS BIGINT) AS n_parts,
             CAST(min(p_partkey) AS BIGINT) AS min_partkey
      FROM part GROUP BY 1, 2
    )
    SELECT price_cents, p_size, n_parts, min_partkey
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE (q.price_cents < p.price_cents AND q.p_size >= p.p_size)
         OR (q.price_cents <= p.price_cents AND q.p_size > p.p_size)
    )
    """,
)
def orders_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts on (price low, size high): every
    (price, size) point such that no part is both no-more-expensive AND
    no-smaller with at least one strict. Output per frontier point:
    (price_cents, p_size, n_parts, min_partkey) — prices in integer
    cents so the dominance comparisons are exact in both engines.

    Scale: the corpus collapses to distinct (price, size) points first
    (bounded by the value domain, not the row count); the sweep is the
    two-phase prefix-MAX described in the module docstring — the only
    unpartitioned window runs over the per-bucket max frame
    (price-range/{bucket} rows). The oracle states the same set as a
    quadratic NOT EXISTS over the distinct points — fine at oracle
    scale, which is exactly why the Spark side doesn't do it that way."""
    pts = (
        load_table(spark, sf_dir, "part")
        .select(
            F.expr("cast(round(p_retailprice * 100) as bigint)").alias(
                "price_cents"
            ),
            F.col("p_size").cast("int").alias("p_size"),
            "p_partkey",
        )
        .groupBy("price_cents", "p_size")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_partkey").alias("min_partkey"),
        )
        .withColumn("bucket", F.expr(f"price_cents div {_SKY_BUCKET_CENTS}"))
    )
    off_w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        pts.groupBy("bucket")
        .agg(F.max("p_size").alias("bmax"))
        .select(
            "bucket",
            F.coalesce(F.max("bmax").over(off_w), F.lit(-1)).alias("prev_max"),
        )
    )
    loc_w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("price_cents").asc(), F.col("p_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = pts.withColumn(
        "local_max", F.coalesce(F.max("p_size").over(loc_w), F.lit(-1))
    ).join(F.broadcast(offs), "bucket")
    return (
        swept.filter(
            F.col("p_size") > F.greatest(F.col("prev_max"), F.col("local_max"))
        )
        .select("price_cents", "p_size", "n_parts", "min_partkey")
    )
