"""Robust location estimators (round 11): 5 %-trimmed and winsorized
means of order value per priority class — the outlier-resistant
companions to the registered mean/median/weighted-median family. A
platform that alerts on "average order value moved" needs the trimmed
series to know whether the MOVE was real or one whale; winsorizing is
the same defense when the tail must still count (bounded, not
discarded).

Exactness discipline — 100 % integer arithmetic on the cent-lattice
LEVEL FRAME (the ``stats_rank`` contract):

- per (priority, cents) level with count c, inclusive-cumulative cnt
  ``cum`` and exclusive ``prev = cum − c``, the middle order-statistic
  range [k+1, n−k] (k = ⌊0.05·n⌋, exact) overlaps the level in
  ``max(0, min(cum, n−k) − max(prev, k))`` positions — an exact count,
  so the trimmed sum is a BIGINT/DECIMAL dot product;
- the winsor bounds are themselves order statistics read off the same
  cumulative frame: x_(k+1) = min x with cum ≥ k+1, x_(n−k) = min x
  with cum ≥ n−k;
- outputs are truncating-div milli-cents (positive operands: DuckDB
  ``//`` ≡ Spark ``div``), so no float and no round() exist anywhere.

Scale: one map-side-combinable collapse to the cent lattice, one
cumulative window over the bounded level frame per priority, the
(n, k) totals broadcast back, one aggregate out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register


@register(
    "orders_trimmed_winsorized",
    oracle="""
    WITH lvl AS (
      SELECT o_orderpriority AS pri,
             CAST(round(o_totalprice * 100) AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2
    ),
    cumf AS (
      SELECT pri, x, c,
             sum(c) OVER (PARTITION BY pri ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM lvl
    ),
    tot AS (
      SELECT pri, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c) * 5 // 100 AS BIGINT) AS k
      FROM lvl GROUP BY pri
    ),
    j AS (
      SELECT f.pri, f.x, f.c, f.cum, f.cum - f.c AS prev, t.n, t.k
      FROM cumf f JOIN tot t ON t.pri = f.pri
    ),
    agg AS (
      SELECT pri, max(n) AS n, max(k) AS k,
             sum(CAST(x AS HUGEINT) * greatest(
               least(cum, n - k) - greatest(prev, k), 0)) AS mid_sum,
             min(CASE WHEN cum >= k + 1 THEN x END) AS xlo,
             min(CASE WHEN cum >= n - k THEN x END) AS xhi
      FROM j GROUP BY pri
    )
    SELECT pri AS o_orderpriority, n AS n_orders,
           CAST(k AS BIGINT) AS n_trimmed_each_side,
           CAST((1000 * mid_sum) // (n - 2 * k) AS BIGINT)
             AS trimmed_mean_milli,
           CAST((1000 * (mid_sum + CAST(k AS HUGEINT) * xlo
                         + CAST(k AS HUGEINT) * xhi)) // n AS BIGINT)
             AS winsor_mean_milli
    FROM agg
    """,
)
def orders_trimmed_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 %-trimmed and winsorized mean order value (milli-cents, exact
    truncating div) per order priority: the middle 90 % averaged, and
    the full population averaged with both tails clamped to the 5th /
    95th order statistics. Module docstring has the level-frame overlap
    contract — every quantity is an exact integer; assumes n ≥ 2k+1
    (guaranteed for k = ⌊n/20⌋, n ≥ 1).

    Scale: cent-lattice collapse (combinable), bounded cumulative
    window, broadcast totals, one aggregate — the corpus is never
    sorted row-wise."""
    # staged: the cent-lattice level frame feeds both the cumulative
    # window and the (n, k) totals — unstaged, the corpus collapsed twice
    lvl = _staged(
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("pri"),
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias("x"),
        )
        .groupBy("pri", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w_cum = (
        Window.partitionBy("pri")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cumf = lvl.select(
        "pri", "x", "c", F.sum("c").over(w_cum).alias("cum")
    )
    tot = lvl.groupBy("pri").agg(
        F.expr("cast(sum(c) as bigint)").alias("n"),
        F.expr("cast(sum(c) * 5 div 100 as bigint)").alias("k"),
    )
    j = cumf.join(F.broadcast(tot), "pri").select(
        "pri",
        "x",
        "c",
        "cum",
        F.expr("cum - c").alias("prev"),
        "n",
        "k",
    )
    agg = j.groupBy("pri").agg(
        F.expr("max(n)").alias("n"),
        F.expr("max(k)").alias("k"),
        F.expr(
            "sum(cast(x as decimal(38,0)) * greatest("
            "least(cum, n - k) - greatest(prev, k), 0))"
        ).alias("mid_sum"),
        F.expr("min(case when cum >= k + 1 then x end)").alias("xlo"),
        F.expr("min(case when cum >= n - k then x end)").alias("xhi"),
    )
    return agg.select(
        F.col("pri").alias("o_orderpriority"),
        F.col("n").alias("n_orders"),
        F.expr("cast(k as bigint)").alias("n_trimmed_each_side"),
        F.expr(
            "cast((1000 * mid_sum) div (n - 2 * k) as bigint)"
        ).alias("trimmed_mean_milli"),
        F.expr(
            "cast((1000 * (mid_sum + cast(k as decimal(38,0)) * xlo"
            " + cast(k as decimal(38,0)) * xhi)) div n as bigint)"
        ).alias("winsor_mean_milli"),
    )
