"""Inequality & concentration measures (round 11): the Gini coefficient
and the Herfindahl–Hirschman index — the two numbers every marketplace /
revenue-analytics stack reports beside its Pareto table (the registered
``orders_pareto_share`` gives the cumulative-share CURVE; Gini is that
curve's scalar summary, HHI the regulator's concentration screen).

Exactness discipline (the ``stats_rank`` level-frame contract):

- Gini works on the per-customer revenue LEVEL FRAME (one row per
  distinct cent amount with its count), so the rank-weighted sum
  ``Σ 2·r·x`` is integer prefix arithmetic: a level of value x, count c
  and preceding count p contributes ``x · (2·c·p + c·(c+1))`` — exact
  DECIMAL(38,0), no ``.5`` ever exists (the doubled-rank idiom). With
  ascending ranks, ``G = (Σ2rx − (n+1)·Σx) / (n·Σx)``; numerator and
  denominator are exact non-negative integers, so the ppm output is a
  TRUNCATING div — zero float arithmetic in the whole query.
- HHI sums ``r²`` per supplier into DECIMAL(38,0); the ppm output is
  the one fixed-shape float expression (``1e6·Σr² / (Σr)²`` of exact
  integers — identical ints → identical doubles → identical round），
  because ``1e6·(Σr)²`` can exceed 38 digits when one firm holds a
  ~$10T market, where the float quotient is still exact to 9 digits.

Scale: both queries collapse the fact table in ONE partial-aggregatable
pass (map-side combine on (key, cents)); the Gini window runs over the
per-segment level frame (bounded by the distinct-cent-value domain per
segment, not row count); HHI's supplier/nation dims broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register


@register(
    "orders_gini_revenue",
    oracle="""
    WITH rev AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey AS cust,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS x
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    lvl AS (
      SELECT seg, x, CAST(count(*) AS BIGINT) AS c
      FROM rev GROUP BY 1, 2
    ),
    rk AS (
      SELECT seg, x, c,
             coalesce(sum(c) OVER (
               PARTITION BY seg ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
      FROM lvl
    ),
    m AS (
      SELECT seg,
             CAST(sum(c) AS BIGINT) AS n,
             sum(CAST(x AS HUGEINT) * c) AS sx,
             sum(CAST(x AS HUGEINT) * (2 * c * p + c * (c + 1))) AS s2rx
      FROM rk GROUP BY seg
    )
    SELECT seg AS c_mktsegment, n AS n_customers,
           CAST(sx AS BIGINT) AS revenue_cents,
           CAST(CASE WHEN n < 2 OR sx = 0 THEN 0
                     ELSE (1000000 * (s2rx - (n + 1) * sx)) // (n * sx)
                END AS BIGINT) AS gini_ppm
    FROM m
    """,
)
def orders_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient (exact ppm) of per-customer order revenue within
    each market segment — the inequality scalar under the registered
    Pareto curve: 0 = every customer spends alike, →1 = one whale is the
    whole segment. Module docstring has the doubled-rank level-frame
    contract; every column is an exact integer (the ppm is a truncating
    div of non-negative exact DECIMALs — no float anywhere).

    Scale: one map-side-combinable aggregate to (segment, cents), one
    window over the domain-bounded level frame, one aggregate back."""
    rev = (
        load_table(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_mktsegment"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_custkey").alias("cust"),
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
        )
        .groupBy("seg", "cust")
        .agg(F.expr("cast(sum(cents) as bigint)").alias("x"))
    )
    lvl = rev.groupBy("seg", "x").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = (
        Window.partitionBy("seg")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = lvl.select(
        "seg",
        "x",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("p"),
    )
    m = rk.groupBy("seg").agg(
        F.expr("cast(sum(c) as bigint)").alias("n"),
        F.expr("sum(cast(x as decimal(38,0)) * c)").alias("sx"),
        # widen INSIDE the rank product (ADVICE r11): 2*c*p is evaluated
        # before the outer decimal cast applies, so at very large cohorts
        # (c*p ≳ 4.6e18) BIGINT would wrap where DuckDB's window sum has
        # already widened p to HUGEINT — the fairness.py DECIMAL(38,0)
        # cross-product contract applied to the doubled-rank term
        F.expr(
            "sum(cast(x as decimal(38,0)) * (2 * cast(c as decimal(38,0))"
            " * p + cast(c as decimal(38,0)) * (c + 1)))"
        ).alias("s2rx"),
    )
    return m.select(
        F.col("seg").alias("c_mktsegment"),
        F.col("n").alias("n_customers"),
        F.expr("cast(sx as bigint)").alias("revenue_cents"),
        F.expr(
            "cast(case when n < 2 or sx = 0 then 0"
            " else (1000000 * (s2rx - (n + 1) * sx)) div (n * sx)"
            " end as bigint)"
        ).alias("gini_ppm"),
    )


@register(
    "orders_hhi_concentration",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation, l.l_suppkey AS supp,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS r
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY 1, 2
    ),
    m AS (
      SELECT nation,
             CAST(count(*) AS BIGINT) AS n_suppliers,
             sum(CAST(r AS HUGEINT)) AS tot,
             sum(CAST(r AS HUGEINT) * r) AS sumsq,
             max(r) AS mx
      FROM rev GROUP BY nation
    )
    SELECT nation, n_suppliers,
           CAST(tot AS BIGINT) AS revenue_cents,
           CASE WHEN tot = 0 THEN 0
                ELSE CAST(round(1000000 * CAST(sumsq AS DOUBLE)
                     / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)))
                     AS BIGINT)
           END AS hhi_ppm,
           CAST(CASE WHEN tot = 0 THEN 0
                     ELSE (1000000 * CAST(mx AS HUGEINT)) // tot
                END AS BIGINT) AS top_share_ppm
    FROM m
    """,
)
def orders_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index (ppm) of supplier revenue concentration
    per supplier nation: Σ share² over suppliers — the antitrust screen
    (US guidelines: >0.25 ≡ 250 000 ppm = highly concentrated) and, for
    a training-data pipeline, the same math as a source-concentration
    audit. Also the largest single supplier's share (exact truncating
    ppm). Module docstring has the one-float-expression bound rationale.

    Scale: the fact table collapses in one map-side-combinable pass;
    supplier and nation dims broadcast; the final frame is one row per
    nation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("cents"),
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_nationkey"
        )
    )
    nat = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    rev = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("l_suppkey").alias("supp"),
            "cents",
        )
        .groupBy("nation", "supp")
        .agg(F.expr("cast(sum(cents) as bigint)").alias("r"))
    )
    m = rev.groupBy("nation").agg(
        F.expr("cast(count(1) as bigint)").alias("n_suppliers"),
        F.expr("sum(cast(r as decimal(38,0)))").alias("tot"),
        F.expr("sum(cast(r as decimal(38,0)) * r)").alias("sumsq"),
        F.expr("max(r)").alias("mx"),
    )
    return m.select(
        "nation",
        "n_suppliers",
        F.expr("cast(tot as bigint)").alias("revenue_cents"),
        F.expr(
            "case when tot = 0 then cast(0 as bigint)"
            " else cast(round(1000000 * cast(sumsq as double)"
            " / (cast(tot as double) * cast(tot as double))) as bigint)"
            " end"
        ).alias("hhi_ppm"),
        F.expr(
            "cast(case when tot = 0 then 0"
            " else (1000000 * cast(mx as decimal(38,0))) div tot"
            " end as bigint)"
        ).alias("top_share_ppm"),
    )
