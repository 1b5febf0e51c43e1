"""Unpivot / melt (round 11): the inverse of the registered
``pivot_status_revenue`` — wide columns rotated into (key, value) rows.
Spark expresses it as the ``stack()`` generator (one scan, JVM-side
Generate, no join); the oracle as the relational UNION ALL it
desugars to. The demo case melts each lineitem's charge breakdown —
base price, discount given, tax collected (the TPC-H money algebra) —
into component rows and rolls them up per return flag: the long-form
shape every BI/finance export wants.

Exactness: each component is rounded to CENTS PER ROW PER TERM before
any sum (the repo's cent-lattice contract — the discount and tax
amounts are one fixed-shape float product of identical parquet doubles
each, then one round); totals are exact BIGINT sums.

Scale: stack() multiplies rows 3× map-side with no shuffle of its own;
the rollup is a map-side-combinable aggregate over a (flag × 3)
domain. Column pruning still reaches the scan (only the three money
columns are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register


@register(
    "unpivot_lineitem_charges",
    oracle="""
    WITH c AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS base,
             CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)
               AS disc,
             CAST(round(l_extendedprice * (1 - l_discount) * l_tax * 100)
                  AS BIGINT) AS tax
      FROM lineitem
    ),
    long AS (
      SELECT flag, 'base' AS component, base AS cents FROM c
      UNION ALL
      SELECT flag, 'discount', disc FROM c
      UNION ALL
      SELECT flag, 'tax', tax FROM c
    )
    SELECT flag AS l_returnflag, component,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM long GROUP BY 1, 2
    """,
)
def unpivot_lineitem_charges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charge-component melt per return flag: (base, discount, tax)
    columns unpivoted to rows via ``stack()`` and rolled up to exact
    cent totals. Module docstring has the per-term rounding and
    no-shuffle-generate contracts.

    Scale: map-side 3× row expansion, bounded combinable rollup."""
    c = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("base"),
        F.expr(
            "cast(round(l_extendedprice * l_discount * 100) as bigint)"
        ).alias("disc"),
        F.expr(
            "cast(round(l_extendedprice * (1 - l_discount) * l_tax * 100)"
            " as bigint)"
        ).alias("tax"),
    )
    long = c.selectExpr(
        "flag",
        "stack(3, 'base', base, 'discount', disc, 'tax', tax)"
        " as (component, cents)",
    )
    return long.groupBy(
        F.col("flag").alias("l_returnflag"), "component"
    ).agg(
        F.expr("cast(count(1) as bigint)").alias("n_rows"),
        F.expr("cast(sum(cents) as bigint)").alias("total_cents"),
    )
