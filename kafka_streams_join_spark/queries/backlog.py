"""Operational backlog aging (round 11): the classic open-order aging
report — every order not yet finalized, bucketed by how long it has
been open as of the corpus snapshot date, with the capital tied up in
each bucket. The ops twin of ``dq_freshness_lag`` (which audits DATA
staleness; this audits BUSINESS staleness) and the missing flow-state
view beside ``orders_ship_latency`` (which only sees orders that
already shipped — exactly the survivorship bias an aging report
exists to correct).

Exactness: the snapshot is ``max(o_orderdate)`` (an exact value both
engines read identically); ages are exact day differences; bucket
edges are integer compares; value totals are per-order-rounded cents
(the cent-lattice contract). No float anywhere.

Scale: the snapshot is a 1-row aggregate BROADCAST back over the scan
(a deliberate 1-row nested-loop join — the documented exception to
the no-cartesian gate); the status filter prunes at the scan; the
output aggregate is map-side combinable over a (status × 4-bucket)
domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_BUCKET = (
    "CASE WHEN age <= 7 THEN '0-7d' WHEN age <= 30 THEN '8-30d'"
    " WHEN age <= 90 THEN '31-90d' ELSE '90d+' END"
)


@register(
    "orders_backlog_aging",
    oracle=f"""
    WITH snap AS (
      SELECT max(CAST(o_orderdate AS DATE)) AS today FROM orders
    ),
    aged AS (
      SELECT o_orderstatus,
             datediff('day', CAST(o_orderdate AS DATE), s.today) AS age,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders CROSS JOIN snap s
      WHERE o_orderstatus IN ('O', 'P')
    )
    SELECT o_orderstatus, {_BUCKET} AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS open_value_cents
    FROM aged GROUP BY 1, 2
    """,
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order (status O/P) aging buckets as of the snapshot date
    (max order date): order count and open value per (status, bucket).
    The report a fulfillment team reads every morning; at corpus scale,
    the flow-state audit that catches a stuck-order regression the
    shipped-latency percentiles structurally cannot see.

    Scale: 1-row snapshot broadcast, scan-level status pruning, bounded
    combinable aggregate."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("O", "P")
    )
    snap = load_table(spark, sf_dir, "orders").agg(
        F.expr("max(cast(o_orderdate as date))").alias("today")
    )
    aged = orders.crossJoin(F.broadcast(snap)).select(
        "o_orderstatus",
        F.expr("datediff(today, cast(o_orderdate as date))").alias("age"),
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
    )
    return (
        aged.select(
            "o_orderstatus", F.expr(_BUCKET).alias("age_bucket"), "cents"
        )
        .groupBy("o_orderstatus", "age_bucket")
        .agg(
            F.expr("cast(count(1) as bigint)").alias("n_orders"),
            F.expr("cast(sum(cents) as bigint)").alias("open_value_cents"),
        )
    )
