"""Calendar seasonality: the day-of-week × hour-of-day activity profile
(round 8 — the VERDICT-r7 "seasonal/DOW profile" wave item).

``events_hourly_seasonality`` (corpus_stats.py) answers "which hours are
busy"; this module answers the 2-D question every capacity planner and
traffic-anomaly baseline actually needs — "which hours are busy ON WHICH
WEEKDAY" (Monday 9am and Sunday 9am are different worlds), with each
cell's share of its weekday and the cell's peak rank within the weekday.

Determinism contract: weekday and hour are pure integer arithmetic on
epoch seconds — ``(epoch div 86400 + 3) % 7`` (0 = Monday; 1970-01-01
was a Thursday = 3) and ``(epoch div 3600) % 24`` — identical in both
engines (``unix_timestamp`` ≡ ``floor(epoch(ts))``, nonneg so ``div`` ≡
``//``), so no engine-specific DOW convention (Spark's ``dayofweek`` is
1=Sunday, DuckDB's is 0=Sunday) ever enters the plan. The share is an
exact ppm with a DECIMAL(38,0)/HUGEINT numerator (n·1e6 passes BIGINT
once a weekday holds ~9e12 events — the 100-TB audit class).

Scale: one map-side-combinable groupBy collapses the corpus to ≤ 168
rows; both window functions run on that calendar-bounded frame — the
"aggregate BEFORE you window" shape (``temporal.py``'s contract), so no
data-sized frame ever crosses a window Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register


@register(
    "events_dow_hour_profile",
    oracle="""
    WITH cell AS (
      SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 3) % 7 AS dow,
             (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24 AS hod,
             count(*) AS n_events
      FROM events
      GROUP BY 1, 2
    )
    SELECT dow, hod, n_events,
           CAST(CAST(n_events AS HUGEINT) * 1000000
                // sum(n_events) OVER (PARTITION BY dow)
                AS BIGINT) AS dow_share_ppm,
           CAST(row_number() OVER (
                  PARTITION BY dow ORDER BY n_events DESC, hod)
                AS BIGINT) AS peak_rank
    FROM cell
    """,
)
def events_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day event heatmap: per cell the event count,
    its exact-ppm share of that weekday's traffic, and its activity rank
    within the weekday (peak_rank 1 = that weekday's busiest hour). The
    module docstring carries the integer-calendar determinism contract.

    Scale: one groupBy(dow, hod) with map-side combine collapses any
    corpus to ≤ 168 rows; the share window and the rank window both
    partition by dow over that bounded frame."""
    cell = (
        load_table(spark, sf_dir, "events")
        .select(
            F.expr("(unix_timestamp(ts) div 86400 + 3) % 7").alias("dow"),
            F.expr("(unix_timestamp(ts) div 3600) % 24").alias("hod"),
        )
        .groupBy("dow", "hod")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w_share = Window.partitionBy("dow")
    w_rank = Window.partitionBy("dow").orderBy(
        F.col("n_events").desc(), F.col("hod")
    )
    return (
        cell.select(
            "dow",
            "hod",
            "n_events",
            F.sum("n_events").over(w_share).alias("__dow_total"),
            F.row_number().over(w_rank).cast("bigint").alias("peak_rank"),
        )
        .select(
            "dow",
            "hod",
            "n_events",
            F.expr(
                "cast(cast(n_events as decimal(38,0)) * 1000000"
                " div __dow_total as bigint)"
            ).alias("dow_share_ppm"),
            "peak_rank",
        )
    )
