"""Theil–Sen robust trend (round 11): the median of all pairwise slopes
of the daily event-count series per type — the robust twin of the
registered ``events_trend_ols``. OLS answers "what is the trend?"
assuming no day is broken; Theil–Sen keeps its breakdown point at 29 %,
so a backfill spike or an outage day moves the estimate not at all —
exactly the series where volume trends get eyeballed.

Determinism contract: each pairwise slope is ``(c₂−c₁)/(d₂−d₁)`` — one
IEEE division of exact integers, bit-identical in both engines; the
median is ``percentile`` (Spark) ≡ ``quantile_cont`` (DuckDB) over
those identical doubles (the proven equivalence), and the only
``round`` is on the final identical double. Day indices are exact
epoch days, counts exact BIGINTs.

Scale: the corpus collapses to the (type, day) frame in one map-side-
combinable aggregate; the pair self-join is over the BOUNDED day frame
(d² pairs of a domain-sized series — ~10⁵ pairs for a year of days,
constant in corpus size), which is how an O(n²) estimator survives
100 TB: n is days, never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register


@register(
    "events_theilsen_slope",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '1970-01-01',
                      CAST(date_trunc('day', ts) AS DATE)) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    ndays AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1
    ),
    slopes AS (
      SELECT a.event_type,
             CAST(b.c - a.c AS DOUBLE) / (b.d - a.d) AS slope
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.d > a.d
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(round(1000 * quantile_cont(slope, 0.5)) AS BIGINT)
               AS slope_milli
      FROM slopes GROUP BY event_type
    )
    SELECT n.event_type, n.n_days,
           CAST(coalesce(m.n_pairs, 0) AS BIGINT) AS n_pairs,
           m.slope_milli
    FROM ndays n LEFT JOIN m ON m.event_type = n.event_type
    """,
)
def events_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator (milli events/day) of the daily volume trend
    per event type: median over all C(n_days, 2) pairwise slopes.
    Module docstring has the one-division determinism contract and the
    bounded-pair scale argument. Output contract: EVERY observed event
    type emits a row — a single-day type (no pairwise slopes) reports
    n_days=1, n_pairs=0 and a NULL slope_milli rather than disappearing
    (ADVICE r11: a round-over-round diff must read "not enough data",
    not absence).

    Scale: one combinable collapse to (type, day); the self-join and
    the percentile run on the day frame only."""
    daily = _staged(
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(
                "datediff(cast(date_trunc('day', ts) as date),"
                " date'1970-01-01')"
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.expr("b.event_type = a.event_type")) & (F.expr("b.d > a.d")),
    ).select(
        F.expr("a.event_type").alias("event_type"),
        F.expr("cast(b.c - a.c as double) / (b.d - a.d)").alias("slope"),
    )
    ndays = daily.groupBy("event_type").agg(
        F.expr("cast(count(1) as bigint)").alias("n_days")
    )
    m = slopes.groupBy("event_type").agg(
        F.expr("cast(count(1) as bigint)").alias("n_pairs"),
        F.expr(
            "cast(round(1000 * percentile(slope, 0.5D)) as bigint)"
        ).alias("slope_milli"),
    )
    # LEFT join from the day-count frame (ADVICE r11): a type observed on
    # a single day has no pairwise slopes, and an inner join dropped the
    # group entirely — a downstream consumer diffing round-over-round saw
    # the type vanish. Now it reports n_days=1, n_pairs=0, NULL slope —
    # "not enough data" is an answer, absence is not.
    return ndays.join(F.broadcast(m), "event_type", "left").select(
        "event_type",
        "n_days",
        F.coalesce(F.col("n_pairs"), F.lit(0).cast("bigint")).alias(
            "n_pairs"
        ),
        "slope_milli",
    )
