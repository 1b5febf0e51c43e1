"""Overdispersion audit (round 12): the Fano factor (variance-to-mean
dispersion index) of each event type's daily-count series — the one-
number answer to "is this volume Poisson-ish noise or bursty?" that
decides whether rate alerts can use √n bands (Poisson) or need the
robust machinery (``events_anomaly_mad``, ``events_control_rules``).
Fano = 1 for a Poisson process; ≫ 1 means bursts/campaigns,
≪ 1 means rate-limited/scheduled traffic.

The series is the type's daily counts over its OWN observed span
(first..last day inclusive): days inside the span with zero events
count as zeros — a type that fires every other day is overdispersed,
and dropping its silent days would hide exactly that. Zero days enter
through the span length n alone (they add nothing to S = Σc or
Q = Σc²), so no gapfill join is needed.

Exactness contract: with n = span days, S = Σ daily counts, Q = Σ c²,
  mean_milli  = 1000·S div n
  fano_milli  = 1000·(n·Q − S²) div ((n−1)·S)      (sample variance / mean)
— 100 % integer arithmetic; n·Q − S² ≥ 0 by Cauchy–Schwarz, so the
truncating div agrees between Spark (``div``) and DuckDB (``//``).
Q is summed in DECIMAL(38,0)/HUGEINT (daily counts at 100 TB reach
~10⁹, whose squares overflow a BIGINT sum — the ADVICE-r11 Gini
widening applied from the start), and the n·Q / (n−1)·S products stay
in the widened type. A single-day span (n=1) reports NULL fano and a
NULL flag rather than dropping the type (the Theil–Sen single-day
contract).

Scale: the corpus collapses to the (type, day) frame in one map-side-
combinable aggregate, then to one row per type in a second; no join,
no window, no data-sized frame past the first Exchange. The output is
event-type-vocabulary-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register


@register(
    "events_dispersion_fano",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '1970-01-01',
                      CAST(date_trunc('day', ts) AS DATE)) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type,
             CAST(max(d) - min(d) + 1 AS BIGINT) AS n_days,
             CAST(count(*) AS BIGINT) AS n_active_days,
             CAST(sum(c) AS BIGINT) AS total,
             sum(CAST(c AS HUGEINT) * c) AS q
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n_days, n_active_days, total,
           CAST(1000 * CAST(total AS HUGEINT) // n_days AS BIGINT) AS mean_milli,
           CAST(CASE WHEN n_days < 2 THEN NULL
                ELSE 1000 * (CAST(n_days AS HUGEINT) * q
                             - CAST(total AS HUGEINT) * total)
                     // (CAST(n_days - 1 AS HUGEINT) * total)
                END AS BIGINT) AS fano_milli,
           CAST(CASE WHEN n_days < 2 THEN NULL
                WHEN 1000 * (CAST(n_days AS HUGEINT) * q
                             - CAST(total AS HUGEINT) * total)
                     // (CAST(n_days - 1 AS HUGEINT) * total) > 1000
                THEN 1 ELSE 0 END AS INTEGER) AS over_dispersed
    FROM agg
    """,
)
def events_dispersion_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: span days, active days, total volume, and the
    Fano dispersion index of the daily-count series in exact integer
    milli (1000 = Poisson), with the over-dispersion flag. Module
    docstring has the zero-day, widening, and single-day contracts."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", F.col("ts")).cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    agg = daily.groupBy("event_type").agg(
        (F.max("d") - F.min("d") + 1).cast("bigint").alias("n_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_active_days"),
        F.sum("c").cast("bigint").alias("total"),
        F.expr("sum(cast(c as decimal(38,0)) * c)").alias("q"),
    )
    fano = (
        "case when n_days < 2 then null"
        " else 1000 * (cast(n_days as decimal(38,0)) * q"
        "              - cast(total as decimal(38,0)) * total)"
        "      div (cast(n_days - 1 as decimal(38,0)) * total)"
        " end"
    )
    return agg.select(
        "event_type",
        "n_days",
        "n_active_days",
        "total",
        F.expr("cast(1000 * cast(total as decimal(38,0)) div n_days as bigint)").alias("mean_milli"),
        F.expr(f"cast({fano} as bigint)").alias("fano_milli"),
        F.expr(
            f"cast(case when n_days < 2 then null"
            f" when ({fano}) > 1000 then 1 else 0 end as int)"
        ).alias("over_dispersed"),
    )
