"""Statistical process control (round 11): Shewhart control-chart
violations with Western Electric run rules over the hourly event-count
series per type — the monitoring layer a data-ingest pipeline puts on
its volume metrics (the registered z-score/MAD anomaly queries flag
POINTS; WE rules flag RUNS — drifts too small for any single point to
trip 3σ, which is exactly how ingestion slowly rots).

Exactness discipline — this module is 100 % integer arithmetic, no
float, no rounding idiom anywhere:

- center/spread come from exact moments over the hour frame: with n
  hours, S = Σc and Q = Σc², the test ``|c − mean| > k·σ`` (population
  σ² = (n·Q − S²)/n²) multiplies through by n²:
  ``(c·n − S)² > k²·(n·Q − S²)`` — every side an exact integer
  (DECIMAL(38,0): |c·n − S| ≤ c·n ≤ 1e12·1e5 at extreme scale,
  squared = 1e34 < 1e38);
- the run rule uses the SIGN of the exact deviation ``d = c·n − S``
  (strictly above / strictly below the mean), so no threshold float
  exists at all.

Rules reported per event type (the classic WE set, integer-decidable):
rule 1 — a point beyond 3σ; rule 4 — 8 consecutive points strictly on
one side of the center line.

Scale: the corpus collapses to the (type, hour) frame in one map-side-
combinable aggregate; the exact moments are a second tiny aggregate
BROADCAST back onto the hour frame; the run windows are rows-frames over
the bounded hour series per type. Nothing data-sized crosses a wide
Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register


@register(
    "events_control_rules",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('hour', ts) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s,
             sum(CAST(c AS HUGEINT) * c) AS q
      FROM daily GROUP BY event_type
    ),
    dev AS (
      SELECT daily.event_type, daily.d,
             CAST(daily.c AS HUGEINT) * m.n - m.s AS dd,
             CAST(m.n AS HUGEINT) * m.q - CAST(m.s AS HUGEINT) * m.s
               AS varnum,
             m.n
      FROM daily JOIN m ON m.event_type = daily.event_type
    ),
    flags AS (
      SELECT event_type, d, n,
             CASE WHEN dd * dd > 9 * varnum THEN 1 ELSE 0 END AS r1,
             CASE WHEN dd > 0 THEN 1 WHEN dd < 0 THEN -1 ELSE 0 END
               AS side
      FROM dev
    ),
    runs AS (
      SELECT event_type, d, n, r1,
             CASE WHEN row_number() OVER (
                    PARTITION BY event_type ORDER BY d) >= 8
                   AND abs(sum(side) OVER (
                    PARTITION BY event_type ORDER BY d
                    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)) = 8
                  THEN 1 ELSE 0 END AS r4
      FROM flags
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n_hours,
           CAST(sum(r1) AS BIGINT) AS rule1_violations,
           CAST(sum(r4) AS BIGINT) AS rule4_runs
    FROM runs GROUP BY event_type
    """,
)
def events_control_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart + Western Electric audit of the hourly volume series per
    event type: rule-1 hours (count beyond 3 population σ of the type's
    center line — decided by the exact-integer inequality
    ``(c·n − S)² > 9·(n·Q − S²)``) and rule-4 hours (the 8th+ consecutive
    hour strictly one side of the mean — |rolling sum of sign(dev)| = 8
    over an 8-row frame; a 0-deviation hour breaks any run). Module
    docstring has the no-float contract; a sum of signs hits ±8 iff all
    eight are the same strict side.

    Scale: one map-side-combinable collapse to (type, hour), broadcast
    moments, rows-frame windows over the bounded hour series."""
    # staged: the hour frame feeds both the moments aggregate and the
    # deviation join — unstaged, the corpus collapsed twice
    daily = _staged(
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    m = daily.groupBy("event_type").agg(
        F.expr("cast(count(1) as bigint)").alias("n"),
        F.expr("cast(sum(c) as bigint)").alias("s"),
        F.expr("sum(cast(c as decimal(38,0)) * c)").alias("q"),
    )
    dev = daily.join(F.broadcast(m), "event_type").select(
        "event_type",
        "d",
        F.expr("cast(c as decimal(38,0)) * n - s").alias("dd"),
        F.expr(
            "cast(n as decimal(38,0)) * q - cast(s as decimal(38,0)) * s"
        ).alias("varnum"),
        "n",
    )
    flags = dev.select(
        "event_type",
        "d",
        "n",
        F.expr("case when dd * dd > 9 * varnum then 1 else 0 end").alias(
            "r1"
        ),
        F.expr(
            "case when dd > 0 then 1 when dd < 0 then -1 else 0 end"
        ).alias("side"),
    )
    w_rn = Window.partitionBy("event_type").orderBy("d")
    w_run = w_rn.rowsBetween(-7, 0)
    runs = flags.select(
        "event_type",
        "n",
        "r1",
        F.when(
            (F.row_number().over(w_rn) >= 8)
            & (F.abs(F.sum("side").over(w_run)) == 8),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("r4"),
    )
    return runs.groupBy("event_type").agg(
        F.expr("cast(max(n) as bigint)").alias("n_hours"),
        F.expr("cast(sum(r1) as bigint)").alias("rule1_violations"),
        F.expr("cast(sum(r4) as bigint)").alias("rule4_runs"),
    )
