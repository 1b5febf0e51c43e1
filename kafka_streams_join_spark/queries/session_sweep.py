"""Session-gap threshold sweep (round 12): session counts at FOUR
inactivity thresholds (5/15/30/60 min) in one pass — the tuning dial
behind ``sessionize_events``' frozen 30-minute constant. Every
sessionization pipeline picks a gap; this query is the report that
justifies the pick (the elbow where halving the threshold stops
splitting sessions), computed without re-scanning per candidate.

Construction: ONE lag window per user (the sessionize shuffle), then
ONE map-side-combinable aggregate evaluating all four thresholds as
conditional sums — n_sessions(T) = Σ rows where the previous event is
absent or the gap exceeds T (every session has exactly one starting
event) — unpivoted to a 4-row report by a map-side ``stack``. The
sweep costs the same as a single-threshold run; that is the point.

Determinism contract: gaps are exact integer MICROSECONDS
(``unix_micros`` ≡ ``epoch_us`` — the corpus carries sub-second
timestamps, so second-truncated casts would misclassify boundary
gaps); counts are exact; events_per_session_milli is a truncating div
of exact BIGINTs. No float anywhere.

Scale: one pruned 3-column scan, one hash exchange on user_id for the
lag window (the unavoidable sessionize shuffle — never a single
partition), one combinable aggregate to a 1-row frame, then a 4-row
Generate. Nothing data-sized crosses after the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_GAPS_S = (300, 900, 1800, 3600)


def _sum_case_sql(t: int) -> str:
    return (
        f"CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > {t * 1_000_000}"
        " THEN 1 ELSE 0 END) AS BIGINT)"
    )


@register(
    "events_session_gap_sweep",
    oracle=f"""
    WITH lagged AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             {_sum_case_sql(_GAPS_S[0])} AS s0,
             {_sum_case_sql(_GAPS_S[1])} AS s1,
             {_sum_case_sql(_GAPS_S[2])} AS s2,
             {_sum_case_sql(_GAPS_S[3])} AS s3
      FROM lagged
    ),
    rows_ AS (
      SELECT * FROM (
        SELECT CAST({_GAPS_S[0]} AS BIGINT) AS gap_s, s0 AS n_sessions,
               n_events, n_users FROM m
        UNION ALL
        SELECT {_GAPS_S[1]}, s1, n_events, n_users FROM m
        UNION ALL
        SELECT {_GAPS_S[2]}, s2, n_events, n_users FROM m
        UNION ALL
        SELECT {_GAPS_S[3]}, s3, n_events, n_users FROM m
      )
    )
    SELECT gap_s, n_sessions, n_users, n_events,
           CAST(1000 * CAST(n_events AS HUGEINT) // n_sessions AS BIGINT)
             AS events_per_session_milli
    FROM rows_
    """,
)
def events_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions, users, events, and mean session length (milli-events)
    at inactivity gaps of {gaps} seconds — all four thresholds from one
    window + one aggregate. Module docstring has the single-pass,
    microsecond-exact, and shuffle contracts."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    lagged = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .select("user_id", (us - F.lag(us).over(w)).alias("gap_us"))
    )
    sums = [
        F.sum(
            F.when(
                F.col("gap_us").isNull() | (F.col("gap_us") > t * 1_000_000),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias(f"s{i}")
        for i, t in enumerate(_GAPS_S)
    ]
    m = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        *sums,
    )
    stack_args = ", ".join(
        f"{t}L, s{i}" for i, t in enumerate(_GAPS_S)
    )
    return m.select(
        F.expr(
            f"stack({len(_GAPS_S)}, {stack_args}) as (gap_s, n_sessions)"
        ),
        "n_users",
        "n_events",
    ).select(
        "gap_s",
        "n_sessions",
        "n_users",
        "n_events",
        F.expr("cast(1000 * cast(n_events as decimal(38,0)) div n_sessions"
            " as bigint)").alias(
            "events_per_session_milli"
        ),
    )


events_session_gap_sweep.__doc__ = events_session_gap_sweep.__doc__.replace(
    "{gaps}", "/".join(str(t) for t in _GAPS_S)
)
