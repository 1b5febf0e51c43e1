"""Kaplan–Meier survival analysis over user activity (round 8) — a new
operator family: time-to-event with CENSORING, the statistic behind
every honest churn/retention claim (naive churn rates silently treat
still-active users as immortal; KM counts them as censored at the
observation horizon, which is the entire point of the estimator).

Subjects are users; a user whose last event is more than
``_CHURN_GAP_HOURS`` before the corpus horizon is a DEATH at duration
(last − first) hours, anyone else is CENSORED at (horizon − first). The
KM curve S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) multiplies one factor per
distinct death hour.

Granularity is HOURS (round-9 rework): the r8 version used days with a
14-day gap, but the corpus packs every user's events densely across its
~30-day span — the max (horizon − last-event) gap is 1-2 DAYS at every
SF, so the day/14 rule produced zero deaths and the query certified
vacuously (both engines emitting 0 rows proves nothing). Measured on
the corpus, a 24-HOUR silence gap yields ~9% deaths at every test SF
(1/15, 14/150, 141/1500 users), so the at-risk/log-space/clamp logic
actually executes everywhere it is tested.

Determinism contract: products of floats are the summation-order trap
in disguise, so the curve is carried in LOG space with the
``text_bigram_lm_score`` integer discipline — each step's
ln((nᵢ−dᵢ)/nᵢ) is rounded to integer MICRO-nats per step (the operand
is one IEEE division of exact BIGINTs → bit-equal; ln is the
engine-shared libm call every certified surprisal/perplexity query
already leans on), and the cumulative sum is exact BIGINT. The
at-risk counts nᵢ are pure integer prefix arithmetic. ``survival_ppm``
re-exponentiates the certified integer column for readability.
A step where everyone dies (nᵢ = dᵢ) clamps the factor at 1e-6
instead of ln(0) = −inf aborting the sweep (the
``sketch_linear_counting`` saturation lesson, applied at design time).

Scale: one groupBy(user) collapses the corpus to subjects, one
groupBy(duration) collapses subjects to ≤ calendar-range rows; both
windows run on that bounded post-aggregate frame (the
aggregate-before-window contract), so nothing data-sized crosses a
single-partition Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_CHURN_GAP_HOURS = 24


@register(
    "events_survival_curve",
    oracle=f"""
    WITH hrs AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr
      FROM events
    ),
    per AS (
      SELECT user_id, min(hr) AS fd, max(hr) AS ld FROM hrs GROUP BY 1
    ),
    mx AS (SELECT max(ld) AS cmax FROM per),
    subj AS (
      SELECT CASE WHEN m.cmax - p.ld > {_CHURN_GAP_HOURS}
                  THEN p.ld - p.fd ELSE m.cmax - p.fd END AS dur,
             CASE WHEN m.cmax - p.ld > {_CHURN_GAP_HOURS}
                  THEN 1 ELSE 0 END AS death
      FROM per p CROSS JOIN mx m
    ),
    durs AS (
      SELECT dur, CAST(sum(death) AS BIGINT) AS n_deaths,
             count(*) AS n_total
      FROM subj GROUP BY dur
    ),
    n AS (SELECT count(*) AS n_users FROM subj),
    ar AS (
      SELECT d.dur, d.n_deaths,
             CAST(n.n_users - coalesce(sum(d.n_total) OVER (
                    ORDER BY d.dur
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_at_risk
      FROM durs d CROSS JOIN n
    ),
    step AS (
      SELECT dur, n_at_risk, n_deaths,
             CAST(round(1e6 * ln(greatest(
                    CAST(n_at_risk - n_deaths AS DOUBLE) / n_at_risk,
                    1e-6))) AS BIGINT) AS step_log_micro
      FROM ar WHERE n_deaths > 0
    )
    SELECT dur AS dur_hours, n_at_risk, n_deaths,
           CAST(sum(step_log_micro) OVER (
                  ORDER BY dur ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_log_micro,
           CAST(round(1e6 * exp(CAST(sum(step_log_micro) OVER (
                  ORDER BY dur ROWS UNBOUNDED PRECEDING)
                AS DOUBLE) / 1e6)) AS BIGINT) AS survival_ppm
    FROM step
    """,
)
def events_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier churn-survival curve: one row per distinct death
    duration with the at-risk count, deaths, the certified cumulative
    log-survival in integer micro-nats, and its ppm re-exponentiation.
    The module docstring carries the censoring rule and the log-space
    integer contract.

    Scale: corpus → users → durations is two map-side-combinable
    aggregates; both windows run on the calendar-bounded duration
    frame."""
    hrs = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_timestamp(ts) div 3600").alias("hr")
    )
    per = hrs.groupBy("user_id").agg(
        F.min("hr").alias("fd"), F.max("hr").alias("ld")
    )
    mx = per.agg(F.max("ld").alias("cmax"))
    subj = per.crossJoin(F.broadcast(mx)).select(
        F.expr(
            f"case when cmax - ld > {_CHURN_GAP_HOURS} then ld - fd"
            " else cmax - fd end"
        ).alias("dur"),
        F.expr(
            f"case when cmax - ld > {_CHURN_GAP_HOURS} then 1 else 0 end"
        ).alias("death"),
    )
    durs = subj.groupBy("dur").agg(
        F.sum("death").cast("bigint").alias("n_deaths"),
        F.count(F.lit(1)).alias("n_total"),
    )
    n = subj.agg(F.count(F.lit(1)).alias("n_users"))
    w_prev = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ar = durs.crossJoin(F.broadcast(n)).select(
        "dur",
        "n_deaths",
        (
            F.col("n_users")
            - F.coalesce(F.sum("n_total").over(w_prev), F.lit(0))
        )
        .cast("bigint")
        .alias("n_at_risk"),
    )
    step = ar.filter(F.col("n_deaths") > 0).select(
        "dur",
        "n_at_risk",
        "n_deaths",
        F.expr(
            "cast(round(1000000.0D * ln(greatest("
            "cast(n_at_risk - n_deaths as double) / n_at_risk,"
            " 1e-6))) as bigint)"
        ).alias("step_log_micro"),
    )
    w_cum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return step.select(
        F.col("dur").alias("dur_hours"),
        "n_at_risk",
        "n_deaths",
        F.sum("step_log_micro").over(w_cum).cast("bigint").alias(
            "cum_log_micro"
        ),
    ).select(
        "dur_hours",
        "n_at_risk",
        "n_deaths",
        "cum_log_micro",
        F.expr(
            "cast(round(1000000.0D * exp(cast(cum_log_micro as double)"
            " / 1000000.0D)) as bigint)"
        ).alias("survival_ppm"),
    )


@register(
    "events_survival_by_type",
    oracle=f"""
    WITH hrs AS (
      SELECT event_type, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr
      FROM events
    ),
    per AS (
      SELECT event_type, user_id, min(hr) AS fd, max(hr) AS ld
      FROM hrs GROUP BY 1, 2
    ),
    mx AS (SELECT event_type, max(ld) AS cmax FROM per GROUP BY 1),
    subj AS (
      SELECT p.event_type,
             CASE WHEN m.cmax - p.ld > {_CHURN_GAP_HOURS}
                  THEN p.ld - p.fd ELSE m.cmax - p.fd END AS dur,
             CASE WHEN m.cmax - p.ld > {_CHURN_GAP_HOURS}
                  THEN 1 ELSE 0 END AS death
      FROM per p JOIN mx m ON m.event_type = p.event_type
    ),
    durs AS (
      SELECT event_type, dur, CAST(sum(death) AS BIGINT) AS n_deaths,
             count(*) AS n_total
      FROM subj GROUP BY 1, 2
    ),
    n AS (SELECT event_type, count(*) AS n_users FROM subj GROUP BY 1),
    ar AS (
      SELECT d.event_type, d.dur, d.n_deaths,
             CAST(n.n_users - coalesce(sum(d.n_total) OVER (
                    PARTITION BY d.event_type ORDER BY d.dur
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_at_risk
      FROM durs d JOIN n ON n.event_type = d.event_type
    ),
    step AS (
      SELECT event_type, dur, n_at_risk, n_deaths,
             CAST(round(1e6 * ln(greatest(
                    CAST(n_at_risk - n_deaths AS DOUBLE) / n_at_risk,
                    1e-6))) AS BIGINT) AS step_log_micro
      FROM ar WHERE n_deaths > 0
    )
    SELECT event_type, dur AS dur_hours, n_at_risk, n_deaths,
           CAST(sum(step_log_micro) OVER (
                  PARTITION BY event_type
                  ORDER BY dur ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_log_micro,
           CAST(round(1e6 * exp(CAST(sum(step_log_micro) OVER (
                  PARTITION BY event_type
                  ORDER BY dur ROWS UNBOUNDED PRECEDING)
                AS DOUBLE) / 1e6)) AS BIGINT) AS survival_ppm
    FROM step
    """,
)
def events_survival_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED Kaplan–Meier (round 9): one survival curve per event
    type, each stratum observed to ITS OWN horizon (max last-activity
    hour within the type) — the comparison view that turns the single
    certified KM curve into an actual analysis ("does churn differ by
    activity kind?"). Subjects are (type, user) pairs: a user's clock
    runs independently per activity stream. Same hour-granularity
    censoring rule, log-space integer contract, and nᵢ=dᵢ clamp as
    ``events_survival_curve`` (module docstring).

    Scale: identical shape to the unstratified query, but BOTH windows
    partition by event_type — the per-stratum duration frames are
    calendar-bounded and no single-partition Exchange exists at all."""
    hrs = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.expr("unix_timestamp(ts) div 3600").alias("hr"),
    )
    per = hrs.groupBy("event_type", "user_id").agg(
        F.min("hr").alias("fd"), F.max("hr").alias("ld")
    )
    mx = per.groupBy("event_type").agg(F.max("ld").alias("cmax"))
    subj = per.join(F.broadcast(mx), "event_type").select(
        "event_type",
        F.expr(
            f"case when cmax - ld > {_CHURN_GAP_HOURS} then ld - fd"
            " else cmax - fd end"
        ).alias("dur"),
        F.expr(
            f"case when cmax - ld > {_CHURN_GAP_HOURS} then 1 else 0 end"
        ).alias("death"),
    )
    durs = subj.groupBy("event_type", "dur").agg(
        F.sum("death").cast("bigint").alias("n_deaths"),
        F.count(F.lit(1)).alias("n_total"),
    )
    n = subj.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ar = durs.join(F.broadcast(n), "event_type").select(
        "event_type",
        "dur",
        "n_deaths",
        (
            F.col("n_users")
            - F.coalesce(F.sum("n_total").over(w_prev), F.lit(0))
        )
        .cast("bigint")
        .alias("n_at_risk"),
    )
    step = ar.filter(F.col("n_deaths") > 0).select(
        "event_type",
        "dur",
        "n_at_risk",
        "n_deaths",
        F.expr(
            "cast(round(1000000.0D * ln(greatest("
            "cast(n_at_risk - n_deaths as double) / n_at_risk,"
            " 1e-6))) as bigint)"
        ).alias("step_log_micro"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return step.select(
        "event_type",
        F.col("dur").alias("dur_hours"),
        "n_at_risk",
        "n_deaths",
        F.sum("step_log_micro").over(w_cum).cast("bigint").alias(
            "cum_log_micro"
        ),
    ).select(
        "event_type",
        "dur_hours",
        "n_at_risk",
        "n_deaths",
        "cum_log_micro",
        F.expr(
            "cast(round(1000000.0D * exp(cast(cum_log_micro as double)"
            " / 1000000.0D)) as bigint)"
        ).alias("survival_ppm"),
    )
