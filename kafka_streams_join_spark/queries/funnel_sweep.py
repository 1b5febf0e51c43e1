"""Funnel attribution-window sweep (round 12): view→click→purchase
conversion at four per-step windows (1/6/24/72 h) in one pass — the
dial behind ``events_funnel_conversion``'s frozen 24 h. The attribution
window is the most argued-over constant in funnel analytics (too short
under-credits slow converters, too long credits coincidence); this is
the curve that shows where conversion saturates, so the window is
chosen from data instead of folklore.

One-pass decomposition (why the sweep needs no per-window rerun): with
per-step windows, the step-2 event is the FIRST click after the first
view — the same timestamp at every window that admits it — so
stage2(W) ⇔ gap(view→first-click) ≤ W, and stage3(W) ⇔ that AND
gap(first-click→first-purchase-after-it) ≤ W. Two per-user gaps,
computed once from UNBOUNDED first-after-anchor joins (the registered
funnel's anchor-join + min shape), evaluated at all four windows as
conditional sums in ONE combinable aggregate. At the registered 24 h
the sweep's stage counts equal ``events_funnel_conversion``'s exactly
(pinned).

Determinism: gaps are exact integer MICROSECONDS (the corpus has
sub-second timestamps; second-truncated diffs would misclassify
boundary conversions); all counts exact; ppm = truncating div.

Scale: two user-keyed equi-joins + three map-side-combined min
aggregates (the certified funnel shape), one 1-row aggregate, a 4-row
stack. Nothing data-sized crosses after the per-user frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_WINDOWS_H = (1, 6, 24, 72)


@register(
    "events_funnel_window_sweep",
    oracle=f"""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      GROUP BY e.user_id
    ),
    g AS (
      SELECT v.user_id,
             epoch_us(c.c_ts) - epoch_us(v.v_ts) AS gvc,
             epoch_us(p.p_ts) - epoch_us(c.c_ts) AS gcp
      FROM v LEFT JOIN c ON c.user_id = v.user_id
      LEFT JOIN p ON p.user_id = v.user_id
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             {", ".join(
                 f"CAST(count(*) FILTER (WHERE gvc <= {w * 3_600_000_000})"
                 f" AS BIGINT) AS s2_{i},"
                 f" CAST(count(*) FILTER (WHERE gvc <= {w * 3_600_000_000}"
                 f" AND gcp <= {w * 3_600_000_000}) AS BIGINT) AS s3_{i}"
                 for i, w in enumerate(_WINDOWS_H)
             )}
      FROM g
    ),
    rows_ AS (
      {" UNION ALL ".join(
          f"SELECT CAST({w} AS BIGINT) AS window_h, n_users,"
          f" s2_{i} AS n_stage2, s3_{i} AS n_stage3 FROM m"
          for i, w in enumerate(_WINDOWS_H)
      )}
    )
    SELECT window_h, n_users, n_stage2, n_stage3,
           CAST(CAST(n_stage2 AS HUGEINT) * 1000000 // n_users AS BIGINT)
             AS conv2_ppm,
           CAST(CAST(n_stage3 AS HUGEINT) * 1000000 // n_users AS BIGINT)
             AS conv3_ppm,
           CAST(CAST(n_stage3 AS HUGEINT) * 1000000 // greatest(n_stage2, 1)
                AS BIGINT)
             AS step_conv_ppm
    FROM rows_
    """,
)
def events_funnel_window_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per attribution window {ws} h: funnel-entry users, stage-2 and
    stage-3 counts, overall and step conversion in exact ppm — one
    anchor-join pass, all windows as conditional sums. Module docstring
    has the first-after-anchor decomposition and exactness contracts."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    g = (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("gvc"),
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gcp"),
        )
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_users")]
    for i, w in enumerate(_WINDOWS_H):
        b = w * 3_600_000_000
        aggs.append(
            F.sum(F.when(F.col("gvc") <= b, 1).otherwise(0))
            .cast("bigint")
            .alias(f"s2_{i}")
        )
        aggs.append(
            F.sum(
                F.when((F.col("gvc") <= b) & (F.col("gcp") <= b), 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias(f"s3_{i}")
        )
    m = g.agg(*aggs)
    stack_args = ", ".join(
        f"{w}L, s2_{i}, s3_{i}" for i, w in enumerate(_WINDOWS_H)
    )
    return m.select(
        F.expr(
            f"stack({len(_WINDOWS_H)}, {stack_args})"
            " as (window_h, n_stage2, n_stage3)"
        ),
        "n_users",
    ).select(
        "window_h",
        "n_users",
        "n_stage2",
        "n_stage3",
        F.expr("cast(cast(n_stage2 as decimal(38,0)) * 1000000 div n_users"
            " as bigint)").alias(
            "conv2_ppm"
        ),
        F.expr("cast(cast(n_stage3 as decimal(38,0)) * 1000000 div n_users"
            " as bigint)").alias(
            "conv3_ppm"
        ),
        F.expr(
            "cast(cast(n_stage3 as decimal(38,0)) * 1000000"
            " div greatest(n_stage2, 1) as bigint)"
        ).alias("step_conv_ppm"),
    )


events_funnel_window_sweep.__doc__ = events_funnel_window_sweep.__doc__.replace(
    "{ws}", "/".join(str(w) for w in _WINDOWS_H)
)
