"""Temporal / event-time analytics beyond windows (registered round 8).

Drafted at the end of round 6, staged through round 7 (whose sweep was at
its 50-slot capacity), registered in round 8. ``events_trend_ols``'s OLS
arithmetic was widened to DECIMAL(38,0)/HUGEINT in the round-7 scale
audit before its first sweep.

Overlap note: ``events_cusum_changepoint`` and the round-7
``events_value_drawdown`` share the CUSUM prefix-deviation path C_i but
deliver DIFFERENT contracts over it — drawdown reports the excursion
MAGNITUDES (max upswing / max drawdown of the path, in milli-units),
changepoint reports the LOCATION (the argmax hour of |n·S_i − i·S_n|
with its score). A monitoring stack wants both: "how big was the shift"
vs "when did it happen". Kept as two queries with cross-references.

Four operators every time-series-over-events engine grows sooner or
later, each expressed as narrow-row DataFrame pipelines with integer
determinism contracts:

- ``events_max_concurrency`` — sweep-line interval concurrency (the
  "max simultaneous sessions" question): +1/-1 boundary events, a
  TWO-PHASE prefix sum (per-hour-bucket offsets + within-bucket running
  sum — the ``two_phase_rank`` decomposition applied to sums), max per
  key. The data-sized frame never crosses a single-partition window.
- ``events_time_weighted_avg`` — TWAP-style interval-weighted mean:
  each event's value holds until the user's next event; weights are
  exact integer seconds, values integer centi-units, so the weighted
  mean is pure BIGINT arithmetic.
- ``events_cusum_changepoint`` — changepoint detection via the CUSUM
  statistic max_i |n*S_i - i*S_n| over per-type hourly totals (the
  division-free spelling: comparing S_i/i against S_n/n cross-multiplied,
  so the argmax is exact integer comparison, no float boundary).
- ``events_trend_ols`` — closed-form per-key OLS (slope/intercept of
  daily active users vs day index) from the five classic sums; the
  slope/intercept are integer micro-units via the truncating integer
  division both engines share (Spark ``div`` ≡ DuckDB ``//``, both
  truncate toward zero — verified on negatives).

Scale: everything aggregates BEFORE it windows. The sweep-line's only
unpartitioned state is the per-(type, hour-bucket) offset frame
(calendar-bounded, not data-sized); CUSUM/OLS window over per-type
hourly/daily aggregate rows (≤ hours/days in the corpus' time range);
the TWAP windows partition by user_id (high cardinality, skew-free).
The ``props`` payload column is never read (column pruning at the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_MC_HOLD_US = 900 * 1_000_000  # each event "holds" for 15 min
_MC_BUCKET_US = 3600 * 1_000_000  # sweep-line prefix-sum bucket = 1 h
_DAY_US = 86_400 * 1_000_000
_HOUR_US = 3600 * 1_000_000


# --------------------------------------------------------------------------
# events_max_concurrency — sweep-line interval concurrency
# --------------------------------------------------------------------------


@register(
    "events_max_concurrency",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, epoch_us(ts) AS t FROM events
    ),
    d AS (
      SELECT event_type, t, 1 AS delta FROM ev
      UNION ALL
      SELECT event_type, t + {_MC_HOLD_US}, -1 FROM ev
    ),
    r AS (
      SELECT event_type, t, delta,
             CAST(sum(delta) OVER (
               PARTITION BY event_type ORDER BY t, delta
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
      FROM d
    ),
    p AS (SELECT * FROM r WHERE delta = 1),
    m AS (
      SELECT event_type, max(conc) AS mx FROM p GROUP BY event_type
    )
    SELECT m.event_type, CAST(m.mx AS INT) AS max_concurrent,
           min(p.t) AS at_us
    FROM m JOIN p ON p.event_type = m.event_type AND p.conc = m.mx
    GROUP BY m.event_type, m.mx
    """,
)
def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max concurrent "active" events per type, where an event is active
    for 15 min after its timestamp: the classic sweep line — +1 at start,
    -1 at end (half-open interval, so the -1 sorts BEFORE a +1 at the
    same instant), running sum, max. Output: (event_type,
    max_concurrent, at_us = earliest start instant achieving it).

    Scale: the running sum is TWO-PHASE — per-(type, hour) net deltas
    aggregate map-side, their exclusive cumulative sum over the
    calendar-bounded bucket frame gives each bucket's offset, and the
    within-bucket running sum windows over one hour of boundaries at a
    time. No data-sized frame crosses a single-partition exchange; the
    max itself is a hash aggregate. Duplicate sort keys are safe: equal
    (t, delta) rows produce the same multiset of prefix values in any
    order, so max and argmin-t are deterministic in both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("t")
    )
    d = ev.select("event_type", "t", F.lit(1).alias("delta")).unionByName(
        ev.select(
            "event_type",
            (F.col("t") + F.lit(_MC_HOLD_US)).alias("t"),
            F.lit(-1).alias("delta"),
        )
    ).withColumn("bucket", F.expr(f"t div {_MC_BUCKET_US}"))
    off_w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        d.groupBy("event_type", "bucket")
        .agg(F.sum("delta").alias("net"))
        .select(
            "event_type",
            "bucket",
            F.coalesce(F.sum("net").over(off_w), F.lit(0)).alias("off"),
        )
    )
    in_w = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    conc = (
        d.withColumn("run", F.sum("delta").over(in_w))
        .join(F.broadcast(offs), ["event_type", "bucket"])
        .select(
            "event_type",
            "t",
            "delta",
            (F.col("off") + F.col("run")).cast("bigint").alias("conc"),
        )
        .filter(F.col("delta") == 1)
    )
    m = conc.groupBy("event_type").agg(
        F.max(F.struct(F.col("conc"), (-F.col("t")).alias("negt"))).alias("m")
    )
    return m.select(
        "event_type",
        F.col("m.conc").cast("int").alias("max_concurrent"),
        (-F.col("m.negt")).alias("at_us"),
    )


# --------------------------------------------------------------------------
# events_time_weighted_avg — TWAP-style interval-weighted mean per user
# --------------------------------------------------------------------------


@register(
    "events_time_weighted_avg",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             CAST(round(value * 100) AS BIGINT) AS value_c
      FROM events
    ),
    seg AS (
      SELECT user_id, value_c,
             (lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
              - t) // 1000000 AS dt_s
      FROM ev
    ),
    a AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_segments,
             CAST(sum(dt_s) AS BIGINT) AS total_s,
             CAST(sum(value_c * dt_s) AS BIGINT) AS wsum
      FROM seg WHERE dt_s IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n_segments, total_s,
           CASE WHEN total_s > 0 THEN wsum // total_s END AS twap_centi
    FROM a
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (the TWAP / sensor-mean
    semantics): each event's value holds until that user's next event;
    the mean weights each value by its holding duration in whole
    seconds. Output: (user_id, n_segments, total_s, twap_centi) — the
    mean in integer centi-units, NULL when the total weight is zero.

    Determinism: durations are exact integer microseconds floored to
    seconds with the shared truncating division; values are integer
    centi-units before any arithmetic, so the weighted mean is a BIGINT
    ratio — no float summation order anywhere. The last event of each
    user (no successor) carries no weight, by the half-open-interval
    contract.

    Scale: one lead() window partitioned by user_id (high-cardinality,
    skew-free), then a hash aggregate. Weights in seconds (not micros)
    keep value_c * dt_s products ~1e9 per segment — no overflow headroom
    concerns at any realistic per-user history."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t"),
        F.expr("cast(round(value * 100) as bigint)").alias("value_c"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    seg = ev.select(
        "user_id",
        "value_c",
        "t",
        F.lead("t").over(w).alias("nt"),
    ).withColumn("dt_s", F.expr("(nt - t) div 1000000"))
    a = (
        seg.filter(F.col("dt_s").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dt_s").alias("total_s"),
            F.sum(F.col("value_c") * F.col("dt_s")).alias("wsum"),
        )
    )
    return a.select(
        "user_id",
        "n_segments",
        "total_s",
        F.expr(
            "case when total_s > 0 then wsum div total_s end"
        ).alias("twap_centi"),
    )


# --------------------------------------------------------------------------
# events_cusum_changepoint — division-free CUSUM over hourly totals
# --------------------------------------------------------------------------


@register(
    "events_cusum_changepoint",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, epoch_us(ts) // {_HOUR_US} AS h,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, h, x,
             CAST(row_number() OVER (
               PARTITION BY event_type ORDER BY h) AS BIGINT) AS i,
             CAST(sum(x) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS tot
      FROM hourly
    ),
    sc AS (
      SELECT event_type, h, n, abs(s * n - i * tot) AS score,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY abs(s * n - i * tot) DESC, h) AS rnk
      FROM c
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_hours,
           CAST(h AS BIGINT) AS cp_hour, CAST(score AS BIGINT) AS score
    FROM sc WHERE rnk = 1
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint detection per event type over hourly value totals,
    via the CUSUM statistic: the hour h maximizing |S_i/i - S_n/n|
    (prefix mean vs global mean), spelled division-free as
    |n*S_i - i*S_n| so the argmax is an exact BIGINT comparison — ties
    break on the earlier hour. Output: (event_type, n_hours, cp_hour,
    score) with score in the scaled integer units.

    Contract split vs ``events_value_drawdown``: both walk the CUSUM
    prefix-deviation path, but drawdown answers "how big was the largest
    sustained excursion" (magnitudes over daily totals) while this query
    answers "WHEN did the level shift" (the argmax hour + its score over
    hourly totals) — location vs magnitude, complementary outputs.

    Scale: the corpus aggregates to (type, hour) rows FIRST (map-side
    combined hash aggregate); every window after that runs over the
    calendar-bounded per-type hourly frame (≤ hours in the data's time
    range — ~720 rows/type here), never the raw events. Magnitudes:
    |n*S_i| ≤ hours * total_centi — ~2^40 at sf0.1, fifteen bits of
    headroom per 1000× of corpus growth before BIGINT pressure."""
    hourly = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("h"),
            F.expr("cast(round(value * 100) as bigint)").alias("value_c"),
        )
        .groupBy("event_type", "h")
        .agg(F.sum("value_c").alias("x"))
    )
    ord_w = Window.partitionBy("event_type").orderBy("h")
    run_w = ord_w.rowsBetween(Window.unboundedPreceding, 0)
    full_w = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = hourly.select(
        "event_type",
        "h",
        F.row_number().over(ord_w).cast("bigint").alias("i"),
        F.sum("x").over(run_w).alias("s"),
        F.count(F.lit(1)).over(full_w).alias("n"),
        F.sum("x").over(full_w).alias("tot"),
    ).withColumn("score", F.abs(F.col("s") * F.col("n") - F.col("i") * F.col("tot")))
    rnk_w = Window.partitionBy("event_type").orderBy(
        F.col("score").desc(), F.col("h")
    )
    return (
        c.withColumn("rnk", F.row_number().over(rnk_w))
        .filter(F.col("rnk") == 1)
        .select(
            "event_type",
            F.col("n").alias("n_hours"),
            F.col("h").alias("cp_hour"),
            F.col("score").alias("score"),
        )
    )


# --------------------------------------------------------------------------
# events_trend_ols — closed-form per-key OLS over daily active users
# --------------------------------------------------------------------------


@register(
    "events_trend_ols",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    x AS (
      SELECT event_type, y,
             day - min(day) OVER (PARTITION BY event_type) AS xi
      FROM daily
    ),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xi) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(xi * y) AS BIGINT) AS sxy,
             CAST(sum(xi * xi) AS BIGINT) AS sxx,
             CAST(max(xi) AS BIGINT) AS maxx
      FROM x GROUP BY event_type
    ),
    fit AS (
      SELECT event_type, n,
             CAST(((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
                   * 1000000)
                  // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
               AS BIGINT) AS slope_micro,
             sx, sy, maxx
      FROM s
    )
    SELECT event_type, n AS n_days, slope_micro,
           CAST((CAST(sy AS HUGEINT) * 1000000
                 - CAST(slope_micro AS HUGEINT) * sx) // n AS BIGINT)
             AS intercept_micro,
           CAST((CAST(sy AS HUGEINT) * 1000000
                 - CAST(slope_micro AS HUGEINT) * sx) // n
                + CAST(slope_micro AS HUGEINT) * (maxx + 1) AS BIGINT)
             AS forecast_next_micro
    FROM fit
    """,
)
def events_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type linear trend of daily active users: closed-form
    OLS slope/intercept from the five classic sums (n, Σx, Σy, Σxy,
    Σx²) over (day index, DAU) points, plus the next-day forecast.
    Output: (event_type, n_days, slope_micro, intercept_micro,
    forecast_next_micro) — all integer micro-units via the truncating
    integer division both engines share (verified to truncate toward
    zero on negative numerators, so downward trends stay engine-equal).

    Scale: the corpus collapses to (type, day) distinct-user counts in
    one exact-distinct aggregate (the dedup shape); the OLS sums then
    touch ≤ days-per-type rows. The min-day window runs over the same
    calendar-bounded frame. Degenerate keys (a single day: den = 0)
    would need a guard; the events corpus always spans > 1 day."""
    daily = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"),
            "user_id",
        )
        .groupBy("event_type", "day")
        .agg(F.countDistinct("user_id").alias("y"))
    )
    full_w = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    x = daily.select(
        "event_type",
        "y",
        (F.col("day") - F.min("day").over(full_w)).alias("xi"),
    )
    s = x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xi").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("xi") * F.col("y")).alias("sxy"),
        F.sum(F.col("xi") * F.col("xi")).alias("sxx"),
        F.max("xi").alias("maxx"),
    )
    # DECIMAL(38,0) OLS arithmetic: n·sxy·1e6 exceeds BIGINT once daily
    # actives reach ~1e8 over a multi-year span and ANSI throws — the
    # graph_assortativity INT128 class; the oracle widens to HUGEINT.
    # Spark's div truncates toward zero identically on DECIMAL and BIGINT,
    # so negative (downward-trend) slopes keep their verified semantics.
    dec = "cast({} as decimal(38,0))".format
    fit = s.withColumn(
        "slope_micro",
        F.expr(
            f"cast((({dec('n')} * sxy - {dec('sx')} * sy) * 1000000)"
            f" div ({dec('n')} * sxx - {dec('sx')} * sx) as bigint)"
        ),
    ).withColumn(
        "intercept_micro",
        F.expr(
            f"cast(({dec('sy')} * 1000000 - {dec('slope_micro')} * sx)"
            " div n as bigint)"
        ),
    )
    return fit.select(
        "event_type",
        F.col("n").alias("n_days"),
        "slope_micro",
        "intercept_micro",
        F.expr(
            f"cast({dec('intercept_micro')}"
            f" + {dec('slope_micro')} * (maxx + 1) as bigint)"
        ).alias("forecast_next_micro"),
    )
