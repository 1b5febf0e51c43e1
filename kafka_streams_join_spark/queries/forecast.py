"""Trend forecasting and seasonality-adjusted anomaly detection
(round 9, wave 3) — the two compositions a volume dashboard runs on top
of the registered primitives:

- ``events_holt_linear`` extends the certified integer EWMA
  (``events_daily_ewma``) with Holt's LINEAR trend: two coupled
  exponential smoothers (level + trend, α = β = 1/4) walked over the
  per-type daily series, finishing with the h-step-ahead forecasts
  level + h·trend that a flat EWMA structurally cannot produce on
  trending volume.
- ``events_seasonal_anomaly_mad`` subtracts the (day-of-week × hour)
  baseline BEFORE gating outliers: the registered MAD gate
  (``events_anomaly_mad``) flags every rush hour on a diurnal corpus;
  deseasonalizing first is what turns it into an alert a human would
  keep enabled.

Determinism contracts:

- Holt's recursion uses FLOOR division by 4, spelled as
  ``floor(x / 4.0)`` in BOTH engines: dividing an integer |x| < 2⁵² by
  a power of two is EXACT in an IEEE double, so the floor is exact and
  engine-identical even on NEGATIVE trend states. This is load-bearing:
  the trend smoother's numerator goes negative on any downtrend, and
  there Spark's ``div`` truncates toward zero while DuckDB's integer
  ``//`` ALSO truncates (floor-div only for floats) — but Python's
  ``//`` floors, so no two of the three agree by default (verified live:
  ``(-1)//4`` is 0 in DuckDB, -1 in Python). The explicit double-floor
  sidesteps the whole negative-division trap. The recursion is the EWMA
  fold idiom: a row-local ``aggregate`` over each type's collected day
  array on Spark, the same recursion as a recursive CTE in DuckDB.
- The seasonal baseline is the exact truncating-div milli mean per
  (type, dow, hour) bucket — nonneg, so ``div`` ≡ ``//`` — and the
  residual gate is the registered pure-integer half-lattice MAD
  comparison (10000·2dev > 44478·2MAD); medians of integer residuals
  sit on the half-integer lattice, so no float ever decides a flag.

Scale: Holt's event-sized work is one map-side-combined (type, day)
aggregate; the fold walks a calendar-bounded array. The seasonal gate
is three corpus passes over a ≤ |types|·168-row broadcast baseline —
same shape as the certified MAD query it composes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register

# Holt update, floor-div-by-4 (exact in doubles, see module docstring):
#   l' = floor((n + 3(l+b)) / 4);  b' = floor((l' - l + 3b) / 4)
_L_NEXT = "cast(floor((x.n + 3 * (acc.l + acc.b)) / 4.0D) as bigint)"


@register(
    "events_holt_linear",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, d, n,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS rnk
      FROM daily
    ),
    hw AS (
      SELECT event_type, rnk, n AS l, CAST(0 AS BIGINT) AS b
      FROM ranked WHERE rnk = 1
      UNION ALL
      SELECT r.event_type, r.rnk,
             CAST(floor((r.n + 3 * (hw.l + hw.b)) / 4.0) AS BIGINT),
             CAST(floor((CAST(floor((r.n + 3 * (hw.l + hw.b)) / 4.0)
                              AS BIGINT) - hw.l + 3 * hw.b) / 4.0)
                  AS BIGINT)
      FROM ranked r JOIN hw
        ON r.event_type = hw.event_type AND r.rnk = hw.rnk + 1
    ),
    fin AS (
      SELECT event_type, max(rnk) AS n_days FROM hw GROUP BY 1
    )
    SELECT f.event_type, f.n_days,
           h.l AS level_, h.b AS trend,
           h.l + h.b AS forecast_1,
           h.l + 7 * h.b AS forecast_7
    FROM fin f JOIN hw h
      ON h.event_type = f.event_type AND h.rnk = f.n_days
    """,
)
def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend smoothing of daily volumes per event type
    (α = β = 1/4, exact integer floor-div recursion — module docstring)
    ending in the 1-day and 7-day-ahead forecasts level + h·trend. The
    capacity-planning companion to the certified flat EWMA: on trending
    volume the EWMA lags by trend/α forever; Holt's second smoother is
    the correction.

    Scale: one map-side-combined (type, day) aggregate; the recursion
    folds a calendar-bounded array per type, row-locally."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    folded = daily.groupBy("event_type").agg(
        F.expr(
            f"""
            aggregate(
              array_sort(collect_list(struct(d, n))),
              named_struct('l', cast(0 as bigint), 'b', cast(0 as bigint),
                           'i', 0),
              (acc, x) -> CASE WHEN acc.i = 0
                THEN named_struct('l', x.n, 'b', cast(0 as bigint), 'i', 1)
                ELSE named_struct(
                  'l', {_L_NEXT},
                  'b', cast(floor(({_L_NEXT} - acc.l + 3 * acc.b) / 4.0D)
                            as bigint),
                  'i', acc.i + 1) END
            )
            """
        ).alias("st")
    )
    return folded.select(
        "event_type",
        F.expr("cast(st.i as bigint)").alias("n_days"),
        F.col("st.l").alias("level_"),
        F.col("st.b").alias("trend"),
        F.expr("st.l + st.b").alias("forecast_1"),
        F.expr("st.l + 7 * st.b").alias("forecast_7"),
    )


# --------------------------------------------------------------------------
# events_seasonal_anomaly_mad — deseasonalized robust outlier gate
# --------------------------------------------------------------------------


@register(
    "events_seasonal_anomaly_mad",
    oracle="""
    WITH v AS (
      SELECT event_type,
             (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 3) % 7 AS dow,
             (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24 AS hr,
             CAST(round(value * 1000) AS BIGINT) AS xm
      FROM events
    ),
    base AS (
      SELECT event_type, dow, hr,
             CAST(sum(CAST(xm AS HUGEINT)) // count(*) AS BIGINT) AS bm
      FROM v GROUP BY 1, 2, 3
    ),
    res AS (
      SELECT v.event_type, v.xm - b.bm AS r
      FROM v JOIN base b
        ON b.event_type = v.event_type AND b.dow = v.dow AND b.hr = v.hr
    ),
    med AS (
      SELECT event_type, quantile_cont(r, 0.5) AS med FROM res GROUP BY 1
    ),
    dev AS (
      SELECT r.event_type, abs(r.r - m.med) AS dev, m.med
      FROM res r JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           count(*) AS n_events,
           CAST(round(2 * max(d.med)) AS BIGINT) AS med_resid_halfm,
           CAST(round(2 * max(m.mad)) AS BIGINT) AS mad_halfm,
           CAST(sum(CASE WHEN 10000 * CAST(round(2 * d.dev) AS BIGINT)
                          > 44478 * CAST(round(2 * m.mad) AS BIGINT)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(CAST(sum(CASE WHEN 10000 * CAST(round(2 * d.dev) AS BIGINT)
                               > 44478 * CAST(round(2 * m.mad) AS BIGINT)
                          THEN 1 ELSE 0 END) AS HUGEINT) * 1000000
                // count(*) AS BIGINT) AS outlier_ppm
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def events_seasonal_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted robust outliers per event type: each event's
    milli value minus its (day-of-week × hour) bucket's exact integer
    mean, then the registered pure-integer MAD gate on the residuals
    (module docstring has both contracts). Where the raw MAD gate flags
    every rush hour, this flags events anomalous FOR their own hour —
    the difference between a calendar and an alert.

    Scale: the baseline is ≤ |types|·168 rows, broadcast; the corpus
    streams past it and the two median frames — same certified shape as
    ``events_anomaly_mad`` with one extra broadcast join."""
    v = _staged(
        load_table(spark, sf_dir, "events").select(
            "event_type",
            F.expr("(unix_timestamp(ts) div 86400 + 3) % 7").alias("dow"),
            F.expr("(unix_timestamp(ts) div 3600) % 24").alias("hr"),
            F.expr("cast(round(value * 1000) as bigint)").alias("xm"),
        )
    )
    base = v.groupBy("event_type", "dow", "hr").agg(
        F.expr(
            "cast(sum(cast(xm as decimal(38,0))) div count(1) as bigint)"
        ).alias("bm")
    )
    res = _staged(
        v.join(F.broadcast(base), ["event_type", "dow", "hr"]).select(
            "event_type", F.expr("xm - bm").alias("r")
        )
    )
    med = res.groupBy("event_type").agg(
        F.expr("percentile(r, 0.5)").alias("med")
    )
    dev = res.join(F.broadcast(med), "event_type").select(
        "event_type", F.expr("abs(r - med)").alias("dev"), "med"
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    flag = (
        "10000 * cast(round(2 * dev) as bigint)"
        " > 44478 * cast(round(2 * mad) as bigint)"
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("cast(round(2 * max(med)) as bigint)").alias(
                "med_resid_halfm"
            ),
            F.expr("cast(round(2 * max(mad)) as bigint)").alias("mad_halfm"),
            F.expr(
                f"cast(sum(case when {flag} then 1 else 0 end) as bigint)"
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_events",
            "med_resid_halfm",
            "mad_halfm",
            "n_outliers",
            F.expr(
                "cast(cast(n_outliers as decimal(38,0)) * 1000000"
                " div n_events as bigint)"
            ).alias("outlier_ppm"),
        )
    )
