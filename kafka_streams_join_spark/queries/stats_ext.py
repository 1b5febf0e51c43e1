"""Classical statistics with exact-moment contracts (round 8): Pearson
correlation, Welch's z-test, MAD robust outliers, and two-phase
weighted quantiles — the inferential layer an analytics engine owes its
users, each spelled so the SUFFICIENT STATISTICS are exact integers
(BIGINT / DECIMAL(38,0) on Spark, HUGEINT on DuckDB) and floats appear
only in a final, fixed-shape expression over those exact inputs
(IEEE-correctly-rounded div/sqrt of identical operands → identical
doubles → engine-consistent round()).

- ``orders_corr_price_discount`` — Pearson r from the five classic
  sums (n, Σx, Σy, Σx², Σy², Σxy), cross terms in DECIMAL(38,0)
  because Σx² passes BIGINT near sf 100 (the r7 overflow-audit class).
- ``events_ab_test_ztest`` — Welch's two-sample z on a deterministic
  hash split (user_id parity), one single-pass conditional aggregate;
  the experiment-readout query, with exact milli means and a guarded
  z_milli.
- ``events_anomaly_mad`` — median / median-absolute-deviation outlier
  gate (the robust sibling of the registered z-score and IQR gates).
  Cent-quantized values put every median on the half-cent lattice, so
  2·med and 2·MAD are EXACT integers and the 3σ-equivalent cut
  (dev > 3·1.4826·MAD) is the pure-integer comparison
  10000·(2·dev) > 44478·(2·MAD) — no float ever decides a flag.
- ``orders_weighted_median_price`` — quantity-weighted p25/median/p75
  of dollar price per ship mode. The cumulative-weight window runs on
  the (mode, dollar-level) frame, which is bounded by the PRICE DOMAIN
  (~1e5 levels), not the row count — the two_phase_rank decomposition
  applied to weighted quantiles, so the sort never touches a
  data-sized frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register


# --------------------------------------------------------------------------
# orders_corr_price_discount — exact-moment Pearson correlation
# --------------------------------------------------------------------------


@register(
    "orders_corr_price_discount",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             count(*) AS n,
             sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sx,
             sum(CAST(round(l_discount * 100) AS HUGEINT)) AS sy,
             sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxx,
             sum(CAST(round(l_discount * 100) AS HUGEINT)
                 * CAST(round(l_discount * 100) AS BIGINT)) AS syy,
             sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                 * CAST(round(l_discount * 100) AS BIGINT)) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
                THEN 0
                ELSE CAST(round(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)))
                     AS BIGINT)
           END AS r_ppm
    FROM m
    """,
)
def orders_corr_price_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation (exact ppm) between line price and discount
    per return flag, from exact integer moments (module docstring has
    the contract). The discount-indifference of pricing is the point:
    |r| near 0 is the expected TPC-H answer, and the machinery is the
    reusable part.

    Scale: ONE map-side-combinable aggregate; five DECIMAL(38,0) sums
    per group, then constant-time arithmetic on 3 rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("x"),
        F.expr("cast(round(l_discount * 100) as bigint)").alias("y"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(cast(x as decimal(38,0)))").alias("sx"),
        F.expr("sum(cast(y as decimal(38,0)))").alias("sy"),
        F.expr("sum(cast(x as decimal(38,0)) * x)").alias("sxx"),
        F.expr("sum(cast(y as decimal(38,0)) * y)").alias("syy"),
        F.expr("sum(cast(x as decimal(38,0)) * y)").alias("sxy"),
    )
    return m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr(
            "case when n * sxx - sx * sx <= 0 or n * syy - sy * sy <= 0"
            " then cast(0 as bigint)"
            " else cast(round(1000000.0D * cast(n * sxy - sx * sy as double)"
            " / sqrt(cast(n * sxx - sx * sx as double)"
            "        * cast(n * syy - sy * sy as double))) as bigint)"
            " end"
        ).alias("r_ppm"),
    )


# --------------------------------------------------------------------------
# events_ab_test_ztest — Welch z on a deterministic hash split
# --------------------------------------------------------------------------


@register(
    "events_ab_test_ztest",
    oracle="""
    WITH v AS (
      SELECT event_type, user_id % 2 AS grp,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events
    ),
    m AS (
      SELECT event_type,
             sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS nb,
             sum(CASE WHEN grp = 0 THEN CAST(x AS HUGEINT) ELSE 0 END) AS sxa,
             sum(CASE WHEN grp = 1 THEN CAST(x AS HUGEINT) ELSE 0 END) AS sxb,
             sum(CASE WHEN grp = 0 THEN CAST(x AS HUGEINT) * x ELSE 0 END)
               AS sxxa,
             sum(CASE WHEN grp = 1 THEN CAST(x AS HUGEINT) * x ELSE 0 END)
               AS sxxb
      FROM v GROUP BY event_type
    )
    SELECT event_type,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(sxa * 10 // greatest(na, 1) AS BIGINT) AS mean_a_milli,
           CAST(sxb * 10 // greatest(nb, 1) AS BIGINT) AS mean_b_milli,
           CASE WHEN na < 2 OR nb < 2
                  OR (CAST(na * sxxa - sxa * sxa AS DOUBLE)
                      / (CAST(na AS DOUBLE) * (na - 1) * na)
                      + CAST(nb * sxxb - sxb * sxb AS DOUBLE)
                      / (CAST(nb AS DOUBLE) * (nb - 1) * nb)) <= 0
                THEN 0
                ELSE CAST(round(1000 *
                     (CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb)
                     / sqrt(CAST(na * sxxa - sxa * sxa AS DOUBLE)
                            / (CAST(na AS DOUBLE) * (na - 1) * na)
                            + CAST(nb * sxxb - sxb * sxb AS DOUBLE)
                            / (CAST(nb AS DOUBLE) * (nb - 1) * nb)))
                     AS BIGINT)
           END AS z_milli
    FROM m
    """,
)
def events_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample z-test of event value between the user_id
    parity split, per event type: exact milli means (truncating integer
    div of HUGEINT/DECIMAL sums) and z_milli from the canonical
    variance-of-means expression evaluated identically in both engines
    (module docstring has the contract). A deterministic split of a
    homogeneous corpus SHOULD read |z| ≲ 2 — this is the A/A test every
    experimentation platform runs to validate its own plumbing.

    Scale: ONE conditional aggregate pass, six exact sums per type."""
    v = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("user_id % 2").alias("grp"),
        F.expr("cast(round(value * 100) as bigint)").alias("x"),
    )
    m = v.groupBy("event_type").agg(
        F.expr("sum(case when grp = 0 then 1 else 0 end)").alias("na"),
        F.expr("sum(case when grp = 1 then 1 else 0 end)").alias("nb"),
        F.expr(
            "sum(case when grp = 0 then cast(x as decimal(38,0)) else 0 end)"
        ).alias("sxa"),
        F.expr(
            "sum(case when grp = 1 then cast(x as decimal(38,0)) else 0 end)"
        ).alias("sxb"),
        F.expr(
            "sum(case when grp = 0 then cast(x as decimal(38,0)) * x"
            " else 0 end)"
        ).alias("sxxa"),
        F.expr(
            "sum(case when grp = 1 then cast(x as decimal(38,0)) * x"
            " else 0 end)"
        ).alias("sxxb"),
    )
    var_sum = (
        "cast(na * sxxa - sxa * sxa as double)"
        " / (cast(na as double) * (na - 1) * na)"
        " + cast(nb * sxxb - sxb * sxb as double)"
        " / (cast(nb as double) * (nb - 1) * nb)"
    )
    return m.select(
        "event_type",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.expr("cast(sxa * 10 div greatest(na, 1) as bigint)").alias(
            "mean_a_milli"
        ),
        F.expr("cast(sxb * 10 div greatest(nb, 1) as bigint)").alias(
            "mean_b_milli"
        ),
        F.expr(
            f"case when na < 2 or nb < 2 or ({var_sum}) <= 0"
            " then cast(0 as bigint)"
            " else cast(round(1000 *"
            " (cast(sxa as double) / na - cast(sxb as double) / nb)"
            f" / sqrt({var_sum})) as bigint)"
            " end"
        ).alias("z_milli"),
    )


# --------------------------------------------------------------------------
# events_anomaly_mad — median/MAD robust outlier gate
# --------------------------------------------------------------------------


@register(
    "events_anomaly_mad",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
      FROM events
    ),
    med AS (
      SELECT event_type, quantile_cont(x, 0.5) AS med FROM v GROUP BY 1
    ),
    dev AS (
      SELECT v.event_type, v.x, abs(v.x - m.med) AS dev, m.med
      FROM v JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           count(*) AS n_events,
           CAST(round(2 * max(d.med)) AS BIGINT) AS med_halfc,
           CAST(round(2 * max(m.mad)) AS BIGINT) AS mad_halfc,
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
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier gate per event type: median and MAD of the
    cent-quantized value, and the count past the 3σ-equivalent cut
    dev > 3·1.4826·MAD — decided by the pure-integer comparison
    10000·(2·dev) > 44478·(2·MAD) on the exact half-cent lattice
    (module docstring). Completes the outlier triple with the
    registered z-score (moment-fragile) and IQR (quartile) gates; MAD
    is the one with a 50% breakdown point.

    Scale: three aggregates and two BROADCAST joins of the ≤ n_types
    median frames — the corpus streams past them twice, no data-sized
    shuffle beyond the per-type groupings."""
    v = _staged(
        load_table(spark, sf_dir, "events").select(
            "event_type",
            F.expr("cast(round(value * 100) as bigint)").alias("x"),
        )
    )
    med = v.groupBy("event_type").agg(
        F.expr("percentile(x, 0.5)").alias("med")
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type", "x", F.expr("abs(x - med)").alias("dev"), "med"
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
            F.expr("cast(round(2 * max(med)) as bigint)").alias("med_halfc"),
            F.expr("cast(round(2 * max(mad)) as bigint)").alias("mad_halfc"),
            F.expr(
                f"cast(sum(case when {flag} then 1 else 0 end) as bigint)"
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_events",
            "med_halfc",
            "mad_halfc",
            "n_outliers",
            F.expr(
                "cast(cast(n_outliers as decimal(38,0)) * 1000000"
                " div n_events as bigint)"
            ).alias("outlier_ppm"),
        )
    )


# --------------------------------------------------------------------------
# orders_weighted_median_price — two-phase weighted quantiles
# --------------------------------------------------------------------------


@register(
    "orders_weighted_median_price",
    oracle="""
    WITH lvl AS (
      SELECT CASE l_suppkey % 3 WHEN 0 THEN 'AIR' WHEN 1 THEN 'RAIL'
             ELSE 'SHIP' END AS shipmode,
             CAST(round(l_extendedprice * 100) AS BIGINT) // 100 AS price_d,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    tot AS (
      SELECT shipmode, CAST(sum(w) AS BIGINT) AS total_w,
             count(*) AS n_levels
      FROM lvl GROUP BY 1
    ),
    cum AS (
      SELECT l.shipmode, l.price_d, t.total_w, t.n_levels,
             CAST(sum(l.w) OVER (PARTITION BY l.shipmode
                                 ORDER BY l.price_d
                                 ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cw
      FROM lvl l JOIN tot t USING (shipmode)
    )
    SELECT shipmode,
           max(total_w) AS total_weight,
           max(n_levels) AS n_levels,
           min(CASE WHEN 4 * cw >= total_w THEN price_d END) AS wq25_price_d,
           min(CASE WHEN 2 * cw >= total_w THEN price_d END)
             AS median_price_d,
           min(CASE WHEN 4 * cw >= 3 * total_w THEN price_d END)
             AS wq75_price_d
    FROM cum GROUP BY shipmode
    """,
)
def orders_weighted_median_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantity-weighted p25/median/p75 dollar price per ship mode
    (lower weighted quantile: the smallest price level whose cumulative
    weight reaches the quantile of total weight — all-integer, module
    docstring has the bounded-level scale argument). Weighted quantiles
    are what "typical price of a shipped unit" actually means; the
    unweighted median answers a different question about order LINES.
    The corpus has no l_shipmode, so the tpch_ext.py Q12 idiom applies:
    a deterministic supplier hash (l_suppkey % 3 -> AIR/RAIL/SHIP) plays
    the mode identically on both engines.

    Scale: the corpus collapses to (mode, dollar-level) rows first —
    bounded by the price domain, not row count — and the cumulative
    window runs per mode on that frame; quantile extraction is a
    conditional-min aggregate, no second sort."""
    lvl = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.expr(
                "CASE l_suppkey % 3 WHEN 0 THEN 'AIR' WHEN 1 THEN 'RAIL'"
                " ELSE 'SHIP' END"
            ).alias("shipmode"),
            F.expr(
                "cast(round(l_extendedprice * 100) as bigint) div 100"
            ).alias("price_d"),
            F.expr("cast(round(l_quantity) as bigint)").alias("q"),
        )
        .groupBy("shipmode", "price_d")
        .agg(F.sum("q").cast("bigint").alias("w"))
    )
    tot = lvl.groupBy("shipmode").agg(
        F.sum("w").cast("bigint").alias("total_w"),
        F.count(F.lit(1)).alias("n_levels"),
    )
    w_cum = Window.partitionBy("shipmode").orderBy("price_d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = lvl.join(tot, "shipmode").select(
        "shipmode",
        "price_d",
        "total_w",
        "n_levels",
        F.sum("w").over(w_cum).cast("bigint").alias("cw"),
    )
    return cum.groupBy("shipmode").agg(
        F.max("total_w").alias("total_weight"),
        F.max("n_levels").alias("n_levels"),
        F.min(F.expr("case when 4 * cw >= total_w then price_d end")).alias(
            "wq25_price_d"
        ),
        F.min(F.expr("case when 2 * cw >= total_w then price_d end")).alias(
            "median_price_d"
        ),
        F.min(
            F.expr("case when 4 * cw >= 3 * total_w then price_d end")
        ).alias("wq75_price_d"),
    )


# --------------------------------------------------------------------------
# orders_price_elasticity — log-log OLS slope (round 9, wave 2)
# --------------------------------------------------------------------------


@register(
    "orders_price_elasticity",
    oracle="""
    WITH v AS (
      SELECT l_returnflag,
             CAST(round(1e6 * ln(CAST(round(l_extendedprice * 100)
                                      AS BIGINT))) AS BIGINT)
               - 10000000 AS xm,
             CAST(round(1e6 * ln(greatest(CAST(round(l_quantity) AS BIGINT),
                                          1))) AS BIGINT) AS ym
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag, count(*) AS n,
             sum(CAST(xm AS HUGEINT)) AS sx, sum(CAST(ym AS HUGEINT)) AS sy,
             sum(CAST(xm AS HUGEINT) * xm) AS sxx,
             sum(CAST(ym AS HUGEINT) * ym) AS syy,
             sum(CAST(xm AS HUGEINT) * ym) AS sxy
      FROM v GROUP BY 1
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           CASE WHEN n * sxx - sx * sx <= 0 THEN 0
                ELSE CAST(round(1000000 * CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
           END AS elasticity_ppm,
           CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
                THEN 0
                ELSE CAST(round(1000000 * CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)))
                     AS BIGINT)
           END AS r_ppm
    FROM m
    """,
)
def orders_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity of quantity per return flag: the OLS slope of
    ln(quantity) on ln(price cents), plus the log-log Pearson r — the
    econometric readout ("a 1% price increase moves volume by
    elasticity%"). Log coordinates are integer MICRO-NATS per row (the
    surprisal idiom: round(1e6·ln(exact int)) — ln is the engine-shared
    libm call), so the five OLS moments are exact DECIMAL(38,0)/HUGEINT
    sums. The x coordinate is SHIFTED by a fixed 10 micro-nats
    (≈ e^10 cents ≈ $220): OLS slope and r are exactly shift-invariant,
    and the shift keeps n·Σx² ≤ ~5e37 inside DECIMAL(38,0) at a
    trillion rows, where unshifted log-price moments would overflow.
    TPC-H draws quantity independent of price, so ≈0 is the expected
    reading — the machinery is the deliverable, exactly as with the
    registered Pearson and A/A tests.

    Scale: ONE map-side-combinable aggregate; constant-time arithmetic
    on 3 rows after."""
    v = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr(
            "cast(round(1000000.0D * ln(cast(round(l_extendedprice * 100)"
            " as bigint))) as bigint) - 10000000"
        ).alias("xm"),
        F.expr(
            "cast(round(1000000.0D * ln(greatest(cast(round(l_quantity)"
            " as bigint), 1))) as bigint)"
        ).alias("ym"),
    )
    m = v.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(cast(xm as decimal(38,0)))").alias("sx"),
        F.expr("sum(cast(ym as decimal(38,0)))").alias("sy"),
        F.expr("sum(cast(xm as decimal(38,0)) * xm)").alias("sxx"),
        F.expr("sum(cast(ym as decimal(38,0)) * ym)").alias("syy"),
        F.expr("sum(cast(xm as decimal(38,0)) * ym)").alias("sxy"),
    )
    return m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr(
            "case when n * sxx - sx * sx <= 0 then cast(0 as bigint)"
            " else cast(round(1000000 * cast(n * sxy - sx * sy as double)"
            " / cast(n * sxx - sx * sx as double)) as bigint) end"
        ).alias("elasticity_ppm"),
        F.expr(
            "case when n * sxx - sx * sx <= 0 or n * syy - sy * sy <= 0"
            " then cast(0 as bigint)"
            " else cast(round(1000000 * cast(n * sxy - sx * sy as double)"
            " / sqrt(cast(n * sxx - sx * sx as double)"
            "        * cast(n * syy - sy * sy as double))) as bigint) end"
        ).alias("r_ppm"),
    )
