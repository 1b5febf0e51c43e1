"""A/B experiment readout (round 12): the two-proportion pooled z-test
over per-user conversion — the decision primitive behind every product
experiment dashboard, and the missing inferential rung next to the
registered Welch-z (means), Mann-Whitney (ranks) and chi-square
(contingency) tests: THIS one answers "did the treatment move the
conversion RATE".

Framing on this corpus: users split into deterministic arms by
``user_id % 2`` (0 = control, 1 = treatment — the synthetic assignment
every user-keyed experiment framework reduces to), a user CONVERTS if
they ever made a HIGH-VALUE purchase (value > {_CONV_VALUE}). The value
floor keeps the margin non-degenerate at every test SF — every user in
this corpus purchases SOMETHING, so "any purchase" would collapse to
conversion = 1 for all users, X = N, and a vacuously-zero z at every
scale (the round-9 survival-curve lesson: a gate no row can fail
certifies nothing).

Determinism contract (the ``graph_assortativity`` pattern): every count
and cross product is exact — the rate difference numerator
``x_t·n_c − x_c·n_t`` and the pooled-variance factors are DECIMAL(38,0)
(HUGEINT in the oracle) — and only the final z ratio touches doubles,
identical expression shape in both engines, one round at milli scale.
The significance flag derives from the ALREADY-ROUNDED integer
(|z_milli| > 1960 ≙ |z| > 1.96, two-sided α = 0.05), so both engines
flag bit-identically by construction.

Scale: one map-side-combinable collapse to (user, converted), one
4-sum global aggregate. Nothing data-sized crosses a wide Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_Z_CRIT_MILLI = 1960  # |z| > 1.96 — two-sided 5%
_CONV_VALUE = 140  # conversion = a purchase with value above this floor


@register(
    "events_ab_two_proportion",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id % 2 AS arm,
             max(CASE WHEN event_type = 'purchase'
                      AND value > {_CONV_VALUE} THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
             CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS xc,
             CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS xt
      FROM per_user
    ),
    z AS (
      SELECT nc, nt, xc, xt,
             CASE WHEN nc = 0 OR nt = 0 OR (xc + xt) = 0
                   OR (xc + xt) = (nc + nt) THEN CAST(0 AS BIGINT)
             ELSE CAST(round(1000.0 * CAST(CAST(xt AS HUGEINT) * nc
                          - CAST(xc AS HUGEINT) * nt AS DOUBLE)
                  * sqrt(CAST(nc + nt AS DOUBLE)
                         / (CAST(nc AS DOUBLE) * nt * (xc + xt)
                            * ((nc + nt) - (xc + xt))))) AS BIGINT)
             END AS z_milli
      FROM m
    )
    SELECT nc AS n_control, nt AS n_treatment,
           xc AS conv_control, xt AS conv_treatment,
           CAST(CASE WHEN nc = 0 THEN 0
                ELSE 1000000 * xc // nc END AS BIGINT) AS rate_control_ppm,
           CAST(CASE WHEN nt = 0 THEN 0
                ELSE 1000000 * xt // nt END AS BIGINT) AS rate_treatment_ppm,
           z_milli,
           abs(z_milli) > {_Z_CRIT_MILLI} AS significant
    FROM z
    """,
)
def events_ab_two_proportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion pooled z-test of high-value purchase conversion
    (value > {_CONV_VALUE}), treatment
    user_id odd vs control even: arm sizes, conversions,
    exact-ppm rates, z in milli (one rounded double off exact
    DECIMAL(38,0) cross products — module docstring), and the two-sided
    5% significance flag derived from the rounded integer.

    Scale: one combinable (user → converted) collapse, one 4-sum global
    aggregate; degenerate margins (zero conversions, all conversions, an
    empty arm) short-circuit to z = 0 rather than dividing by zero."""
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 2).alias("arm"), F.col("user_id"))
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > _CONV_VALUE),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
    )
    m = per_user.agg(
        F.expr(
            "cast(sum(case when arm = 0 then 1 else 0 end) as bigint)"
        ).alias("nc"),
        F.expr(
            "cast(sum(case when arm = 1 then 1 else 0 end) as bigint)"
        ).alias("nt"),
        F.expr(
            "cast(sum(case when arm = 0 then conv else 0 end) as bigint)"
        ).alias("xc"),
        F.expr(
            "cast(sum(case when arm = 1 then conv else 0 end) as bigint)"
        ).alias("xt"),
    )
    z = m.select(
        "nc",
        "nt",
        "xc",
        "xt",
        F.expr(
            "case when nc = 0 or nt = 0 or (xc + xt) = 0"
            " or (xc + xt) = (nc + nt) then cast(0 as bigint)"
            " else cast(round(1000.0D * cast(cast(xt as decimal(38,0)) * nc"
            " - cast(xc as decimal(38,0)) * nt as double)"
            " * sqrt(cast(nc + nt as double)"
            " / (cast(nc as double) * nt * (xc + xt)"
            " * ((nc + nt) - (xc + xt))))) as bigint)"
            " end"
        ).alias("z_milli"),
    )
    return z.select(
        F.col("nc").alias("n_control"),
        F.col("nt").alias("n_treatment"),
        F.col("xc").alias("conv_control"),
        F.col("xt").alias("conv_treatment"),
        F.expr(
            "cast(case when nc = 0 then 0"
            " else 1000000 * xc div nc end as bigint)"
        ).alias("rate_control_ppm"),
        F.expr(
            "cast(case when nt = 0 then 0"
            " else 1000000 * xt div nt end as bigint)"
        ).alias("rate_treatment_ppm"),
        "z_milli",
        (F.abs(F.col("z_milli")) > _Z_CRIT_MILLI).alias("significant"),
    )


events_ab_two_proportion.__doc__ = events_ab_two_proportion.__doc__.replace(
    "{_CONV_VALUE}", str(_CONV_VALUE)
)
__doc__ = __doc__.replace("{_CONV_VALUE}", str(_CONV_VALUE))
