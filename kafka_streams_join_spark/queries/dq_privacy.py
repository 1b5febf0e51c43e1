"""Privacy / governance audits (round 9, wave 6) — the data-release
side of data quality, absent from the dq_* family until now:

- ``dq_k_anonymity`` — the k-anonymity audit of a release projection:
  group the would-be-published quasi-identifier columns and report how
  many equivalence classes (and how many ROWS) fall below k. This is
  the check a governance gate runs before any aggregate extract ships;
  the release under audit here is the (event_type, day-of-week, 6-hour
  band) projection of the events table — realistic telemetry-release
  granularity, derived with the repo's integer epoch arithmetic.
- ``dq_dp_noisy_counts`` — the Laplace mechanism for ε-DP counts,
  executed end to end: per-type true count, the ε-calibrated scale
  (sensitivity 1), a uniform draw, and the inverse-CDF Laplace noise
  added to the released count. DETERMINISM CAVEAT, stated loudly: the
  "draw" here is the repo's 60-bit md5 of the group key — a FROZEN
  seed, so both engines release identical numbers and the mechanism is
  hash-certifiable. Frozen noise provides NO privacy (a real deployment
  draws fresh randomness per release; swap the hash input for a salt
  per release id); what this query certifies is the MECHANISM — scale
  calibration, symmetric inverse CDF, integer rounding — which is the
  part an engine owns.

Exactness: group sizes and violation counts are pure integers; the
Laplace inverse CDF is one fixed-shape double expression over the
shared md5-uniform (ln of a clamped operand — the engine-shared libm
contract every surprisal query certifies), rounded once to an integer
noise term.

Scale: both queries are one map-side-combinable aggregate over the
release projection (k-anonymity adds one bounded re-aggregate of group
sizes). Nothing else exists in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_K = 5  # anonymity threshold under audit
_EPS_MILLI = 1000  # ε = 1.0; Laplace scale b = sensitivity/ε = 1.0

# 60-bit md5 uniform of the release group key, in [0, 1)
_U_SPARK = (
    "cast(conv(substring(md5(concat('dp1_', event_type)), 1, 15), 16, 10)"
    " as bigint) / cast(1152921504606846976 as double)"
)
_U_SQL = (
    "CAST(('0x' || substr(md5('dp1_' || event_type), 1, 15)) AS BIGINT)"
    " / CAST(1152921504606846976 AS DOUBLE)"
)


@register(
    "dq_k_anonymity",
    oracle=f"""
    WITH rel AS (
      SELECT event_type,
             (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 3) % 7 AS dow,
             ((CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24) // 6
               AS hr_band
      FROM events
    ),
    g AS (
      SELECT event_type, dow, hr_band, CAST(count(*) AS BIGINT) AS sz
      FROM rel GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(sz) AS BIGINT) AS n_rows,
           CAST(min(sz) AS BIGINT) AS min_group_size,
           CAST(sum(CASE WHEN sz < {_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(sum(CASE WHEN sz < {_K} THEN sz ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(CAST(sum(CASE WHEN sz < {_K} THEN sz ELSE 0 END) AS HUGEINT)
                * 1000000 // greatest(sum(sz), 1) AS BIGINT)
             AS rows_at_risk_ppm
    FROM g
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity (k={_K}) audit of the (event_type, dow, 6-hour band)
    release projection: equivalence-class count, the smallest class, and
    how many classes/rows would be re-identifiable below k (module
    docstring). One row; a nonzero ``rows_at_risk`` is the governance
    gate's stop signal.

    Scale: one aggregate to the bounded quasi-identifier lattice
    (|types|·7·4 classes), one constant-size re-aggregate."""
    rel = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("(unix_timestamp(ts) div 86400 + 3) % 7").alias("dow"),
        F.expr("((unix_timestamp(ts) div 3600) % 24) div 6").alias(
            "hr_band"
        ),
    )
    g = rel.groupBy("event_type", "dow", "hr_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.expr("cast(sum(sz) as bigint)").alias("n_rows"),
        F.expr("cast(min(sz) as bigint)").alias("min_group_size"),
        F.expr(
            f"cast(sum(case when sz < {_K} then 1 else 0 end) as bigint)"
        ).alias("n_violating_groups"),
        F.expr(
            f"cast(sum(case when sz < {_K} then sz else 0 end) as bigint)"
        ).alias("rows_at_risk"),
        F.expr(
            f"cast(cast(sum(case when sz < {_K} then sz else 0 end)"
            " as decimal(38,0)) * 1000000 div greatest(sum(sz), 1)"
            " as bigint)"
        ).alias("rows_at_risk_ppm"),
    )


@register(
    "dq_dp_noisy_counts",
    oracle=f"""
    WITH c AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events
      GROUP BY 1
    ),
    u AS (
      SELECT event_type, n, {_U_SQL} - 0.5 AS ud FROM c
    )
    SELECT event_type, n AS true_count,
           {_EPS_MILLI} AS epsilon_milli,
           CAST(round(-1000 * sign(ud)
                * ln(greatest(1 - 2 * abs(ud), 1e-12))) AS BIGINT)
             AS noise_milli,
           n + CAST(round(-1 * sign(ud)
                * ln(greatest(1 - 2 * abs(ud), 1e-12))) AS BIGINT)
             AS noisy_count
    FROM u
    """,
)
def dq_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism ε-DP released counts per event type (ε=1,
    sensitivity 1): the true count, the realized noise in milli, and
    the released noisy count — with the FROZEN-seed caveat stated in
    the module docstring (the hash draw makes the mechanism
    hash-certifiable across engines; real privacy requires fresh
    per-release randomness in its place). The inverse CDF is the
    symmetric −b·sgn(u)·ln(1−2|u|) over the md5 uniform, clamped away
    from ln(0).

    Scale: one map-side-combinable count; constant-time arithmetic per
    released group."""
    c = load_table(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    u = c.select(
        "event_type", "n", F.expr(f"{_U_SPARK} - 0.5D").alias("ud")
    )
    return u.select(
        "event_type",
        F.col("n").alias("true_count"),
        F.lit(_EPS_MILLI).cast("int").alias("epsilon_milli"),
        F.expr(
            "cast(round(-1000 * sign(ud)"
            " * ln(greatest(1 - 2 * abs(ud), 1e-12))) as bigint)"
        ).alias("noise_milli"),
        F.expr(
            "n + cast(round(-1 * sign(ud)"
            " * ln(greatest(1 - 2 * abs(ud), 1e-12))) as bigint)"
        ).alias("noisy_count"),
    )
