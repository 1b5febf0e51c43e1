"""Embedding-space isotropy audit (round 11): per-dimension variance
spread and the participation-ratio effective dimensionality — the
health check a platform runs on an embedding column BEFORE trusting
any of the similarity tiers built on it (anisotropic spaces — a few
dominant directions — are why raw cosine search degrades; this is the
number that says whether whitening/centering is needed, and the
fit-time sibling of ``emb_dim_profile``/``emb_covariance``).

Determinism: per-dim ``var_pop`` is rounded to integer MICRO units
before anything else touches it (the ``emb_covariance`` 6-dp contract
— drowns partition-order float drift); every downstream statistic is
then pure integer arithmetic on those 64 exact ints, including the
participation ratio ``(Σv)² / Σv²`` (BIGINT-safe: Σv ≤ 64·2²⁰ micro)
and the min/max ratio — both truncating-div outputs, no second float.

Accepted boundary risk (stated per ADVICE r11, shared verbatim with
``emb_covariance``/``emb_pca_project_fixed``): ``var_pop`` is an
algebraic float aggregate whose last-ulp value depends on partition
and summation order, so a dimension whose true variance sits within
one ulp of a .5-micro rounding boundary COULD round differently in
Spark vs DuckDB and fail a parity hash. This is the repo-wide 6-dp
contract trade-off — the alternative (exact integer moments on a
quantized input lattice) changes the measured statistic itself
(variance of quantized x, not of x). Empirically the margin is wide:
across all 64 dims at sf0.001/0.01/0.1 the closest ``1e6·var_pop``
fractional part sits ≥ 1.2e-3 micro from a .5 boundary (measured),
while partition-order drift is bounded by a few ulps ≈ 1e-11 micro at
these magnitudes — an ~10⁸× safety factor, and the query has been
hash-green at 3 SFs since registration. A production deployment
wanting zero risk would adopt the lattice variant and re-baseline.

Scale: one map-side explode to (dim, x) cells (the covariance
diagonal), one algebraic aggregate (partials collapse per partition
to 64 cells), then constant-size arithmetic. O(partitions · d) moves,
independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_DIM = 64


@register(
    "emb_isotropy_audit",
    oracle=f"""
    WITH v AS (
      SELECT d,
             CAST(round(1000000 * var_pop(CAST(embedding[d] AS DOUBLE)))
                  AS BIGINT) AS vm
      FROM embeddings, unnest(generate_series(1, {_DIM})) AS t(d)
      GROUP BY d
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_dims,
             CAST(min(vm) AS BIGINT) AS min_var_micro,
             CAST(max(vm) AS BIGINT) AS max_var_micro,
             CAST(sum(vm) AS BIGINT) AS sv,
             sum(CAST(vm AS HUGEINT) * vm) AS svv
      FROM v
    )
    SELECT n_dims, min_var_micro, max_var_micro,
           CAST(CASE WHEN max_var_micro = 0 THEN 0
                     ELSE (1000000 * min_var_micro) // max_var_micro
                END AS BIGINT) AS var_ratio_ppm,
           CAST(CASE WHEN sv = 0 THEN 0
                     ELSE (1000000 * max_var_micro) // sv
                END AS BIGINT) AS top_dim_share_ppm,
           CAST(CASE WHEN svv = 0 THEN 0
                     ELSE (1000 * CAST(sv AS HUGEINT) * sv) // svv
                END AS BIGINT) AS effective_dims_milli
    FROM m
    """,
)
def emb_isotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row isotropy report over the embedding column: the weakest /
    strongest dimension variances (micro units, 6-dp-rounded before any
    arithmetic — module docstring), their ratio (1.0 = perfectly
    isotropic), the strongest dimension's share of total variance, and
    the participation-ratio effective dimensionality ``(Σv)²/Σv²``
    (milli — 64.0 means all dimensions carry signal; a collapsed space
    reads single digits). All outputs truncating-div integers.

    Scale: diagonal-cell explode + algebraic variance; constant-size
    tail."""
    cells = load_table(spark, sf_dir, "embeddings").select(
        F.explode(
            F.expr(
                f"transform(sequence(1, {_DIM}), d -> named_struct("
                "'d', d, 'x', cast(embedding[d - 1] as double)))"
            )
        ).alias("c")
    ).select("c.d", "c.x")
    v = cells.groupBy("d").agg(
        F.expr(
            "cast(round(1000000 * var_pop(x)) as bigint)"
        ).alias("vm")
    )
    m = v.agg(
        F.expr("cast(count(1) as bigint)").alias("n_dims"),
        F.expr("cast(min(vm) as bigint)").alias("min_var_micro"),
        F.expr("cast(max(vm) as bigint)").alias("max_var_micro"),
        F.expr("cast(sum(vm) as bigint)").alias("sv"),
        F.expr("sum(cast(vm as decimal(38,0)) * vm)").alias("svv"),
    )
    return m.select(
        "n_dims",
        "min_var_micro",
        "max_var_micro",
        F.expr(
            "cast(case when max_var_micro = 0 then 0"
            " else (1000000 * min_var_micro) div max_var_micro"
            " end as bigint)"
        ).alias("var_ratio_ppm"),
        F.expr(
            "cast(case when sv = 0 then 0"
            " else (1000000 * max_var_micro) div sv end as bigint)"
        ).alias("top_dim_share_ppm"),
        F.expr(
            "cast(case when svv = 0 then 0"
            " else (1000 * cast(sv as decimal(38,0)) * sv) div svv"
            " end as bigint)"
        ).alias("effective_dims_milli"),
    )
