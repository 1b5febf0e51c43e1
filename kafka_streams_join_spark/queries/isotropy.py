"""Embedding-space isotropy audit (round 11; LATTICE exact-integer form
since round 13): per-dimension variance spread and the participation-ratio
effective dimensionality — the health check a platform runs on an
embedding column BEFORE trusting any of the similarity tiers built on it
(anisotropic spaces — a few dominant directions — are why raw cosine
search degrades; this is the number that says whether whitening/centering
is needed, and the fit-time sibling of ``emb_dim_profile``/
``emb_covariance``).

Determinism (round-13 re-baseline, VERDICT r12 item 6): the round-11 form
rounded a FLOAT ``var_pop`` to micro units and certified on a measured
1.2e-3-micro margin to the nearest rounding boundary — honest but the
registry's only certification resting on a margin instead of a proof. The
lattice form removes the float aggregate entirely: each coordinate is
quantized ONCE, element-wise, to the micro lattice ``q = floor(x·10⁶ +
0.5)`` (one double multiply-add per value — bit-identical in Spark and
DuckDB, no summation involved), and the per-dimension variance is then
EXACT integer moments on the lattice: ``vm = (n·Σq² − (Σq)²) div
(n²·10⁶)`` (micro units of variance, truncating div). Every number after
quantization is integer arithmetic — partition order, partial-aggregation
tree shape, and engine summation order cannot move any digit. The measured
statistic is the variance of the QUANTIZED coordinates, which differs from
the float variance by O(lattice step² = 1e-12) — far below the micro
reporting unit.

Overflow audit at the 100-TB contract: |x| ≤ ~2 → |q| ≤ ~2·10⁶, q² ≤
4·10¹² (int64-safe per element); Σq and Σq² accumulate in DECIMAL(38,0)/
HUGEINT, so at n = 10⁹ vectors n·Σq² ≤ 10⁹·4·10²¹ = 4·10³⁰ < 10³⁸.

Scale: one map-side explode to (dim, q) cells, one integer aggregate
(partials collapse per partition to 64 cells), then constant-size
arithmetic. O(partitions · d) moves, independent of corpus size.
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
    WITH q AS (
      SELECT d,
             CAST(floor(CAST(embedding[d] AS DOUBLE) * 1000000 + 0.5)
                  AS BIGINT) AS q
      FROM embeddings, unnest(generate_series(1, {_DIM})) AS t(d)
    ),
    v AS (
      SELECT d,
             CAST((count(*) * sum(q * q) - sum(q) * sum(q))
                  // (CAST(count(*) AS HUGEINT) * count(*) * 1000000)
                  AS BIGINT) AS vm
      FROM q
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
    strongest dimension variances (micro units — EXACT integer moments on
    the micro-quantized lattice, module docstring), their ratio (1.0 =
    perfectly isotropic), the strongest dimension's share of total
    variance, and the participation-ratio effective dimensionality
    ``(Σv)²/Σv²`` (milli — 64.0 means all dimensions carry signal; a
    collapsed space reads single digits). All outputs truncating-div
    integers; no float aggregate anywhere.

    Scale: diagonal-cell explode + integer moment aggregate;
    constant-size tail."""
    cells = load_table(spark, sf_dir, "embeddings").select(
        F.explode(
            F.expr(
                f"transform(sequence(1, {_DIM}), d -> named_struct("
                "'d', d, 'q', cast(floor(cast(embedding[d - 1] as double)"
                " * 1000000 + 0.5) as bigint)))"
            )
        ).alias("c")
    ).select("c.d", "c.q")
    v = cells.groupBy("d").agg(
        F.expr(
            "cast((count(1) * sum(cast(q as decimal(38,0)) * q)"
            " - sum(cast(q as decimal(38,0))) * sum(cast(q as decimal(38,0))))"
            " div (cast(count(1) as decimal(38,0)) * count(1) * 1000000)"
            " as bigint)"
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


@register(
    "emb_isotropy_by_label",
    oracle=f"""
    WITH q AS (
      SELECT label, d,
             CAST(floor(CAST(embedding[d] AS DOUBLE) * 1000000 + 0.5)
                  AS BIGINT) AS q
      FROM embeddings, unnest(generate_series(1, {_DIM})) AS t(d)
    ),
    v AS (
      SELECT label, d,
             CAST((count(*) * sum(q * q) - sum(q) * sum(q))
                  // (CAST(count(*) AS HUGEINT) * count(*) * 1000000)
                  AS BIGINT) AS vm,
             count(*) AS n_vecs
      FROM q
      GROUP BY label, d
    )
    SELECT label,
           CAST(any_value(n_vecs) AS BIGINT) AS n_vecs,
           CAST(min(vm) AS BIGINT) AS min_var_micro,
           CAST(max(vm) AS BIGINT) AS max_var_micro,
           CAST(CASE WHEN max(vm) = 0 THEN 0
                     ELSE (1000000 * min(vm)) // max(vm)
                END AS BIGINT) AS var_ratio_ppm,
           CAST(CASE WHEN sum(CAST(vm AS HUGEINT) * vm) = 0 THEN 0
                     ELSE (1000 * CAST(sum(vm) AS HUGEINT) * sum(vm))
                          // sum(CAST(vm AS HUGEINT) * vm)
                END AS BIGINT) AS effective_dims_milli
    FROM v
    GROUP BY label
    """,
)
def emb_isotropy_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-LABEL isotropy profile (round 13): the lattice exact-integer
    isotropy statistics of ``emb_isotropy_audit``, grouped by the corpus
    label — the fairness sibling of the global audit. A healthy global
    participation ratio can hide one collapsed subpopulation (a label
    whose vectors all point one way retrieves terribly even when the
    corpus looks isotropic); this is the per-slice readout that catches
    it. Same contract as the global audit: one element-wise micro-lattice
    quantization, then pure integer moments — no float aggregate, exact
    at any partitioning.

    Scale: (label, dim, q) cells collapse map-side to labels × 64 rows;
    the tail is constant-size per label."""
    cells = load_table(spark, sf_dir, "embeddings").select(
        "label",
        F.explode(
            F.expr(
                f"transform(sequence(1, {_DIM}), d -> named_struct("
                "'d', d, 'q', cast(floor(cast(embedding[d - 1] as double)"
                " * 1000000 + 0.5) as bigint)))"
            )
        ).alias("c"),
    ).select("label", "c.d", "c.q")
    v = cells.groupBy("label", "d").agg(
        F.expr(
            "cast((count(1) * sum(cast(q as decimal(38,0)) * q)"
            " - sum(cast(q as decimal(38,0))) * sum(cast(q as decimal(38,0))))"
            " div (cast(count(1) as decimal(38,0)) * count(1) * 1000000)"
            " as bigint)"
        ).alias("vm"),
        F.count(F.lit(1)).alias("n_vecs"),
    )
    return v.groupBy("label").agg(
        F.expr("cast(any_value(n_vecs) as bigint)").alias("n_vecs"),
        F.expr("cast(min(vm) as bigint)").alias("min_var_micro"),
        F.expr("cast(max(vm) as bigint)").alias("max_var_micro"),
        F.expr(
            "cast(case when max(vm) = 0 then 0"
            " else (1000000 * min(vm)) div max(vm) end as bigint)"
        ).alias("var_ratio_ppm"),
        F.expr(
            "cast(case when sum(cast(vm as decimal(38,0)) * vm) = 0 then 0"
            " else (1000 * cast(sum(vm) as decimal(38,0)) * sum(vm))"
            " div sum(cast(vm as decimal(38,0)) * vm) end as bigint)"
        ).alias("effective_dims_milli"),
    )
