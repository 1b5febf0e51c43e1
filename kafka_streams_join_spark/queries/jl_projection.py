"""Johnson–Lindenstrauss random projection with a FROZEN sign matrix
(round 8 — the VERDICT-r7 "JL random projection, pca_fixed idiom" item).

Two queries over the 64-dim embedding table:

- ``emb_jl_project`` — the transform: 16 Rademacher components
  j_k = Σ_d s_kd·e_d with s_kd ∈ {+1, −1} derived from md5("jl8_k_d")
  at module import (hashlib is bit-stable everywhere — no RNG
  reproducibility caveat), inlined as literals into BOTH the Spark
  expression and the DuckDB oracle exactly like
  ``emb_pca_project_fixed``'s eigenbasis. ±1.0 multiplication is exact,
  both engines evaluate the identical left-associative 64-term tree, so
  scores are bit-equal before the 6-dp rounding.

- ``emb_jl_distortion`` — the lemma audit: per vector the exact-ppm
  ratio ||Sx||² / (16·||x||²) (E[(s_k·x)²] = ||x||² for Rademacher
  rows, so the expectation is 1e6 ppm), micro-rounded per ROW and
  bucketed into quarter-expectation bins — the distributional-JL
  statement on norms,
  which by linearity of S is the same guarantee pairwise distances get
  (S(u−v) = Su − Sv). A projection whose histogram drifts off the
  1e6-centered bell is a broken random matrix; this is the check a
  100-TB pipeline runs before trusting 4× cheaper ANN over projected
  vectors.

Scale: both queries are single-scan, zero-shuffle flat codegen
expressions (the distortion ends in an ≤ 8-group aggregate); no Python,
no UDFs, nothing wide ever enters an Exchange.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_JL_IN = 64
_JL_OUT = 16


def _sign(k: int, d: int) -> float:
    """+1.0/−1.0 from the parity of md5('jl8_{k}_{d}')'s first byte —
    frozen, engine-free, and reviewable (the pca_frozen.py role without
    a fit step to checkpoint)."""
    h = hashlib.md5(f"jl8_{k}_{d}".encode()).digest()[0]
    return 1.0 if h % 2 == 0 else -1.0


JL_SIGNS = [[_sign(k, d) for d in range(_JL_IN)] for k in range(_JL_OUT)]


def _proj_spark(k: int) -> str:
    return " + ".join(
        f"({JL_SIGNS[k][d]!r}) * cast(embedding[{d}] as double)"
        for d in range(_JL_IN)
    )


def _proj_sql(k: int) -> str:
    return " + ".join(
        f"({JL_SIGNS[k][d]!r}) * CAST(embedding[{d + 1}] AS DOUBLE)"
        for d in range(_JL_IN)
    )


_NFULL_SPARK = " + ".join(
    f"cast(embedding[{d}] as double) * cast(embedding[{d}] as double)"
    for d in range(_JL_IN)
)
_NFULL_SQL = " + ".join(
    f"CAST(embedding[{d + 1}] AS DOUBLE) * CAST(embedding[{d + 1}] AS DOUBLE)"
    for d in range(_JL_IN)
)
_NPROJ = " + ".join(f"j{k} * j{k}" for k in range(_JL_OUT))


@register(
    "emb_jl_project",
    oracle="SELECT vec_id, "
    + ", ".join(f"round({_proj_sql(k)}, 6) AS j{k}" for k in range(_JL_OUT))
    + " FROM embeddings",
)
def emb_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL projection 64 → 16 dims with the frozen Rademacher matrix: each
    j_k is a flat codegen'd 64-term literal expression (module docstring
    has the full contract) — the transform half a production pipeline
    runs on every ingest batch to feed projected-space ANN.

    Scale: one scan, zero shuffles, zero Python."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        *[
            F.round(F.expr(_proj_spark(k)), 6).alias(f"j{k}")
            for k in range(_JL_OUT)
        ],
    )


@register(
    "emb_jl_distortion",
    oracle=f"""
    WITH proj AS (
      SELECT vec_id,
             {", ".join(f"({_proj_sql(k)}) AS j{k}" for k in range(_JL_OUT))},
             ({_NFULL_SQL}) AS nfull
      FROM embeddings
    ),
    ratio AS (
      SELECT vec_id,
             CAST(round(1e6 * ({_NPROJ}) / (16.0 * nfull)) AS BIGINT)
               AS ratio_ppm
      FROM proj WHERE nfull > 0
    )
    SELECT least(ratio_ppm // 250000, 7) AS bucket,
           count(*) AS n_vecs,
           min(ratio_ppm) AS min_ppm,
           max(ratio_ppm) AS max_ppm
    FROM ratio GROUP BY 1
    """,
)
def emb_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distortion audit of the frozen JL matrix: per-vector exact-ppm
    norm ratio ||Sx||²/(16·||x||²), micro-rounded per row (the shared
    double is bit-equal — identical flat expression trees — so the
    round-to-integer is engine-consistent), bucketed into quarters of
    the expectation (bucket b covers [b·0.25e6, (b+1)·0.25e6) ppm,
    clamped at 7). n_vecs concentrated in buckets 3-4 ≈ ratios near 1
    is the JL lemma holding; mass in the tails means the projection is
    lying about distances.

    Scale: single scan, the 16 projections and both norms are one
    codegen stage, then an ≤ 8-group aggregate. Zero wide columns past
    the scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    proj = emb.select(
        "vec_id",
        *[F.expr(_proj_spark(k)).alias(f"j{k}") for k in range(_JL_OUT)],
        F.expr(_NFULL_SPARK).alias("nfull"),
    )
    ratio = proj.filter(F.col("nfull") > 0).select(
        F.expr(
            f"cast(round(1000000.0D * ({_NPROJ}) / (16.0D * nfull)) as bigint)"
        ).alias("ratio_ppm")
    )
    return (
        ratio.groupBy(
            F.expr("least(ratio_ppm div 250000, 7)").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("ratio_ppm").alias("min_ppm"),
            F.max("ratio_ppm").alias("max_ppm"),
        )
    )
