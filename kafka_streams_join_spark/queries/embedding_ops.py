"""Embedding preprocessing operators (round 2) — the per-vector transforms
an ANN index build runs before any of the similarity/dedup queries.

Both are pure narrow projections (no shuffle, no Python): JVM higher-order
functions over the array column, oracle-checked cell-by-cell. At 100 TB
these run in the same scan as the index write — the point is that Spark
expresses them without materializing an intermediate corpus.

Sweep placement is automatic: queries/__init__.py sorts driver-unproven
queries into the sweep window from the checked-in CORRECTNESS_r*.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_NORM_SQL = (
    "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)
_NORM_SPARK = (
    "sqrt(aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)),"
    " cast(0 as double), (acc, v) -> acc + v))"
)


@register(
    "emb_l2_normalize",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding, {_NORM_SQL} AS nrm FROM embeddings
    )
    SELECT vec_id,
           round(nrm, 4) AS norm,
           array_to_string(list_transform(embedding,
             x -> printf('%.4f', CASE WHEN nrm = 0 THEN 0.0
                  ELSE round(CAST(x AS DOUBLE) / nrm, 4) + 0.0 END)),
             ',') AS unit_vec
    FROM n
    """,
)
def emb_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization: unit vectors make cosine a plain dot product, which
    halves the work in every downstream GEMM. Narrow projection — one scan,
    zero exchanges. The norm is computed ONCE in a prior projection and
    captured by the per-cell lambda — embedding the aggregate inside the
    lambda would re-fold the whole array per cell, O(dim²) interpreted work
    per row. A zero vector normalizes to zeros (0/0 would be NaN, which the
    engines serialize differently).

    Serialization contract: the vector is emitted as a C-format
    ('%.4f'-per-cell, comma-joined) STRING, not an array — array-typed
    result columns are an output shape the external hash gate has never
    certified, and engine float-to-string rules differ ('1.0E-4' vs
    '0.0001') where printf does not. The ``+ 0.0`` after the round (both
    engines) collapses IEEE ``-0.0`` to ``+0.0``."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", F.expr(_NORM_SPARK)
    )
    return emb.select(
        "vec_id",
        F.round(F.col("nrm"), 4).alias("norm"),
        F.expr(
            "array_join(transform(embedding,"
            " x -> format_string('%.4f',"
            "   CASE WHEN nrm = cast(0 as double) THEN cast(0 as double)"
            "   ELSE round(cast(x as double) / nrm, 4) + cast(0 as double) END)),"
            " ',')"
        ).alias("unit_vec"),
    )


@register(
    "emb_quantize_int8",
    oracle="""
    WITH m AS (
      SELECT vec_id, embedding,
             CAST(list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))) AS DOUBLE) AS am
      FROM embeddings
    )
    SELECT vec_id,
           round(am / 127, 6) AS scale,
           array_to_string(list_transform(embedding,
             x -> CAST(CAST(CASE WHEN am = 0 THEN 0
                  ELSE round(CAST(x AS DOUBLE) / (am / 127)) END
                  AS INTEGER) AS VARCHAR)),
             ',') AS qvec
    FROM m
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (absmax / 127 scale): 4× less
    index storage and memory traffic — the standard ANN compression trade.
    Integer cells are engine-exact; the scale factor (rounded) rides along
    for dequantization. Pure projection, no shuffle; absmax is hoisted out
    of the per-cell lambda (same O(dim²) trap as the norm) and a zero
    vector quantizes to zeros instead of 0/0 — Spark's non-ANSI NaN→int
    cast yields 0 where DuckDB's raises, so the guard is also what keeps
    the oracle runnable. Emitted comma-joined (see emb_l2_normalize: array
    result columns are an uncertified output shape for the external hash
    gate; integer-to-string is engine-stable)."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "am", F.expr("array_max(transform(embedding, x -> abs(cast(x as double))))")
    )
    return emb.select(
        "vec_id",
        F.round(F.col("am") / 127, 6).alias("scale"),
        F.expr(
            "array_join(transform(embedding,"
            " x -> cast(cast(CASE WHEN am = cast(0 as double) THEN cast(0 as double)"
            "   ELSE round(cast(x as double) / (am / 127)) END as int)"
            " as string)), ',')"
        ).alias("qvec"),
    )
