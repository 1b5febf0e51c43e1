"""Embedding preprocessing operators (round 2) — the per-vector transforms
an ANN index build runs before any of the similarity/dedup queries.

Both are pure narrow projections (no shuffle, no Python): JVM higher-order
functions over the array column, oracle-checked cell-by-cell. At 100 TB
these run in the same scan as the index write — the point is that Spark
expresses them without materializing an intermediate corpus.

Registered after the proven tail — outside the driver's current sweep
window (local-oracle-proven; rotated in a later round).
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
    SELECT vec_id,
           round({_NORM_SQL}, 4) AS norm,
           array_to_string(list_transform(embedding,
             x -> printf('%.4f', round(CAST(x AS DOUBLE) / {_NORM_SQL}, 4) + 0.0)),
             ',') AS unit_vec
    FROM embeddings
    """,
)
def emb_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization: unit vectors make cosine a plain dot product, which
    halves the work in every downstream GEMM. Narrow projection — one scan,
    zero exchanges.

    Serialization contract: the vector is emitted as a C-format
    ('%.4f'-per-cell, comma-joined) STRING, not an array — array-typed
    result columns are an output shape the external hash gate has never
    certified, and engine float-to-string rules differ ('1.0E-4' vs
    '0.0001') where printf does not. The ``+ 0.0`` after the round (both
    engines) collapses IEEE ``-0.0`` to ``+0.0``."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(F.expr(_NORM_SPARK), 4).alias("norm"),
        F.expr(
            f"array_join(transform(embedding,"
            f" x -> format_string('%.4f',"
            f"   round(cast(x as double) / ({_NORM_SPARK}), 4) + cast(0 as double))),"
            f" ',')"
        ).alias("unit_vec"),
    )


@register(
    "emb_quantize_int8",
    oracle="""
    SELECT vec_id,
           round(CAST(list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))) AS DOUBLE) / 127, 6) AS scale,
           array_to_string(list_transform(embedding,
             x -> CAST(CAST(round(CAST(x AS DOUBLE)
                  / (list_max(list_transform(embedding,
                       y -> abs(CAST(y AS DOUBLE)))) / 127)) AS INTEGER) AS VARCHAR)),
             ',') AS qvec
    FROM embeddings
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (absmax / 127 scale): 4× less
    index storage and memory traffic — the standard ANN compression trade.
    Integer cells are engine-exact; the scale factor (rounded) rides along
    for dequantization. Pure projection, no shuffle. Emitted comma-joined
    (see emb_l2_normalize: array result columns are an uncertified output
    shape for the external hash gate; integer-to-string is engine-stable)."""
    emb = load_table(spark, sf_dir, "embeddings")
    absmax = (
        "array_max(transform(embedding, x -> abs(cast(x as double))))"
    )
    return emb.select(
        "vec_id",
        F.round(F.expr(f"{absmax} / 127"), 6).alias("scale"),
        F.expr(
            f"array_join(transform(embedding,"
            f" x -> cast(cast(round(cast(x as double) / ({absmax} / 127)) as int)"
            f" as string)), ',')"
        ).alias("qvec"),
    )
