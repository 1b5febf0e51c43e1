"""Binary (sign-bit) embedding quantization + Hamming-distance top-k
(round 11) — the 1-bit rung under the registered quantization ladder
(float32 brute force → int8 SQ → PQ → IVFPQ/ADC in ``similarity.py`` /
``pq.py``): 64 dims collapse to 64 BITS (two packed 32-bit words in
BIGINTs), a 32× memory cut, and candidate scoring becomes two XORs and
two popcounts per pair — integer ALU work that stays entirely inside
whole-stage codegen, no vector math at all. This is the production
first-pass filter for billion-vector search (binary embeddings are the
standard Hamming-recall trick); the companion audit
``sim_hamming_recall`` measures exactly what the 1-bit cut costs
against the certified float32 ground truth.

Determinism contract: the sign bit is ``embedding[d] >= 0`` on the raw
parquet FLOAT — both engines read the identical value and no arithmetic
precedes the comparison, so the packed words are bit-identical by
construction; every output column in this module is an exact integer
(no rounding idiom needed anywhere).

Scale contract: packing is one projection over the corpus (map-only);
the query side is the shared bounded admission gate (``vec_id %
QUERY_STRIDE = 0``) and BROADCASTS; distance + per-query top-k runs as
rank-over-window with a Partial ``WindowGroupLimit`` BEFORE the
exchange, so each map task forwards at most Q·K candidate rows — the
shuffle is bounded by queries × K × partitions, never by the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register
from .similarity import (
    QUERY_STRIDE,
    TOP_K,
    query_admission,
    sim_topk_bruteforce,
)

# packed sign words, 0-based dims: lo = bits 0..31, hi = bits 32..63.
# Built with shiftleft into a BIGINT accumulator — each word < 2^32, no
# sign-bit hazard. Spark arrays index 0-based; DuckDB lists 1-based.
_PACK_LO = (
    "aggregate(sequence(0, 31), cast(0 as bigint), (acc, d) -> acc"
    " + if(embedding[d] >= cast(0 as float),"
    " shiftleft(cast(1 as bigint), d), cast(0 as bigint)))"
)
_PACK_HI = (
    "aggregate(sequence(32, 63), cast(0 as bigint), (acc, d) -> acc"
    " + if(embedding[d] >= cast(0 as float),"
    " shiftleft(cast(1 as bigint), d - 32), cast(0 as bigint)))"
)

_PACKED_SQL = """
  bits AS (
    SELECT vec_id, d,
           CASE WHEN embedding[d + 1] >= 0 THEN 1 ELSE 0 END AS b
    FROM embeddings, generate_series(0, 63) t(d)
  ),
  packed AS (
    SELECT vec_id,
           CAST(sum(CASE WHEN d < 32 THEN CAST(b AS BIGINT) << d
                         ELSE 0 END) AS BIGINT) AS lo,
           CAST(sum(CASE WHEN d >= 32 THEN CAST(b AS BIGINT) << (d - 32)
                         ELSE 0 END) AS BIGINT) AS hi
    FROM bits GROUP BY vec_id
  )
"""

_HAM_TOPK_SQL = f"""
    WITH {_PACKED_SQL},
    q AS (SELECT * FROM packed WHERE vec_id % {QUERY_STRIDE} = 0),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(bit_count(xor(q.lo, c.lo))
                  + bit_count(xor(q.hi, c.hi)) AS BIGINT) AS hamming
      FROM q JOIN packed c ON c.vec_id != q.vec_id
    ),
    rk AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rnk, hamming
    FROM rk WHERE rn <= {TOP_K}
"""


def _packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(_PACK_LO).alias("lo"),
        F.expr(_PACK_HI).alias("hi"),
    )


@register("sim_binary_hamming_topk", oracle=_HAM_TOPK_SQL)
def sim_binary_hamming_topk(
    spark: SparkSession, sf_dir: str, query_batch=None
) -> DataFrame:
    """Hamming top-k over sign-quantized embeddings: every corpus vector
    packs to two 32-bit sign words; each admitted query scans the packed
    corpus with XOR+popcount and keeps its K nearest by Hamming distance
    (self excluded and ties broken by neighbor_id — the brute-force
    family contract). Module docstring has the determinism and scale
    contracts; the candidate stream is cut to Q·K per map task by the
    Partial WindowGroupLimit before any shuffle."""
    packed = _packed(spark, sf_dir)
    q = query_admission(packed, query_batch).select(
        F.col("vec_id").alias("query_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    scored = (
        packed.join(
            F.broadcast(q), F.col("vec_id") != F.col("query_id")
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(
                "cast(bit_count(qlo ^ lo) + bit_count(qhi ^ hi) as bigint)"
            ).alias("hamming"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rn").cast("bigint").alias("rnk"),
            "hamming",
        )
    )


# The exact tier is the REGISTERED brute-force query (hash-certified
# cross-engine since round 2) — the recall audit reuses it verbatim on
# both sides rather than re-deriving float cosine rankings here, so any
# float-ordering subtlety lives in exactly one certified place.
from .similarity import _COS_SQL  # noqa: E402  (shared family contract)

_EXACT_TOPK_SQL = f"""
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_COS_SQL} DESC, b.vec_id) AS rn
        FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
        WHERE a.vec_id % {QUERY_STRIDE} = 0
      ) WHERE rn <= {TOP_K}
"""


@register(
    "sim_hamming_recall",
    oracle=f"""
    WITH ham AS (
      SELECT query_id, neighbor_id FROM ({_HAM_TOPK_SQL})
    ),
    exact AS ({_EXACT_TOPK_SQL})
    SELECT e.query_id,
           CAST(count(h.neighbor_id) AS BIGINT) AS n_hits,
           CAST(count(h.neighbor_id) * 1000000 // {TOP_K} AS BIGINT)
             AS recall_ppm
    FROM exact e LEFT JOIN ham h
      ON h.query_id = e.query_id AND h.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
)
def sim_hamming_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of the 1-bit Hamming tier against exact float32 cosine
    (the certified brute-force query, reused verbatim as ground truth):
    per query, how many of the true top-K survive sign quantization —
    exact-integer ppm via truncating division (positive operands, so
    DuckDB ``//`` ≡ Spark ``div``). The honesty audit for the 32×
    compression: the number a platform quotes before switching its
    first-pass filter to binary codes.

    Scale: both tiers are per-query bounded (K rows each after their
    Partial WindowGroupLimits); the audit join and the per-query
    aggregate run on Q·K rows, never the corpus."""
    ham = sim_binary_hamming_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    exact = sim_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hits = exact.alias("e").join(
        F.broadcast(ham.alias("h")),
        (F.expr("e.query_id = h.query_id"))
        & (F.expr("e.neighbor_id = h.neighbor_id")),
        "left",
    )
    return hits.groupBy(F.expr("e.query_id").alias("query_id")).agg(
        F.expr("cast(count(h.neighbor_id) as bigint)").alias("n_hits"),
        F.expr(
            f"cast(count(h.neighbor_id) * 1000000 div {TOP_K} as bigint)"
        ).alias("recall_ppm"),
    )
