"""Scale-path embedding near-dup: LSH blocking + exact cosine verify.

``dedup_embedding_cosine`` (queries/dedup.py) is the exact all-pairs
baseline — (N/B)² block pairs, kept only as the measuring stick. This module
adds the operator a 100 TB pipeline actually runs: multi-probe LSH blocking
prunes the pair space to bucket-collision candidates (~5/16 of all pairs at
4 planes, shrinking with more planes), then the SAME blocked float64 GEMM
scores candidates exactly. Both the blocking and the scoring are the two
levers that keep embedding dedup sub-quadratic: prune with buckets, score
with BLAS.

Recall contract (approximate, by design): a pair is found iff its two
bucket signatures differ in at most 1 of the NUM_PLANES hyperplane bits.
For cosine ≥ t pairs the per-plane agreement probability is 1 − θ/π
(θ = arccos t), so recall is binomial and tunable via planes/probes — the
standard LSH trade (Lv et al., multi-probe). The DuckDB oracle replicates
the blocking exactly, so the driver hash certifies the *operator contract*
(blocking + exact verify), not a pretended exact-recall claim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .dedup import COSINE_DUP_THRESHOLD, _block_cosine_batches
from .registry import register
from .similarity import _BUCKET_SPARK, _BUCKET_SQL, _COS_SQL, NUM_PLANES, _TOPK_BLOCK


@register(
    "dedup_embedding_lsh",
    oracle=f"""
    WITH bucketed AS (
      SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
    ),
    probes AS (
      SELECT vec_id, embedding, xor(bucket, flip) AS probe
      FROM bucketed,
           unnest([0::BIGINT{"".join(f", {1 << p}::BIGINT" for p in range(NUM_PLANES))}]) AS t(flip)
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_COS_SQL}, 3) AS cos
    FROM probes a JOIN bucketed b
      ON a.probe = b.bucket AND a.vec_id < b.vec_id
    WHERE {_COS_SQL} >= {COSINE_DUP_THRESHOLD}
    """,
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (cosine ≥ threshold) among LSH bucket-collision
    candidates — the scale path ``dedup_embedding_cosine`` is the baseline
    for.

    Plan shape: one scan computes the (codegen'd) bucket signature; the
    probe fan-out is a 5× explode; candidates come from an equi self-join
    on the bucket id (never all-pairs); scoring is one NumPy GEMM per
    bounded block pair inside ``mapInPandas``. Each (a, b) candidate is
    scored exactly once: b's home bucket is unique and a probes it via
    exactly one flip, while the b-probes-a direction fails the a < b mask.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bucketed = emb.select("vec_id", "embedding", F.expr(_BUCKET_SPARK).alias("bucket"))
    bgrp = (
        bucketed.withColumn("blk", (F.col("vec_id") / _TOPK_BLOCK).cast("int"))
        .groupBy("bucket", "blk")
        .agg(F.collect_list(F.struct("vec_id", "embedding")).alias("y_rows"))
    )
    flips = F.array(F.lit(0), *[F.lit(1 << p) for p in range(NUM_PLANES)])
    agrp = (
        bucketed.select("vec_id", "embedding", F.explode(flips).alias("flip"), "bucket")
        .select(
            "vec_id",
            "embedding",
            F.expr("bucket ^ flip").cast("long").alias("probe"),
            (F.col("vec_id") / _TOPK_BLOCK).cast("int").alias("ablk"),
        )
        .groupBy("probe", "ablk")
        .agg(F.collect_list(F.struct("vec_id", "embedding")).alias("x_rows"))
    )
    # merge hint: corpus-scaled self-join sides, never broadcastable at
    # production scale (round 14; see dedup._simhash_mih_pairs).
    pairs = agrp.hint("merge").join(bgrp, agrp.probe == bgrp.bucket).select(
        "x_rows", "y_rows"
    )
    scored = pairs.mapInPandas(
        _block_cosine_batches, "vec_a bigint, vec_b bigint, cos_raw double"
    )
    return scored.select("vec_a", "vec_b", F.round("cos_raw", 3).alias("cos"))
