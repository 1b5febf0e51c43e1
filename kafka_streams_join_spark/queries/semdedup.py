"""Semantic dedup over k-means cells (SemDeDup, Abbas et al. 2023).

Embedding-space dedup whose candidate stage is a TRAINED codebook instead
of random hyperplanes: cluster the corpus with k-means, call two vectors
candidate duplicates only if they land in the same cluster, verify
candidates with exact cosine, and keep one representative per duplicate
group (the lowest vec_id — SemDeDup's greedy keep-rule). Complements
``dedup_embedding_lsh``: LSH blocking is data-independent and cheap;
k-means blocking adapts to corpus geometry, which is what lets SemDeDup
prune semantically redundant (not just near-identical) web data.

Composition, not new machinery: the clusterer is
``cluster_kmeans_embeddings``'s trained assignment (shared via
``kmeans_assignments``) and the verifier is the SAME bounded blocked-GEMM
kernel every embedding-pair operator uses (``_block_cosine_batches``).

Scale design (100 TB): the quadratic is confined within cells — cost is
sum over cells of n_c^2, the knob being K (at scale, K ~ N/10^4 keeps
cells bounded; here K=8 mirrors the clustering query). Cells are blocked
into <= _COS_BLOCK-vector chunks, so a hot cell splits across tasks
instead of becoming one giant row; pair blocks join on the cell id (equi,
never all-pairs). The keep-rule is one aggregation over dup pairs — no
iteration, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .clustering import kmeans_assignments, kmeans_ctes
from .dedup import COSINE_DUP_THRESHOLD, _COS_BLOCK, _block_cosine_batches
from .registry import register
from .similarity import _COS_SQL


@register(
    "dedup_semantic",
    oracle=kmeans_ctes()
    + f""",
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM afinal a JOIN afinal b
        ON a.cl = b.cl AND a.vec_id < b.vec_id
      WHERE {_COS_SQL} >= {COSINE_DUP_THRESHOLD}
    ),
    dropped AS (SELECT DISTINCT vec_b AS vec_id FROM pairs)
    SELECT a.vec_id, a.cl AS cluster,
           CAST(d.vec_id IS NULL AS INT) AS kept
    FROM afinal a LEFT JOIN dropped d USING (vec_id)
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep/drop decision per vector: within each trained k-means
    cell, a vector is DROPPED iff some lower-id vector in the same cell
    has cosine >= COSINE_DUP_THRESHOLD to it (the greedy one-per-group
    rule; kept = the group's minimum id, matching ``dedup_exact``'s
    keep-first convention). Output is one row per vector — the selection
    a curation pipeline applies with a semi-join.

    Plan: trained assignment (broadcast-codebook, corpus unshuffled) →
    per-cell blocked GEMM (equi-join of bounded blocks on the cell id) →
    one distinct over dup pairs → left join back. The only corpus-wide
    shuffles are the cell-block collect and the final join, both on
    narrow keys."""
    # Deliberately NOT staged despite two consumers (block build + final
    # left join): the raw corpus inside kmeans_assignments is already
    # cached, so the recomputed part is one broadcast-join argmin pass
    # over that cache — measured equal to staging at sf0.1 (4.8 vs 4.9 s
    # best-of-3), while staging would add a SECOND corpus-sized cache
    # (embedding + cl). Same measured-recompute-wins call as the minhash
    # signature stage (dedup.py). Determinism holds either way via the
    # 6-dp centroid rounding contract.
    assigned = kmeans_assignments(spark, sf_dir)
    blks = (
        assigned.withColumn("blk", (F.col("vec_id") / _COS_BLOCK).cast("int"))
        .groupBy("cl", "blk")
        .agg(F.collect_list(F.struct("vec_id", "embedding")).alias("rows"))
    )
    x = blks.select("cl", F.col("blk").alias("x_blk"), F.col("rows").alias("x_rows"))
    y = blks.select(
        F.col("cl").alias("y_cl"),
        F.col("blk").alias("y_blk"),
        F.col("rows").alias("y_rows"),
    )
    # blk = vec_id / B is monotone, so x_blk <= y_blk covers every a < b
    # pair exactly once (the kernel masks the diagonal block)
    pairs = x.join(
        y, (F.col("cl") == F.col("y_cl")) & (F.col("x_blk") <= F.col("y_blk"))
    ).select("x_rows", "y_rows")
    dup = pairs.mapInPandas(
        _block_cosine_batches, "vec_a bigint, vec_b bigint, cos_raw double"
    )
    dropped = dup.select(F.col("vec_b").alias("vec_id")).distinct()
    return (
        assigned.join(dropped.withColumn("hit", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            F.col("cl").alias("cluster"),
            F.when(F.col("hit").isNull(), 1).otherwise(0).alias("kept"),
        )
    )
