"""Prefix-dimension ("Matryoshka") retrieval recall (round 8).

Matryoshka-style embeddings promise that the FIRST d' dimensions of a
d-dim vector are themselves a usable embedding — shipping 4× less
vector is the cheapest ANN speedup there is, IF recall survives. This
query measures exactly that on the corpus: exact cosine top-k over the
full 64 dims vs exact cosine top-k over dims 1..16, and the per-query
overlap recall@k. The full side composes the REGISTERED
``sim_topk_bruteforce`` surface (Spark function and oracle SQL
verbatim); the prefix side is the same blocked-GEMM machinery over
``slice(embedding, 1, 16)`` with the same raw-cosine,
id-tie-broken ranking contract that family has certified since round 3.

Scale: two bounded-query blocked-GEMM passes (each the already-gated
distributed-TakeOrdered shape — block-local top-k, then a k·n_blocks
merge window); the recall join touches only (query_id, neighbor_id)
pairs, Q·k rows a side. recall_ppm is n_match·200000 — exact fifths,
no float anywhere past the certified rankings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import ORACLES, register
from .similarity import (
    QUERY_STRIDE,
    TOP_K,
    _TOPK_BLOCK,
    _topk_block_batches,
    query_admission,
    sim_topk_bruteforce,
)

_PREFIX_DIMS = 16
_RECALL_PPM_PER_MATCH = 1_000_000 // TOP_K  # 200000 — exact, precomputed

_COS16_SQL = (
    f"list_sum(list_transform(list_zip(a.embedding[1:{_PREFIX_DIMS}],"
    f" b.embedding[1:{_PREFIX_DIMS}]),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    f" / sqrt(list_sum(list_transform(a.embedding[1:{_PREFIX_DIMS}],"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    f"   * list_sum(list_transform(b.embedding[1:{_PREFIX_DIMS}],"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


def _prefix_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k over the 16-dim prefix: sim_topk_bruteforce's blocked
    pipeline verbatim, fed sliced vectors (the kernel scores whatever
    'embedding' holds)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(f"slice(embedding, 1, {_PREFIX_DIMS})").alias("embedding"),
    )
    qblks = (
        query_admission(emb)
        .withColumn(
            "qblk", (F.col("vec_id") / (QUERY_STRIDE * _TOPK_BLOCK)).cast("int")
        )
        .groupBy("qblk")
        .agg(F.collect_list(F.struct("vec_id", "embedding")).alias("q_rows"))
    )
    bblks = (
        emb.withColumn("blk", (F.col("vec_id") / _TOPK_BLOCK).cast("int"))
        .groupBy("blk")
        .agg(F.collect_list(F.struct("vec_id", "embedding")).alias("b_rows"))
    )
    pairs = bblks.crossJoin(F.broadcast(qblks))
    scored = pairs.mapInPandas(
        _topk_block_batches, "query_id bigint, neighbor_id bigint, cos_raw double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )


@register(
    "sim_prefix_dim_recall",
    oracle=f"""
    WITH fullr AS ({ORACLES["sim_topk_bruteforce"]}),
    pref AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_COS16_SQL} DESC, b.vec_id) AS rnk
        FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
        WHERE a.vec_id % {QUERY_STRIDE} = 0
      ) WHERE rnk <= {TOP_K}
    ),
    m AS (
      SELECT f.query_id, count(*) AS n_match
      FROM fullr f JOIN pref p
        ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
      GROUP BY 1
    ),
    q AS (SELECT DISTINCT query_id FROM fullr)
    SELECT q.query_id,
           CAST(coalesce(m.n_match, 0) AS BIGINT) AS n_match,
           CAST(coalesce(m.n_match, 0) * {_RECALL_PPM_PER_MATCH} AS BIGINT)
             AS recall_ppm
    FROM q LEFT JOIN m ON m.query_id = q.query_id
    """,
)
def sim_prefix_dim_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of 16-of-64 prefix-dimension retrieval against the
    full-dimension exact top-k, per query (module docstring has the
    why). n_match counts neighbors the truncated index still finds;
    recall_ppm = n_match·{_RECALL_PPM_PER_MATCH} (exact fifths). A mean
    near 1e6 green-lights shipping 4× smaller vectors to the ANN tier.

    Scale: both rankings are the gated blocked-GEMM distributed-
    TakeOrdered; the overlap join and count touch Q·k narrow rows."""
    fullk = sim_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    prefk = _prefix_topk(spark, sf_dir)
    m = (
        fullk.join(prefk, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    q = fullk.select("query_id").distinct()
    return q.join(m, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_match"),
        (F.coalesce(F.col("__n"), F.lit(0)) * F.lit(_RECALL_PPM_PER_MATCH))
        .cast("bigint")
        .alias("recall_ppm"),
    )
