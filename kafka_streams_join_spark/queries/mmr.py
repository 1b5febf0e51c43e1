"""Maximal Marginal Relevance re-ranking (round 9, wave 3) — the
diversification operator every retrieval stack runs between ANN top-k
and the consumer: greedily pick the candidate maximizing
λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s), so the final set trades raw
relevance for coverage (Carbonell & Goldstein's MMR). Near-duplicate
candidates — exactly what a deduplicated-corpus pipeline still serves
from ANN — collapse to one representative.

Composition: the candidate stage IS the registered exact top-k surface
(``sim_topk_bruteforce``, K=5, query stride contract), re-ranked to
M=3 selections with λ=0.7. A production deployment swaps the candidate
source for the ANN surface (same ``query_batch`` admission pattern);
the re-rank stage below is untouched by that swap because it only sees
(query, candidate, relevance, embedding) rows.

Determinism contract: relevance and pairwise similarity enter the
selection as MILLI-integers (the candidate surface's certified
3-dp cosines ×1000; pairwise cosines rounded the same way), the MMR
score is the pure-integer ``7·rel_m − 3·maxsim_m`` (λ=0.7 scaled ×10),
and every argmax tie-breaks on the candidate id — so the greedy walk
is exactly reproducible in both engines. Step 1 is the candidate
surface's own rank-1 row (its rnk already carries the unrounded-cos +
id ordering).

Scale: the re-rank runs entirely on candidate-sized frames — K rows
and K·(K−1)/2 pairwise rows per query, a constant per query — and
every window partitions by query_id. The pairwise cosines use the
interpreted zip_with/aggregate fold, which is the documented SLOW path
for corpus-sized pair spaces (dedup_embedding_cosine's 35× lesson) but
the right tool here: 10 pairs per query is not a GEMM's job, and the
fold's left-to-right order is the engine-shared summation contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import ORACLES as _ORACLES
from .registry import register
from .similarity import sim_topk_bruteforce

_LAM10 = 7  # λ·10; the (1-λ)·10 complement is 10 - _LAM10

_COS_AB_SQL = (
    "list_sum(list_transform(list_zip(a.embedding, b.embedding),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    " / sqrt(list_sum(list_transform(a.embedding,"
    "          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    "   * list_sum(list_transform(b.embedding,"
    "          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)

_DOT_SPARK = (
    "aggregate(zip_with(a.embedding, b.embedding,"
    " (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)


def _n2_spark(side: str) -> str:
    return (
        f"aggregate({side}.embedding, cast(0.0 as double),"
        " (acc, x) -> acc + cast(x as double) * cast(x as double))"
    )


@register(
    "sim_mmr_rerank",
    oracle=f"""
    WITH bf AS ({_ORACLES["sim_topk_bruteforce"]}),
    ce AS (
      SELECT bf.query_id, bf.neighbor_id, bf.rnk,
             CAST(round(bf.cos * 1000) AS BIGINT) AS rel_m, e.embedding
      FROM bf JOIN embeddings e ON e.vec_id = bf.neighbor_id
    ),
    ps AS (
      SELECT a.query_id, a.neighbor_id AS x, b.neighbor_id AS y,
             CAST(round(1000 * ({_COS_AB_SQL})) AS BIGINT) AS ps_m
      FROM ce a JOIN ce b
        ON a.query_id = b.query_id AND a.neighbor_id < b.neighbor_id
    ),
    psym AS (
      SELECT query_id, x, y, ps_m FROM ps
      UNION ALL SELECT query_id, y, x, ps_m FROM ps
    ),
    s1 AS (
      SELECT query_id, neighbor_id AS sid, {_LAM10} * rel_m AS mmr
      FROM ce WHERE rnk = 1
    ),
    r2 AS (
      SELECT c.query_id, c.neighbor_id, c.rel_m, p.ps_m AS ms
      FROM ce c
      JOIN s1 ON s1.query_id = c.query_id AND c.neighbor_id <> s1.sid
      JOIN psym p ON p.query_id = c.query_id
                 AND p.x = c.neighbor_id AND p.y = s1.sid
    ),
    s2 AS (
      SELECT query_id, neighbor_id AS sid, mmr FROM (
        SELECT query_id, neighbor_id,
               {_LAM10} * rel_m - {10 - _LAM10} * ms AS mmr,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY {_LAM10} * rel_m - {10 - _LAM10} * ms DESC,
                          neighbor_id) AS rn
        FROM r2) WHERE rn = 1
    ),
    r3 AS (
      SELECT c.query_id, c.neighbor_id, c.rel_m,
             CAST(max(p.ps_m) AS BIGINT) AS ms
      FROM ce c
      JOIN s1 ON s1.query_id = c.query_id
      JOIN s2 ON s2.query_id = c.query_id
      JOIN psym p ON p.query_id = c.query_id AND p.x = c.neighbor_id
                 AND (p.y = s1.sid OR p.y = s2.sid)
      WHERE c.neighbor_id <> s1.sid AND c.neighbor_id <> s2.sid
      GROUP BY 1, 2, 3
    ),
    s3 AS (
      SELECT query_id, neighbor_id AS sid, mmr FROM (
        SELECT query_id, neighbor_id,
               {_LAM10} * rel_m - {10 - _LAM10} * ms AS mmr,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY {_LAM10} * rel_m - {10 - _LAM10} * ms DESC,
                          neighbor_id) AS rn
        FROM r3) WHERE rn = 1
    )
    SELECT query_id, 1 AS step, sid AS selected_id,
           CAST(mmr AS BIGINT) AS mmr_milli FROM s1
    UNION ALL SELECT query_id, 2, sid, CAST(mmr AS BIGINT) FROM s2
    UNION ALL SELECT query_id, 3, sid, CAST(mmr AS BIGINT) FROM s3
    """,
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-3 from the exact top-5 candidate surface,
    λ=0.7: per query, the greedy selection order with each step's
    integer MMR score (module docstring has the contract and the
    production candidate-source swap). ``step`` is the selection
    position — the output IS the serving order.

    Scale: candidate-sized frames only (K and K²/2 rows per query);
    all windows partition by query_id; the candidate stage scales as
    its own registered query does."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # staged: ce fans out to the pairwise self-join, s1, and both greedy
    # steps — left lazy, every consumer would re-execute the full-corpus
    # candidate GEMM (the multi-consumer trap operators/staging.py
    # documents); staged, the GEMM runs once and the re-rank reads the
    # tiny K-rows-per-query frame
    ce = _staged(
        sim_topk_bruteforce(spark, sf_dir)
        .join(emb, F.col("neighbor_id") == F.col("vec_id"))
        .select(
            "query_id",
            "neighbor_id",
            "rnk",
            F.expr("cast(round(cos * 1000) as bigint)").alias("rel_m"),
            "embedding",
        )
    )
    a, b = ce.alias("a"), ce.alias("b")
    ps = a.join(
        b,
        (F.expr("a.query_id = b.query_id"))
        & (F.expr("a.neighbor_id < b.neighbor_id")),
    ).select(
        F.expr("a.query_id").alias("query_id"),
        F.expr("a.neighbor_id").alias("x"),
        F.expr("b.neighbor_id").alias("y"),
        F.expr(
            f"cast(round(1000 * ({_DOT_SPARK}"
            f" / sqrt({_n2_spark('a')} * {_n2_spark('b')}))) as bigint)"
        ).alias("ps_m"),
    )
    # ps is consumed twice by the symmetrization and once per greedy step
    ps = _staged(ps)
    psym = ps.unionByName(
        ps.select("query_id", F.col("y").alias("x"), F.col("x").alias("y"), "ps_m")
    )
    cand = ce.select("query_id", "neighbor_id", "rnk", "rel_m")
    s1 = cand.filter("rnk = 1").select(
        "query_id",
        F.col("neighbor_id").alias("sid"),
        F.expr(f"cast({_LAM10} * rel_m as bigint)").alias("mmr"),
    )

    def _step(selected: list[DataFrame]) -> DataFrame:
        """One greedy step: max over remaining candidates of
        7·rel_m − 3·(max sim to any selected), id tie-break."""
        sel = selected[0].select("query_id", F.col("sid"))
        for s in selected[1:]:
            sel = sel.unionByName(s.select("query_id", "sid"))
        pool = cand.join(
            sel.withColumnRenamed("sid", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_anti",
        )
        ms = (
            pool.join(
                psym.join(
                    sel.withColumnRenamed("sid", "y"),
                    ["query_id", "y"],
                ).select("query_id", F.col("x").alias("neighbor_id"), "ps_m"),
                ["query_id", "neighbor_id"],
            )
            .groupBy("query_id", "neighbor_id", "rel_m")
            .agg(F.expr("cast(max(ps_m) as bigint)").alias("ms"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("mmr"), F.asc("neighbor_id")
        )
        return (
            ms.select(
                "query_id",
                "neighbor_id",
                F.expr(
                    f"cast({_LAM10} * rel_m - {10 - _LAM10} * ms as bigint)"
                ).alias("mmr"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("query_id", F.col("neighbor_id").alias("sid"), "mmr")
        )

    s2 = _step([s1])
    s3 = _step([s1, s2])
    out = (
        s1.select("query_id", F.lit(1).alias("step"), F.col("sid"), F.col("mmr"))
        .unionByName(
            s2.select("query_id", F.lit(2).alias("step"), "sid", "mmr")
        )
        .unionByName(
            s3.select("query_id", F.lit(3).alias("step"), "sid", "mmr")
        )
    )
    return out.select(
        "query_id",
        F.col("step").cast("int").alias("step"),
        F.col("sid").alias("selected_id"),
        F.col("mmr").cast("bigint").alias("mmr_milli"),
    )
