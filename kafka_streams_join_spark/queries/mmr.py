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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

    Scale: candidate-sized frames only (K rows per query, collapsed to
    ONE array row per query); the candidate stage scales as its own
    registered query does. Round-15 shape (guide §2.4/§1.2 "remove
    passes"): the previous form ran the greedy walk as a DAG of
    anti-joins, pairwise self-joins and per-step windows over two
    persisted frames — ~30 joins and two cache materializations for
    K=5-per-query frames. The walk is now three chained array
    expressions over one collect_list row per query: same integer MMR
    arithmetic (milli-cosines via the identical zip_with/aggregate fold
    — pairwise cosine is exactly symmetric, so evaluation side never
    matters), same argmax tie-breaks (mmr DESC, id ASC), zero joins
    after the candidate fetch, and the collect_list order is irrelevant
    because every step is an order-free argmax with a total tie-break."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ce = (
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
    # one row per query: the K-candidate array (the window above already
    # partitioned by query_id, so this groupBy reuses that exchange)
    per_q = ce.groupBy("query_id").agg(
        F.collect_list(
            F.struct("neighbor_id", "rnk", "rel_m", "embedding")
        ).alias("cs")
    )

    def _dot(ea: str, eb: str) -> str:
        return (
            f"aggregate(zip_with({ea}, {eb},"
            " (x, y) -> cast(x as double) * cast(y as double)),"
            " cast(0.0 as double), (acc, v) -> acc + v)"
        )

    def _n2(e: str) -> str:
        return (
            f"aggregate({e}, cast(0.0 as double),"
            " (acc, x) -> acc + cast(x as double) * cast(x as double))"
        )

    def _ps_m(ea: str, eb: str) -> str:
        """The pairwise milli-cosine contract (round 9): identical fold
        spelling, symmetric bit-for-bit (elementwise products and the
        norm product commute exactly in IEEE doubles)."""
        return (
            f"cast(round(1000 * ({_dot(ea, eb)}"
            f" / sqrt({_n2(ea)} * {_n2(eb)}))) as bigint)"
        )

    def _pick(sel_arr: str) -> str:
        """One greedy step as an expression: among candidates not yet in
        ``sel_arr``, maximize 7·rel_m − 3·max(sim to selected); ties to
        the lowest id — exactly the previous per-step window ordering."""
        scored = (
            f"transform(filter(cs, c -> NOT array_contains("
            f"transform({sel_arr}, s -> s.sid), c.neighbor_id)),"
            f" c -> named_struct('sid', c.neighbor_id, 'emb', c.embedding,"
            f" 'mmr', {_LAM10} * c.rel_m - {10 - _LAM10}"
            f" * array_max(transform({sel_arr},"
            f" s -> {_ps_m('c.embedding', 's.emb')}))))"
        )
        return (
            f"get(array_sort({scored}, (l, r) -> CASE"
            " WHEN l.mmr > r.mmr THEN -1 WHEN l.mmr < r.mmr THEN 1"
            " WHEN l.sid < r.sid THEN -1 WHEN l.sid > r.sid THEN 1"
            " ELSE 0 END), 0)"
        )

    s1 = (
        "named_struct('sid', get(filter(cs, c -> c.rnk = 1), 0).neighbor_id,"
        " 'emb', get(filter(cs, c -> c.rnk = 1), 0).embedding,"
        f" 'mmr', cast({_LAM10}"
        " * get(filter(cs, c -> c.rnk = 1), 0).rel_m as bigint))"
    )
    steps = (
        per_q.withColumn("s1", F.expr(s1))
        .withColumn("s2", F.expr(_pick("array(s1)")))
        .withColumn("s3", F.expr(_pick("array(s1, s2)")))
    )
    # queries with < 2 or < 3 candidates have NULL s2/s3 — emit no row for
    # those steps, matching the join-form (and the oracle's empty CTEs)
    out = steps.select(
        "query_id",
        F.explode(
            F.expr(
                "filter(array("
                " named_struct('step', 1, 'sid', s1.sid, 'mmr', s1.mmr),"
                " named_struct('step', 2, 'sid', s2.sid, 'mmr', s2.mmr),"
                " named_struct('step', 3, 'sid', s3.sid, 'mmr', s3.mmr)),"
                " s -> s.sid IS NOT NULL)"
            )
        ).alias("st"),
    )
    return out.select(
        "query_id",
        F.col("st.step").cast("int").alias("step"),
        F.col("st.sid").alias("selected_id"),
        F.col("st.mmr").cast("bigint").alias("mmr_milli"),
    )
