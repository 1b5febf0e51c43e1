"""K-minimum-values distinct sweep (round 13): the third rung of the
distinct-count sketch family (exact ≫ HLL ≫ KMV), at k = 64 / 256 / 1024
minima — the Bar-Yossef et al. estimator every "theta sketch" descends
from. Where HLL keeps max-ρ registers, KMV keeps the k smallest hash
values: with the hash space [0, 2⁶⁰) and h_k the k-th smallest distinct
hash, E[distinct] ≈ (k−1)·2⁶⁰ / h_k, with standard error ~1/√(k−2). KMV's
production edge over HLL is exact MERGEABILITY under set operations
(union = merge minima lists; intersection via the Jaccard of minima) —
the streaming twin (``streaming/kmv.py``) exercises the merge.

Exactness contract: the hash is the registered 60-bit md5 contract shared
with the HLL family (``sketches_ext._H60_SPARK/_H60_SQL`` — identical
bits in both engines), the estimator is pure integer arithmetic
((k−1)·2⁶⁰ // h_k in DECIMAL(38,0)/HUGEINT), the small-range rung
(distinct < k → the sketch IS the exact set, estimate = exact count,
kth_min = NULL) branches on an integer comparison, and err_ppm is
exact-integer against the exact distinct count. theoretical_se_ppm =
⌊10⁶/√(k−2)⌋ is a frozen integer literal per k. No float leaves any
engine.

Non-vacuous across SFs: ~15 distinct users at sf0.001 (all three k on
the small rung, err 0), ~150 at sf0.01 (k=64 estimating), ~1500 at
sf0.1 (all three estimating) — the sweep shows the rung switching and
the error tracking the 1/√(k−2) curve.

Scale: one pruned scan → distinct 60-bit hashes (one hash-aggregate
shuffle of long rows); each k's minima come from a distributed top-k
(``TakeOrderedAndProject`` — every partition forwards at most k longs,
no global sort, no data-sized single-partition exchange); the tail is
3 one-row aggregates. State is k longs per sweep size regardless of
corpus size — that bound is the entire point of the sketch.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register
from .sketches_ext import _H60_SPARK, _H60_SQL

_KMV_KS = (64, 256, 1024)
_H_SPACE = 1 << 60


def _se_ppm(k: int) -> int:
    return int(1_000_000 / math.sqrt(k - 2))


@register(
    "sketch_kmv_distinct_sweep",
    oracle=f"""
    WITH dh AS (SELECT DISTINCT {_H60_SQL} AS h FROM events),
    ranked AS (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM dh),
    ex AS (SELECT count(*) AS n_exact FROM ranked),
    ks(k, se_ppm) AS (VALUES
      {", ".join(f"({k}, {_se_ppm(k)})" for k in _KMV_KS)}),
    kth AS (
      SELECT ks.k, ks.se_ppm, r.h AS kth_min
      FROM ks LEFT JOIN ranked r ON r.rk = ks.k
    ),
    est AS (
      SELECT k, se_ppm, kth_min,
             CASE WHEN kth_min IS NULL THEN (SELECT n_exact FROM ex)
                  ELSE CAST((k - 1) * CAST({_H_SPACE} AS HUGEINT) // kth_min
                            AS BIGINT)
             END AS est_distinct
      FROM kth
    )
    SELECT CAST(k AS BIGINT) AS k_minima,
           CAST((SELECT n_exact FROM ex) AS BIGINT) AS n_exact,
           kth_min,
           CAST(est_distinct AS BIGINT) AS est_distinct,
           CAST(CAST(abs(est_distinct - (SELECT n_exact FROM ex)) AS HUGEINT)
                * 1000000 // (SELECT n_exact FROM ex) AS BIGINT) AS err_ppm,
           CAST(se_ppm AS BIGINT) AS theoretical_se_ppm
    FROM est
    """,
)
def sketch_kmv_distinct_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per k ∈ {64, 256, 1024}: the KMV distinct-user estimate beside the
    exact count, in exact-integer ppm, with the 1/√(k−2) theoretical SE —
    the memory/accuracy dial of the mergeable distinct sketch (module
    docstring has the estimator, rung, and scale contracts)."""
    dh = _staged(
        load_table(spark, sf_dir, "events")
        .select(F.expr(_H60_SPARK).alias("h"))
        .distinct()
    )
    ex = dh.agg(F.count(F.lit(1)).alias("n_exact"))
    rows = []
    for k in _KMV_KS:
        topk = dh.orderBy("h").limit(k)
        rows.append(
            topk.agg(
                F.count(F.lit(1)).alias("cnt"), F.max("h").alias("kth")
            ).select(
                F.lit(k).cast("bigint").alias("k_minima"),
                F.lit(_se_ppm(k)).cast("bigint").alias("theoretical_se_ppm"),
                "cnt",
                "kth",
            )
        )
    u = rows[0]
    for r in rows[1:]:
        u = u.unionByName(r)
    return u.crossJoin(F.broadcast(ex)).select(
        "k_minima",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.expr("CASE WHEN cnt < k_minima THEN NULL ELSE kth END").alias(
            "kth_min"
        ),
        F.expr(
            "cast(CASE WHEN cnt < k_minima THEN n_exact"
            f" ELSE (k_minima - 1) * cast({_H_SPACE} as decimal(38,0))"
            " div kth END as bigint)"
        ).alias("est_distinct"),
        F.expr(
            "cast(cast(abs((CASE WHEN cnt < k_minima THEN n_exact"
            f" ELSE (k_minima - 1) * cast({_H_SPACE} as decimal(38,0))"
            " div kth END) - n_exact) as decimal(38,0)) * 1000000"
            " div n_exact as bigint)"
        ).alias("err_ppm"),
        "theoretical_se_ppm",
    )
