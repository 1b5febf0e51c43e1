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
_OVL_K = 256  # minima per side for the overlap estimator

# user-day audience key: one activity unit per (user, calendar day) —
# user-level audiences saturate on this corpus (every event type reaches
# every user), user-days overlap partially (~23% click∩purchase Jaccard).
# Spark date_format 'yyyy-MM-dd' ≡ DuckDB strftime '%Y-%m-%d' (both
# zero-padded ISO under the shared UTC session contract).
_OVL_KEY_SPARK = (
    "cast(conv(substring(md5(concat('kmvo_', cast(user_id as string), '_',"
    " date_format(ts, 'yyyy-MM-dd'))), 1, 15), 16, 10) as bigint)"
)
_OVL_KEY_SQL = (
    "CAST(('0x' || substr(md5('kmvo_' || CAST(user_id AS VARCHAR) || '_'"
    " || strftime(ts, '%Y-%m-%d')), 1, 15)) AS BIGINT)"
)


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
                  ELSE CAST((k - 1) * CAST({_H_SPACE} AS HUGEINT)
                            // greatest(kth_min, 1) AS BIGINT)
             END AS est_distinct
      FROM kth
    )
    SELECT CAST(k AS BIGINT) AS k_minima,
           CAST((SELECT n_exact FROM ex) AS BIGINT) AS n_exact,
           kth_min,
           CAST(est_distinct AS BIGINT) AS est_distinct,
           CAST(CAST(abs(est_distinct - (SELECT n_exact FROM ex)) AS HUGEINT)
                * 1000000 // greatest((SELECT n_exact FROM ex), 1) AS BIGINT) AS err_ppm,
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
            " div greatest(kth, 1) END as bigint)"
        ).alias("est_distinct"),
        F.expr(
            "cast(cast(abs((CASE WHEN cnt < k_minima THEN n_exact"
            f" ELSE (k_minima - 1) * cast({_H_SPACE} as decimal(38,0))"
            " div greatest(kth, 1) END) - n_exact) as decimal(38,0)) * 1000000"
            " div greatest(n_exact, 1) as bigint)"
        ).alias("err_ppm"),
        "theoretical_se_ppm",
    )


@register(
    "sketch_kmv_audience_overlap",
    oracle=f"""
    WITH ka AS (
      SELECT DISTINCT {_OVL_KEY_SQL} AS h FROM events
      WHERE event_type = 'click'
    ),
    kb AS (
      SELECT DISTINCT {_OVL_KEY_SQL} AS h FROM events
      WHERE event_type = 'purchase'
    ),
    ex AS (
      SELECT (SELECT count(*) FROM ka) AS n_a,
             (SELECT count(*) FROM kb) AS n_b,
             (SELECT count(*) FROM ka JOIN kb USING (h)) AS n_inter
    ),
    ma AS (SELECT h FROM ka ORDER BY h LIMIT {_OVL_K}),
    mb AS (SELECT h FROM kb ORDER BY h LIMIT {_OVL_K}),
    m AS (
      SELECT DISTINCT h
      FROM (SELECT h FROM ma UNION ALL SELECT h FROM mb)
      ORDER BY h LIMIT {_OVL_K}
    ),
    mm AS (
      SELECT count(*) AS cnt, max(h) AS kth,
             (SELECT count(*) FROM m JOIN ma USING (h) JOIN mb USING (h))
               AS matches
      FROM m
    ),
    est AS (
      SELECT cnt, matches,
             CASE WHEN cnt < {_OVL_K} THEN cnt
                  ELSE CAST(({_OVL_K} - 1) * CAST({_H_SPACE} AS HUGEINT)
                            // greatest(kth, 1) AS BIGINT) END AS est_union
      FROM mm
    )
    SELECT CAST(ex.n_a AS BIGINT) AS n_a_exact,
           CAST(ex.n_b AS BIGINT) AS n_b_exact,
           CAST(ex.n_inter AS BIGINT) AS n_inter_exact,
           CAST(ex.n_inter * CAST(1000000 AS HUGEINT)
                // greatest(ex.n_a + ex.n_b - ex.n_inter, 1) AS BIGINT)
             AS jaccard_exact_ppm,
           CAST(est.est_union AS BIGINT) AS est_union,
           CAST(est.matches * CAST(1000000 AS HUGEINT) // greatest(est.cnt, 1)
             AS BIGINT)
             AS est_jaccard_ppm,
           CAST(CASE WHEN est.cnt < {_OVL_K} THEN est.matches
                     ELSE CAST(est.matches * CAST(est.est_union AS HUGEINT)
                               // est.cnt AS BIGINT) END AS BIGINT)
             AS est_inter,
           CAST(abs((CASE WHEN est.cnt < {_OVL_K} THEN est.matches
                          ELSE CAST(est.matches
                                    * CAST(est.est_union AS HUGEINT)
                                    // est.cnt AS BIGINT) END)
                    - ex.n_inter) * CAST(1000000 AS HUGEINT)
                // greatest(ex.n_inter, 1) AS BIGINT) AS err_inter_ppm
    FROM ex CROSS JOIN est
    """,
)
def sketch_kmv_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from KMV sketches — the set-operation
    capability that is KMV's production edge over HLL (round-13 module
    docstring): distinct CLICK user-days vs distinct PURCHASE user-days,
    their exact intersection, and the sketch estimate computed ONLY from
    the two k-minima sets: merge = k smallest of the union (a valid KMV
    of A∪B), est_jaccard = |merge ∩ minA ∩ minB| / |merge| (every merged
    hash is a uniform sample of A∪B, so the match fraction estimates the
    Jaccard), est_inter = est_jaccard · est_union. Small rung: when the
    union holds fewer than k distinct keys the sketch IS the set and
    every estimate is exact.

    All arithmetic integer (DECIMAL(38,0)/HUGEINT): the registered md5
    hash contract, truncating divs, exact-ppm comparisons against the
    exact counts — the one-row report an audience-overlap dashboard
    reads without ever joining the raw audiences.

    Scale: two pruned scans → distinct user-day hashes (hash-aggregate
    shuffles of long rows); minima via TakeOrderedAndProject; everything
    after is k-row frames (k = {_OVL_K}) — the raw audiences are never
    joined on the estimate path (the exact intersection here exists only
    as the certification target)."""
    ev = load_table(spark, sf_dir, "events")

    def keys(etype: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .select(F.expr(_OVL_KEY_SPARK).alias("h"))
            .distinct()
        )

    ka, kb = _staged(keys("click")), _staged(keys("purchase"))
    ex = (
        ka.agg(F.count(F.lit(1)).alias("n_a"))
        .crossJoin(F.broadcast(kb.agg(F.count(F.lit(1)).alias("n_b"))))
        .crossJoin(
            F.broadcast(
                ka.join(kb, "h").agg(F.count(F.lit(1)).alias("n_inter"))
            )
        )
    )
    ma = _staged(ka.orderBy("h").limit(_OVL_K))
    mb = _staged(kb.orderBy("h").limit(_OVL_K))
    m = _staged(
        ma.unionByName(mb).distinct().orderBy("h").limit(_OVL_K)
    )
    mm = (
        m.agg(F.count(F.lit(1)).alias("cnt"), F.max("h").alias("kth"))
        .crossJoin(
            F.broadcast(
                m.join(ma, "h").join(mb, "h").agg(
                    F.count(F.lit(1)).alias("matches")
                )
            )
        )
    )
    est = mm.select(
        "cnt",
        "matches",
        F.expr(
            f"CASE WHEN cnt < {_OVL_K} THEN cnt"
            f" ELSE cast(({_OVL_K} - 1) * cast({_H_SPACE} as decimal(38,0))"
            " div greatest(kth, 1) as bigint) END"
        ).alias("est_union"),
    )
    return ex.crossJoin(F.broadcast(est)).select(
        F.col("n_a").cast("bigint").alias("n_a_exact"),
        F.col("n_b").cast("bigint").alias("n_b_exact"),
        F.col("n_inter").cast("bigint").alias("n_inter_exact"),
        F.expr(
            "cast(cast(n_inter as decimal(38,0)) * 1000000"
            " div greatest(n_a + n_b - n_inter, 1) as bigint)"
        ).alias("jaccard_exact_ppm"),
        F.col("est_union").cast("bigint").alias("est_union"),
        F.expr(
            "cast(cast(matches as decimal(38,0)) * 1000000"
            " div greatest(cnt, 1) as bigint)"
        ).alias("est_jaccard_ppm"),
        F.expr(
            f"cast(CASE WHEN cnt < {_OVL_K} THEN matches"
            " ELSE cast(cast(matches as decimal(38,0)) * est_union"
            " div cnt as bigint) END as bigint)"
        ).alias("est_inter"),
        F.expr(
            f"cast(cast(abs((CASE WHEN cnt < {_OVL_K} THEN matches"
            " ELSE cast(cast(matches as decimal(38,0)) * est_union"
            " div cnt as bigint) END) - n_inter) as decimal(38,0))"
            " * 1000000 div greatest(n_inter, 1) as bigint)"
        ).alias("err_inter_ppm"),
    )
