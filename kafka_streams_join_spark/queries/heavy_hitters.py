"""Misra–Gries heavy hitters (round 12) — the last standard mergeable
sketch the repo's sketch shelf was missing (SpaceSaving's deterministic
twin; the streaming complement of ``agg_count_min_sketch``'s probe
side). Frequent-item summaries are THE data-pipeline primitive for
"which users/domains/tokens dominate the corpus" when the key space is
too wide to rank exactly on every run.

Algorithm (Agarwal et al., "Mergeable Summaries", PODS'12 form): the
stream is split into S shards; each shard builds a k-counter summary —
keep its k most frequent keys, each decremented by the shard's
(k+1)-th count e_s (the MG prune: every surviving counter ĉ = c − e_s
underestimates by at most e_s, everything else is provably ≤ e_s) —
and summaries MERGE BY COUNTER ADDITION, with the final top-N cut as
the re-prune. The classic guarantee survives the merge: for every key,
``est_min ≤ true count ≤ est_min + Σ_s e_s``.

Determinism contract: physical Spark partitions would make the summary
order-dependent, so shards are LOGICAL — ``event_id % S``, identical
in both engines — and every step is exact integer arithmetic with
total-order tie-breaks (count desc, key asc). The exact per-key count
rides along as the in-row audit leg (the ``sketch_hll_bias_corrected``
contract pattern): ``within_bound`` certifies the MG guarantee on
every output row in both engines.

Scale: the per-(shard, key) count is one map-side-combinable
aggregate; the rank-prune filter (rn ≤ k+1) plans as Partial+Final
``WindowGroupLimit`` — each map task forwards at most (k+1)·S rows per
partition, which is the sketch's memory story told in shuffle bytes.
The merged summary is ≤ S·k rows; the top-N is a TakeOrdered heap. The
exact audit leg is the one corpus-wide key aggregate — the truth
column a production run at 10⁹ keys would drop (and with it the only
key-cardinality shuffle in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ranking import two_phase_rank
from ..sources.parquet import load_table
from .registry import register

_HH_SHARDS = 16  # logical stream shards (≙ per-partition summaries)
_HH_K = 8  # counters per shard summary
_HH_TOPN = 20


@register(
    "sketch_misra_gries_topk",
    oracle=f"""
    WITH ev AS (
      SELECT event_id % {_HH_SHARDS} AS shard, user_id FROM events
    ),
    cnt AS (
      SELECT shard, user_id, CAST(count(*) AS BIGINT) AS c
      FROM ev GROUP BY 1, 2
    ),
    rk AS (
      SELECT shard, user_id, c,
             row_number() OVER (PARTITION BY shard
                                ORDER BY c DESC, user_id) AS rn
      FROM cnt
    ),
    thr AS (
      SELECT shard, c AS e FROM rk WHERE rn = {_HH_K + 1}
    ),
    etot AS (
      SELECT CAST(coalesce(sum(e), 0) AS BIGINT) AS err_bound FROM thr
    ),
    kept AS (
      SELECT rk.user_id, rk.c - coalesce(thr.e, 0) AS chat
      FROM rk LEFT JOIN thr ON thr.shard = rk.shard
      WHERE rk.rn <= {_HH_K} AND rk.c - coalesce(thr.e, 0) > 0
    ),
    est AS (
      SELECT user_id, CAST(sum(chat) AS BIGINT) AS est_min
      FROM kept GROUP BY user_id
    ),
    exact AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count
      FROM events GROUP BY user_id
    ),
    top AS (
      SELECT * FROM est ORDER BY est_min DESC, user_id LIMIT {_HH_TOPN}
    )
    SELECT row_number() OVER (ORDER BY t.est_min DESC, t.user_id) AS rnk,
           t.user_id, t.est_min, etot.err_bound, x.exact_count,
           (t.est_min <= x.exact_count
            AND x.exact_count <= t.est_min + etot.err_bound)
             AS within_bound
    FROM top t JOIN exact x ON x.user_id = t.user_id
    CROSS JOIN etot
    """,
)
def sketch_misra_gries_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_HH_TOPN} heavy-hitter users by merged Misra–Gries summaries
    ({_HH_SHARDS} logical shards × {_HH_K} counters): per shard, keep the
    k most frequent keys decremented by the (k+1)-th count; merge by
    counter addition; report the lower-bound estimate, the global error
    bound Σe_s, the exact count (audit leg), and the certified
    ``within_bound`` guarantee flag. Module docstring has the mergeable-
    summaries construction, determinism, and scale contracts."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("event_id") % _HH_SHARDS).alias("shard"), "user_id"
    )
    cnt = ev.groupBy("shard", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("shard").orderBy(F.desc("c"), F.asc("user_id"))
    rk = cnt.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _HH_K + 1
    )
    thr = rk.filter(F.col("rn") == _HH_K + 1).select(
        "shard", F.col("c").alias("e")
    )
    etot = thr.agg(
        F.coalesce(F.sum("e"), F.lit(0)).cast("bigint").alias("err_bound")
    )
    kept = (
        rk.filter(F.col("rn") <= _HH_K)
        .join(F.broadcast(thr), "shard", "left")
        .select(
            "user_id",
            (F.col("c") - F.coalesce(F.col("e"), F.lit(0))).alias("chat"),
        )
        .filter(F.col("chat") > 0)
    )
    est = kept.groupBy("user_id").agg(
        F.sum("chat").cast("bigint").alias("est_min")
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
    )
    top = est.orderBy(F.desc("est_min"), F.asc("user_id")).limit(_HH_TOPN)
    # global rank via two_phase_rank (never an unpartitioned window —
    # registry-wide gate): the level frame is the <= TOPN distinct
    # est_min values of the already-cut top frame, so the one
    # unpartitioned offset window runs over a model-sized input and the
    # user_id-carrying rows cross only hash exchanges
    ranked = two_phase_rank(
        top.join(exact, "user_id").crossJoin(F.broadcast(etot)),
        level_col="est_min",
        id_col="user_id",
        rank_col="rnk",
        ascending=False,
    )
    return ranked.select(
        "rnk",
        "user_id",
        "est_min",
        "err_bound",
        "exact_count",
        (
            (F.col("est_min") <= F.col("exact_count"))
            & (F.col("exact_count") <= F.col("est_min") + F.col("err_bound"))
        ).alias("within_bound"),
    )


sketch_misra_gries_topk.__doc__ = (
    sketch_misra_gries_topk.__doc__.replace("{_HH_TOPN}", str(_HH_TOPN))
    .replace("{_HH_SHARDS}", str(_HH_SHARDS))
    .replace("{_HH_K}", str(_HH_K))
)
