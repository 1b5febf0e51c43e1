"""Information-theoretic sequence diagnostics (round 11): per-state
conditional entropy H(next | current) and branching perplexity of the
user event chain — the uncertainty scalar ON TOP of the registered
``events_markov_transitions`` matrix. The matrix says where users go;
the branch entropy says how PREDICTABLE each state is (perplexity =
the effective number of next steps), which is the number journey-
mining and next-event-model teams actually track release-over-release.

Sequencing contract: consecutive events per user ordered by µs
timestamp with event_id tie-breaks — the engine-stable idiom shared
with the Markov matrix.

Exactness (the repo's log-space contract, ``events_user_entropy``):
each entropy term ``1e6 · n_ij · ln(n_i/n_ij) / n_i`` is rounded to
integer MICRO-NATS per transition cell BEFORE summation — identical
exact integers feed identical doubles into one fixed-shape expression,
and the cross-cell sum is then an INTEGER sum, immune to float
summation order. Perplexity re-enters float once, on the identical
integer µnat total.

Scale: one user_id shuffle feeds the lead() window (narrow columns);
everything after runs on the K²-cell transition frame (K = type
vocabulary) — constant-sized in corpus volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register


@register(
    "events_conditional_entropy",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    pairs AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (
      SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from,
             CAST(count(*) AS BIGINT) AS n_branches
      FROM pairs GROUP BY from_type
    ),
    ent AS (
      SELECT p.from_type,
             CAST(sum(CAST(round(1000000.0 * p.n
                  * ln(CAST(t.n_from AS DOUBLE) / p.n) / t.n_from)
                  AS BIGINT)) AS BIGINT) AS h_micro
      FROM pairs p JOIN tot t ON t.from_type = p.from_type
      GROUP BY p.from_type
    )
    SELECT t.from_type AS event_type, t.n_from AS n_transitions,
           t.n_branches, e.h_micro AS branch_entropy_micro,
           CAST(round(1000 * exp(CAST(e.h_micro AS DOUBLE) / 1000000))
                AS BIGINT) AS perplexity_milli
    FROM tot t JOIN ent e ON e.from_type = t.from_type
    """,
)
def events_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state branch entropy (integer µnats, per-cell rounding before
    the integer sum — module docstring has the log-space contract) and
    perplexity (milli, the effective branching factor) of the user
    event chain. A state whose perplexity drifts toward 1.0 has become
    deterministic (bot loops, broken UI); toward K, noise.

    Scale: one user shuffle for the lead window; all arithmetic on the
    K² transition frame."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # staged: the K²-cell pair frame feeds tot, ent, and (via tot) the
    # final join — unstaged, the events scan + user shuffle + window
    # executed four times (round-11 review finding)
    pairs = _staged(
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(
        F.expr("cast(sum(n) as bigint)").alias("n_from"),
        F.expr("cast(count(1) as bigint)").alias("n_branches"),
    )
    ent = (
        pairs.join(F.broadcast(tot), "from_type")
        .groupBy("from_type")
        .agg(
            F.expr(
                "cast(sum(cast(round(1000000.0D * n"
                " * ln(cast(n_from as double) / n) / n_from)"
                " as bigint)) as bigint)"
            ).alias("h_micro")
        )
    )
    return tot.join(F.broadcast(ent), "from_type").select(
        F.col("from_type").alias("event_type"),
        F.col("n_from").alias("n_transitions"),
        "n_branches",
        F.col("h_micro").alias("branch_entropy_micro"),
        F.expr(
            "cast(round(1000 * exp(cast(h_micro as double) / 1000000))"
            " as bigint)"
        ).alias("perplexity_milli"),
    )
