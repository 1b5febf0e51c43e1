"""AUC-ROC via exact rank statistics (round 11): the area under the ROC
curve of a document-quality score against the DSIR target-membership
label — the ONE number every classifier-based curation gate (CCNet,
DCLM, fasttext quality filters) is judged by before anyone picks a
threshold. The registered ``classifier_calibration_report`` asks "are
the probabilities honest?"; ``classifier_threshold_sweep`` asks "what
happens at each cut?"; AUC asks the prior question: "does the score
rank positives above negatives AT ALL?"

AUC is the Mann–Whitney statistic in disguise — P(score⁺ > score⁻) +
½·P(tie) — so the whole query is the ``stats_rank`` doubled-rank level
frame: scores collapse to an integer milli lattice, tied levels carry
their average rank DOUBLED (2r = 2·prev + cnt + 1, exact BIGINT), and
AUC = (R2⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻) — numerator and denominator exact
non-negative integers, output a TRUNCATING-div ppm. 100 % integer
arithmetic: the score itself is the round-half-up integer
``(2000·n_stop + n_tok) // (2·n_tok)`` (positive operands, so DuckDB
``//`` ≡ Spark ``div`` ≡ half-up), and no float exists anywhere.

Scale: one map pass builds (lang, score) with the label counters; one
map-side-combinable aggregate collapses to the ≤1001-level score
lattice per lang; one window over that bounded frame ranks it; one
aggregate emits per-lang AUC. The corpus is never sorted or shuffled
row-wise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register
from .retrieval import _DSIR_TGT_SQL
from .text import _STOP, _STOP_SQL, _TOKS, _TOKS_SQL

_SCORE = (
    f"cast((2000 * size(filter({_TOKS},"
    f" t -> array_contains({_STOP}, lower(t))))"
    f" + greatest(size({_TOKS}), 1))"
    f" div (2 * greatest(size({_TOKS}), 1)) as bigint)"
)
_SCORE_SQL = (
    f"CAST((2000 * len(list_filter({_TOKS_SQL},"
    f" t -> list_contains({_STOP_SQL}, lower(t))))"
    f" + greatest(len({_TOKS_SQL}), 1))"
    f" // (2 * greatest(len({_TOKS_SQL}), 1)) AS BIGINT)"
)


@register(
    "classifier_auc_roc",
    oracle=f"""
    WITH scored AS (
      SELECT lang, {_SCORE_SQL} AS x,
             CASE WHEN source IN {_DSIR_TGT_SQL} THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    lvl AS (
      SELECT lang, x,
             CAST(sum(y) AS BIGINT) AS pos_c,
             CAST(count(*) - sum(y) AS BIGINT) AS neg_c
      FROM scored GROUP BY 1, 2
    ),
    rk AS (
      SELECT lang, x, pos_c, pos_c + neg_c AS cnt,
             coalesce(sum(pos_c + neg_c) OVER (
               PARTITION BY lang ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM lvl
    ),
    m AS (
      SELECT lang,
             CAST(sum(pos_c) AS BIGINT) AS np,
             CAST(sum(cnt - pos_c) AS BIGINT) AS nn,
             sum(CAST(pos_c AS HUGEINT) * (2 * prev + cnt + 1)) AS r2p
      FROM rk GROUP BY lang
    )
    SELECT lang, np AS n_pos, nn AS n_neg,
           CAST(CASE WHEN np = 0 OR nn = 0 THEN 0
                     ELSE (1000000 * (r2p - CAST(np AS HUGEINT) * (np + 1)))
                          // (2 * CAST(np AS HUGEINT) * nn)
                END AS BIGINT) AS auc_ppm
    FROM m
    """,
)
def classifier_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language AUC-ROC (exact truncating ppm) of the stopword-ratio
    quality score for predicting DSIR-target-source membership — the
    ranking-power audit in front of the registered calibration and
    threshold-sweep reports. Doubled-average-rank level-frame contract
    in the module docstring; a lang with no positives or no negatives
    reports 0 (undefined AUC, flagged by the n_pos/n_neg columns).

    Scale: corpus → (lang, milli-score) lattice in one combinable
    aggregate; rank window over the ≤1001-level frame; no row-wise
    shuffle anywhere."""
    scored = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.expr(_SCORE).alias("x"),
        F.expr(
            f"case when source in {_DSIR_TGT_SQL} then 1 else 0 end"
        ).alias("y"),
    )
    lvl = scored.groupBy("lang", "x").agg(
        F.expr("cast(sum(y) as bigint)").alias("pos_c"),
        F.expr("cast(count(1) - sum(y) as bigint)").alias("neg_c"),
    )
    w_prev = (
        Window.partitionBy("lang")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = lvl.select(
        "lang",
        "pos_c",
        F.expr("pos_c + neg_c").alias("cnt"),
        F.coalesce(
            F.sum(F.expr("pos_c + neg_c")).over(w_prev), F.lit(0)
        ).alias("prev"),
    )
    m = rk.groupBy("lang").agg(
        F.expr("cast(sum(pos_c) as bigint)").alias("np"),
        F.expr("cast(sum(cnt - pos_c) as bigint)").alias("nn"),
        F.expr(
            "sum(cast(pos_c as decimal(38,0)) * (2 * prev + cnt + 1))"
        ).alias("r2p"),
    )
    return m.select(
        "lang",
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.expr(
            "cast(case when np = 0 or nn = 0 then 0"
            " else (1000000 * (r2p - cast(np as decimal(38,0)) * (np + 1)))"
            " div (2 * cast(np as decimal(38,0)) * nn)"
            " end as bigint)"
        ).alias("auc_ppm"),
    )
