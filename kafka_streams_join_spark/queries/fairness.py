"""Group-fairness audit (round 11): the EEOC four-fifths (80 %) rule
applied to a curation gate — for each language cohort, the selection
rate of the stopword-ratio quality filter and its DISPARATE-IMPACT
ratio against the best-treated cohort. This is the governance sibling
of ``dq_k_anonymity``/``dq_dp_noisy_counts``: before a corpus ships,
the pipeline must show WHICH cohorts its English-centric heuristics
under-select — the canonical training-data bias (a stopword list is an
English detector in disguise; the audit quantifies exactly that).

Exactness discipline — 100 % integer arithmetic:

- the score and the ≥80-milli gate reuse the AUC module's
  round-half-up integer score, so selection is integer-decided;
- the BEST cohort is found by exact fraction domination (``sel_b·n_a >
  sel_a·n_b``, widened to DECIMAL(38,0)/HUGEINT like every cross
  product here — count×count exceeds BIGINT once cohorts pass ~3e9
  docs) — never by comparing truncated rates, which
  can tie where the exact fractions differ and silently pick the wrong
  reference; among exactly-tied maxima the min-lang row is taken, and
  the DI ratio is provably invariant under that choice (equal exact
  rates ⟹ equal cross products);
- rate and DI outputs are truncating-div ppm of exact integers.

Scale: one map pass + one combinable aggregate collapse the corpus to
a ≤|langs| frame; the domination anti-join and the reference join run
on that tiny frame (broadcast nested loop over single-digit rows — a
deliberate exception to the no-cartesian gate, bounded by the lang
domain, never data-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .auc_eval import _SCORE, _SCORE_SQL
from .registry import register

_SEL_THRESHOLD = 80  # milli-score gate: stopword ratio >= 8 %


@register(
    "dq_group_fairness",
    oracle=f"""
    WITH rates AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN {_SCORE_SQL} >= {_SEL_THRESHOLD}
                           THEN 1 ELSE 0 END) AS BIGINT) AS sel
      FROM documents GROUP BY lang
    ),
    best AS (
      SELECT lang, n, sel FROM rates a
      WHERE NOT EXISTS (
        SELECT 1 FROM rates b
        WHERE CAST(b.sel AS HUGEINT) * a.n > CAST(a.sel AS HUGEINT) * b.n
      )
      ORDER BY lang LIMIT 1
    )
    SELECT r.lang, r.n AS n_docs, r.sel AS n_selected,
           CAST(CAST(r.sel AS HUGEINT) * 1000000 // r.n AS BIGINT) AS rate_ppm,
           CAST(CASE WHEN b.sel = 0 THEN 1000000
                     ELSE (1000000 * CAST(r.sel AS HUGEINT) * b.n)
                     // (CAST(r.n AS HUGEINT) * b.sel)
                END AS BIGINT) AS di_ratio_ppm,
           CASE WHEN b.sel = 0 THEN FALSE
                ELSE (1000000 * CAST(r.sel AS HUGEINT) * b.n)
                     // (CAST(r.n AS HUGEINT) * b.sel) < 800000
           END AS four_fifths_violation
    FROM rates r CROSS JOIN best b
    """,
)
def dq_group_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-fifths-rule audit of the quality gate per language cohort:
    selection rate (exact ppm), disparate-impact ratio vs the
    best-treated cohort (exact fraction domination picks the reference
    — module docstring has the tie-invariance argument), and the
    violation flag at the 0.8 bar. A TRUE row is a cohort the gate
    under-selects to a degree US hiring law would presume
    discriminatory — the pre-release red flag for corpus language
    balance.

    Scale: corpus collapses to the lang frame in one combinable
    aggregate; everything after runs on single-digit rows."""
    rates = _staged(
        load_table(spark, sf_dir, "documents")
        .select(
            "lang",
            F.expr(
                f"case when {_SCORE} >= {_SEL_THRESHOLD} then 1 else 0 end"
            ).alias("s"),
        )
        .groupBy("lang")
        .agg(
            F.expr("cast(count(1) as bigint)").alias("n"),
            F.expr("cast(sum(s) as bigint)").alias("sel"),
        )
    )  # staged: feeds both anti-join sides, best, and the final select
    a = rates.alias("a")
    b = rates.alias("b")
    undominated = a.join(
        F.broadcast(b),
        F.expr(
            "cast(b.sel as decimal(38,0)) * a.n"
            " > cast(a.sel as decimal(38,0)) * b.n"
        ),
        "left_anti",
    )
    best = (
        undominated.orderBy("lang")
        .limit(1)
        .select(
            F.col("lang").alias("b_lang"),
            F.col("n").alias("b_n"),
            F.col("sel").alias("b_sel"),
        )
    )
    return rates.crossJoin(F.broadcast(best)).select(
        "lang",
        F.col("n").alias("n_docs"),
        F.col("sel").alias("n_selected"),
        F.expr("cast(cast(sel as decimal(38,0)) * 1000000 div n as bigint)").alias("rate_ppm"),
        F.expr(
            "cast(case when b_sel = 0 then 1000000"
            " else (1000000 * cast(sel as decimal(38,0)) * b_n)"
            " div (cast(n as decimal(38,0)) * b_sel)"
            " end as bigint)"
        ).alias("di_ratio_ppm"),
        F.expr(
            "case when b_sel = 0 then false"
            " else (1000000 * cast(sel as decimal(38,0)) * b_n)"
            " div (cast(n as decimal(38,0)) * b_sel) < 800000"
            " end"
        ).alias("four_fifths_violation"),
    )
