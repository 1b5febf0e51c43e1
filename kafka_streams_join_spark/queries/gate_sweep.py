"""Quality-gate threshold sweep (round 12): per language, how much of
the corpus survives the C4/Gopher-style quality filter at five score
bars (0.4–0.8) — the single most consequential dial in a curation
pipeline (the quality bar IS the data budget), reported per language
because an English-tuned score under-keeps other languages (the
``dq_group_fairness`` finding, here as the curve that shows WHERE the
bar starts biting each language).

Scoring reuses the registered ``text_quality_score`` formula verbatim
via its INTEGER e4 form — quality_e4 = floor(score·10⁴ + 0.5), the
query's own engine-stable rounding contract — and thresholds compare
integers (quality_e4 ≥ 4000/…/8000), so the sweep never compares
floats across engines. Kept-document and kept-token counts are exact;
ppm shares are truncating divs.

Scale: ONE pruned scan computes (lang, n_tokens, quality_e4) row-
locally; the 5-row threshold dial broadcasts onto it (map-side
fan-out) and one combinable (threshold, lang) aggregate produces the
bounded thresholds × languages report. No join of data-sized frames,
no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.literals import values_frame
from ..sources.parquet import load_table
from .registry import register
from .text import _STOP, _TOKS, _TOKS_SQL

_GATE_E4 = (4000, 5000, 6000, 7000, 8000)

_SCORE_E4_SQL = """
  floor((0.5 * least(n_tokens / 100.0, 1.0)
       + 0.3 * least(n_stop * 5.0 / greatest(n_tokens, 1), 1.0)
       + 0.2 * (1.0 - least(n_punct * 10.0 / greatest(n_char, 1), 1.0)))
       * 10000 + 0.5)
"""


@register(
    "text_quality_gate_sweep",
    oracle=f"""
    WITH feat AS (
      SELECT lang,
             len({_TOKS_SQL}) AS n_tokens,
             len(list_filter({_TOKS_SQL},
                 t -> t IN ('the', 'a', 'of', 'and'))) AS n_stop,
             length(text) - length(regexp_replace(text, '[[:punct:]]', '',
                                                  'g')) AS n_punct,
             length(text) AS n_char
      FROM documents
    ),
    scored AS (
      SELECT lang, n_tokens,
             CAST({_SCORE_E4_SQL} AS BIGINT) AS quality_e4
      FROM feat
    ),
    ts AS (SELECT unnest([{", ".join(str(t) for t in _GATE_E4)}]) AS t)
    SELECT CAST(ts.t AS BIGINT) AS threshold_e4, s.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN s.quality_e4 >= ts.t THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(CAST(sum(CASE WHEN s.quality_e4 >= ts.t THEN 1 ELSE 0 END)
                     AS HUGEINT)
                * 1000000 // count(*) AS BIGINT) AS kept_ppm,
           CAST(sum(s.n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN s.quality_e4 >= ts.t THEN s.n_tokens
                    ELSE 0 END) AS BIGINT) AS n_tokens_kept,
           CAST(CAST(sum(CASE WHEN s.quality_e4 >= ts.t THEN s.n_tokens
                         ELSE 0 END) AS HUGEINT) * 1000000
                // greatest(sum(s.n_tokens), 1) AS BIGINT)
             AS token_kept_ppm
    FROM scored s CROSS JOIN ts
    GROUP BY ts.t, s.lang
    """,
)
def text_quality_gate_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (threshold, language): documents and token mass surviving the
    quality gate at score bars {ts}, in exact counts and ppm. Module
    docstring has the integer-e4, verbatim-formula, and one-scan
    contracts."""
    feat = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.expr(f"size({_TOKS})").alias("n_tokens"),
        F.expr(
            f"size(filter({_TOKS}, t -> array_contains({_STOP}, t)))"
        ).alias("n_stop"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[!-/:-@\[-`{-~]", ""))
        ).alias("n_punct"),
        F.length("text").alias("n_char"),
    )
    scored = feat.select(
        "lang",
        "n_tokens",
        F.expr(f"cast({_SCORE_E4_SQL} as bigint)").alias("quality_e4"),
    )
    ts = values_frame(spark, [(t,) for t in _GATE_E4], "t long")
    kept = F.when(F.col("quality_e4") >= F.col("t"), 1).otherwise(0)
    kept_toks = F.when(
        F.col("quality_e4") >= F.col("t"), F.col("n_tokens")
    ).otherwise(0)
    return (
        scored.crossJoin(F.broadcast(ts))
        .groupBy("t", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(kept).cast("bigint").alias("n_kept"),
            F.sum(F.col("n_tokens")).cast("bigint").alias("n_tokens"),
            F.sum(kept_toks).cast("bigint").alias("n_tokens_kept"),
        )
        .select(
            F.col("t").cast("bigint").alias("threshold_e4"),
            "lang",
            "n_docs",
            "n_kept",
            F.expr("cast(cast(n_kept as decimal(38,0)) * 1000000 div n_docs"
            " as bigint)").alias(
                "kept_ppm"
            ),
            "n_tokens",
            "n_tokens_kept",
            F.expr(
                "cast(cast(n_tokens_kept as decimal(38,0)) * 1000000"
                " div greatest(n_tokens, 1) as bigint)"
            ).alias("token_kept_ppm"),
        )
    )


text_quality_gate_sweep.__doc__ = text_quality_gate_sweep.__doc__.replace(
    "{ts}", "/".join(f"0.{t // 1000}" for t in _GATE_E4)
)
