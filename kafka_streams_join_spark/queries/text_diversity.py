"""Lexical diversity indices (round 9, wave 2): Simpson's family over
the per-language token distribution — the concentration view of corpus
health that entropy (registered: char/user/byte) and Zipf slope
(registered) don't give directly. Gini–Simpson is the probability two
random tokens differ; inverse Simpson is the "effective vocabulary
size" (how many equally-common types would look this concentrated) —
the number a data-mixing plan actually wants per language bucket.

Exactness: Simpson's λ on a finite sample is Σc(c−1)/(N(N−1)) — a
ratio of EXACT integers (DECIMAL(38,0): Σc² ≤ N² = 1e24 at a trillion
tokens), so both indices are one float division of identical exact
operands. No probability ever exists as a float sum.

Tokenization is the repo-wide whitespace contract (``text.py _TOKS``),
verbatim, so the counts agree with every other token-level query.

Scale: explode → (lang, token) count → per-lang moment sums: two
map-side-combinable aggregates; the (lang, token) shuffle is narrow
(two small columns) and vocabulary-bounded after the first combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register
from .text import _TOKS, _TOKS_SQL


@register(
    "text_simpson_diversity",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest({_TOKS_SQL}) AS tok
      FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
    ),
    cnt AS (
      SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    ),
    m AS (
      SELECT lang,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             sum(CAST(c AS HUGEINT) * (c - 1)) AS s2
      FROM cnt GROUP BY lang
    )
    SELECT lang, n_tokens, n_types,
           CASE WHEN n_tokens < 2 THEN 0
                ELSE CAST(round(1000000
                     * CAST(CAST(n_tokens AS HUGEINT) * (n_tokens - 1) - s2
                            AS DOUBLE)
                     / CAST(CAST(n_tokens AS HUGEINT) * (n_tokens - 1)
                            AS DOUBLE)) AS BIGINT)
           END AS gini_simpson_ppm,
           CASE WHEN s2 + n_tokens <= 0 THEN 0
                ELSE CAST(round(1000
                     * CAST(CAST(n_tokens AS HUGEINT) * n_tokens AS DOUBLE)
                     / CAST(s2 + n_tokens AS DOUBLE)) AS BIGINT)
           END AS inv_simpson_milli
    FROM m
    """,
)
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language lexical diversity: token and type counts,
    Gini–Simpson in ppm (P[two random tokens differ], exact-integer
    numerator/denominator), and inverse Simpson in milli units — the
    effective vocabulary size, computed from Σc² = s2 + N (module
    docstring has the contract). Low inverse-Simpson relative to
    n_types flags a language bucket dominated by a few boilerplate
    tokens — a mixing-weight red flag no raw count shows.

    Scale: two map-side-combinable aggregates; the only shuffle keys
    are (lang, token)."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .filter("text is not null and length(trim(text)) > 0")
        .select("lang", F.explode(F.expr(_TOKS)).alias("tok"))
    )
    cnt = tok.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    m = cnt.groupBy("lang").agg(
        F.expr("cast(sum(c) as bigint)").alias("n_tokens"),
        F.expr("cast(count(1) as bigint)").alias("n_types"),
        F.expr("sum(cast(c as decimal(38,0)) * (c - 1))").alias("s2"),
    )
    return m.select(
        "lang",
        "n_tokens",
        "n_types",
        F.expr(
            "case when n_tokens < 2 then cast(0 as bigint)"
            " else cast(round(1000000"
            " * cast(cast(n_tokens as decimal(38,0)) * (n_tokens - 1) - s2"
            "        as double)"
            " / cast(cast(n_tokens as decimal(38,0)) * (n_tokens - 1)"
            "        as double)) as bigint) end"
        ).alias("gini_simpson_ppm"),
        F.expr(
            "case when s2 + n_tokens <= 0 then cast(0 as bigint)"
            " else cast(round(1000"
            " * cast(cast(n_tokens as decimal(38,0)) * n_tokens as double)"
            " / cast(s2 + n_tokens as double)) as bigint) end"
        ).alias("inv_simpson_milli"),
    )
