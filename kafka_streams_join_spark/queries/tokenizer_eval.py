"""Tokenizer-economics evaluation (round 9, wave 4).

``pipeline_tokenizer_fertility`` — FERTILITY (BPE tokens per whitespace
word) and compression (chars per BPE token) per language: the two
numbers a tokenizer evaluation actually reports, and the per-language
cost model a token-budget plan needs (a language with 2× fertility
burns 2× budget for the same text). Composes the repo's two certified
token contracts verbatim: the whitespace ``_TOKS`` split and the
GPT-2-style BPE pre-tokenization regex of ``text_token_count_bpe``.

``text_script_mix`` — character-class composition per language (latin
letters / digits / whitespace / other-ASCII / non-ASCII) as exact ppm:
the code-switching and mojibake triage the n-gram ``text_lang_id``
can't give, because lang-id reports the WINNING language while the mix
reports how much of the text that verdict actually covers.

Determinism: class counts are ``length(x) − length(regexp_replace(x,
class, ''))`` — pure integer; DuckDB's regexp_replace takes the 'g'
flag (the known trap), Spark's is global by default. All ratios are
exact truncating integer divisions of nonnegative counts (``div`` ≡
``//`` on nonneg).

Scale: both queries are one scan → row-local projections → one
map-side-combinable per-language aggregate. No joins, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register
from .text import _TOKS, _TOKS_SQL

_BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
# Spark SQL single-quoted literals PROCESS backslash escapes ('\s' -> 's',
# silently corrupting the class to [^a-zA-Z0-9s]); DuckDB's do not. Same
# regex, two spellings — the text_token_count_bpe precedent.
_BPE_RE_SPARK = _BPE_RE.replace("\\", "\\\\")


@register(
    "pipeline_tokenizer_fertility",
    oracle=f"""
    WITH d AS (
      SELECT lang,
             len({_TOKS_SQL}) AS ws,
             len(regexp_extract_all(text, '{_BPE_RE}')) AS bpe,
             length(text) AS ch
      FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ws) AS BIGINT) AS ws_tokens,
           CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
           CAST(sum(ch) AS BIGINT) AS n_chars,
           CAST(CAST(sum(bpe) AS HUGEINT) * 1000
                // greatest(sum(ws), 1) AS BIGINT) AS fertility_milli,
           CAST(CAST(sum(ch) AS HUGEINT) * 1000
                // greatest(sum(bpe), 1) AS BIGINT) AS chars_per_bpe_milli
    FROM d GROUP BY lang
    """,
)
def pipeline_tokenizer_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer fertility (BPE tokens per whitespace word, milli) and
    compression (chars per BPE token, milli) per language, over the
    repo's certified token contracts (module docstring). Fertility ≈
    1300-1500 on English-like text; a language bucket far above that is
    the budget-plan line item to renegotiate.

    Scale: one scan, row-local token counts, one per-language
    aggregate."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter("text is not null and length(trim(text)) > 0")
        .select(
            "lang",
            F.expr(f"size({_TOKS})").alias("ws"),
            F.expr(
                f"size(regexp_extract_all(text, '{_BPE_RE_SPARK}', 0))"
            ).alias("bpe"),
            F.length("text").alias("ch"),
        )
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("cast(sum(ws) as bigint)").alias("ws_tokens"),
        F.expr("cast(sum(bpe) as bigint)").alias("bpe_tokens"),
        F.expr("cast(sum(ch) as bigint)").alias("n_chars"),
        F.expr(
            "cast(cast(sum(bpe) as decimal(38,0)) * 1000"
            " div greatest(sum(ws), 1) as bigint)"
        ).alias("fertility_milli"),
        F.expr(
            "cast(cast(sum(ch) as decimal(38,0)) * 1000"
            " div greatest(sum(bpe), 1) as bigint)"
        ).alias("chars_per_bpe_milli"),
    )


@register(
    "text_script_mix",
    oracle=r"""
    WITH d AS (
      SELECT lang, length(text) AS n,
             length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
               AS latin,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
               AS digit,
             length(text) - length(regexp_replace(text, '[ \t\n\r]', '', 'g'))
               AS space,
             length(regexp_replace(text, '[ -~\t\n\r]', '', 'g'))
               AS non_ascii
      FROM documents WHERE text IS NOT NULL AND length(text) > 0
    )
    SELECT lang,
           CAST(sum(n) AS BIGINT) AS n_chars,
           CAST(CAST(sum(latin) AS HUGEINT) * 1000000
                // greatest(sum(n), 1) AS BIGINT) AS latin_ppm,
           CAST(CAST(sum(digit) AS HUGEINT) * 1000000
                // greatest(sum(n), 1) AS BIGINT) AS digit_ppm,
           CAST(CAST(sum(space) AS HUGEINT) * 1000000
                // greatest(sum(n), 1) AS BIGINT) AS space_ppm,
           CAST(CAST(sum(n) - sum(latin) - sum(digit) - sum(space)
                     - sum(non_ascii) AS HUGEINT) * 1000000
                // greatest(sum(n), 1) AS BIGINT) AS other_ascii_ppm,
           CAST(CAST(sum(non_ascii) AS HUGEINT) * 1000000
                // greatest(sum(n), 1) AS BIGINT) AS non_ascii_ppm
    FROM d GROUP BY lang
    """,
)
def text_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per language in exact ppm: latin
    letters, digits, whitespace, other printable ASCII, and non-ASCII
    (module docstring). A 'en' bucket with high non_ascii_ppm is
    mojibake or code-switching; a 'zh' bucket that is mostly latin is a
    lang-id miss — either way, the triage starts here.

    Scale: one scan, five row-local regexp counts, one per-language
    aggregate."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter("text is not null and length(text) > 0")
        .select(
            "lang",
            F.length("text").alias("n"),
            F.expr(
                "length(text) - length(regexp_replace(text, '[A-Za-z]', ''))"
            ).alias("latin"),
            F.expr(
                "length(text) - length(regexp_replace(text, '[0-9]', ''))"
            ).alias("digit"),
            F.expr(
                "length(text)"
                r" - length(regexp_replace(text, '[ \\t\\n\\r]', ''))"
            ).alias("space"),
            F.expr(
                r"length(regexp_replace(text, '[ -~\\t\\n\\r]', ''))"
            ).alias("non_ascii"),
        )
    )
    g = d.groupBy("lang").agg(
        F.expr("cast(sum(n) as bigint)").alias("n_chars"),
        F.expr("sum(latin)").alias("latin"),
        F.expr("sum(digit)").alias("digit"),
        F.expr("sum(space)").alias("space"),
        F.expr("sum(non_ascii)").alias("non_ascii"),
    )

    def _ppm(num: str, alias: str):
        return F.expr(
            f"cast(cast({num} as decimal(38,0)) * 1000000"
            " div greatest(n_chars, 1) as bigint)"
        ).alias(alias)

    return g.select(
        "lang",
        "n_chars",
        _ppm("latin", "latin_ppm"),
        _ppm("digit", "digit_ppm"),
        _ppm("space", "space_ppm"),
        _ppm("n_chars - latin - digit - space - non_ascii", "other_ascii_ppm"),
        _ppm("non_ascii", "non_ascii_ppm"),
    )
