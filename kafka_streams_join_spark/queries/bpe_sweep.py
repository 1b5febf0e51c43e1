"""BPE merge-count sweep (round 12): corpus fertility (BPE tokens per
word) and compression (chars per BPE token) at four merge-table sizes
(0/4/8/12 merges) — the vocabulary-size dial of tokenizer design. Every
tokenizer team plots exactly this curve (more merges → fewer, longer
tokens → cheaper training, until returns diminish); this computes it on
the corpus with the frozen merge table the apply path already ships
(``tokenizer.py:BPE_MERGES``), so the curve is the real deployment's,
not a re-trained approximation.

Prefix semantics: BPE merge tables are ordered — the k-merge tokenizer
IS the first k rows of the full table — so the sweep encodes each
DISTINCT word once per level by stopping the sentinel-space replace
chain early (four chained-expression columns in one projection over the
Zipf-bounded vocabulary; the corpus contributes one word explode that
joins the encoded vocab and re-aggregates, the certified
``text_bpe_encode_apply`` shape).

Exactness: token counts per word are exact (the bpe.py deterministic
replace contract, byte-identical in both engines); corpus totals are
exact BIGINT sums; fertility_ppm and chars_per_token_milli are
truncating divs. Monotonicity (more merges never more tokens) is pinned.

Scale: one corpus scan (word explode) collapsed map-side to per-word
counts (the one shuffle — Zipf-bounded vocabulary rows, not corpus
tokens), one vocab-sized projection with the four chains weighting each
word's counts by its corpus frequency, ONE global aggregate, a 4-row
stack. Document text never enters an Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register
from .text import _TOKS, _TOKS_SQL
from .tokenizer import _SYM_SPARK, _SYM_SQL, _apply_merges

_MERGE_LEVELS = (0, 4, 8, 12)


@register(
    "text_bpe_merge_sweep",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lower(unnest({_TOKS_SQL})) AS word FROM documents
    ),
    v AS (SELECT DISTINCT word FROM tok),
    enc AS (
      SELECT word, length(word) AS n_chars,
             {", ".join(
                 f"len(string_split({_apply_merges(_SYM_SQL, 'sql', k)},"
                 f" ' ')) AS t{k}"
                 for k in _MERGE_LEVELS
             )}
      FROM v
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(e.n_chars) AS BIGINT) AS n_chars,
             {", ".join(
                 f"CAST(sum(e.t{k}) AS BIGINT) AS s{k}"
                 for k in _MERGE_LEVELS
             )}
      FROM tok t JOIN enc e USING (word)
    ),
    rows_ AS (
      {" UNION ALL ".join(
          f"SELECT CAST({k} AS BIGINT) AS merges, n_words, n_chars,"
          f" s{k} AS n_bpe_tokens FROM m"
          for k in _MERGE_LEVELS
      )}
    )
    SELECT merges, n_words, n_bpe_tokens,
           CAST(CAST(n_bpe_tokens AS HUGEINT) * 1000000 // n_words AS BIGINT)
             AS fertility_ppm,
           CAST(CAST(n_chars AS HUGEINT) * 1000 // n_bpe_tokens AS BIGINT)
             AS chars_per_token_milli
    FROM rows_
    """,
)
def text_bpe_merge_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per merge-table size {ks}: corpus word count, BPE token count,
    fertility (tokens per word, exact ppm), and compression (chars per
    token, exact milli). Module docstring has the prefix-table,
    vocabulary-encode, and exactness contracts."""
    # Round 15 (guide §2.3, aggregate before you shuffle): collapse the
    # corpus word stream to per-word COUNTS first — one map-side-combined
    # shuffle of (word, cnt) — then encode each distinct word once and
    # weight its token/char counts by cnt. The previous shape joined the
    # full corpus token stream against the encoded vocabulary (a
    # corpus-sized SortMergeJoin); corpus totals are identical integers:
    # Σ_tokens f(word) = Σ_words cnt·f(word).
    wc = load_table(spark, sf_dir, "documents").select(
        F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias(
            "word"
        ),
    ).groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    enc = wc.select(
        "cnt",
        F.length("word").alias("n_chars"),
        *[
            F.expr(
                f"size(split({_apply_merges(_SYM_SPARK, 'spark', k)}, ' '))"
            ).alias(f"t{k}")
            for k in _MERGE_LEVELS
        ],
    )
    m = enc.agg(
        F.sum("cnt").cast("bigint").alias("n_words"),
        F.sum(F.col("cnt") * F.col("n_chars")).cast("bigint").alias("n_chars"),
        *[
            F.sum(F.col("cnt") * F.col(f"t{k}")).cast("bigint").alias(f"s{k}")
            for k in _MERGE_LEVELS
        ],
    )
    stack_args = ", ".join(f"{k}L, s{k}" for k in _MERGE_LEVELS)
    return m.select(
        F.expr(
            f"stack({len(_MERGE_LEVELS)}, {stack_args})"
            " as (merges, n_bpe_tokens)"
        ),
        "n_words",
        "n_chars",
    ).select(
        "merges",
        "n_words",
        "n_bpe_tokens",
        F.expr("cast(cast(n_bpe_tokens as decimal(38,0)) * 1000000 div n_words"
            " as bigint)").alias(
            "fertility_ppm"
        ),
        F.expr("cast(cast(n_chars as decimal(38,0)) * 1000 div n_bpe_tokens"
            " as bigint)").alias(
            "chars_per_token_milli"
        ),
    )


text_bpe_merge_sweep.__doc__ = text_bpe_merge_sweep.__doc__.replace(
    "{ks}", "/".join(str(k) for k in _MERGE_LEVELS)
)
