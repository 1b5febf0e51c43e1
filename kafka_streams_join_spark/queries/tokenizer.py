"""Tokenizer APPLY: encode the corpus with a trained BPE merge table.

``text_bpe_merge_mining`` (queries/bpe.py) trains merges; this module is
the inference half every token-budget query implicitly presupposes —
encode each document with the trained tokenizer and report its real BPE
token count (``pipeline_pack_sequences`` packs on whitespace counts; the
bpe_per_word fertility emitted here is the correction factor between the
two).

The merge table is a FROZEN artifact (the deployed-model idiom of
``quality_classifier_logreg``'s ``scoring_expr`` and the k-means 6-dp
centroid contract): the first 12 merges mined by the bpe.py loop on the
sf0.01 corpus, checked in as literals so Spark and the DuckDB oracle
apply the byte-identical table. Merge application reuses bpe.py's
sentinel-space ``replace`` contract verbatim (leftmost non-overlapping,
one pass per merge, in priority order — the deterministic variant both
engines share exactly; see bpe.py's module docstring for the
``… a b a b …`` caveat).

Scale design (100 TB): encoding runs on the DISTINCT-WORD vocabulary
(Zipf-bounded, ≪ corpus) — per word, a 12-deep chain of row-local
``replace`` calls, exactly how subword-nmt applies merges to its word
dict. The corpus contributes one (doc_id, word) explode that joins the
encoded vocabulary on the word key and re-aggregates per document:
one narrow-token shuffle in, one doc_id shuffle out, document text never
enters an Exchange, no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register
from .text import _TOKS, _TOKS_SQL

# Frozen merge table: the first 12 merges the bpe.py miner finds on the
# sf0.01 corpus (priority order; later merges build on earlier symbols —
# 'm er', 'p ar', 'jo in' consume round-1 outputs, like a real trainer's
# table). Left/right symbols of every pair are distinct, and application
# order is the training order — the standard BPE apply contract.
BPE_MERGES = [
    "e r", "i n", "o w", "o r", "s t", "m er",
    "a t", "l u", "a r", "p ar", "j o", "jo in",
]


def _apply_merges(sym_expr: str, concat: str, k: int | None = None) -> str:
    """Chain the frozen merges over a space-separated symbol expression.
    ``concat`` is the engine's string-concat spelling ('concat' for Spark,
    '||' handled by the caller passing a format). ``k`` applies only the
    first k merges (merge tables are ordered, so the k-merge tokenizer IS
    the table's prefix — the bpe_sweep dial); default applies the full
    table."""
    e = sym_expr
    for m in BPE_MERGES[: len(BPE_MERGES) if k is None else k]:
        joined = m.replace(" ", "")
        if concat == "spark":
            e = f"trim(replace(concat(' ', {e}, ' '), ' {m} ', ' {joined} '))"
        else:
            e = f"trim(replace(' ' || {e} || ' ', ' {m} ', ' {joined} '))"
    return e


# char-split to a space-joined symbol string — bpe.py's exact idioms
_SYM_SPARK = "array_join(split(word, ''), ' ')"
_SYM_SQL = (
    "array_to_string(list_transform(generate_series(1, length(word)),"
    " i -> word[i]), ' ')"
)


@register(
    "text_bpe_encode_apply",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lower(unnest({_TOKS_SQL})) AS word FROM documents
    ),
    v AS (SELECT DISTINCT word FROM tok),
    enc AS (
      SELECT word,
             len(string_split({_apply_merges(_SYM_SQL, "sql")}, ' ')) AS n_bpe
      FROM v
    )
    SELECT t.doc_id,
           count(*) AS n_words,
           CAST(sum(e.n_bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(e.n_bpe) * 1000000 // count(*) AS BIGINT)
             AS bpe_per_word_ppm
    FROM tok t JOIN enc e USING (word)
    GROUP BY t.doc_id
    """,
)
def text_bpe_encode_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document with the frozen 12-merge BPE table and emit
    its true subword token count plus the per-word fertility (exact ppm)
    — the number that converts whitespace token budgets into tokenizer
    token budgets. Encoding happens once per DISTINCT word (the Zipf
    bound), then joins back to the corpus on the word key.

    Reference scope note: the reference engine has no tokenizer surface
    at all (its 4 Scala tests stop at stream joins); this is part of the
    §2.7 training-data extension family."""
    tok = _staged(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias("word"),
        )
    )
    enc = tok.select("word").distinct().select(
        "word",
        F.expr(
            f"size(split({_apply_merges(_SYM_SPARK, 'spark')}, ' '))"
        ).alias("n_bpe"),
    )
    return (
        tok.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_bpe").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe_tokens",
            F.expr("n_bpe_tokens * 1000000 div n_words").alias(
                "bpe_per_word_ppm"
            ),
        )
    )
