"""Tokenizer training: BPE merge mining over the corpus vocabulary.

The one pipeline stage between raw text and every token-budget number in
this repo is the tokenizer, and training one is itself a corpus-scale
job: byte-pair encoding (Sennrich et al. ACL'16) repeatedly finds the
most frequent adjacent symbol pair (weighted by word frequency) and
merges it. This operator mines the first T merges the way real trainers
(subword-nmt, HuggingFace tokenizers) do:

- ONE corpus scan builds the word-frequency table — after that, every
  merge round runs on the VOCABULARY (Zipf-bounded, ≪ corpus), exactly
  like the reference trainers' word-count dict. At 100 TB the corpus
  contributes one token-count aggregate; the iterations are a rounding
  error.
- each round: explode the current symbol sequences into adjacent pairs,
  sum word weights per pair (map-side combined), take the global top
  pair (ties broken on the pair string — engine-stable), broadcast it,
  and apply the merge to the vocabulary map-side.

Merge-application contract (both engines, byte-identical): the symbol
sequence is space-joined with sentinel spaces and the pair is applied
with leftmost non-overlapping ``replace``. On an immediate repetition of
the same pair inside one word (… a b a b …) this merges alternate
occurrences where classic greedy BPE merges both — a deterministic
variant both engines share exactly; on an [a-z]-word vocabulary such
runs are rare and the MINED merge ranking is unaffected on this corpus
(the oracle proves it end to end). Integer frequencies throughout — no
float anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register
from .text import _TOKS, _TOKS_SQL

_BPE_ROUNDS = 3
_TOP_PER_ROUND = 5

# adjacent pairs of the space-split symbol string; the CASE guards 1-symbol
# words (sequence(1, 0) counts DOWN in Spark — the dedup.py trap)
_PAIRS_SPARK = (
    "CASE WHEN size(s) < 2 THEN array() ELSE"
    " transform(sequence(1, size(s) - 1), i -> concat(s[i - 1], ' ', s[i])) END"
)
# DuckDB's generate_series(1, 0) is already empty (no descending trap)
_PAIRS_SQL = "list_transform(generate_series(1, len(s) - 1), i -> s[i] || ' ' || s[i + 1])"


def _oracle_sql() -> str:
    parts = [
        f"""WITH words AS (
      SELECT token AS word, count(*) AS wc FROM (
        SELECT unnest({_TOKS_SQL}) AS token FROM documents)
      WHERE regexp_matches(token, '^[a-z]+$')
      GROUP BY token
    ),
    v0 AS (
      SELECT word, wc,
             array_to_string(list_transform(generate_series(1, length(word)),
                                            i -> word[i]), ' ') AS sym
      FROM words
    )"""
    ]
    for r in range(1, _BPE_ROUNDS + 1):
        parts.append(
            f""",
    p{r} AS (
      SELECT pair, sum(wc) AS freq,
             row_number() OVER (ORDER BY sum(wc) DESC, pair) AS rnk
      FROM (
        SELECT wc, unnest({_PAIRS_SQL}) AS pair
        FROM (SELECT wc, string_split(sym, ' ') AS s FROM v{r - 1}))
      GROUP BY pair
    ),
    m{r} AS (SELECT pair FROM p{r} WHERE rnk = 1),
    v{r} AS (
      SELECT word, wc,
             trim(replace(' ' || sym || ' ',
                          ' ' || m{r}.pair || ' ',
                          ' ' || replace(m{r}.pair, ' ', '') || ' ')) AS sym
      FROM v{r - 1}, m{r}
    )"""
        )
    selects = [
        f"SELECT {r} AS merge_round, rnk, pair, CAST(freq AS BIGINT) AS freq"
        f" FROM p{r} WHERE rnk <= {_TOP_PER_ROUND}"
        for r in range(1, _BPE_ROUNDS + 1)
    ]
    return "".join(parts) + " " + " UNION ALL ".join(selects)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(pair, freq, rnk): adjacent-pair frequencies over the current
    vocabulary, weighted by word count, globally ranked."""
    w = Window.orderBy(F.col("freq").desc(), F.col("pair"))
    return (
        vocab.select("wc", F.split("sym", " ").alias("s"))
        .select("wc", F.explode(F.expr(_PAIRS_SPARK)).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("wc").alias("freq"))
        .withColumn("rnk", F.row_number().over(w))
    )


@register("text_bpe_merge_mining", oracle=_oracle_sql())
def text_bpe_merge_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine the first {_BPE_ROUNDS} BPE merges from the corpus, emitting
    each round's top-{_TOP_PER_ROUND} pair candidates (merge_round, rnk,
    pair, freq). The winning pair of each round is broadcast and applied
    to the vocabulary before the next round's counts — so rounds 2+ see
    merged symbols, exactly like a real trainer.

    Scale shape: the corpus is scanned once for the word-frequency
    aggregate (one token shuffle, map-side combined). Every subsequent
    stage — pair explode, pair counts, the 1-row top-pair broadcast, the
    map-side merge application — runs over the Zipf-bounded vocabulary.
    The global rank window sorts pair aggregates, which are bounded by
    the vocabulary's distinct adjacent pairs, not by the corpus."""
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(F.expr(f"{_TOKS}")).alias("word")
    )
    vocab = _staged(
        tok.filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .select(
            "word",
            "wc",
            F.expr("array_join(split(word, ''), ' ')").alias("sym"),
        )
    )
    out = []
    for r in range(1, _BPE_ROUNDS + 1):
        pairs = _staged(_pair_counts(vocab))
        out.append(
            pairs.filter(F.col("rnk") <= _TOP_PER_ROUND).select(
                F.lit(r).alias("merge_round"), "rnk", "pair", "freq"
            )
        )
        top = pairs.filter(F.col("rnk") == 1).select("pair")
        vocab = vocab.crossJoin(F.broadcast(top)).select(
            "word",
            "wc",
            F.trim(
                F.expr(
                    "replace(concat(' ', sym, ' '),"
                    " concat(' ', pair, ' '),"
                    " concat(' ', replace(pair, ' ', ''), ' '))"
                )
            ).alias("sym"),
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionAll(o)
    return res
