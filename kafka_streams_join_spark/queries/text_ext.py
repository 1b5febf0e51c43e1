"""Text-analysis extensions (round 2): corpus-statistical quality scoring.

``text_quality_score`` (queries/text.py) scores documents with per-document
heuristics (length, punctuation, stopword ratios). This adds the corpus-level
signal real curation pipelines combine with it: **unigram surprisal** — a
document whose tokens are improbable under the corpus's own unigram language
model is boilerplate, noise, or the wrong language. Two aggregation passes,
both shuffle-light: vocab build is one hash-agg on token, scoring is one
broadcast join + one hash-agg on doc_id.

Registered after the proven tail — outside the driver's current sweep
window (local-oracle-proven; rotated in a later round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from ..operators.staging import staged as _staged
from .registry import register
from .text import _TOKS, _TOKS_SQL


@register(
    "text_unigram_surprisal",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lower(unnest({_TOKS_SQL})) AS token FROM documents
    ),
    vocab AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    total AS (SELECT sum(c) AS t FROM vocab)
    SELECT doc_id,
           count(*) AS n_tokens,
           round(avg(-ln(v.c / (SELECT t FROM total))), 4) AS avg_surprisal
    FROM tok JOIN vocab v USING (token)
    GROUP BY doc_id
    """,
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average unigram surprisal per document, under the corpus's own
    unigram model: -ln(count(token)/total_tokens), averaged over the
    document. High surprisal = improbable text (noise, wrong language);
    low = boilerplate. No smoothing needed — every scored token is in the
    vocabulary by construction.

    Scale shape: the vocabulary is Zipf-bounded (≪ corpus size), so it
    broadcasts into the scoring join and the corpus shuffles only once, on
    doc_id, for the final average. The total-token count is a 1-row
    broadcast scalar."""
    # staged: the exploded token frame feeds the vocab build, the scalar
    # total, AND the scoring join — one corpus scan, three consumers
    tok = _staged(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias("token"),
        )
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    return (
        tok.join(F.broadcast(vocab), "token")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c") / F.col("t"))), 4).alias("avg_surprisal"),
        )
    )
