"""Positional phrase search (round 11): exact-phrase retrieval via the
POSITIONAL POSTINGS JOIN — the IR operator under every search engine's
quoted-phrase query, and the missing rung between the registered
``text_bm25_search`` (bag-of-words ranking) and
``text_keyword_in_context`` (single-term windows). The corpus explodes
to (doc, term, position) postings FOR THE PHRASE'S TERMS ONLY, and a
phrase hit is the equi-join ``postings(w₁) ⋈ postings(w₂) ON same doc,
adjacent positions`` — at scale this is a co-partitioned join of two
pre-filtered posting lists, never a rescan of the text.

Phrase constant: "table hash" (a high-frequency corpus bigram, so the
operator exercises multi-hit docs at every SF — non-vacuous by
construction).

Exactness: positions and counts are exact integers; the rate output is
a truncating-div ppm of exact token totals (positive operands, DuckDB
``//`` ≡ Spark ``div``). No float anywhere.

Scale: the candidate-doc prefilter (``array_contains`` both terms) cuts
the explode to matching docs; the postings carry only the two phrase
terms; the adjacency join keys on (doc, pos) so Spark co-partitions
both sides on one shuffle each; per-source rollups are map-side
combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register
from .text import _TOKS, _TOKS_SQL

_W1 = "table"
_W2 = "hash"


@register(
    "text_phrase_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKS_SQL} AS t
      FROM documents
    ),
    totals AS (
      SELECT source, CAST(sum(len(t)) AS BIGINT) AS n_tokens
      FROM toks GROUP BY source
    ),
    cand AS (
      SELECT * FROM toks
      WHERE list_contains(t, '{_W1}') AND list_contains(t, '{_W2}')
    ),
    post AS (
      SELECT doc_id, source, t[i] AS term, i AS pos
      FROM cand, generate_series(1, 400) s(i)
      WHERE i <= len(t) AND t[i] IN ('{_W1}', '{_W2}')
    ),
    hits AS (
      SELECT p1.source, p1.doc_id
      FROM post p1 JOIN post p2
        ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
      WHERE p1.term = '{_W1}' AND p2.term = '{_W2}'
    ),
    occ AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM hits GROUP BY source
    )
    SELECT t.source, coalesce(o.n_docs, 0) AS n_docs,
           coalesce(o.n_occurrences, 0) AS n_occurrences,
           CAST(coalesce(o.n_occurrences, 0) * 1000000 // t.n_tokens
                AS BIGINT) AS occ_ppm_tokens
    FROM totals t LEFT JOIN occ o ON o.source = t.source
    """,
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase ("table hash") retrieval per source: candidate docs
    prefiltered by containment, postings built for the two phrase terms
    only, adjacency decided by the (doc, pos)=(doc, pos+1) equi-join,
    and the per-source phrase rate reported in exact ppm of that
    source's token volume. Module docstring has the postings-join scale
    contract.

    The oracle bounds positions at 400 (generate_series); corpus docs
    are far shorter at every SF — the Spark side uses true positions
    via posexplode, so a longer-doc corpus would surface as a parity
    break, not silent truncation (max doc here ≈ 60 tokens)."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_TOKS).alias("t")
    )
    totals = toks.groupBy("source").agg(
        F.expr("cast(sum(size(t)) as bigint)").alias("n_tokens")
    )
    cand = toks.filter(
        F.expr(f"array_contains(t, '{_W1}') and array_contains(t, '{_W2}')")
    )
    post = (
        cand.select(
            "doc_id",
            "source",
            F.posexplode("t").alias("pos0", "term"),
        )
        .filter(F.col("term").isin(_W1, _W2))
        # 1-based positions to mirror the oracle's list indexing
        .select(
            "doc_id", "source", "term", (F.col("pos0") + 1).alias("pos")
        )
    )
    p1 = post.filter(F.col("term") == _W1).alias("p1")
    p2 = post.filter(F.col("term") == _W2).alias("p2")
    hits = p1.join(
        p2,
        (F.expr("p1.doc_id = p2.doc_id"))
        & (F.expr("p2.pos = p1.pos + 1")),
    ).select(F.expr("p1.source").alias("source"), F.expr("p1.doc_id").alias("doc_id"))
    occ = hits.groupBy("source").agg(
        F.expr("cast(count(1) as bigint)").alias("n_occurrences"),
        F.expr("cast(count(distinct doc_id) as bigint)").alias("n_docs"),
    )
    return (
        totals.join(occ, "source", "left")
        .select(
            "source",
            F.expr("coalesce(n_docs, cast(0 as bigint))").alias("n_docs"),
            F.expr("coalesce(n_occurrences, cast(0 as bigint))").alias(
                "n_occurrences"
            ),
            F.expr(
                "cast(coalesce(n_occurrences, 0) * 1000000 div n_tokens"
                " as bigint)"
            ).alias("occ_ppm_tokens"),
        )
    )
