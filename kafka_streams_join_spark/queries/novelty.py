"""Corpus novelty decay (round 12): how much NEW content each slice of
an arriving corpus still contributes — per arrival decile, the share of
its distinct 3-word shingles never seen in any earlier decile. THE
curve a data-acquisition team reads before paying for the next crawl
batch: when novelty_ppm flattens toward zero, additional data from the
same source is re-buying content already owned (the measured companion
to the dedup tiers, which REMOVE the repeats this query FORECASTS).

Arrival order on this corpus is doc_id (the synthetic tables assign ids
in generation order); deciles are exact integer buckets
``doc_id * 10 div (max_id + 1)`` — deterministic in both engines, no
ntile/global-sort window anywhere.

Shingling reuses THE contract from ``dedup.py`` verbatim (whitespace
tokens → 3-word shingles), so "novel shingle" here means exactly what
the near-dup family means by it.

Scale: the shingle explode is map-side; the (decile, shingle) distinct
is one shuffle; the first-seen aggregate (shingle → min decile) and the
per-decile histogram are map-side-combinable aggregates over that
STAGED frame; the membership join is shingle-keyed equi. The output is
10 rows. Nothing wider than the distinct shingle frame crosses an
Exchange, and deciles cap the frame at ~10× the distinct-shingle count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register
from .dedup import _SHINGLE_ARRAY, _TOKS, _TOKS_SQL


@register(
    "docs_ngram_novelty_decay",
    oracle=f"""
    WITH nd AS (
      SELECT max(doc_id) + 1 AS hi FROM documents
    ),
    tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    ds AS (
      SELECT DISTINCT
             CAST(tok.doc_id * 10 // nd.hi AS BIGINT) AS decile,
             toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS shingle
      FROM tok CROSS JOIN nd,
           unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS t(i)
    ),
    fs AS (
      SELECT shingle, min(decile) AS first_seen FROM ds GROUP BY shingle
    )
    SELECT ds.decile,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN fs.first_seen = ds.decile THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(CAST(sum(CASE WHEN fs.first_seen = ds.decile
                         THEN 1 ELSE 0 END) AS HUGEINT)
                * 1000000 // count(*) AS BIGINT) AS novelty_ppm
    FROM ds JOIN fs ON fs.shingle = ds.shingle
    GROUP BY ds.decile
    """,
)
def docs_ngram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty-decay curve: per arrival decile of the document corpus,
    the count of distinct 3-word shingles present in that decile and how
    many of them first appear there (exact ppm share). Module docstring
    has the arrival-order, shingling-contract, and scale notes.

    Scale: staged (decile, shingle) distinct frame fans into the
    first-seen aggregate and the membership join; 10-row output."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hi = docs.agg((F.max("doc_id") + 1).alias("hi"))
    ds = _staged(
        docs.crossJoin(F.broadcast(hi))
        .withColumn("toks", F.expr(_TOKS))
        .select(
            F.expr("cast(doc_id * 10 div hi as bigint)").alias("decile"),
            F.explode(F.expr(_SHINGLE_ARRAY)).alias("shingle"),
        )
        .distinct()
    )
    fs = ds.groupBy("shingle").agg(F.min("decile").alias("first_seen"))
    return (
        ds.join(fs, "shingle")
        .groupBy("decile")
        .agg(
            F.expr("cast(count(1) as bigint)").alias("n_shingles"),
            F.expr(
                "cast(sum(case when first_seen = decile then 1 else 0 end)"
                " as bigint)"
            ).alias("n_new"),
            F.expr(
                "cast(cast(sum(case when first_seen = decile then 1"
                " else 0 end) as decimal(38,0))"
                " * 1000000 div count(1) as bigint)"
            ).alias("novelty_ppm"),
        )
    )
