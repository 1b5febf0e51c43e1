"""The dedup impact report (moved from dedup.py in round 6 to add the
SEMANTIC tier, whose contract registers after dedup.py imports).

Round-6 change (VERDICT r5 task #1): a fourth row, ``semantic`` — the
SemDeDup removal rate over ITS corpus (the embeddings table; documents
and embeddings are the two sides of one multimodal corpus). The
``n_docs`` column is therefore each tier's own population: the three
text tiers count documents, the semantic tier counts vectors — removal
ppm stays comparable because every tier is normalized to what it scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .dedup import dedup_cluster_canonical
from .registry import ORACLES, register
from .semdedup import dedup_semantic


@register(
    "dedup_tier_report",
    oracle=f"""
    WITH n AS (SELECT count(*) AS n_docs FROM documents),
    exact AS (
      SELECT 'exact' AS tier, (SELECT n_docs FROM n) AS pop,
             count(DISTINCT md5(text)) AS survivors
      FROM documents
    ),
    normalized AS (
      SELECT 'normalized' AS tier, (SELECT n_docs FROM n) AS pop,
             count(DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))))
               AS survivors
      FROM documents
    ),
    neardup AS (
      SELECT 'neardup_cluster' AS tier, (SELECT n_docs FROM n) AS pop,
             count(DISTINCT canonical_id) AS survivors
      FROM ({ORACLES["dedup_cluster_canonical"]})
    ),
    semantic AS (
      SELECT 'semantic' AS tier,
             count(*) AS pop,
             CAST(sum(kept) AS BIGINT) AS survivors
      FROM ({ORACLES["dedup_semantic"]})
    ),
    tiers AS (
      SELECT * FROM exact UNION ALL
      SELECT * FROM normalized UNION ALL
      SELECT * FROM neardup UNION ALL
      SELECT * FROM semantic
    )
    SELECT tier, pop AS n_docs,
           CAST(survivors AS BIGINT) AS survivors,
           CAST(pop - survivors AS BIGINT) AS removed,
           CAST((pop - survivors) * 1000000 // pop AS BIGINT) AS removed_ppm
    FROM tiers
    """,
)
def dedup_tier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup impact report: how many items EACH tier would remove,
    measured independently against its raw corpus — exact (byte-identical
    text), normalization-exact (whitespace/case-collapsed), transitive
    near-dup clusters (one survivor per cluster), and SEMANTIC (SemDeDup
    keep/drop over the embedding corpus — round-6 addition). The
    before-you-delete summary a pipeline owner reads to pick tiers and
    order (each number is a standalone removal rate, NOT a sequential
    funnel — ``pipeline_curation_funnel`` is the sequential composition).
    Survivor identities reuse the exact contracts the tier queries
    certify: md5(text), the normalized md5 chain,
    ``dedup_cluster_canonical``'s min-label components, and
    ``dedup_semantic``'s greedy per-cell keep rule. ``n_docs`` is each
    tier's own population (documents for the text tiers, vectors for the
    semantic tier).

    Scale: two hash-distinct aggregates over one documents scan, the
    already-gated components pipeline, and the already-gated SemDeDup
    cell pipeline; the report rows are four 1-row aggregates."""
    doc = load_table(spark, sf_dir, "documents")
    n = doc.agg(F.count(F.lit(1)).alias("pop"))
    exact = (
        doc.agg(F.count_distinct(F.md5("text")).alias("survivors"))
        .crossJoin(F.broadcast(n))
        .select(F.lit("exact").alias("tier"), "pop", "survivors")
    )
    normalized = (
        doc.agg(
            F.count_distinct(
                F.md5(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))))
            ).alias("survivors")
        )
        .crossJoin(F.broadcast(n))
        .select(F.lit("normalized").alias("tier"), "pop", "survivors")
    )
    neardup = (
        dedup_cluster_canonical(spark, sf_dir)
        .agg(F.count_distinct("canonical_id").alias("survivors"))
        .crossJoin(F.broadcast(n))
        .select(F.lit("neardup_cluster").alias("tier"), "pop", "survivors")
    )
    semantic = dedup_semantic(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("pop"),
        F.sum("kept").cast("bigint").alias("survivors"),
    ).select(F.lit("semantic").alias("tier"), "pop", "survivors")
    tiers = (
        exact.unionByName(normalized).unionByName(neardup).unionByName(semantic)
    )
    return tiers.select(
        F.col("tier"),
        F.col("pop").alias("n_docs"),
        F.col("survivors").cast("long").alias("survivors"),
        (F.col("pop") - F.col("survivors")).cast("long").alias("removed"),
        F.expr(
            "cast((pop - survivors) * 1000000 div pop as bigint)"
        ).alias("removed_ppm"),
    )
