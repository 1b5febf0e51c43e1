"""Hubness audit (round 12): the k-occurrence distribution of the exact
top-k neighbor lists — for each corpus vector, how many queries retrieve
it — reported as a histogram with an explicit antihub (occurrence-0)
row. Hubness is the classic high-dimensional pathology (Radovanović et
al., JMLR'10): as dimensionality grows, a few "hub" vectors appear in
everyone's neighbor list while most are never retrieved, which silently
degrades retrieval diversity, kNN classification, and SemDeDup-style
semantic dedup. This is the embedding-health gate read NEXT TO
``emb_isotropy_audit`` before trusting the similarity tiers.

Ground truth: the REGISTERED ``sim_topk_bruteforce`` neighbor lists
(oracle composed verbatim — the certified exact tier, never a
re-derivation), so the audited lists are bit-identical to the family's
recall baselines.

Exactness: occurrences and the histogram are exact counts; the antihub
row is n_corpus − |distinct retrieved|; share_ppm is a truncating div
of exact BIGINTs over n_corpus. No float beyond the already-certified
brute-force leg.

Scale: the input is the Q·K result frame (query-batch-sized, never
corpus-sized); the occurrence rollup and histogram are two combinable
aggregates over it; the corpus appears only in the 1-row count
aggregate that sizes the antihub row and the ppm denominator. At
100 TB this is the cost of the recall audit plus three tiny
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import ORACLES, register
from .similarity import sim_topk_bruteforce


@register(
    "sim_hubness_audit",
    oracle=f"""
    WITH bf AS ({ORACLES["sim_topk_bruteforce"]}),
    occ AS (
      SELECT neighbor_id, CAST(count(*) AS BIGINT) AS k_occurrence
      FROM bf GROUP BY neighbor_id
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM embeddings),
    hist AS (
      SELECT k_occurrence, CAST(count(*) AS BIGINT) AS n_vectors
      FROM occ GROUP BY k_occurrence
      UNION ALL
      SELECT CAST(0 AS BIGINT),
             n.n_corpus - (SELECT CAST(count(*) AS BIGINT) FROM occ)
      FROM n
    )
    SELECT h.k_occurrence, h.n_vectors,
           CAST(CAST(h.n_vectors AS HUGEINT) * 1000000 // n.n_corpus AS BIGINT)
             AS share_ppm
    FROM hist h CROSS JOIN n
    """,
)
def sim_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-occurrence histogram of the exact top-k lists: how many corpus
    vectors are retrieved by 0, 1, 2, … queries, with corpus shares in
    exact ppm. The occurrence-0 row counts the antihubs. Module
    docstring has the reuse, exactness, and Q·K-sized-input contracts."""
    bf = sim_topk_bruteforce(spark, sf_dir).select("neighbor_id")
    # staged: occ feeds both the histogram and the retrieved-count leg —
    # unstaged, each consumer would re-run the brute-force GEMM lineage
    occ = _staged(
        bf.groupBy("neighbor_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("k_occurrence")
        )
    )
    hist = occ.groupBy("k_occurrence").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    )
    n = (
        load_table(spark, sf_dir, "embeddings")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_corpus"))
    )
    retrieved = occ.agg(F.count(F.lit(1)).cast("bigint").alias("n_retrieved"))
    zero = (
        n.crossJoin(F.broadcast(retrieved))
        .select(
            F.lit(0).cast("bigint").alias("k_occurrence"),
            (F.col("n_corpus") - F.col("n_retrieved")).alias("n_vectors"),
        )
    )
    return (
        hist.unionByName(zero)
        .crossJoin(F.broadcast(n))
        .select(
            "k_occurrence",
            "n_vectors",
            F.expr("cast(cast(n_vectors as decimal(38,0)) * 1000000 div n_corpus"
                " as bigint)").alias(
                "share_ppm"
            ),
        )
    )
