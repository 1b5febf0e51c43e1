"""Incremental (batch-vs-corpus) near-dup — the production shape of dedup.

``dedup_minhash_lsh`` answers "which pairs inside this corpus collide"; a
live ingestion pipeline asks a different question every day: "which of the
NEW documents duplicate something ALREADY IN the corpus". That asymmetric
probe is what this module provides, reusing the exact signature contract of
``dedup.py`` (same shingles, same K=32 permutations, same 8×4 banding) so a
signatures table written by the full-corpus job is directly probe-able by
the incremental job — the two are one system, not two codebases.

Scale shape (the point of the split): the base-corpus band index is built
ONCE and persisted (here recomputed from parquet because the sandbox has no
catalog — at 100 TB it is a bucketed signatures table, written by the full
job, read pre-partitioned on band_sig). The daily batch is orders of
magnitude smaller than the corpus, so the probe join's streamed side is
tiny, candidate verification touches only colliding documents' shingle
sets, and the corpus is never re-paired against itself. Re-running the full
self-join daily would be O(corpus) per day; the incremental probe is
O(batch + collisions).

Membership is a deterministic id-hash slice (``doc_id % 10 = 3`` plays the
"today's crawl" batch) for the same reason every pipeline op here avoids
rand(): rerun-stable, and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register
from .dedup import (
    _BANDS,
    _K,
    _MINHASH_SQL_PARAMS,
    _P,
    _SHINGLES_SQL,
    JACCARD_THRESHOLD,
    _doc_shingle_sets,
    _minhash_bands,
)

# "today's batch" = this id-hash slice; everything else is the base corpus
_IS_BATCH = "doc_id % 10 = 3"


@register(
    "dedup_incremental_minhash",
    oracle=f"""
    {_SHINGLES_SQL},
    hashed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT)  AS h32,
             CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h60
      FROM sh
    ),
    params(i, a, b) AS (VALUES {_MINHASH_SQL_PARAMS}),
    mh AS (
      SELECT doc_id, i AS hash_idx, min((a * h32 + b) % {_P}) AS mh
      FROM hashed, params GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, hash_idx // {_K // _BANDS} AS band,
             md5(string_agg(mh::VARCHAR, ',' ORDER BY hash_idx)) AS band_sig
      FROM mh GROUP BY doc_id, hash_idx // {_K // _BANDS}
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS batch_id, y.doc_id AS base_id
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_sig = y.band_sig
      WHERE x.{_IS_BATCH} AND NOT (y.{_IS_BATCH})
    ),
    sizes AS (SELECT doc_id, count(DISTINCT h60) AS n FROM hashed GROUP BY doc_id),
    inter AS (
      SELECT c.batch_id, c.base_id, count(DISTINCT a.h60) AS c
      FROM cand c
      JOIN hashed a ON a.doc_id = c.batch_id
      JOIN hashed b ON b.doc_id = c.base_id AND b.h60 = a.h60
      GROUP BY 1, 2
    ),
    dups AS (
      SELECT batch_id, count(*) AS n_dups
      FROM inter
      JOIN sizes sa ON sa.doc_id = batch_id
      JOIN sizes sb ON sb.doc_id = base_id
      WHERE c * 1.0 / (sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
      GROUP BY batch_id
    )
    SELECT d.doc_id,
           CAST(coalesce(u.n_dups, 0) AS BIGINT) AS n_dups,
           CAST(u.batch_id IS NULL AS INT)       AS kept
    FROM documents d LEFT JOIN dups u ON u.batch_id = d.doc_id
    WHERE d.{_IS_BATCH}
    """,
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admission decision for every batch document: how many base-corpus
    documents it near-duplicates (exact Jaccard >= {JACCARD_THRESHOLD} over
    the shared shingle sets, LSH-banded candidates only), and the resulting
    keep flag (kept = no base match). One row per batch doc — including
    shingle-less short docs, which trivially pass.

    Plan: signatures/bands come from the shared ``_doc_shingle_sets`` /
    ``_minhash_bands`` contract (one shuffle on doc_id; the batch/base
    filters sit on the grouping key so Catalyst pushes them below the
    aggregate and into the scan). The probe is a (band, band_sig) equi-join
    with the small batch side streamed against the base index, verification
    joins only the candidate ids back onto the shingle sets, and the final
    per-batch-doc count is a hash-agg over the (rare) hits.
    """
    docsets = _doc_shingle_sets(spark, sf_dir)
    bands = _minhash_bands(docsets)
    batch_bands = bands.filter(F.expr(_IS_BATCH))
    base_bands = bands.filter(~F.expr(_IS_BATCH))
    cand = (
        batch_bands.alias("x")
        .join(
            base_bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_sig") == F.col("y.band_sig")),
        )
        .select(
            F.col("x.doc_id").alias("batch_id"), F.col("y.doc_id").alias("base_id")
        )
        .distinct()
    )
    sa = docsets.alias("sa")
    sb = docsets.alias("sb")
    inter = F.size(F.expr("array_intersect(sa.hs60, sb.hs60)"))
    union = F.size(F.col("sa.hs60")) + F.size(F.col("sb.hs60")) - inter
    dups = (
        cand.join(sa, F.col("batch_id") == F.col("sa.doc_id"))
        .join(sb, F.col("base_id") == F.col("sb.doc_id"))
        .filter((inter / union) >= JACCARD_THRESHOLD)
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n_dups"))
    )
    batch_docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.expr(_IS_BATCH))
        .select("doc_id")
    )
    return batch_docs.join(
        dups, F.col("doc_id") == F.col("batch_id"), "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("n_dups"), F.lit(0)).alias("n_dups"),
        F.col("batch_id").isNull().cast("int").alias("kept"),
    )
