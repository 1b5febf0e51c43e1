"""Perceptual-hash radius sweep (round 12): near-dup pair and flagged-
asset counts at four Hamming radii (0/2/5/8) over the certified
``mm_phash_neardup`` machinery — the multimodal dedup dial (radius 0 is
bit-exact ahash identity; each wider radius admits more re-encodes /
crops / recompressions AND more false matches; this curve is how the
radius gets picked, per corpus, instead of inherited).

Candidate-set semantics (the recall contract, inherited verbatim from
mm_phash_neardup and certified by its uncapped-identical oracle): pairs
come from the banded-LSH equi-join ({bands} bands × {bb} bits).
Pigeonhole guarantees every pair with Hamming ≤ {bands} − 1 is a
candidate; wider radii count qualifying pairs AMONG CANDIDATES — the
same definition on both engines, stated here exactly as the
SHINGLE_DF_CAP contract states its bound. All counts exact integers
(bit_count over XOR); ppm = truncating div over the hashable-blob
count.

Scale: one payload scan through the Arrow ahash kernel (the wide bytes
never shuffle — only (doc_id, ahash) leaves the scan), band-bucket
equi-join candidates (never all-pairs), then ONE aggregate with the
four radii as conditional sums + conditional count-distincts. The
sweep adds no second scan and no second join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .multimodal import (
    _PH_BAND_BITS,
    _PH_BANDS,
    _PH_SCHEMA,
    _ahash_batches,
)
from ..operators.staging import staged as _staged
from ..functions.literals import values_frame
from ..sources.parquet import load_table
from .registry import register

_PH_RADII = (0, 2, 5, 8)


@register(
    "mm_phash_radius_sweep",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    bytes AS (
      SELECT doc_id, n,
             CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS INT) AS v,
             (i - 1) * 32 // n AS k
      FROM b, unnest(generate_series(1, n)) AS t(i)
    ),
    chunks AS (
      SELECT doc_id, n, k, sum(v) AS csum, count(*) AS ccnt,
             sum(sum(v)) OVER (PARTITION BY doc_id) AS total
      FROM bytes GROUP BY doc_id, n, k
    ),
    hashes AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN csum * n > total * ccnt
                           THEN 1::BIGINT << k ELSE 0 END) AS BIGINT) AS ahash
      FROM chunks GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, ahash, t.band,
             (ahash >> (band * {_PH_BAND_BITS}))
               & {(1 << _PH_BAND_BITS) - 1} AS band_val
      FROM hashes, unnest(generate_series(0, {_PH_BANDS - 1})) AS t(band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.ahash, b.ahash)) AS hamming
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
    ),
    rs AS (SELECT unnest([{", ".join(str(r) for r in _PH_RADII)}]) AS r),
    nh AS (SELECT CAST(count(*) AS BIGINT) AS n_assets FROM hashes),
    sweep AS (
      SELECT rs.r,
             CAST(count(c.doc_b) AS BIGINT) AS n_pairs,
             CAST(count(DISTINCT c.doc_b) AS BIGINT) AS n_flagged
      FROM rs LEFT JOIN cand c ON c.hamming <= rs.r
      GROUP BY rs.r
    )
    SELECT CAST(s.r AS BIGINT) AS radius, s.n_pairs, s.n_flagged,
           CAST(CAST(s.n_flagged AS HUGEINT) * 1000000 // nh.n_assets AS BIGINT)
             AS removal_ppm,
           nh.n_assets
    FROM sweep s CROSS JOIN nh
    """,
)
def mm_phash_radius_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per Hamming radius {rs}: qualifying near-dup pairs among the
    banded-LSH candidates, assets flagged (higher id of a pair), and
    the removal fraction of hashable assets in exact ppm. Module
    docstring has the candidate-set recall contract and the
    bytes-never-shuffle scale story."""
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    hashes = _staged(doc.mapInPandas(_ahash_batches, schema=_PH_SCHEMA))
    mask = (1 << _PH_BAND_BITS) - 1
    bands = hashes.select(
        "doc_id",
        "ahash",
        F.explode(F.array(*[F.lit(i) for i in range(_PH_BANDS)])).alias(
            "band"
        ),
    ).withColumn(
        "band_val", F.expr(f"(ahash >> (band * {_PH_BAND_BITS})) & {mask}")
    )
    a = bands.select(
        F.col("band").alias("band_a"),
        F.col("band_val").alias("bv_a"),
        F.col("doc_id").alias("doc_a"),
        F.col("ahash").alias("ha"),
    )
    b = bands.select(
        F.col("band").alias("band_b"),
        F.col("band_val").alias("bv_b"),
        F.col("doc_id").alias("doc_b"),
        F.col("ahash").alias("hb"),
    )
    cand = (
        a.join(
            b,
            (F.col("band_a") == F.col("band_b"))
            & (F.col("bv_a") == F.col("bv_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr("cast(bit_count(ha ^ hb) as bigint)").alias("hamming"),
        )
        .distinct()
    )
    rs = values_frame(spark, [(r,) for r in _PH_RADII], "r long")
    sweep = (
        cand.crossJoin(F.broadcast(rs))
        .groupBy("r")
        .agg(
            F.sum(F.when(F.col("hamming") <= F.col("r"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pairs"),
            F.countDistinct(
                F.when(F.col("hamming") <= F.col("r"), F.col("doc_b"))
            )
            .cast("bigint")
            .alias("n_flagged"),
        )
    )
    sweep_full = rs.join(sweep, "r", "left").select(
        "r",
        F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
        F.coalesce("n_flagged", F.lit(0)).cast("bigint").alias("n_flagged"),
    )
    nh = hashes.agg(F.count(F.lit(1)).cast("bigint").alias("n_assets"))
    return sweep_full.crossJoin(F.broadcast(nh)).select(
        F.col("r").cast("bigint").alias("radius"),
        "n_pairs",
        "n_flagged",
        F.expr("cast(cast(n_flagged as decimal(38,0)) * 1000000 div n_assets"
            " as bigint)").alias(
            "removal_ppm"
        ),
        "n_assets",
    )


mm_phash_radius_sweep.__doc__ = mm_phash_radius_sweep.__doc__.replace(
    "{rs}", "/".join(str(r) for r in _PH_RADII)
)
__doc__ = __doc__.replace("{bands}", str(_PH_BANDS)).replace(
    "{bb}", str(_PH_BAND_BITS)
)
