"""Reservoir sampling, distributed the Spark way (round 8 — the
VERDICT-r7 "reservoir-sample twin" wave item).

Classic Algorithm R keeps a k-slot reservoir while streaming rows past
it. The order-statistics restatement is what distributes: assign every
row an i.i.d. uniform key and keep the k smallest — identical output
law, and in Spark it compiles to the ONE pattern the engine already
optimizes end-to-end: ``row_number() OVER (PARTITION BY stratum ORDER BY
key) <= k`` becomes a ``WindowGroupLimit``, i.e. every input partition
keeps only its local top-k BEFORE the shuffle — each task literally
maintains a k-slot reservoir, and the exchange merges reservoirs instead
of rows. That map-side truncation is the whole scale story: the shuffle
carries O(k · partitions) rows no matter how many billions flow in.

The uniform key is the corpus-shuffle 60-bit md5 rank (salted so this
sample is independent of ``pipeline_global_shuffle``'s order and of the
hash-split assignment), making the "random" sample fully deterministic
and hash-certifiable — the seeded-sampling discipline every reproducible
training pipeline wants anyway.

Siblings, for the registry map: ``pipeline_weighted_sample`` is the
WEIGHTED reservoir (Efraimidis–Spirakis keys), ``pipeline_stratified_
sample`` takes a per-stratum FRACTION; this is the fixed-k-per-stratum
UNIFORM reservoir — the third sampling contract an LLM-data pipeline
reaches for (exactly k docs per language for an eval set, say).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_RES_K = 20  # reservoir slots per stratum (lang)

_RES_KEY_SPARK = (
    "cast(conv(substring(md5(concat('res8_', cast(doc_id as string))),"
    " 1, 15), 16, 10) as bigint)"
)
_RES_KEY_SQL = (
    "CAST(('0x' || substr(md5('res8_' || CAST(doc_id AS VARCHAR)), 1, 15))"
    " AS BIGINT)"
)


@register(
    "pipeline_reservoir_sample",
    oracle=f"""
    SELECT lang, slot, doc_id, n_chars FROM (
      SELECT lang, doc_id, n_chars,
             CAST(row_number() OVER (
                    PARTITION BY lang
                    ORDER BY {_RES_KEY_SQL} ASC, doc_id ASC)
                  AS BIGINT) AS slot
      FROM documents
    ) WHERE slot <= {_RES_K}
    """,
)
def pipeline_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k={_RES_K}-per-language reservoir sample of the document
    corpus: rank every doc inside its stratum by the salted 60-bit md5
    key (ties impossible — the key is injective-enough at 60 bits, and
    doc_id breaks the theoretical collision), keep slots 1..k. The
    module docstring carries the Algorithm-R ≡ bottom-k-by-uniform-key
    equivalence and the WindowGroupLimit scale argument.

    Scale: rank-filter over a partitioned window → WindowGroupLimit →
    every map task keeps ≤ k rows per stratum before the exchange; the
    shuffle is k·partitions rows of (lang, key, doc_id, n_chars) — the
    text column is never read (pruned at the scan)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    w = Window.partitionBy("lang").orderBy(
        F.expr(_RES_KEY_SPARK).asc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("slot", F.row_number().over(w).cast("bigint"))
        .filter(F.col("slot") <= _RES_K)
        .select("lang", "slot", "doc_id", "n_chars")
    )
