"""Byte-level payload analytics (round 8): Shannon entropy over the raw
BINARY bytes of each payload — the multimodal sibling of
``text_char_entropy``. Character entropy reads decoded text; byte
entropy reads the wire format, which is what a media-ingest pipeline
actually sees: ~log2(256) bits/byte flags encrypted or already-
compressed payloads (don't recompress, maybe quarantine), anomalously
LOW entropy flags padding, truncation, or constant-fill corruption.
On this corpus the payload is the documents' UTF-8 bytes (the
``mm_binary_meta`` stand-in contract), where multi-byte scripts (zh)
visibly diverge from their char-level entropy — the demonstration that
byte and char views are different measurements.

Determinism contract: bytes are enumerated via ``hex()`` of the
payload (both engines hex the identical UTF-8 bytes — the certified
``mm_binary_meta`` parity) and counted exactly; each byte-value's
entropy term cnt·ln(n/cnt) is rounded to integer MICRO-nats per TERM
before the BIGINT sum (the surprisal-family discipline), and the
per-doc normalization is a truncating integer div. Term magnitude is
n·ln(256)·1e6 ≈ 5.5e6·n — BIGINT-safe to ~1.6e12-byte payloads, far
past any single document.

Scale: stride-sampled docs explode to (doc, byte-value) rows — at most
256 distinct values per doc after the count — so the shuffle carries
bounded-alphabet narrow rows; the hex string never leaves its map
stage. The stride keeps the certified output small; dropping it is the
production spelling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_ENT_STRIDE = 10  # doc_id % 10 == 0 -> certified sample


@register(
    "mm_byte_entropy",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, hex(text) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
      WHERE doc_id % {_ENT_STRIDE} = 0 AND text IS NOT NULL
        AND length(text) > 0
    ),
    bytes AS (
      SELECT doc_id, n_bytes, substr(hx, 2 * i - 1, 2) AS bb
      FROM d, unnest(generate_series(1, n_bytes)) AS t(i)
    ),
    cnts AS (
      SELECT doc_id, n_bytes, bb, count(*) AS cnt
      FROM bytes GROUP BY 1, 2, 3
    ),
    terms AS (
      SELECT doc_id, n_bytes,
             CAST(round(1e6 * cnt * ln(CAST(n_bytes AS DOUBLE) / cnt))
                  AS BIGINT) AS t_micro
      FROM cnts
    )
    SELECT doc_id, max(n_bytes) AS n_bytes,
           count(*) AS n_distinct_bytes,
           CAST(sum(t_micro) // max(n_bytes) AS BIGINT) AS h_micro_nats
    FROM terms GROUP BY doc_id
    """,
)
def mm_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shannon entropy (integer micro-nats) of each sampled
    payload's raw bytes, plus its byte-alphabet size — the
    encrypted/compressed/corrupt triage signal (module docstring has
    the contract and the byte-vs-char distinction).

    Scale: row-local hex + explode, then a bounded-alphabet (≤256
    values/doc) narrow aggregate; wide columns never shuffle."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(
            f"doc_id % {_ENT_STRIDE} = 0 and text is not null"
            " and length(text) > 0"
        )
        .select(
            "doc_id",
            F.expr("hex(encode(text, 'UTF-8'))").alias("hx"),
            F.expr("cast(octet_length(text) as bigint)").alias("n_bytes"),
        )
    )
    by = d.select(
        "doc_id",
        "n_bytes",
        "hx",
        F.explode(F.expr("sequence(1, cast(n_bytes as int))")).alias("i"),
    ).select(
        "doc_id",
        "n_bytes",
        F.expr("substr(hx, 2 * i - 1, 2)").alias("bb"),
    )
    cnts = by.groupBy("doc_id", "n_bytes", "bb").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    terms = cnts.select(
        "doc_id",
        "n_bytes",
        F.expr(
            "cast(round(1000000.0D * cnt"
            " * ln(cast(n_bytes as double) / cnt)) as bigint)"
        ).alias("t_micro"),
    )
    return terms.groupBy("doc_id").agg(
        F.max("n_bytes").alias("n_bytes"),
        F.count(F.lit(1)).alias("n_distinct_bytes"),
        F.expr("cast(sum(t_micro) div max(n_bytes) as bigint)").alias(
            "h_micro_nats"
        ),
    )
