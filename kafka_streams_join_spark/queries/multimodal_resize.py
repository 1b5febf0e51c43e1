"""Resize on the DECODED plane (round 14): the one step of the brief's
multimodal quartet (decode / feature-extract / resize / frame-sample) that
did not yet exist as a first-class op. ``mm_frame_sample`` strides the RAW
bytes and ``mm_decode_features`` / ``mm_phash_decoded`` decode without
rescaling; this op performs the canonical thumbnailing step between them:
payload → real 24-bit BMP container → strict parse → exact-integer BT.601
luma plane (h×w) → NEAREST-NEIGHBOR resize to a fixed 8×8 thumbnail
(source cell (r,c) ← pixel (r·h div 8, c·w div 8) — the standard integer
NN rule, well-defined for up- AND down-scaling since source geometry spans
3..31 × 2..18).

Certification (same design as ``mm_decode_features``, multimodal.py:102):
pixel content is a deterministic function of the payload bytes, so the
DuckDB oracle recomputes each thumbnail cell in closed form from the hex
byte stream. The emitted columns certify three distinct failure surfaces:
``thumb_sum`` the resize arithmetic, ``thumb_wsum`` = Σ (idx+1)·L over
ROW-MAJOR thumbnail order (order-sensitive — a transposed or flipped
resize passes the sum but fails this), and the above-mean bit signature
split into two signed-safe 32-bit halves (``thumb_ahash_lo/hi`` — the
thumbnail-then-ahash pipeline every perceptual-dedup system runs, packed
as two BIGINTs because bit 63 of a single word would wrap the sign).
All integer; no float leaves either engine.

Scale: one pruned 2-column scan → Arrow-batched ``mapInPandas`` (decode +
resize are row-local; nothing shuffles — the ``mm_frame_sample`` rule) →
64-cell-bounded per-doc state. The oracle's 64-rows-per-doc unnest exists
only on the certification side.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..sources.parquet import load_table
from .multimodal import (
    _BMP_H_MIN,
    _BMP_H_MOD,
    _BMP_W_MIN,
    _BMP_W_MOD,
    _LUMA_SQL,
    _bmp_encode,
    _bmp_pixels,
)
from .registry import register

_RS = 8  # thumbnail grid: 8x8 = 64 cells

_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("thumb_sum", LongType()),
        StructField("thumb_wsum", LongType()),
        StructField("thumb_ahash_lo", LongType()),
        StructField("thumb_ahash_hi", LongType()),
    ]
)


def _resize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Decode-then-resize kernel: real BMP round-trip (strict container
    parse via ``_bmp_pixels``), integer luma, nearest-neighbor 8×8."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            if not b:
                continue
            blob = _bmp_encode(b)
            px = _bmp_pixels(blob)  # (npix, 3) int64, image order, B/G/R
            _, w, h = struct.unpack_from("<Iii", blob, 14)
            luma = (299 * px[:, 2] + 587 * px[:, 1] + 114 * px[:, 0]) // 1000
            plane = luma.reshape(h, w)
            rsel = (np.arange(_RS, dtype=np.int64) * h) // _RS
            csel = (np.arange(_RS, dtype=np.int64) * w) // _RS
            thumb = plane[np.ix_(rsel, csel)].ravel()  # row-major 64 cells
            tsum = int(thumb.sum())
            idx = np.arange(1, _RS * _RS + 1, dtype=np.int64)
            wsum = int((idx * thumb).sum())
            lo = hi = 0
            for k in range(_RS * _RS):
                if int(thumb[k]) * (_RS * _RS) > tsum:
                    if k < 32:
                        lo |= 1 << k
                    else:
                        hi |= 1 << (k - 32)
            rows.append((int(doc_id), w, h, tsum, wsum, lo, hi))
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "width",
                "height",
                "thumb_sum",
                "thumb_wsum",
                "thumb_ahash_lo",
                "thumb_ahash_hi",
            ],
        )


@register(
    "mm_resize_decoded",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
      WHERE octet_length(encode(text)) > 0
    ),
    geom AS (
      SELECT doc_id, hx, n,
             n % {_BMP_W_MOD} + {_BMP_W_MIN} AS w,
             n % {_BMP_H_MOD} + {_BMP_H_MIN} AS h
      FROM b
    ),
    cells AS (
      SELECT doc_id, hx, n, w, h, t.i AS idx,
             ((t.i // {_RS}) * h // {_RS}) * w
               + ((t.i % {_RS}) * w // {_RS}) AS p
      FROM geom, unnest(generate_series(0, {_RS * _RS - 1})) AS t(i)
    ),
    vv AS (
      SELECT doc_id, idx,
             CAST(('0x' || substr(hx, 2 * ((p % n) + 1) - 1, 2)) AS INT)
               AS v
      FROM cells
    ),
    lum AS (
      SELECT doc_id, idx, CAST({_LUMA_SQL} AS BIGINT) AS L FROM vv
    ),
    tot AS (SELECT doc_id, sum(L) AS tsum FROM lum GROUP BY doc_id),
    ah AS (
      SELECT l.doc_id,
             CAST(sum((idx + 1) * L) AS BIGINT) AS thumb_wsum,
             CAST(sum(CASE WHEN L * {_RS * _RS} > t.tsum AND idx < 32
                           THEN 1::BIGINT << idx ELSE 0 END) AS BIGINT)
               AS thumb_ahash_lo,
             CAST(sum(CASE WHEN L * {_RS * _RS} > t.tsum AND idx >= 32
                           THEN 1::BIGINT << (idx - 32) ELSE 0 END)
                  AS BIGINT) AS thumb_ahash_hi
      FROM lum l JOIN tot t USING (doc_id)
      GROUP BY l.doc_id
    )
    SELECT g.doc_id,
           CAST(g.w AS INTEGER) AS width,
           CAST(g.h AS INTEGER) AS height,
           CAST(t.tsum AS BIGINT) AS thumb_sum,
           ah.thumb_wsum, ah.thumb_ahash_lo, ah.thumb_ahash_hi
    FROM geom g JOIN tot t USING (doc_id) JOIN ah USING (doc_id)
    """,
)
def mm_resize_decoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + nearest-neighbor resize to a fixed 8×8 luma thumbnail via
    Arrow-batched mapInPandas, certified in closed form by the oracle
    (module docstring has the NN rule, the three certification surfaces,
    and the scale contract)."""
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return doc.mapInPandas(_resize_batches, schema=_RESIZE_SCHEMA)
