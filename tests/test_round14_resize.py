"""Round-14 ``mm_resize_decoded``: decode → nearest-neighbor 8×8 luma
thumbnail (``queries/multimodal_resize.py``).

Layers per §5.2: a pure-Python exact replay of the whole chain (payload
bytes → closed-form geometry → NN source indices → integer luma → the
three certification aggregates), a direct kernel unit test on a crafted
payload (including the flip-sensitivity of ``thumb_wsum``), and the plan
gates (pruned 2-column scan; the op is row-local so the plan must contain
NO Exchange at all)."""

from __future__ import annotations

from kafka_streams_join_spark.plans import (
    assert_read_schema_pruned,
    explain_str,
)
from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.queries.multimodal_resize import (
    _RS,
    _resize_batches,
)
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE

W_MOD, W_MIN, H_MOD, H_MIN = 29, 3, 17, 2  # frozen geometry contract


def _py_thumb(payload: bytes):
    """Closed-form replay: no BMP container, just the pixel contract —
    pixel p has v = payload[p mod n], luma = (299·(7v%256) + 587·(255−v)
    + 114·v) // 1000; thumbnail cell (r,c) reads pixel (r·h//8, c·w//8)."""
    n = len(payload)
    w, h = n % W_MOD + W_MIN, n % H_MOD + H_MIN
    cells = []
    for r in range(_RS):
        for c in range(_RS):
            p = (r * h // _RS) * w + (c * w // _RS)
            v = payload[p % n]
            cells.append((299 * (v * 7 % 256) + 587 * (255 - v) + 114 * v) // 1000)
    tsum = sum(cells)
    wsum = sum((i + 1) * x for i, x in enumerate(cells))
    lo = sum(1 << k for k in range(32) if cells[k] * 64 > tsum)
    hi = sum(1 << (k - 32) for k in range(32, 64) if cells[k] * 64 > tsum)
    return w, h, tsum, wsum, lo, hi


def test_resize_matches_pure_python_replay(spark):
    docs = {
        r["doc_id"]: r["text"].encode()
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    }
    got = {
        r["doc_id"]: r
        for r in QUERIES["mm_resize_decoded"](spark, SF_SMOKE).collect()
    }
    assert set(got) == {d for d, b in docs.items() if b}
    for doc_id, b in docs.items():
        if not b:
            continue
        w, h, tsum, wsum, lo, hi = _py_thumb(b)
        r = got[doc_id]
        assert (r["width"], r["height"]) == (w, h)
        assert r["thumb_sum"] == tsum
        assert r["thumb_wsum"] == wsum
        assert (r["thumb_ahash_lo"], r["thumb_ahash_hi"]) == (lo, hi)


def test_resize_kernel_direct_and_flip_sensitivity():
    """Drive the mapInPandas kernel directly on crafted payloads: the
    replay must agree, a constant payload must set zero ahash bits (strict
    above-mean rule), and reversing the payload must change thumb_wsum
    when it changes the thumbnail (order sensitivity)."""
    import pandas as pd

    payloads = {
        1: bytes(range(200)),          # varied bytes
        2: b"\x42" * 100,              # constant plane -> 0 ahash bits
        3: bytes(range(200))[::-1],    # reversed no. 1
    }
    pdf = pd.DataFrame(
        {"doc_id": list(payloads), "payload": list(payloads.values())}
    )
    out = list(_resize_batches(iter([pdf])))[0].set_index("doc_id")
    for doc_id, b in payloads.items():
        w, h, tsum, wsum, lo, hi = _py_thumb(b)
        row = out.loc[doc_id]
        assert (row["width"], row["height"]) == (w, h)
        assert (row["thumb_sum"], row["thumb_wsum"]) == (tsum, wsum)
        assert (row["thumb_ahash_lo"], row["thumb_ahash_hi"]) == (lo, hi)
    assert out.loc[2, "thumb_ahash_lo"] == 0 and out.loc[2, "thumb_ahash_hi"] == 0
    # same byte multiset, different order -> different thumbnail reading
    assert out.loc[1, "thumb_wsum"] != out.loc[3, "thumb_wsum"]


def test_resize_plan_is_row_local(spark):
    """Pruned 2-column scan and NO Exchange anywhere: decode + resize are
    row-local; bytes never shuffle (the mm_frame_sample rule)."""
    df = QUERIES["mm_resize_decoded"](spark, SF_SMOKE)
    assert_read_schema_pruned(df, max_columns=2)
    plan = explain_str(df)
    assert "Exchange" not in plan, plan[:1500]
    assert "CartesianProduct" not in plan
