"""Round-13 pins: ADVICE-r12 fixes and the new quadratic-baseline guards.

Each test pins a specific contract introduced or repaired this round so a
regression is caught by name, not by a downstream parity diff.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kafka_streams_join_spark.streaming.heavy_hitters import (
    MG_K,
    _mg_fn,
    mg_step,
)


class _FakeState:
    """Minimal GroupState stand-in: _mg_fn touches exists/get/update only."""

    def __init__(self):
        self.exists = False
        self._tuple = None

    @property
    def get(self):
        return self._tuple

    def update(self, t):
        self._tuple = t
        self.exists = True


def test_mg_decrement_storm_emits_no_empty_frame():
    """ADVICE-r12: k counters at 1 plus one unseen key empties the summary;
    the operator must emit NOTHING (not a 0-row object-dtype frame)."""
    state = _FakeState()
    rows = [(t, t, t) for t in range(1, MG_K + 1)] + [(99, 99, 99)]
    pdf = pd.DataFrame(rows, columns=["ts_us", "event_id", "user_id"])
    out = list(_mg_fn((0,), iter([pdf]), state))
    assert out == []
    keys, counts, e, n_seen, batch_seq = state.get
    assert list(keys) == [] and list(counts) == []
    assert e == 1 and n_seen == MG_K + 1 and batch_seq == 1
    # and the reference automaton agrees the summary is empty
    counters: dict[int, int] = {}
    e2 = 0
    for _, _, uid in rows:
        e2 = mg_step(counters, MG_K, uid, e2)
    assert counters == {} and e2 == 1


def test_mg_nonempty_snapshot_still_emits():
    """The guard must not suppress normal snapshots."""
    state = _FakeState()
    pdf = pd.DataFrame(
        [(1, 1, 7), (2, 2, 7), (3, 3, 8)],
        columns=["ts_us", "event_id", "user_id"],
    )
    (out,) = list(_mg_fn((5,), iter([pdf]), state))
    assert sorted(zip(out["user_id"], out["est"])) == [(7, 2), (8, 1)]
    assert set(out["shard"]) == {5}
    # dtypes must be integral (Arrow coercion to the long schema is exact)
    for c in ["shard", "batch_seq", "user_id", "est", "e_shard", "n_seen"]:
        assert out[c].dtype.kind == "i", (c, out[c].dtype)


def test_gate_score_total_on_empty_document(spark):
    """ADVICE-r12: the shared quality-score formula must be total — a
    zero-token / zero-char document divides by greatest(x,1) so Spark and
    DuckDB agree (unguarded, Spark yields NULL but DuckDB yields inf)."""
    from kafka_streams_join_spark.queries.gate_sweep import _SCORE_E4_SQL

    feat = "SELECT 0 AS n_tokens, 0 AS n_stop, 0 AS n_punct, 0 AS n_char"
    spark_val = (
        spark.sql(f"SELECT cast({_SCORE_E4_SQL} as bigint) AS q FROM ({feat})")
        .collect()[0]["q"]
    )
    duck_val = duckdb.sql(
        f"SELECT CAST({_SCORE_E4_SQL} AS BIGINT) AS q FROM ({feat})"
    ).fetchone()[0]
    assert spark_val is not None and spark_val == duck_val == 2000
    # (0.2 weight survives: n_punct*10/max(n_char,1) = 0 → term = 0.2)


SF_DIR = "/root/testdata/sf0.001"


def test_row_ceiling_guard_raises_and_passes(spark):
    from kafka_streams_join_spark.operators.guards import (
        TestScaleCeilingError,
        enforce_row_ceiling,
    )

    df = spark.range(10)
    assert (
        enforce_row_ceiling(df, op_name="x", ceiling=10, scale_path="y") == 10
    )
    with pytest.raises(TestScaleCeilingError, match="the_scale_path"):
        enforce_row_ceiling(
            df, op_name="x", ceiling=9, scale_path="the_scale_path"
        )


def test_quadratic_baselines_enforce_ceiling(spark, monkeypatch):
    """The two exact baselines must refuse past their ceilings — the
    docstring contract is executable (VERDICT r12 item 3)."""
    import kafka_streams_join_spark.queries.dedup as dedup
    import kafka_streams_join_spark.queries.similarity as sim
    from kafka_streams_join_spark.operators.guards import (
        TestScaleCeilingError,
    )

    with monkeypatch.context() as m:
        m.setattr(dedup, "_COS_CEILING", 1)
        with pytest.raises(TestScaleCeilingError, match="dedup_embedding_lsh"):
            dedup.dedup_embedding_cosine(spark, SF_DIR)
    with monkeypatch.context() as m:
        m.setattr(sim, "_BRUTE_CEILING", 1)
        with pytest.raises(TestScaleCeilingError, match="sim_lsh_ann_topk"):
            sim.sim_topk_bruteforce(spark, SF_DIR)
    # and at the real ceilings the test corpora are far inside the bound
    assert dedup.dedup_embedding_cosine(spark, SF_DIR).count() > 0


# --------------------------------------------------------------------------
# Real BMP decode (VERDICT r12 item 5): the parser is certified against
# HAND-BUILT bytes (the spec), not just against our own encoder.
# --------------------------------------------------------------------------


def _hand_bmp() -> bytes:
    """A 3x2 24bpp BMP built field-by-field: stride 12 (3 pad bytes),
    bottom-up rows. Image order (top-left first), (B,G,R):
    row0 = (1,2,3),(4,5,6),(7,8,9); row1 = (10,11,12),(13,14,15),(16,17,18).
    """
    import struct

    header = struct.pack("<2sIHHI", b"BM", 78, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, 24, 2835, 2835, 0, 0)
    bottom_row = bytes(range(10, 19)) + b"\x00\x00\x00"  # stored first
    top_row = bytes(range(1, 10)) + b"\x00\x00\x00"
    return header + dib + bottom_row + top_row


def test_bmp_decode_golden_bytes():
    from kafka_streams_join_spark.queries.multimodal import _bmp_decode

    w, h, fb, sum_b, sum_g, sum_r, wsum_b = _bmp_decode(_hand_bmp())
    assert (w, h, fb) == (3, 2, 78)
    assert (sum_b, sum_g, sum_r) == (51, 57, 63)
    # order-sensitive: 1*1 + 2*4 + 3*7 + 4*10 + 5*13 + 6*16
    assert wsum_b == 231


def test_bmp_decode_rejects_malformed():
    import struct

    from kafka_streams_join_spark.queries.multimodal import _bmp_decode

    good = _hand_bmp()
    with pytest.raises(ValueError, match="magic"):
        _bmp_decode(b"XX" + good[2:])
    with pytest.raises(ValueError, match="file size"):
        _bmp_decode(good + b"\x00")  # declared size no longer matches
    bpp32 = good[:28] + struct.pack("<H", 32) + good[30:]
    with pytest.raises(ValueError, match="24bpp"):
        _bmp_decode(bpp32)
    topdown = good[:22] + struct.pack("<i", -2) + good[26:]
    with pytest.raises(ValueError, match="orientation"):
        _bmp_decode(topdown)
    # one stored row missing, header file size patched to stay consistent
    short = struct.pack("<2sIHHI", b"BM", 66, 0, 0, 54) + good[14:66]
    with pytest.raises(ValueError, match="truncated"):
        _bmp_decode(short)


def test_streaming_bench_canary(spark):
    """Regression canary for tools/bench_streaming.py (VERDICT r12 item 4):
    the interval-join micro-bench must produce the exact expected join
    cardinality and a sane throughput record at smoke scale."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.bench_streaming import bench_interval_join

    rec = bench_interval_join(spark, batches=2, rows_per_batch=200)
    assert rec["metric"] == "streaming_interval_join"
    assert rec["unit"] == "rows_per_sec"
    assert rec["rows_in"] == 600  # 400 displays + 200 clicks
    assert rec["rows_out"] == 200  # exactly the clicked half
    assert rec["value"] > 5  # loud floor: catches a hung drain, not noise


# --------------------------------------------------------------------------
# round-13 wave: candidate budget audit, per-label isotropy, BMP geometry
# --------------------------------------------------------------------------


def test_candidate_budget_consistent_with_members(spark):
    """Each tier's survivor count must equal the registered member query's
    row count, candidates must dominate survivors, and the ppm columns
    must be the exact truncating-div of the counts."""
    from kafka_streams_join_spark.queries import QUERIES

    rows = {
        r["tier"]: r
        for r in QUERIES["dedup_candidate_budget_audit"](spark, SF_DIR).collect()
    }
    assert set(rows) == {"minhash_band", "ngram_rare_shingle", "simhash_mih"}
    members = {
        "minhash_band": "dedup_minhash_lsh",
        "ngram_rare_shingle": "dedup_ngram_jaccard",
        "simhash_mih": "dedup_simhash",
    }
    n_docs = 500
    for tier, member in members.items():
        r = rows[tier]
        assert r["n_docs"] == n_docs
        assert r["n_survivors"] == QUERIES[member](spark, SF_DIR).count()
        assert r["n_candidates"] >= r["n_survivors"] > 0
        assert r["cand_per_doc_ppm"] == r["n_candidates"] * 1_000_000 // n_docs
        assert (
            r["precision_ppm"]
            == r["n_survivors"] * 1_000_000 // max(r["n_candidates"], 1)
        )
    # non-vacuous: the tiers must actually differ in budget (that is the
    # point of the audit) and minhash must be the tightest
    budgets = {t: rows[t]["n_candidates"] for t in rows}
    assert budgets["minhash_band"] < budgets["ngram_rare_shingle"]
    assert budgets["minhash_band"] < budgets["simhash_mih"]


def test_candidate_budget_plan(spark):
    """No CartesianProduct anywhere; every BroadcastNestedLoopJoin in the
    plan is a deliberate 1-row count-frame crossJoin (the tier_report
    idiom), and the candidate joins themselves are equi (SortMerge or
    BroadcastHash), never nested-loop over data."""
    from kafka_streams_join_spark.plans.inspect import explain_str
    from kafka_streams_join_spark.queries import QUERIES

    df = QUERIES["dedup_candidate_budget_audit"](spark, SF_DIR)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    # the data-carrying candidate stages must appear as equi joins
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_isotropy_by_label_matches_exact_replay(spark):
    import math

    from kafka_streams_join_spark.queries import QUERIES
    from kafka_streams_join_spark.sources.parquet import load_table

    emb = [
        (r["label"], list(r["embedding"]))
        for r in load_table(spark, SF_DIR, "embeddings")
        .select("label", "embedding")
        .collect()
    ]
    by_label: dict[int, list[list[float]]] = {}
    for lbl, vec in emb:
        by_label.setdefault(lbl, []).append(vec)
    exp = {}
    for lbl, vecs in by_label.items():
        vms = []
        for d in range(64):
            qs = [math.floor(float(v[d]) * 1_000_000 + 0.5) for v in vecs]
            n, sq, sqq = len(qs), sum(qs), sum(q * q for q in qs)
            vms.append((n * sqq - sq * sq) // (n * n * 1_000_000))
        sv, svv = sum(vms), sum(v * v for v in vms)
        exp[lbl] = (
            len(vecs), min(vms), max(vms),
            (1_000_000 * min(vms)) // max(vms) if max(vms) else 0,
            (1000 * sv * sv) // svv if svv else 0,
        )
    got = {
        r["label"]: (
            r["n_vecs"], r["min_var_micro"], r["max_var_micro"],
            r["var_ratio_ppm"], r["effective_dims_milli"],
        )
        for r in QUERIES["emb_isotropy_by_label"](spark, SF_DIR).collect()
    }
    assert got == exp
    assert len(got) > 1  # non-vacuous: more than one label slice


def test_geometry_histogram_matches_replay(spark):
    from kafka_streams_join_spark.queries import QUERIES
    from kafka_streams_join_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    lens = [
        r["n"]
        for r in load_table(spark, SF_DIR, "documents")
        .select(F.octet_length(F.encode("text", "UTF-8")).alias("n"))
        .collect()
        if r["n"] > 0
    ]
    exp: dict[tuple[int, int], list[int]] = {}
    for n in lens:
        w, h = n % 29 + 3, n % 17 + 2
        stride = (3 * w + 3) // 4 * 4
        e = exp.setdefault((w, h), [0, 0, 0, 0])
        e[0] += 1
        e[1] += w * h
        e[2] += h * (stride - 3 * w)
        e[3] += 54 + h * stride
    got = {}
    for r in QUERIES["mm_decode_geometry_histogram"](spark, SF_DIR).collect():
        got[(r["width"], r["height"])] = [
            r["n_assets"], r["n_pixels"], r["padding_bytes"], r["file_bytes"],
        ]
        assert r["padding_ppm"] == r["padding_bytes"] * 1_000_000 // r["file_bytes"]
    assert got == exp


def test_kmv_sweep_matches_exact_replay(spark):
    """Batch KMV sweep vs a pure-Python replay of the registered 60-bit
    hash contract and the integer estimator — exact, no tolerance."""
    import hashlib

    from kafka_streams_join_spark.queries import QUERIES
    from kafka_streams_join_spark.sources.parquet import load_table

    uids = {
        r["user_id"]
        for r in load_table(spark, SF_DIR, "events").select("user_id").collect()
    }
    hs = sorted(
        int(hashlib.md5(f"hll8_{u}".encode()).hexdigest()[:15], 16)
        for u in uids
    )
    exact = len(hs)
    got = {
        r["k_minima"]: r
        for r in QUERIES["sketch_kmv_distinct_sweep"](spark, SF_DIR).collect()
    }
    assert set(got) == {64, 256, 1024}
    for k, r in got.items():
        assert r["n_exact"] == exact
        if exact < k:
            assert r["kth_min"] is None and r["est_distinct"] == exact
            assert r["err_ppm"] == 0
        else:
            kth = hs[k - 1]
            est = (k - 1) * (1 << 60) // kth
            assert (r["kth_min"], r["est_distinct"]) == (kth, est)
            assert r["err_ppm"] == abs(est - exact) * 1_000_000 // exact


def test_kmv_sweep_plan_is_distributed_topk(spark):
    """The k minima must come from TakeOrderedAndProject (per-partition
    k-bounded forward), never a global sort exchange over the hashes."""
    from kafka_streams_join_spark.plans.inspect import explain_str
    from kafka_streams_join_spark.queries import QUERIES

    plan = explain_str(
        QUERIES["sketch_kmv_distinct_sweep"](spark, SF_DIR), "simple"
    )
    assert plan.count("TakeOrderedAndProject") >= 3, plan[:2000]
    assert "rangepartitioning" not in plan, plan[:2000]


def test_kmv_overlap_matches_exact_replay(spark):
    """KMV audience overlap vs a pure-Python replay of the user-day hash
    contract, the merge, and the integer estimators — exact."""
    import hashlib

    from kafka_streams_join_spark.queries import QUERIES
    from kafka_streams_join_spark.queries.kmv_sweep import _OVL_K
    from kafka_streams_join_spark.sources.parquet import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "user_id", F.date_format("ts", "yyyy-MM-dd").alias("d")
    ).collect()

    def hs(etype):
        keys = {(r["user_id"], r["d"]) for r in ev if r["event_type"] == etype}
        return sorted(
            int(hashlib.md5(f"kmvo_{u}_{d}".encode()).hexdigest()[:15], 16)
            for u, d in keys
        )

    ha, hb = hs("click"), hs("purchase")
    sa, sb = set(ha), set(hb)
    n_a, n_b, n_inter = len(ha), len(hb), len(sa & sb)
    ma, mb = ha[:_OVL_K], hb[:_OVL_K]
    m = sorted(set(ma) | set(mb))[:_OVL_K]
    cnt, matches = len(m), sum(1 for h in m if h in sa and h in sb)
    # replay must use minA/minB membership, same as the engines
    matches = sum(1 for h in m if h in set(ma) and h in set(mb))
    est_union = cnt if cnt < _OVL_K else (_OVL_K - 1) * (1 << 60) // m[-1]
    est_inter = matches if cnt < _OVL_K else matches * est_union // cnt
    [r] = QUERIES["sketch_kmv_audience_overlap"](spark, SF_DIR).collect()
    assert (r["n_a_exact"], r["n_b_exact"], r["n_inter_exact"]) == (
        n_a, n_b, n_inter,
    )
    assert r["jaccard_exact_ppm"] == n_inter * 1_000_000 // (n_a + n_b - n_inter)
    assert r["est_union"] == est_union
    assert r["est_jaccard_ppm"] == matches * 1_000_000 // cnt
    assert r["est_inter"] == est_inter
    assert r["err_inter_ppm"] == abs(est_inter - n_inter) * 1_000_000 // max(
        n_inter, 1
    )
    # non-vacuous: a real partial overlap, and the estimate in the right
    # ballpark (within 3 sigma-ish of the exact Jaccard)
    assert 0 < n_inter < min(n_a, n_b)
    assert abs(r["est_jaccard_ppm"] - r["jaccard_exact_ppm"]) < 200_000


def test_phash_decoded_matches_luma_replay(spark):
    """Decoded-plane perceptual hash vs a naive per-pixel Python replay
    (generation rule → luma → chunk votes), and exact-dup payloads must
    collide at hamming 0 in the registered output."""
    from kafka_streams_join_spark.queries import QUERIES
    from kafka_streams_join_spark.queries.multimodal import (
        _BMP_H_MIN,
        _BMP_H_MOD,
        _BMP_W_MIN,
        _BMP_W_MOD,
        _PH_BITS,
        _bmp_encode,
        _bmp_pixels,
    )

    payload = b"the quick brown fox jumps over the lazy dog" * 3
    n = len(payload)
    w, h = n % _BMP_W_MOD + _BMP_W_MIN, n % _BMP_H_MOD + _BMP_H_MIN
    npix = w * h
    # naive replay straight from the generation rule (no numpy, no parser)
    lum, total = [], 0
    for p in range(npix):
        v = payload[p % n]
        L = (299 * ((v * 7) % 256) + 587 * (255 - v) + 114 * v) // 1000
        lum.append(L)
        total += L
    exp = 0
    for k in range(_PH_BITS):
        idxs = [p for p in range(npix) if p * _PH_BITS // npix == k]
        if sum(lum[p] for p in idxs) * npix > total * len(idxs):
            exp |= 1 << k
    # the kernel's path: real encode -> strict parse -> luma -> votes
    px = _bmp_pixels(_bmp_encode(payload))
    luma = (299 * px[:, 2] + 587 * px[:, 1] + 114 * px[:, 0]) // 1000
    assert list(luma) == lum
    import numpy as np

    kk = np.arange(npix) * _PH_BITS // npix
    got = 0
    cnts = np.bincount(kk, minlength=_PH_BITS)
    csum = np.bincount(kk, weights=luma, minlength=_PH_BITS)
    for k in range(_PH_BITS):
        if csum[k] * npix > int(luma.sum()) * cnts[k]:
            got |= 1 << k
    assert got == exp
    # registered output is non-vacuous and within the Hamming contract
    # (sf0.001 has no exact byte-dups — dedup_exact is 500 singleton
    # groups — so hamming-0 pairs only appear at larger SFs)
    rows = QUERIES["mm_phash_decoded"](spark, SF_DIR).collect()
    assert rows
    assert all(0 <= r["hamming"] <= 5 for r in rows)
    # identical payloads must produce identical hashes (the hamming-0 case)
    assert list(_bmp_pixels(_bmp_encode(payload))[:, 0]) == list(px[:, 0])


def test_bmp_roundtrip_matches_independent_replay():
    """Encode→decode equals a naive per-pixel replay of the generation
    rule — an implementation-independent oracle for the round trip."""
    from kafka_streams_join_spark.queries.multimodal import (
        _BMP_H_MIN,
        _BMP_H_MOD,
        _BMP_W_MIN,
        _BMP_W_MOD,
        _bmp_decode,
        _bmp_encode,
    )

    for payload in [b"\x00", b"abc", bytes(range(256)), b"spark" * 97]:
        n = len(payload)
        w = n % _BMP_W_MOD + _BMP_W_MIN
        h = n % _BMP_H_MOD + _BMP_H_MIN
        exp_b = exp_g = exp_r = exp_w = 0
        for p in range(w * h):
            v = payload[p % n]
            exp_b += v
            exp_g += 255 - v
            exp_r += (v * 7) % 256
            exp_w += (p + 1) * v
        blob = _bmp_encode(payload)
        fb = 54 + h * ((3 * w + 3) // 4 * 4)
        assert _bmp_decode(blob) == (w, h, fb, exp_b, exp_g, exp_r, exp_w)
        assert len(blob) == fb
