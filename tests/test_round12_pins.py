"""Round-12 semantic pins: independent pure-Python reimplementations on
the sf0.001 corpus (arbitrary-precision ints / plain sequential float64,
no Spark SQL, no DuckDB), plus the new queries' plan gates and the
round-12 ADVICE-fix behavior tests (the §5.2 checklist's pin step)."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from kafka_streams_join_spark.queries import QUERIES
from tests.conftest import SF_SMOKE  # noqa: F401  (used by later pins)


# --------------------------------------------------------------------------
# events_theilsen_slope — single-day groups are reported, not dropped
# (ADVICE r11: the inner join silently removed types with one observed
# day; the contract now emits n_days=1, n_pairs=0, NULL slope_milli)
# --------------------------------------------------------------------------


def test_theilsen_single_day_type_reports_null_slope(spark, tmp_path):
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    # 'steady' spans 3 days with counts 1/2/3 -> slopes all exactly 1.0
    for day, n in ((0, 1), (1, 2), (2, 3)):
        for i in range(n):
            rows.append(("steady", base + datetime.timedelta(days=day, minutes=i)))
    # 'oneshot' fires only on a single day -> no pairwise slopes exist
    rows.append(("oneshot", base))
    rows.append(("oneshot", base + datetime.timedelta(hours=3)))
    table = pa.table(
        {
            "event_type": [r[0] for r in rows],
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    got = {
        r["event_type"]: (r["n_days"], r["n_pairs"], r["slope_milli"])
        for r in QUERIES["events_theilsen_slope"](spark, str(tmp_path)).collect()
    }
    assert got["steady"] == (3, 3, 1000)
    # the single-day group must APPEAR, with the not-enough-data sentinel
    assert got["oneshot"] == (1, 0, None)


# --------------------------------------------------------------------------
# sim_hamming_rerank / sim_hamming_rerank_recall
# --------------------------------------------------------------------------

import math

from kafka_streams_join_spark.plans import explain_str


def _embeddings():
    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pydict()
    return list(zip(t["vec_id"], t["embedding"]))


def _sign_words(vec):
    lo = hi = 0
    for d, v in enumerate(vec):
        if v >= 0:
            if d < 32:
                lo |= 1 << d
            else:
                hi |= 1 << (d - 32)
    return lo, hi


def _cos(a, b):
    # sequential float64 fold, mirroring both engines' left-to-right
    # accumulation order
    num = na = nb = 0.0
    for x, y in zip(a, b):
        num += float(x) * float(y)
    for x in a:
        na += float(x) * float(x)
    for x in b:
        nb += float(x) * float(x)
    return num / math.sqrt(na * nb)


def _rerank_expected():
    """Pure-Python two-stage retrieve-rerank on the sf0.001 corpus:
    Hamming top-R candidates, exact-cosine re-rank to top-5."""
    emb = _embeddings()
    vecs = dict(emb)
    packed = {vid: _sign_words(vec) for vid, vec in emb}
    out = {}
    for qid in vecs:
        if qid % 100 != 0:
            continue
        qlo, qhi = packed[qid]
        cands = sorted(
            (
                (bin(qlo ^ lo).count("1") + bin(qhi ^ hi).count("1"), nid)
                for nid, (lo, hi) in packed.items()
                if nid != qid
            )
        )[:20]  # R = 4 * TOP_K
        rer = sorted(
            ((-_cos(vecs[qid], vecs[nid]), nid) for _, nid in cands)
        )[:5]
        out[qid] = [(nid, -negcos) for negcos, nid in rer]
    return out


def test_hamming_rerank_matches_bruteforce(spark):
    expected = {
        (qid, nid): rnk
        for qid, rows in _rerank_expected().items()
        for rnk, (nid, _) in enumerate(rows, start=1)
    }
    got = {}
    for r in QUERIES["sim_hamming_rerank"](spark, SF_SMOKE).collect():
        got[(r["query_id"], r["neighbor_id"])] = r["rnk"]
        # the reported cosine is the exact value rounded to 3 dp
        exp_rows = dict(_rerank_expected()[r["query_id"]])
        assert abs(r["cos"] - exp_rows[r["neighbor_id"]]) < 5e-4
    assert got == expected


def test_hamming_rerank_recall_dominates_raw_tier(spark):
    """Invariant: re-ranking the R candidates by the TRUE score can only
    help — rerank recall@K >= raw Hamming recall@K for every query (the
    raw top-K is a subset of the candidate set the rerank orders
    exactly)."""
    raw = {
        r["query_id"]: r["n_hits"]
        for r in QUERIES["sim_hamming_recall"](spark, SF_SMOKE).collect()
    }
    rer = {
        r["query_id"]: r["n_hits"]
        for r in QUERIES["sim_hamming_rerank_recall"](spark, SF_SMOKE).collect()
    }
    assert set(raw) == set(rer)
    assert all(rer[q] >= raw[q] for q in raw), (raw, rer)


def test_hamming_rerank_plan(spark):
    """Two-stage plan shape: the 1-bit prefilter cuts candidates map-side
    (Partial+Final WindowGroupLimit); the candidate frame BROADCASTS into
    both vector fetches (rerank join bounded by Q*R — two broadcast hash
    joins, the corpus never shuffles for the fetch); no cartesian."""
    df = QUERIES["sim_hamming_rerank"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("WindowGroupLimit") >= 2, plan[:2000]
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


# --------------------------------------------------------------------------
# sketch_misra_gries_topk
# --------------------------------------------------------------------------


def test_misra_gries_matches_bruteforce(spark):
    ev = pq.read_table(
        f"{SF_SMOKE}/events.parquet", columns=["event_id", "user_id"]
    ).to_pydict()
    S, K, TOPN = 16, 8, 20
    shard_counts: dict = {}
    exact: dict = {}
    for eid, uid in zip(ev["event_id"], ev["user_id"]):
        s = eid % S
        shard_counts.setdefault(s, {})
        shard_counts[s][uid] = shard_counts[s].get(uid, 0) + 1
        exact[uid] = exact.get(uid, 0) + 1
    est: dict = {}
    err_bound = 0
    for s, counts in shard_counts.items():
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        e = ranked[K][1] if len(ranked) > K else 0
        err_bound += e
        for uid, c in ranked[:K]:
            if c - e > 0:
                est[uid] = est.get(uid, 0) + (c - e)
    top = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:TOPN]
    expected = {
        uid: (rnk, em, err_bound, exact[uid],
              em <= exact[uid] <= em + err_bound)
        for rnk, (uid, em) in enumerate(top, start=1)
    }
    got = {
        r["user_id"]: (r["rnk"], r["est_min"], r["err_bound"],
                       r["exact_count"], r["within_bound"])
        for r in QUERIES["sketch_misra_gries_topk"](spark, SF_SMOKE).collect()
    }
    assert got == expected
    # the MG guarantee must actually hold on every emitted row
    assert all(v[4] for v in got.values())


def test_misra_gries_plan(spark):
    """The rank prune (rn <= k+1) must plan as Partial+Final
    WindowGroupLimit (map tasks forward at most (k+1) rows per shard per
    partition); the top-N is a TakeOrdered heap; the only nested-loop
    join is the broadcast 1-row error-bound frame — no CartesianProduct."""
    df = QUERIES["sketch_misra_gries_topk"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("WindowGroupLimit") >= 2, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
