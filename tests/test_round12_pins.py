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


# --------------------------------------------------------------------------
# round-12 wave: A/B z-test, novelty decay, gate kappa, AGMS join size
# --------------------------------------------------------------------------

import re

import hashlib


def _round_half_up(x: float) -> int:
    import math as _m

    return _m.floor(x + 0.5) if x >= 0 else _m.ceil(x - 0.5)


def _trunc_div(num: int, den: int) -> int:
    """Truncate-toward-zero integer division — Spark div / DuckDB //
    semantics (Python // floors, which differs for negative numerators)."""
    s = -1 if (num < 0) != (den < 0) else 1
    return s * (abs(num) // abs(den))


def test_ab_two_proportion_matches_bruteforce(spark):
    ev = pq.read_table(
        f"{SF_SMOKE}/events.parquet",
        columns=["user_id", "event_type", "value"],
    ).to_pydict()
    conv: dict = {}
    for uid, et, val in zip(ev["user_id"], ev["event_type"], ev["value"]):
        conv[uid] = conv.get(uid, 0) or int(et == "purchase" and val > 140)
    nc = sum(1 for u in conv if u % 2 == 0)
    nt = sum(1 for u in conv if u % 2 == 1)
    xc = sum(v for u, v in conv.items() if u % 2 == 0)
    xt = sum(v for u, v in conv.items() if u % 2 == 1)
    X, N = xc + xt, nc + nt
    z = (xt * nc - xc * nt) * math.sqrt(N / (nc * nt * X * (N - X)))
    z_milli = _round_half_up(1000 * z)
    r = QUERIES["events_ab_two_proportion"](spark, SF_SMOKE).collect()[0]
    assert (r["n_control"], r["n_treatment"]) == (nc, nt)
    assert (r["conv_control"], r["conv_treatment"]) == (xc, xt)
    assert r["rate_control_ppm"] == 1_000_000 * xc // nc
    assert r["rate_treatment_ppm"] == 1_000_000 * xt // nt
    assert r["z_milli"] == z_milli
    assert r["significant"] == (abs(z_milli) > 1960)


def test_ab_two_proportion_plan(spark):
    """One pruned scan, combinable aggregates, no join anywhere."""
    df = QUERIES["events_ab_two_proportion"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan[:1500]
    assert "Join" not in plan, plan[:1500]


def test_novelty_decay_matches_bruteforce(spark):
    d = pq.read_table(
        f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    hi = max(d["doc_id"]) + 1
    seen_by_decile: dict = {}
    for did, text in zip(d["doc_id"], d["text"]):
        dec = did * 10 // hi
        toks = re.sub(r"\s+", " ", text.strip()).split(" ")
        shingles = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()
        seen_by_decile.setdefault(dec, set()).update(shingles)
    first_seen: dict = {}
    for dec in sorted(seen_by_decile):
        for sh in seen_by_decile[dec]:
            first_seen.setdefault(sh, dec)
    expected = {
        dec: (
            len(shs),
            sum(1 for sh in shs if first_seen[sh] == dec),
            sum(1 for sh in shs if first_seen[sh] == dec)
            * 1_000_000
            // len(shs),
        )
        for dec, shs in seen_by_decile.items()
    }
    got = {
        r["decile"]: (r["n_shingles"], r["n_new"], r["novelty_ppm"])
        for r in QUERIES["docs_ngram_novelty_decay"](spark, SF_SMOKE).collect()
    }
    assert got == expected
    # decile 0 is all-new by construction; later deciles decay
    assert got[0][2] == 1_000_000


def test_novelty_decay_plan(spark):
    """The (decile, shingle) frame is STAGED and fans into first-seen +
    membership join (InMemoryTableScan); the only nested-loop join is
    the broadcast 1-row max-id frame — no CartesianProduct."""
    df = QUERIES["docs_ngram_novelty_decay"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "InMemoryTableScan" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_gate_kappa_matches_bruteforce(spark):
    d = pq.read_table(
        f"{SF_SMOKE}/documents.parquet", columns=["text", "n_chars"]
    ).to_pydict()
    a = b = c = dd = 0
    for text, n_chars in zip(d["text"], d["n_chars"]):
        toks = re.sub(r"\s+", " ", text.strip()).split(" ")
        ga = int(n_chars >= 200)
        gb = int(2 * len(set(toks)) >= len(toks))
        if ga and gb:
            a += 1
        elif ga:
            b += 1
        elif gb:
            c += 1
        else:
            dd += 1
    n = a + b + c + dd
    pe_num = (a + b) * (a + c) + (c + dd) * (b + dd)
    kappa_milli = _trunc_div(1000 * (n * (a + dd) - pe_num), n * n - pe_num)
    r = QUERIES["quality_gate_kappa"](spark, SF_SMOKE).collect()[0]
    assert (r["both_pass"], r["len_only"], r["lex_only"], r["both_fail"]) == (
        a,
        b,
        c,
        dd,
    )
    assert r["agree_ppm"] == (a + dd) * 1_000_000 // n
    assert r["kappa_milli"] == kappa_milli


def test_gate_kappa_plan(spark):
    """One pruned scan (text + n_chars only), one aggregate, no join."""
    df = QUERIES["quality_gate_kappa"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan[:1500]
    assert "Join" not in plan, plan[:1500]


def test_agms_join_size_matches_bruteforce(spark):
    ev = pq.read_table(
        f"{SF_SMOKE}/events.parquet", columns=["user_id"]
    ).to_pydict()["user_id"]
    od = pq.read_table(
        f"{SF_SMOKE}/orders.parquet", columns=["o_custkey"]
    ).to_pydict()["o_custkey"]

    def sign(key: int, j: int) -> int:
        digit = int(hashlib.md5(str(key).encode()).hexdigest()[j - 1], 16)
        return 1 if digit % 2 == 0 else -1

    prods = []
    for j in range(1, 10):
        sa = sum(sign(k, j) for k in ev)
        sb = sum(sign(k, j) for k in od)
        prods.append(sa * sb)
    est = sorted(prods)[4]
    ce: dict = {}
    co: dict = {}
    for k in ev:
        ce[k] = ce.get(k, 0) + 1
    for k in od:
        co[k] = co.get(k, 0) + 1
    exact = sum(c * co[k] for k, c in ce.items() if k in co)
    r = QUERIES["sketch_agms_join_size"](spark, SF_SMOKE).collect()[0]
    assert r["exact_join_size"] == exact
    assert r["est_join_size"] == est
    assert r["n_sketches"] == 9
    assert r["err_ppm"] == abs(est - exact) * 1_000_000 // exact


def test_agms_join_size_plan(spark):
    """Two sketch scans + two audit-leg scans at most; the 1-row frames
    cross via broadcast nested loop (allowed); no CartesianProduct, no
    Python evaluators."""
    df = QUERIES["sketch_agms_join_size"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") <= 4, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in plan, plan[:1500]


# --------------------------------------------------------------------------
# sim_ivf_cell_balance
# --------------------------------------------------------------------------


def test_ivf_cell_balance_matches_assignments(spark):
    """The audit must describe exactly the cells the registered (and
    hash-certified) k-means assignment emits: derive occupancies from
    cluster_kmeans_embeddings and recompute every output column with
    pure-Python integers."""
    cells: dict = {}
    for r in QUERIES["cluster_kmeans_embeddings"](spark, SF_SMOKE).collect():
        cells[r["cluster"]] = cells.get(r["cluster"], 0) + 1
    occ = list(cells.values())
    n = sum(occ)
    sumsq = sum(c * c for c in occ)
    r = QUERIES["sim_ivf_cell_balance"](spark, SF_SMOKE).collect()[0]
    assert r["n_cells"] == len(occ)
    assert r["n_vectors"] == n
    assert (r["min_occ"], r["max_occ"]) == (min(occ), max(occ))
    assert r["imbalance_milli"] == 1000 * 8 * max(occ) // n
    assert r["hhi_ppm"] == 1_000_000 * sumsq // (n * n)
    # sanity: balanced-ish hash init keeps the factor in a sane band
    assert r["imbalance_milli"] >= 1000


def test_ivf_cell_balance_plan(spark):
    """Assignment stays the broadcast-codebook plan (corpus never
    shuffles to assign): broadcast joins present, no cartesian beyond
    the K-row codebook cross, no range partitioning."""
    df = QUERIES["sim_ivf_cell_balance"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "rangepartitioning" not in plan.lower(), plan[:2000]
