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


# --------------------------------------------------------------------------
# round-12 wave 3: dispersion, session sweep, bloom sizing, hubness,
# nprobe sweep
# --------------------------------------------------------------------------

import hashlib


def _events_rows():
    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pydict()
    return list(zip(t["event_id"], t["ts"], t["user_id"], t["event_type"]))


def test_dispersion_fano_pin(spark):
    """Independent integer recompute: per-type daily counts over the
    type's own span, Fano via exact arbitrary-precision arithmetic."""
    daily: dict = {}
    for _eid, ts, _uid, et in _events_rows():
        d = (ts.date() - datetime.date(1970, 1, 1)).days
        daily.setdefault(et, {})
        daily[et][d] = daily[et].get(d, 0) + 1
    got = {
        r["event_type"]: r.asDict()
        for r in QUERIES["events_dispersion_fano"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(daily)
    for et, days in daily.items():
        n = max(days) - min(days) + 1
        s = sum(days.values())
        q = sum(c * c for c in days.values())
        r = got[et]
        assert r["n_days"] == n
        assert r["n_active_days"] == len(days)
        assert r["total"] == s
        assert r["mean_milli"] == 1000 * s // n
        if n < 2:
            assert r["fano_milli"] is None and r["over_dispersed"] is None
        else:
            fano = 1000 * (n * q - s * s) // ((n - 1) * s)
            assert r["fano_milli"] == fano
            assert r["over_dispersed"] == (1 if fano > 1000 else 0)


def test_dispersion_fano_plan(spark):
    """Two combinable aggregates on a 2-column pruned scan: no join, no
    window, no Python evaluators, no single-partition/range exchange."""
    df = QUERIES["events_dispersion_fano"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan[:2000]
    for bad in ("Join", "Window", "CartesianProduct", "MapInPandas",
                "BatchEvalPython", "rangepartitioning", "SinglePartition"):
        assert bad not in plan, (bad, plan[:2000])


def test_session_gap_sweep_pin(spark):
    """Independent recompute: per-user microsecond gaps, session counts
    at every threshold."""
    per_user: dict = {}
    for eid, ts, uid, _et in _events_rows():
        per_user.setdefault(uid, []).append((ts, eid))
    epoch = datetime.datetime(1970, 1, 1)
    n_events = 0
    sessions = {300: 0, 900: 0, 1800: 0, 3600: 0}
    for uid, evs in per_user.items():
        evs.sort()
        prev = None
        for ts, _eid in evs:
            us = (ts - epoch) // datetime.timedelta(microseconds=1)
            n_events += 1
            for t in sessions:
                if prev is None or us - prev > t * 1_000_000:
                    sessions[t] += 1
            prev = us
    got = {
        r["gap_s"]: r.asDict()
        for r in QUERIES["events_session_gap_sweep"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(sessions)
    for t, n_sess in sessions.items():
        r = got[t]
        assert r["n_sessions"] == n_sess
        assert r["n_users"] == len(per_user)
        assert r["n_events"] == n_events
        assert r["events_per_session_milli"] == 1000 * n_events // n_sess
    # the dial must actually move: strictly fewer sessions as gap grows
    ordered = [sessions[t] for t in (300, 900, 1800, 3600)]
    assert ordered == sorted(ordered, reverse=True)


def test_session_gap_sweep_plan(spark):
    """One scan, one user-hash window, one aggregate, one 4-row Generate;
    no join of data-sized frames, no Python evaluators."""
    df = QUERIES["events_session_gap_sweep"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan[:2000]
    assert "Generate" in plan, plan[:2000]
    for bad in ("CartesianProduct", "MapInPandas", "BatchEvalPython"):
        assert bad not in plan, (bad, plan[:2000])


def _bloom_h(j: int, k: int) -> int:
    return int(hashlib.md5(f"{j}#{k}".encode()).hexdigest()[:15], 16)


def test_bloom_size_sweep_pin(spark):
    """Independent recompute of all three filter sizes: bit sets, probe
    verdicts, observed and predicted FPR in exact integers."""
    orders = pq.read_table(f"{SF_SMOKE}/orders.parquet").to_pydict()
    cust = pq.read_table(f"{SF_SMOKE}/customer.parquet").to_pydict()
    members = set(orders["o_custkey"])
    probes = {1_000_000_000_000 + c for c in cust["c_custkey"]} - members
    got = {
        r["m_bits"]: r.asDict()
        for r in QUERIES["sketch_bloom_size_sweep"](spark, SF_SMOKE).collect()
    }
    assert set(got) == {1024, 4096, 16384}
    for m in (1024, 4096, 16384):
        bits = {_bloom_h(j, k) % m for k in members for j in (1, 2, 3)}
        fp = sum(
            1
            for k in probes
            if all(_bloom_h(j, k) % m in bits for j in (1, 2, 3))
        )
        r = got[m]
        assert r["k_hashes"] == 3
        assert r["n_inserted"] == len(members)
        assert r["bits_set"] == len(bits)
        assert r["load_ppm"] == len(bits) * 1_000_000 // m
        assert r["n_probes"] == len(probes)
        assert r["n_false_pos"] == fp
        assert r["fpr_ppm"] == fp * 1_000_000 // len(probes)
        assert r["predicted_fpr_ppm"] == (
            len(bits) ** 3 * 1_000_000 // m**3
        )
    # the dial must move: observed FPR strictly falls as m grows
    fprs = [got[m]["fpr_ppm"] for m in (1024, 4096, 16384)]
    assert fprs == sorted(fprs, reverse=True)


def test_bloom_size_sweep_plan(spark):
    """Bit sets and dims broadcast; the only scans are the two sides (plus
    their staged reuse); no CartesianProduct, no Python evaluators."""
    df = QUERIES["sketch_bloom_size_sweep"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "BroadcastExchange" in plan, plan[:2000]
    for bad in ("CartesianProduct", "MapInPandas", "BatchEvalPython"):
        assert bad not in plan, (bad, plan[:2000])


def test_hubness_audit_pin(spark):
    """The histogram must describe exactly the registered brute-force
    lists: derive k-occurrences from sim_topk_bruteforce and recompute
    every row, including the antihub zero row."""
    occ: dict = {}
    for r in QUERIES["sim_topk_bruteforce"](spark, SF_SMOKE).collect():
        occ[r["neighbor_id"]] = occ.get(r["neighbor_id"], 0) + 1
    n_corpus = pq.read_metadata(f"{SF_SMOKE}/embeddings.parquet").num_rows
    hist: dict = {}
    for c in occ.values():
        hist[c] = hist.get(c, 0) + 1
    hist[0] = n_corpus - len(occ)
    got = {
        r["k_occurrence"]: (r["n_vectors"], r["share_ppm"])
        for r in QUERIES["sim_hubness_audit"](spark, SF_SMOKE).collect()
    }
    assert got == {
        k: (n, n * 1_000_000 // n_corpus) for k, n in hist.items()
    }
    # shares must account for the whole corpus
    assert sum(n for n, _ in got.values()) == n_corpus


def _round4(x: float) -> float:
    """HALF_UP at 4 dp on the shortest decimal repr — Spark's
    F.round(double) ≡ BigDecimal.valueOf ≡ Decimal(repr(x))."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def test_ivf_nprobe_sweep_pin(spark):
    """Full pure-Python reimplementation at sf0.001: per-label centroids
    (sequential float64), nearest-cell assignment, probe_rank <= p
    candidate sets, 4-dp HALF_UP rounded cosine ranking, recall vs the
    registered brute-force lists."""
    emb = _embeddings()
    labels = dict(
        zip(
            pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
            .to_pydict()["vec_id"],
            pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
            .to_pydict()["label"],
        )
    )
    by_label: dict = {}
    for vid, vec in emb:
        by_label.setdefault(labels[vid], []).append(vec)
    centroids = {}
    for lab, vecs in by_label.items():
        cent = []
        for d in range(64):
            s = 0.0
            for v in vecs:
                s += float(v[d])
            cent.append(s / len(vecs))
        centroids[lab] = cent
    def dist2(vec, cent):
        s = 0.0
        for d in range(64):
            t = float(vec[d]) - cent[d]
            s += t * t
        return s
    ranked_cells = {
        vid: sorted(
            (dist2(vec, centroids[lab]), lab) for lab in centroids
        )
        for vid, vec in emb
    }
    assigned: dict = {}
    for vid, _vec in emb:
        assigned.setdefault(ranked_cells[vid][0][1], set()).add(vid)
    vecs = dict(emb)
    truth: dict = {}
    for r in QUERIES["sim_topk_bruteforce"](spark, SF_SMOKE).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    expected = {}
    for p in (1, 2, 3):
        n_truth = n_hit = 0
        for qid in vecs:
            if qid % 100 != 0:
                continue
            cand = set()
            for _d2, lab in ranked_cells[qid][:p]:
                cand |= assigned.get(lab, set())
            cand.discard(qid)
            top = sorted(
                ((-_round4(_cos(vecs[qid], vecs[n])), n) for n in cand)
            )[:5]
            hits = {n for _s, n in top} & truth[qid]
            n_truth += len(truth[qid])
            n_hit += len(hits)
        expected[p] = (n_truth, n_hit, n_hit * 1_000_000 // n_truth)
    got = {
        r["nprobe"]: (r["n_truth"], r["n_hit"], r["recall_ppm"])
        for r in QUERIES["sim_ivf_nprobe_sweep"](spark, SF_SMOKE).collect()
    }
    assert got == expected
    # the dial must move the right way: recall monotone in nprobe
    assert got[1][2] <= got[2][2] <= got[3][2]


def test_ivf_nprobe_sweep_plan(spark):
    """Stage-1 cut must plan WindowGroupLimit (map-side top-k per
    (query, probe_rank) before the level fan-out); codebook broadcast;
    no CartesianProduct."""
    df = QUERIES["sim_ivf_nprobe_sweep"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert "BroadcastExchange" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


# --------------------------------------------------------------------------
# round-12 wave 4: pack-length sweep, rich club, containment sweep
# --------------------------------------------------------------------------

import re as _re


def test_pack_length_sweep_pin(spark):
    """Exact integer recompute of padded/packed sequence counts and
    waste at every candidate length."""
    lens = [
        n
        for n in pq.read_table(f"{SF_SMOKE}/documents.parquet")
        .to_pydict()["text"]
        if len(n) > 0
    ]
    lens = [len(t) for t in lens]
    total = sum(lens)
    got = {
        r["seq_len"]: r.asDict()
        for r in QUERIES["pipeline_pack_length_sweep"](spark, SF_SMOKE).collect()
    }
    assert set(got) == {512, 1024, 2048, 4096}
    for L in (512, 1024, 2048, 4096):
        padded = sum((x + L - 1) // L for x in lens)
        packed = (total + L - 1) // L
        r = got[L]
        assert r["n_docs"] == len(lens)
        assert r["total_units"] == total
        assert r["n_seqs_padded"] == padded
        assert r["pad_waste_ppm"] == (padded * L - total) * 1_000_000 // (
            padded * L
        )
        assert r["n_seqs_packed"] == packed
        assert r["packing_gain_ppm"] == (padded - packed) * 1_000_000 // padded
    # the dial must move: waste grows with L, packed count shrinks
    waste = [got[L]["pad_waste_ppm"] for L in (512, 1024, 2048, 4096)]
    assert waste == sorted(waste)


def test_pack_length_sweep_plan(spark):
    """One 1-column pruned scan, one combinable aggregate, one Generate;
    no join, no window, no Python evaluators."""
    df = QUERIES["pipeline_pack_length_sweep"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan[:2000]
    assert "Generate" in plan, plan[:2000]
    for bad in ("Join", "Window", "MapInPandas", "BatchEvalPython"):
        assert bad not in plan, (bad, plan[:2000])


def _copurchase_graph():
    t = pq.read_table(
        f"{SF_SMOKE}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    baskets: dict = {}
    for ok, pk in zip(t["l_orderkey"], t["l_partkey"]):
        baskets.setdefault(ok, set()).add(pk)
    pairs = set()
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pairs.add((ps[i], ps[j]))
    deg: dict = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return pairs, deg


def test_rich_club_pin(spark):
    """Pure-Python recompute: quantile-derived degree thresholds from the
    cumulative level histogram, club sizes, club edges, phi."""
    pairs, deg = _copurchase_graph()
    n_nodes, n_edges = len(deg), len(pairs)
    lvl: dict = {}
    for d in deg.values():
        lvl[d] = lvl.get(d, 0) + 1
    cum = {}
    running = 0
    for d in sorted(lvl, reverse=True):
        running += lvl[d]
        cum[d] = running
    got = {
        r["club_q_milli"]: r.asDict()
        for r in QUERIES["graph_rich_club"](spark, SF_SMOKE).collect()
    }
    assert set(got) == {500, 250, 100}
    for q in (500, 250, 100):
        target = (q * n_nodes + 999) // 1000
        ks = [d for d in cum if cum[d] >= target]
        k = max(ks)
        n_club = cum[k]
        e_club = sum(
            1 for u, v in pairs if min(deg[u], deg[v]) >= k
        )
        r = got[q]
        assert r["k_degree"] == k
        assert r["n_club"] == n_club
        assert r["e_club"] == e_club
        assert r["phi_ppm"] == e_club * 2_000_000 // (n_club * (n_club - 1))
        assert r["n_nodes"] == n_nodes and r["n_edges"] == n_edges
        assert r["density_ppm"] == n_edges * 2_000_000 // (
            n_nodes * (n_nodes - 1)
        )
    # the rich-club signature: every club at least as dense as the graph
    assert all(
        got[q]["phi_ppm"] >= got[q]["density_ppm"] for q in (500, 250, 100)
    )


def test_rich_club_plan(spark):
    """Edge/degree frames cross only hash exchanges; the 3-row dial
    broadcasts; no CartesianProduct, no Python evaluators."""
    df = QUERIES["graph_rich_club"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "BroadcastExchange" in plan, plan[:2000]
    for bad in ("CartesianProduct", "MapInPandas", "BatchEvalPython"):
        assert bad not in plan, (bad, plan[:2000])


def _doc_shingles():
    t = pq.read_table(
        f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    out = {}
    for did, text in zip(t["doc_id"], t["text"]):
        toks = [
            w
            for w in _re.sub(r"[^a-zA-Z0-9 ]", " ", text).lower().split(" ")
            if w
        ]
        out[did] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    return out


def test_containment_sweep_pin(spark):
    """Pure-Python recompute of the full pair frame (uncapped — the cap
    may only lose nothing) and the five-threshold sweep."""
    sh = _doc_shingles()
    ids = sorted(sh)
    inv: dict = {}
    for did in ids:
        for s in sh[did]:
            inv.setdefault(s, []).append(did)
    cand = set()
    for docs in inv.values():
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                cand.add((docs[i], docs[j]))
    rows = []
    for a, b in cand:
        c = len(sh[a] & sh[b])
        mn = min(len(sh[a]), len(sh[b]))
        if 1000 * c >= 200 * mn:
            rows.append((a, b, c, mn))
    got = {
        r["threshold_milli"]: r.asDict()
        for r in QUERIES["dedup_containment_sweep"](spark, SF_SMOKE).collect()
    }
    n_docs = len(ids)
    for t in (200, 300, 500, 700, 900):
        qual = [(a, b) for a, b, c, mn in rows if 1000 * c >= t * mn]
        flagged = {b for _a, b in qual}
        r = got[t]
        assert r["n_pairs"] == len(qual)
        assert r["n_docs_flagged"] == len(flagged)
        assert r["removal_ppm"] == len(flagged) * 1_000_000 // n_docs
    # monotone: higher threshold can only remove less
    ns = [got[t]["n_pairs"] for t in (200, 300, 500, 700, 900)]
    assert ns == sorted(ns, reverse=True)
    # and the dial actually moves on this corpus at the low end
    assert ns[0] > ns[1]


def test_containment_sweep_plan(spark):
    """Inherits the candidate stage plan (staged docsets, DF-capped
    index); the sweep adds broadcasts only — no CartesianProduct, no
    Python evaluators."""
    df = QUERIES["dedup_containment_sweep"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "BroadcastExchange" in plan, plan[:2000]
    for bad in ("CartesianProduct", "MapInPandas", "BatchEvalPython"):
        assert bad not in plan, (bad, plan[:2000])


# --------------------------------------------------------------------------
# round-12 wave 5: quality-gate sweep, sample-rate sweep
# --------------------------------------------------------------------------


def _quality_e4(text: str):
    toks = [w for w in _re.sub(r"\s+", " ", text.strip()).split(" ")]
    n_tokens = len(toks)
    n_stop = sum(1 for t in toks if t in ("the", "a", "of", "and"))
    n_punct = sum(
        1 for ch in text if 33 <= ord(ch) <= 47 or 58 <= ord(ch) <= 64
        or 91 <= ord(ch) <= 96 or 123 <= ord(ch) <= 126
    )
    n_char = len(text)
    score = (
        0.5 * min(n_tokens / 100.0, 1.0)
        + 0.3 * min(n_stop * 5.0 / n_tokens, 1.0)
        + 0.2 * (1.0 - min(n_punct * 10.0 / n_char, 1.0))
    )
    return n_tokens, math.floor(score * 10000 + 0.5)


def test_quality_gate_sweep_pin(spark):
    """Exact recompute of the per-(threshold, lang) keep counts from the
    registered scoring formula's integer e4 form."""
    t = pq.read_table(
        f"{SF_SMOKE}/documents.parquet", columns=["lang", "text"]
    ).to_pydict()
    docs = [
        (lang, *_quality_e4(text))
        for lang, text in zip(t["lang"], t["text"])
    ]
    got = {
        (r["threshold_e4"], r["lang"]): r.asDict()
        for r in QUERIES["text_quality_gate_sweep"](spark, SF_SMOKE).collect()
    }
    langs = {d[0] for d in docs}
    assert set(got) == {
        (t_, lang) for t_ in (4000, 5000, 6000, 7000, 8000) for lang in langs
    }
    for (t_, lang), r in got.items():
        grp = [(nt, q) for (lg, nt, q) in docs if lg == lang]
        n_kept = sum(1 for _nt, q in grp if q >= t_)
        toks_kept = sum(nt for nt, q in grp if q >= t_)
        toks = sum(nt for nt, _q in grp)
        assert r["n_docs"] == len(grp)
        assert r["n_kept"] == n_kept
        assert r["kept_ppm"] == n_kept * 1_000_000 // len(grp)
        assert r["n_tokens"] == toks
        assert r["n_tokens_kept"] == toks_kept
        assert r["token_kept_ppm"] == toks_kept * 1_000_000 // max(toks, 1)
    # the bar must bite: strictly fewer docs kept at 0.8 than at 0.4
    for lang in langs:
        assert got[(8000, lang)]["n_kept"] < got[(4000, lang)]["n_kept"]


def test_quality_gate_sweep_plan(spark):
    """One scan + broadcast 5-row dial + one combinable aggregate; no
    data-sized join, no window, no Python evaluators."""
    df = QUERIES["text_quality_gate_sweep"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan[:2000]
    for bad in ("Window", "CartesianProduct", "MapInPandas",
                "BatchEvalPython"):
        assert bad not in plan, (bad, plan[:2000])


def test_sample_rate_sweep_pin(spark):
    """Exact recompute: the nested hash samples, HT count estimates, and
    the engine-shared linear-interpolation median over each sample."""
    t = pq.read_table(
        f"{SF_SMOKE}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    ).to_pydict()
    space = 1 << 40

    def q50(vals):
        s = sorted(vals)
        n = len(s)
        pos = (n - 1) * 0.5
        lo = int(math.floor(pos))
        frac = pos - lo
        v = s[lo] + (s[min(lo + 1, n - 1)] - s[lo]) * frac
        import decimal
        return float(
            decimal.Decimal(repr(v)).quantize(
                decimal.Decimal("0.0001"),
                rounding=decimal.ROUND_HALF_UP,
            )
        )

    rows = []
    for ok, ln, price in zip(
        t["l_orderkey"], t["l_linenumber"], t["l_extendedprice"]
    ):
        hv = int(hashlib.md5(f"{ok}-{ln}".encode()).hexdigest()[:10], 16)
        rows.append((hv, price))
    got = {
        r["rate"]: r.asDict()
        for r in QUERIES["sketch_sample_rate_sweep"](spark, SF_SMOKE).collect()
    }
    n_total = len(rows)
    prev_sample: set = set()
    for rate in (512, 64, 8):  # ascending sample size for the nesting check
        cut = space // rate
        sample = [(hv, p) for hv, p in rows if hv < cut]
        r = got[rate]
        assert r["n_total"] == n_total
        assert r["n_sample"] == len(sample)
        assert r["est_total"] == len(sample) * rate
        assert r["count_err_ppm"] == (
            abs(len(sample) * rate - n_total) * 1_000_000 // n_total
        )
        assert abs(r["q50_sample"] - q50([p for _h, p in sample])) < 5e-4
        assert abs(r["q50_exact"] - q50([p for _h, p in rows])) < 5e-4
        # nesting: the smaller-rate sample contains the previous one
        cur = set(sample)
        assert prev_sample <= cur
        prev_sample = cur


def test_sample_rate_sweep_plan(spark):
    """One scan, one combinable aggregate, one 3-row Generate; no join,
    no window, no Python evaluators."""
    df = QUERIES["sketch_sample_rate_sweep"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan[:2000]
    assert "Generate" in plan, plan[:2000]
    for bad in ("Join", "Window", "MapInPandas", "BatchEvalPython"):
        assert bad not in plan, (bad, plan[:2000])


# --------------------------------------------------------------------------
# round-12 wave 6: funnel attribution-window sweep
# --------------------------------------------------------------------------


def test_funnel_window_sweep_pin(spark):
    """Exact recompute of the two per-user gaps and every window's
    stage counts; at the registered 24 h window the sweep must equal
    events_funnel_conversion's stage tallies exactly."""
    t = pq.read_table(
        f"{SF_SMOKE}/events.parquet", columns=["user_id", "event_type", "ts"]
    ).to_pydict()
    by_user: dict = {}
    for uid, et, ts in zip(t["user_id"], t["event_type"], t["ts"]):
        by_user.setdefault(uid, []).append((ts, et))
    gaps = {}
    for uid, evs in by_user.items():
        views = [ts for ts, et in evs if et == "view"]
        if not views:
            continue
        v_ts = min(views)
        clicks = [ts for ts, et in evs if et == "click" and ts > v_ts]
        c_ts = min(clicks) if clicks else None
        p_ts = None
        if c_ts is not None:
            purch = [ts for ts, et in evs if et == "purchase" and ts > c_ts]
            p_ts = min(purch) if purch else None
        us = lambda a, b: (b - a) // datetime.timedelta(microseconds=1)
        gaps[uid] = (
            us(v_ts, c_ts) if c_ts is not None else None,
            us(c_ts, p_ts) if p_ts is not None else None,
        )
    got = {
        r["window_h"]: r.asDict()
        for r in QUERIES["events_funnel_window_sweep"](spark, SF_SMOKE).collect()
    }
    assert set(got) == {1, 6, 24, 72}
    n = len(gaps)
    for w in (1, 6, 24, 72):
        b = w * 3_600_000_000
        s2 = sum(1 for gvc, _ in gaps.values() if gvc is not None and gvc <= b)
        s3 = sum(
            1
            for gvc, gcp in gaps.values()
            if gvc is not None and gcp is not None and gvc <= b and gcp <= b
        )
        r = got[w]
        assert r["n_users"] == n
        assert (r["n_stage2"], r["n_stage3"]) == (s2, s3)
        assert r["conv2_ppm"] == s2 * 1_000_000 // n
        assert r["conv3_ppm"] == s3 * 1_000_000 // n
        assert r["step_conv_ppm"] == s3 * 1_000_000 // max(s2, 1)
    # the dial must move and be monotone in the window
    s2s = [got[w]["n_stage2"] for w in (1, 6, 24, 72)]
    s3s = [got[w]["n_stage3"] for w in (1, 6, 24, 72)]
    assert s2s == sorted(s2s) and s3s == sorted(s3s)
    assert s2s[0] < s2s[-1]
    # cross-check against the REGISTERED funnel at its frozen 24 h window
    stages = [
        r["stage"]
        for r in QUERIES["events_funnel_conversion"](spark, SF_SMOKE).collect()
    ]
    assert got[24]["n_stage2"] == sum(1 for s in stages if s >= 2)
    assert got[24]["n_stage3"] == sum(1 for s in stages if s == 3)


def test_funnel_window_sweep_plan(spark):
    """The certified funnel shape (user-keyed equi-joins + min
    aggregates) followed by one 1-row aggregate and a 4-row Generate;
    no CartesianProduct, no Python evaluators, no range exchange."""
    df = QUERIES["events_funnel_window_sweep"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "Generate" in plan, plan[:2000]
    for bad in ("CartesianProduct", "MapInPandas", "BatchEvalPython",
                "rangepartitioning"):
        assert bad not in plan, (bad, plan[:2000])


# --------------------------------------------------------------------------
# round-12 wave 7: pHash radius sweep, MinHash permutation sweep
# --------------------------------------------------------------------------

from kafka_streams_join_spark.queries.dedup import _HASH_PARAMS as _MH_PARAMS
from kafka_streams_join_spark.queries.dedup import _P as _MH_P


def _ahash(b: bytes):
    n = len(b)
    if n == 0:
        return None
    total = sum(b)
    sums = [0] * 32
    cnts = [0] * 32
    for i, v in enumerate(b):
        k = i * 32 // n
        sums[k] += v
        cnts[k] += 1
    h = 0
    for k in range(32):
        if sums[k] * n > total * cnts[k]:
            h |= 1 << k
    return h


def test_phash_radius_sweep_pin(spark):
    """Pure-Python recompute: ahash per blob, banded candidates, hamming
    counts at every radius."""
    t = pq.read_table(
        f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    hashes = {
        did: _ahash(text.encode("utf-8"))
        for did, text in zip(t["doc_id"], t["text"])
    }
    hashes = {d: h for d, h in hashes.items() if h is not None}
    buckets: dict = {}
    for d, h in hashes.items():
        for band in range(4):
            buckets.setdefault((band, (h >> (band * 8)) & 255), []).append(d)
    cand = set()
    for docs in buckets.values():
        ds = sorted(docs)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    got = {
        r["radius"]: r.asDict()
        for r in QUERIES["mm_phash_radius_sweep"](spark, SF_SMOKE).collect()
    }
    assert set(got) == {0, 2, 5, 8}
    for radius in (0, 2, 5, 8):
        qual = [
            (a, b)
            for a, b in cand
            if bin(hashes[a] ^ hashes[b]).count("1") <= radius
        ]
        flagged = {b for _a, b in qual}
        r = got[radius]
        assert r["n_assets"] == len(hashes)
        assert r["n_pairs"] == len(qual)
        assert r["n_flagged"] == len(flagged)
        assert r["removal_ppm"] == len(flagged) * 1_000_000 // len(hashes)
    # the dial must move
    ns = [got[radius]["n_pairs"] for radius in (0, 2, 5, 8)]
    assert ns == sorted(ns) and ns[-1] > ns[0]


def test_phash_radius_sweep_plan(spark):
    """Bytes never shuffle (only the ahash kernel's MapInPandas output
    does); candidates via band equi-join; no CartesianProduct."""
    df = QUERIES["mm_phash_radius_sweep"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "MapInPandas" in plan, plan[:2000]  # the ahash kernel itself
    assert "CartesianProduct" not in plan, plan[:2000]


def test_minhash_perm_sweep_pin(spark):
    """Pure-Python recompute: the registered 32-perm signatures, band
    candidates, prefix-match counts, exact-rational errors."""
    sh = _doc_shingles()
    h32 = {
        d: [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in ss]
        for d, ss in sh.items()
    }
    mh = {
        d: [
            min((a * h + b) % _MH_P for h in hs) if hs else None
            for a, b in _MH_PARAMS
        ]
        for d, hs in h32.items()
    }
    buckets: dict = {}
    for d, sig in mh.items():
        for band in range(8):
            key = ",".join(str(sig[band * 4 + r]) for r in range(4))
            buckets.setdefault(
                (band, hashlib.md5(key.encode()).hexdigest()), []
            ).append(d)
    cand = set()
    for docs in buckets.values():
        ds = sorted(docs)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    rows = []
    for a, b in cand:
        c = len(sh[a] & sh[b])
        u = len(sh[a]) + len(sh[b]) - c
        if u == 0:
            continue
        ms = {
            p: sum(1 for i in range(p) if mh[a][i] == mh[b][i])
            for p in (8, 16, 32)
        }
        rows.append((c, u, ms))
    got = {
        r["perms"]: r.asDict()
        for r in QUERIES["dedup_minhash_perm_sweep"](spark, SF_SMOKE).collect()
    }
    assert set(got) == {8, 16, 32}
    for p in (8, 16, 32):
        errs = [
            abs(1000 * ms[p] * u - 1000 * c * p) // (p * u)
            for c, u, ms in rows
        ]
        r = got[p]
        assert r["n_pairs"] == len(errs)
        assert r["mean_abs_err_milli"] == sum(errs) // len(errs)
        assert r["max_abs_err_milli"] == max(errs)
    # the 32-perm estimator must not be worse on average than the 8-perm
    assert got[32]["mean_abs_err_milli"] <= got[8]["mean_abs_err_milli"]


def test_minhash_perm_sweep_plan(spark):
    """Signatures stay map-side aggregate columns; candidates from the
    (band, band_sig) equi-join; no CartesianProduct, no extra scans
    beyond the staged shingle stage."""
    df = QUERIES["dedup_minhash_perm_sweep"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "Generate" in plan, plan[:2000]  # the 3-level stack


# --------------------------------------------------------------------------
# round-12 wave 8: BPE merge-count sweep
# --------------------------------------------------------------------------

from kafka_streams_join_spark.queries.tokenizer import BPE_MERGES


def _bpe_encode(word: str, k: int) -> int:
    """subword token count after the first k merges — the sentinel-space
    replace contract (leftmost non-overlapping, one pass per merge)."""
    s = " ".join(word)
    for m in BPE_MERGES[:k]:
        s = (" " + s + " ").replace(
            " " + m + " ", " " + m.replace(" ", "") + " "
        ).strip()
    return len(s.split(" "))


def test_bpe_merge_sweep_pin(spark):
    """Exact recompute: per-word prefix encodings over the distinct
    vocabulary, corpus totals, fertility, compression."""
    t = pq.read_table(
        f"{SF_SMOKE}/documents.parquet", columns=["text"]
    ).to_pydict()
    words = []
    for text in t["text"]:
        words.extend(
            w.lower()
            for w in _re.sub(r"\s+", " ", text.strip()).split(" ")
        )
    vocab = set(words)
    got = {
        r["merges"]: r.asDict()
        for r in QUERIES["text_bpe_merge_sweep"](spark, SF_SMOKE).collect()
    }
    assert set(got) == {0, 4, 8, 12}
    n_words = len(words)
    n_chars = sum(len(w) for w in words)
    for k in (0, 4, 8, 12):
        enc = {w: _bpe_encode(w, k) for w in vocab}
        total = sum(enc[w] for w in words)
        r = got[k]
        assert r["n_words"] == n_words
        assert r["n_bpe_tokens"] == total
        assert r["fertility_ppm"] == total * 1_000_000 // n_words
        assert r["chars_per_token_milli"] == n_chars * 1000 // total
    # monotone: more merges never produce more tokens, and these merges
    # actually fire on this corpus
    ts = [got[k]["n_bpe_tokens"] for k in (0, 4, 8, 12)]
    assert ts == sorted(ts, reverse=True) and ts[-1] < ts[0]
    # zero merges = character tokenization: exactly 1 char per token
    assert got[0]["chars_per_token_milli"] == 1000


def test_bpe_merge_sweep_plan(spark):
    """Encoding runs on the distinct vocabulary (no per-occurrence
    chains); one corpus explode, word-keyed join, one aggregate, 4-row
    Generate; no Python evaluators, no cartesian."""
    df = QUERIES["text_bpe_merge_sweep"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "Generate" in plan, plan[:2000]
    for bad in ("CartesianProduct", "MapInPandas", "BatchEvalPython"):
        assert bad not in plan, (bad, plan[:2000])


# --------------------------------------------------------------------------
# round-12 wave 9: HLL precision sweep
# --------------------------------------------------------------------------

from kafka_streams_join_spark.queries.hll_sweep import _dims as _hll_dims


def test_hll_precision_sweep_pin(spark):
    """Pure-Python HLL replication per register count: 60-bit md5,
    max-rho registers, exact-int harmonic sum, the certified rounding,
    the small-range branch, and the exact-integer error."""
    t = pq.read_table(
        f"{SF_SMOKE}/events.parquet", columns=["user_id"]
    ).to_pydict()
    hs = [
        int(hashlib.md5(f"hll8_{u}".encode()).hexdigest()[:15], 16)
        for u in t["user_id"]
    ]
    exact = len(set(t["user_id"]))
    got = {
        r["m_registers"]: r.asDict()
        for r in QUERIES["sketch_hll_precision_sweep"](spark, SF_SMOKE).collect()
    }
    half_up = lambda x: math.floor(x + 0.5)
    for m, p, num, small_milli, se_ppm in _hll_dims():
        regs: dict = {}
        for h in hs:
            w = h // m
            rho = p if w == 0 else p - w.bit_length()
            b = h % m
            regs[b] = max(regs.get(b, 0), rho)
        n_empty = m - len(regs)
        s_int = sum(1 << (p - mr) for mr in regs.values()) + n_empty * (
            1 << p
        )
        est_raw = half_up(num / s_int)
        if est_raw <= small_milli * 1000 and n_empty > 0:
            method = "linear_counting"
            est = half_up(1000 * m * math.log(m / n_empty))
        else:
            method, est = "raw", est_raw
        r = got[m]
        assert r["method"] == method
        assert r["est_milli"] == est
        assert r["exact_distinct"] == exact
        assert r["err_ppm"] == abs(est - 1000 * exact) * 1000 // exact
        assert r["theoretical_se_ppm"] == se_ppm
    # the dial must move the right way: error shrinks as m grows
    errs = [got[m]["err_ppm"] for m, *_ in _hll_dims()]
    assert errs[-1] < errs[0]


def test_hll_precision_sweep_plan(spark):
    """The 3x fan-out happens before the first aggregate (shuffle bytes
    are register rows, not corpus rows): two hash aggregates, the 3-row
    dim broadcast, no Python evaluators, no cartesian of data frames."""
    df = QUERIES["sketch_hll_precision_sweep"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "BroadcastExchange" in plan, plan[:2000]
    for bad in ("CartesianProduct", "MapInPandas", "BatchEvalPython"):
        assert bad not in plan, (bad, plan[:2000])
