"""Round-11 semantic pins: independent pure-Python reimplementations on
the sf0.001 corpus (arbitrary-precision ints / plain sequential float64,
no Spark SQL, no DuckDB), plus the new queries' plan gates. The oracle
hash certifies ENGINE PARITY; these certify the SEMANTICS, so a shared
misreading between the Spark plan and its oracle SQL cannot slip
through (the §5.2 checklist's pin step)."""

from __future__ import annotations

import math

import pyarrow.parquet as pq

from kafka_streams_join_spark.plans import explain_str
from kafka_streams_join_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


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


# --------------------------------------------------------------------------
# sim_binary_hamming_topk
# --------------------------------------------------------------------------


def test_binary_hamming_topk_matches_bruteforce(spark):
    emb = _embeddings()
    packed = {vid: _sign_words(vec) for vid, vec in emb}
    expected = {}
    for qid in packed:
        if qid % 100 != 0:
            continue
        cands = []
        for nid, (lo, hi) in packed.items():
            if nid == qid:
                continue
            qlo, qhi = packed[qid]
            ham = bin(qlo ^ lo).count("1") + bin(qhi ^ hi).count("1")
            cands.append((ham, nid))
        cands.sort()
        for rnk, (ham, nid) in enumerate(cands[:5], start=1):
            expected[(qid, nid)] = (rnk, ham)
    got = {
        (r["query_id"], r["neighbor_id"]): (r["rnk"], r["hamming"])
        for r in QUERIES["sim_binary_hamming_topk"](spark, SF_SMOKE)
        .collect()
    }
    assert got == expected


def test_binary_hamming_topk_plan(spark):
    """The packed-corpus scan must broadcast the query side and cut
    candidates map-side: Partial+Final WindowGroupLimit, broadcast join,
    and a ReadSchema pruned to (vec_id, embedding)."""
    df = QUERIES["sim_binary_hamming_topk"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("WindowGroupLimit") >= 2, plan[:2000]
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, (
        plan[:2000]
    )
    assert "CartesianProduct" not in plan, plan[:2000]


# --------------------------------------------------------------------------
# sim_hamming_recall
# --------------------------------------------------------------------------


def test_hamming_recall_matches_bruteforce(spark):
    emb = _embeddings()
    packed = {vid: _sign_words(vec) for vid, vec in emb}

    def _cos(a, b):
        # sequential float64 fold, mirroring both engines' left-to-right
        # accumulation order
        num = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            num += float(x) * float(y)
        for x in a:
            na += float(x) * float(x)
        for x in b:
            nb += float(x) * float(x)
        return num / math.sqrt(na * nb)

    vecs = dict(emb)
    expected = {}
    for qid in vecs:
        if qid % 100 != 0:
            continue
        exact = sorted(
            ((-_cos(vecs[qid], v), nid) for nid, v in vecs.items() if nid != qid)
        )[:5]
        qlo, qhi = packed[qid]
        ham = sorted(
            (
                (
                    bin(qlo ^ lo).count("1") + bin(qhi ^ hi).count("1"),
                    nid,
                )
                for nid, (lo, hi) in packed.items()
                if nid != qid
            )
        )[:5]
        ham_ids = {nid for _, nid in ham}
        n_hits = sum(1 for _, nid in exact if nid in ham_ids)
        expected[qid] = (n_hits, n_hits * 1_000_000 // 5)
    got = {
        r["query_id"]: (r["n_hits"], r["recall_ppm"])
        for r in QUERIES["sim_hamming_recall"](spark, SF_SMOKE).collect()
    }
    assert got == expected


# --------------------------------------------------------------------------
# orders_gini_revenue / orders_hhi_concentration
# --------------------------------------------------------------------------


def _round_half_up(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_gini_revenue_matches_bruteforce(spark):
    o = pq.read_table(f"{SF_SMOKE}/orders.parquet").to_pydict()
    c = pq.read_table(f"{SF_SMOKE}/customer.parquet").to_pydict()
    seg_of = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    rev: dict = {}
    for ck, price in zip(o["o_custkey"], o["o_totalprice"]):
        key = (seg_of[ck], ck)
        rev[key] = rev.get(key, 0) + _round_half_up(price * 100)
    by_seg: dict = {}
    for (seg, _ck), x in rev.items():
        by_seg.setdefault(seg, []).append(x)
    expected = {}
    for seg, xs in by_seg.items():
        xs.sort()
        n = len(xs)
        sx = sum(xs)
        s2rx = sum(2 * (i + 1) * x for i, x in enumerate(xs))
        gini = (
            0
            if n < 2 or sx == 0
            else (1_000_000 * (s2rx - (n + 1) * sx)) // (n * sx)
        )
        expected[seg] = (n, sx, gini)
    got = {
        r["c_mktsegment"]: (r["n_customers"], r["revenue_cents"], r["gini_ppm"])
        for r in QUERIES["orders_gini_revenue"](spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_hhi_concentration_matches_bruteforce(spark):
    li = pq.read_table(f"{SF_SMOKE}/lineitem.parquet").to_pydict()
    s = pq.read_table(f"{SF_SMOKE}/supplier.parquet").to_pydict()
    n = pq.read_table(f"{SF_SMOKE}/nation.parquet").to_pydict()
    nat_of_supp = dict(zip(s["s_suppkey"], s["s_nationkey"]))
    name_of_nat = dict(zip(n["n_nationkey"], n["n_name"]))
    rev: dict = {}
    for sk, price in zip(li["l_suppkey"], li["l_extendedprice"]):
        key = (name_of_nat[nat_of_supp[sk]], sk)
        rev[key] = rev.get(key, 0) + _round_half_up(price * 100)
    by_nat: dict = {}
    for (nat, _sk), r in rev.items():
        by_nat.setdefault(nat, []).append(r)
    expected = {}
    for nat, rs in by_nat.items():
        tot = sum(rs)
        sumsq = sum(r * r for r in rs)
        hhi = (
            0
            if tot == 0
            else _round_half_up(1_000_000 * float(sumsq) / (float(tot) * float(tot)))
        )
        top = 0 if tot == 0 else (1_000_000 * max(rs)) // tot
        expected[nat] = (len(rs), tot, hhi, top)
    got = {
        r["nation"]: (
            r["n_suppliers"],
            r["revenue_cents"],
            r["hhi_ppm"],
            r["top_share_ppm"],
        )
        for r in QUERIES["orders_hhi_concentration"](spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_gini_hhi_plans(spark):
    """Gini: dims broadcast, the rank window runs over the level frame
    (never a single unpartitioned data-sized window); HHI: both dims
    broadcast, no shuffle wider than the (nation, supp) aggregate."""
    g = QUERIES["orders_gini_revenue"](spark, SF_SMOKE)
    plan = explain_str(g, "simple")
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    h = QUERIES["orders_hhi_concentration"](spark, SF_SMOKE)
    plan_h = explain_str(h, "simple")
    assert plan_h.count("BroadcastHashJoin") >= 2, plan_h[:2000]
    assert "CartesianProduct" not in plan_h, plan_h[:2000]


# --------------------------------------------------------------------------
# events_control_rules
# --------------------------------------------------------------------------


def test_control_rules_matches_bruteforce(spark):
    ev = pq.read_table(
        f"{SF_SMOKE}/events.parquet", columns=["event_type", "ts"]
    ).to_pydict()
    hourly: dict = {}
    for et, ts in zip(ev["event_type"], ev["ts"]):
        key = (et, ts.replace(minute=0, second=0, microsecond=0, nanosecond=0)
               if hasattr(ts, "nanosecond")
               else ts.replace(minute=0, second=0, microsecond=0))
        hourly[key] = hourly.get(key, 0) + 1
    by_type: dict = {}
    for (et, h), c in sorted(hourly.items()):
        by_type.setdefault(et, []).append(c)
    expected = {}
    any_r1 = any_r4 = 0
    for et, cs in by_type.items():
        n = len(cs)
        s = sum(cs)
        q = sum(c * c for c in cs)
        r1 = sum(1 for c in cs if (c * n - s) ** 2 > 9 * (n * q - s * s))
        sides = [1 if c * n > s else -1 if c * n < s else 0 for c in cs]
        r4 = sum(
            1
            for i in range(7, n)
            if abs(sum(sides[i - 7 : i + 1])) == 8
        )
        expected[et] = (n, r1, r4)
        any_r1 += r1
        any_r4 += r4
    # non-vacuousness: the machinery must actually execute on this corpus
    # (the r9 survival-curve lesson — a hash match on all-zeros proves
    # nothing about the rule logic)
    assert any_r1 > 0 and any_r4 > 0
    got = {
        r["event_type"]: (r["n_hours"], r["rule1_violations"], r["rule4_runs"])
        for r in QUERIES["events_control_rules"](spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_control_rules_plan(spark):
    """Moments broadcast back onto the hour frame; the run windows are
    partitioned by type (never a single-partition data-sized window)."""
    df = QUERIES["events_control_rules"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


# --------------------------------------------------------------------------
# classifier_auc_roc
# --------------------------------------------------------------------------


def test_auc_roc_matches_bruteforce(spark):
    import re as _re

    docs = pq.read_table(
        f"{SF_SMOKE}/documents.parquet", columns=["lang", "text", "source"]
    ).to_pydict()
    stop = {"the", "a", "of", "and"}
    by_lang: dict = {}
    for lang, text, source in zip(docs["lang"], docs["text"], docs["source"]):
        toks = _re.sub(r"\s+", " ", text.strip()).split(" ")
        n_tok = max(len(toks), 1)
        n_stop = sum(1 for t in toks if t.lower() in stop)
        score = (2000 * n_stop + n_tok) // (2 * n_tok)
        y = 1 if source in ("src0", "src1") else 0
        by_lang.setdefault(lang, []).append((score, y))
    expected = {}
    for lang, rows in by_lang.items():
        pos = [s for s, y in rows if y == 1]
        neg = [s for s, y in rows if y == 0]
        np_, nn = len(pos), len(neg)
        if np_ == 0 or nn == 0:
            expected[lang] = (np_, nn, 0)
            continue
        # direct pairwise Mann-Whitney definition — deliberately NOT the
        # rank decomposition the query uses
        wins = sum(
            2 if p > q else 1 if p == q else 0 for p in pos for q in neg
        )
        expected[lang] = (np_, nn, (1_000_000 * wins) // (2 * np_ * nn))
    got = {
        r["lang"]: (r["n_pos"], r["n_neg"], r["auc_ppm"])
        for r in QUERIES["classifier_auc_roc"](spark, SF_SMOKE).collect()
    }
    assert got == expected
    # non-degenerate on this corpus: at least one lang ranks away from 0.5
    assert any(v[2] not in (0, 500_000) for v in got.values())


def test_auc_roc_plan(spark):
    """The corpus collapses to the milli-score lattice before any window;
    the rank window is partitioned by lang (never single-partition over
    a data-sized frame)."""
    df = QUERIES["classifier_auc_roc"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "Exchange SinglePartition" not in plan, plan[:2000]


# --------------------------------------------------------------------------
# orders_trimmed_winsorized
# --------------------------------------------------------------------------


def test_trimmed_winsorized_matches_bruteforce(spark):
    o = pq.read_table(
        f"{SF_SMOKE}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).to_pydict()
    by_pri: dict = {}
    for pri, price in zip(o["o_orderpriority"], o["o_totalprice"]):
        by_pri.setdefault(pri, []).append(_round_half_up(price * 100))
    expected = {}
    for pri, xs in by_pri.items():
        xs.sort()
        n = len(xs)
        k = n * 5 // 100
        mid = xs[k : n - k]
        wins = sum(mid) + k * xs[k] + k * xs[n - k - 1]
        expected[pri] = (
            n,
            k,
            (1000 * sum(mid)) // (n - 2 * k),
            (1000 * wins) // n,
        )
    got = {
        r["o_orderpriority"]: (
            r["n_orders"],
            r["n_trimmed_each_side"],
            r["trimmed_mean_milli"],
            r["winsor_mean_milli"],
        )
        for r in QUERIES["orders_trimmed_winsorized"](spark, SF_SMOKE).collect()
    }
    assert got == expected
    # non-vacuous: trimming must actually drop rows at this SF
    assert all(v[1] > 0 for v in got.values())


# --------------------------------------------------------------------------
# text_phrase_search
# --------------------------------------------------------------------------


def test_phrase_search_matches_bruteforce(spark):
    import re as _re

    docs = pq.read_table(
        f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pydict()
    totals: dict = {}
    occs: dict = {}
    ndocs: dict = {}
    max_len = 0
    for _doc, src, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        toks = _re.sub(r"\s+", " ", text.strip()).split(" ")
        max_len = max(max_len, len(toks))
        totals[src] = totals.get(src, 0) + len(toks)
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "table" and toks[i + 1] == "hash"
        )
        if n:
            occs[src] = occs.get(src, 0) + n
            ndocs[src] = ndocs.get(src, 0) + 1
    # the oracle's generate_series bound must dominate real doc length
    assert max_len < 400
    expected = {
        src: (
            ndocs.get(src, 0),
            occs.get(src, 0),
            occs.get(src, 0) * 1_000_000 // totals[src],
        )
        for src in totals
    }
    # non-vacuous: the phrase must occur somewhere
    assert sum(occs.values()) > 0
    got = {
        r["source"]: (r["n_docs"], r["n_occurrences"], r["occ_ppm_tokens"])
        for r in QUERIES["text_phrase_search"](spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_phrase_search_plan(spark):
    """The containment prefilter must reach the scan side (filter before
    the posexplode Generate), and the adjacency join must not be a
    cartesian."""
    df = QUERIES["text_phrase_search"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "Generate" in plan, plan[:2000]


# --------------------------------------------------------------------------
# dq_group_fairness
# --------------------------------------------------------------------------


def test_group_fairness_matches_bruteforce(spark):
    import re as _re
    from fractions import Fraction

    docs = pq.read_table(
        f"{SF_SMOKE}/documents.parquet", columns=["lang", "text"]
    ).to_pydict()
    stop = {"the", "a", "of", "and"}
    rates: dict = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        toks = _re.sub(r"\s+", " ", text.strip()).split(" ")
        n_tok = max(len(toks), 1)
        n_stop = sum(1 for t in toks if t.lower() in stop)
        score = (2000 * n_stop + n_tok) // (2 * n_tok)
        n, sel = rates.get(lang, (0, 0))
        rates[lang] = (n + 1, sel + (1 if score >= 80 else 0))
    # reference cohort by EXACT fraction, min lang among ties
    best_lang = min(
        (lang for lang in rates),
        key=lambda g: (-Fraction(rates[g][1], rates[g][0]), g),
    )
    bn, bsel = rates[best_lang]
    expected = {}
    for lang, (n, sel) in rates.items():
        di = 1_000_000 if bsel == 0 else (1_000_000 * sel * bn) // (n * bsel)
        expected[lang] = (
            n,
            sel,
            sel * 1_000_000 // n,
            di,
            False if bsel == 0 else di < 800_000,
        )
    got = {
        r["lang"]: (
            r["n_docs"],
            r["n_selected"],
            r["rate_ppm"],
            r["di_ratio_ppm"],
            r["four_fifths_violation"],
        )
        for r in QUERIES["dq_group_fairness"](spark, SF_SMOKE).collect()
    }
    assert got == expected
    # non-vacuous: somebody is selected, and the audit finds a violation
    assert any(v[1] > 0 for v in got.values())
    assert any(v[4] for v in got.values())


# --------------------------------------------------------------------------
# events_theilsen_slope
# --------------------------------------------------------------------------


def test_theilsen_matches_bruteforce(spark):
    ev = pq.read_table(
        f"{SF_SMOKE}/events.parquet", columns=["event_type", "ts"]
    ).to_pydict()
    daily: dict = {}
    for et, ts in zip(ev["event_type"], ev["ts"]):
        day = (
            ts.replace(hour=0, minute=0, second=0, microsecond=0)
            .date()
            .toordinal()
        )
        daily[(et, day)] = daily.get((et, day), 0) + 1
    by_type: dict = {}
    for (et, day), c in daily.items():
        by_type.setdefault(et, []).append((day, c))
    expected = {}
    for et, rows in by_type.items():
        rows.sort()
        slopes = [
            (c2 - c1) / (d2 - d1)
            for i, (d1, c1) in enumerate(rows)
            for (d2, c2) in rows[i + 1 :]
        ]
        slopes.sort()
        m = len(slopes)
        if m == 0:
            # a single-day type yields no pairs: since the round-12
            # ADVICE fix the group is REPORTED with n_pairs=0 and a NULL
            # slope instead of vanishing from the output
            expected[et] = (len(rows), 0, None)
            continue
        med = (
            slopes[m // 2]
            if m % 2
            else (slopes[m // 2 - 1] + slopes[m // 2]) / 2.0
        )
        expected[et] = (len(rows), m, _round_half_up(1000 * med))
    got = {
        r["event_type"]: (r["n_days"], r["n_pairs"], r["slope_milli"])
        for r in QUERIES["events_theilsen_slope"](spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_theilsen_plan(spark):
    """The pair join must run on the staged day frame, not the corpus;
    no cartesian (the equi-join keys on event_type)."""
    df = QUERIES["events_theilsen_slope"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan[:2000]


# --------------------------------------------------------------------------
# events_conditional_entropy
# --------------------------------------------------------------------------


def test_conditional_entropy_matches_bruteforce(spark):
    ev = pq.read_table(
        f"{SF_SMOKE}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).to_pydict()
    rows = sorted(
        zip(ev["user_id"], ev["ts"], ev["event_id"], ev["event_type"])
    )
    pairs: dict = {}
    for (u1, _t1, _e1, a), (u2, _t2, _e2, b) in zip(rows, rows[1:]):
        if u1 == u2:
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    tot: dict = {}
    branches: dict = {}
    for (a, _b), n in pairs.items():
        tot[a] = tot.get(a, 0) + n
        branches[a] = branches.get(a, 0) + 1
    expected = {}
    for a in tot:
        h = sum(
            _round_half_up(
                1_000_000 * n * math.log(tot[a] / n) / tot[a]
            )
            for (x, _b), n in pairs.items()
            if x == a
        )
        expected[a] = (
            tot[a],
            branches[a],
            h,
            _round_half_up(1000 * math.exp(h / 1_000_000)),
        )
    got = {
        r["event_type"]: (
            r["n_transitions"],
            r["n_branches"],
            r["branch_entropy_micro"],
            r["perplexity_milli"],
        )
        for r in QUERIES["events_conditional_entropy"](spark, SF_SMOKE)
        .collect()
    }
    assert got == expected
    # non-degenerate: some state must actually branch
    assert any(v[1] > 1 for v in got.values())


# --------------------------------------------------------------------------
# orders_backlog_aging
# --------------------------------------------------------------------------


def test_backlog_aging_matches_bruteforce(spark):
    o = pq.read_table(
        f"{SF_SMOKE}/orders.parquet",
        columns=["o_orderstatus", "o_orderdate", "o_totalprice"],
    ).to_pydict()
    today = max(ts.date() for ts in o["o_orderdate"])
    agg: dict = {}
    for st, od, price in zip(
        o["o_orderstatus"], o["o_orderdate"], o["o_totalprice"]
    ):
        if st not in ("O", "P"):
            continue
        age = (today - od.date()).days
        b = (
            "0-7d"
            if age <= 7
            else "8-30d" if age <= 30 else "31-90d" if age <= 90 else "90d+"
        )
        n, v = agg.get((st, b), (0, 0))
        agg[(st, b)] = (n + 1, v + _round_half_up(price * 100))
    got = {
        (r["o_orderstatus"], r["age_bucket"]): (
            r["n_orders"],
            r["open_value_cents"],
        )
        for r in QUERIES["orders_backlog_aging"](spark, SF_SMOKE).collect()
    }
    assert got == agg
    # non-vacuous: more than one bucket must be populated
    assert len({b for _s, b in got}) > 1


# --------------------------------------------------------------------------
# emb_isotropy_audit
# --------------------------------------------------------------------------


def test_isotropy_matches_bruteforce(spark):
    """Round-13 lattice form: the replay is EXACT — coordinates quantize
    element-wise to the micro lattice, then pure integer moments, so no
    tolerance is needed anywhere (VERDICT r12 item 6)."""
    emb = _embeddings()
    dims = len(emb[0][1])
    vms = []
    for d in range(dims):
        qs = [math.floor(float(vec[d]) * 1_000_000 + 0.5) for _vid, vec in emb]
        n = len(qs)
        sq = sum(qs)
        sqq = sum(q * q for q in qs)
        vms.append((n * sqq - sq * sq) // (n * n * 1_000_000))
    sv = sum(vms)
    svv = sum(v * v for v in vms)
    exp = {
        "n_dims": dims,
        "min_var_micro": min(vms),
        "max_var_micro": max(vms),
        "var_ratio_ppm": (1_000_000 * min(vms)) // max(vms),
        "top_dim_share_ppm": (1_000_000 * max(vms)) // sv,
        "effective_dims_milli": (1000 * sv * sv) // svv,
    }
    [row] = QUERIES["emb_isotropy_audit"](spark, SF_SMOKE).collect()
    assert {k: row[k] for k in exp} == exp
    # non-degenerate: the space must not be collapsed, and not perfectly
    # isotropic either (otherwise the audit proves nothing here)
    assert 0 < row["var_ratio_ppm"] < 1_000_000
    assert row["effective_dims_milli"] > 1000


# --------------------------------------------------------------------------
# unpivot_lineitem_charges
# --------------------------------------------------------------------------


def test_unpivot_charges_matches_bruteforce(spark):
    li = pq.read_table(
        f"{SF_SMOKE}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_discount", "l_tax"],
    ).to_pydict()
    agg: dict = {}
    for fl, ext, disc, tax in zip(
        li["l_returnflag"], li["l_extendedprice"], li["l_discount"], li["l_tax"]
    ):
        for comp, cents in (
            ("base", _round_half_up(ext * 100)),
            ("discount", _round_half_up(ext * disc * 100)),
            ("tax", _round_half_up(ext * (1 - disc) * tax * 100)),
        ):
            n, v = agg.get((fl, comp), (0, 0))
            agg[(fl, comp)] = (n + 1, v + cents)
    got = {
        (r["l_returnflag"], r["component"]): (r["n_rows"], r["total_cents"])
        for r in QUERIES["unpivot_lineitem_charges"](spark, SF_SMOKE).collect()
    }
    assert got == agg


def test_unpivot_plan_is_generate_no_join(spark):
    """stack() must plan as a map-side Generate/Expand over ONE scan —
    an unpivot that joins or unions three scans reads the table three
    times at 100 TB."""
    df = QUERIES["unpivot_lineitem_charges"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("Scan parquet") == 1, plan[:2000]
    assert "Join" not in plan, plan[:2000]
