"""Round-7 property tests: invariants the oracle hash can't express —
brute-force differentials, recall guarantees, merge laws, conservation —
for the round-7 operator wave (graph communities/similarity, hash-sample
and theta sketches, perceptual multimodal dedup).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# --------------------------------------------------------------------------
# graph: label propagation / jaccard / local clustering
# --------------------------------------------------------------------------


def test_label_propagation_communities_partition_nodes(spark):
    """Community sizes sum to ≤ the node count, every community id IS a
    node id (labels start as ids and only copy), and the report is
    rank-ordered by (size desc, community)."""
    from kafka_streams_join_spark.queries.graph import (
        _edges,
        graph_label_propagation,
    )

    rows = sorted(
        graph_label_propagation(spark, SF).collect(), key=lambda r: r["rnk"]
    )
    nodes = {r["src"] for r in _edges(spark, SF).select("src").distinct().collect()}
    assert sum(r["n_members"] for r in rows) <= len(nodes)
    prev = None
    for r in rows:
        assert r["community"] in nodes
        key = (-r["n_members"], r["community"])
        assert prev is None or prev < key
        prev = key


def test_jaccard_neighbors_bounds_and_order(spark):
    """Jaccard is in (0, 1e6] ppm, n_common ≥ the floor, pairs are
    canonical (a < b), ordering is (jaccard desc, a, b)."""
    from kafka_streams_join_spark.queries.graph import (
        _JACC_MIN_COMMON,
        graph_jaccard_neighbors,
    )

    rows = sorted(
        graph_jaccard_neighbors(spark, SF).collect(), key=lambda r: r["rnk"]
    )
    assert rows, "expected candidates at sf0.001"
    prev = None
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["n_common"] >= _JACC_MIN_COMMON
        assert 0 < r["jaccard_ppm"] <= 1_000_000
        key = (-r["jaccard_ppm"], r["part_a"], r["part_b"])
        assert prev is None or prev < key
        prev = key


def test_local_clustering_matches_bruteforce(spark):
    """Differential: the oriented-wedge triangle charge equals a pure-
    Python per-node triangle count over the collected sf0.001 edge list,
    and cc_ppm = 2e6 * t // (d * (d-1)) exactly."""
    from kafka_streams_join_spark.queries.graph import (
        _LCC_MIN_DEG,
        _edges,
        graph_local_clustering,
    )

    edges = {
        (r["src"], r["dst"]) for r in _edges(spark, SF).collect()
    }
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    tri = {
        u: sum(
            1
            for a in ns
            for b in ns
            if a < b and b in adj.get(a, ())
        )
        for u, ns in adj.items()
    }
    rows = graph_local_clustering(spark, SF).collect()
    assert rows
    for r in rows:
        u = r["part_id"]
        d = len(adj[u])
        assert r["degree"] == d >= _LCC_MIN_DEG
        assert r["n_tri"] == tri[u]
        assert r["cc_ppm"] == tri[u] * 2_000_000 // (d * (d - 1))


# --------------------------------------------------------------------------
# sketches: hash-sample merge law, theta intersection
# --------------------------------------------------------------------------


def test_hash_sample_merge_law(spark):
    """The sketch's mergeability is exact: the sampled row-key set of the
    full table equals the union of the sampled key sets of any disjoint
    split (hash filtering commutes with union — no compaction step)."""
    from kafka_streams_join_spark.queries.sketches import (
        _HSQ_CUT,
        _HSQ_H_SPARK,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", F.expr(_HSQ_H_SPARK).alias("hv")
    )
    full = {
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.filter(F.col("hv") < _HSQ_CUT).collect()
    }
    parts = [
        li.filter((F.col("l_orderkey") % 2 == m) & (F.col("hv") < _HSQ_CUT))
        for m in (0, 1)
    ]
    merged = set()
    for p in parts:
        merged |= {(r["l_orderkey"], r["l_linenumber"]) for r in p.collect()}
    assert merged == full and full


def test_hash_sample_quantiles_monotone(spark):
    from kafka_streams_join_spark.queries.sketches import (
        sketch_hash_sample_quantiles,
    )

    for r in sketch_hash_sample_quantiles(spark, SF01).collect():
        assert 0 < r["n_sample"] < r["n_total"]
        assert r["est_total"] == r["n_sample"] * 8
        assert r["q50"] <= r["q90"] <= r["q99"]


def test_theta_intersection_structure(spark):
    """All type pairs present exactly once (canonical order), estimate is
    zero iff the sketches share no hash, and the exact column matches a
    direct distinct-user intersection."""
    from kafka_streams_join_spark.queries.sketches import (
        sketch_theta_intersection,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = sketch_theta_intersection(spark, SF).collect()
    types = sorted({r["type_a"] for r in rows} | {r["type_b"] for r in rows})
    n = len(types)
    assert len(rows) == n * (n - 1) // 2
    ev = load_table(spark, SF, "events").select("event_type", "user_id").distinct()
    users = {
        t: {r["user_id"] for r in ev.filter(F.col("event_type") == t).collect()}
        for t in types
    }
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert (r["est_common"] == 0) == (r["n_common_sketch"] == 0)
        assert r["exact_common"] == len(
            users[r["type_a"]] & users[r["type_b"]]
        )


# --------------------------------------------------------------------------
# multimodal: perceptual hash recall + exact-bytes conservation
# --------------------------------------------------------------------------


def _ahash_py(b: bytes, bits: int) -> int:
    n = len(b)
    total = sum(b)
    sums = [0] * bits
    cnts = [0] * bits
    for i, v in enumerate(b):
        k = i * bits // n
        sums[k] += v
        cnts[k] += 1
    h = 0
    for k in range(bits):
        if sums[k] * n > total * cnts[k]:
            h |= 1 << k
    return h


def test_phash_recall_and_precision(spark):
    """Precision: every reported pair re-verifies hamming ≤ the cap in
    pure Python. Recall: every brute-force pair with hamming < #bands is
    GUARANTEED present (pigeonhole — some band must be identical);
    pairs between #bands and the cap are best-effort LSH."""
    from kafka_streams_join_spark.queries.multimodal import (
        _PH_BANDS,
        _PH_BITS,
        _PH_MAX_HAMMING,
        mm_phash_neardup,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    docs = {
        r["doc_id"]: _ahash_py(r["text"].encode("utf-8"), _PH_BITS)
        for r in load_table(spark, SF, "documents").collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in mm_phash_neardup(spark, SF).collect()
    }
    for (a, b), ham in got.items():
        assert bin(docs[a] ^ docs[b]).count("1") == ham <= _PH_MAX_HAMMING
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(docs[a] ^ docs[b]).count("1")
            if ham < _PH_BANDS:
                assert (a, b) in got, (a, b, ham)


def test_exact_bytes_dedup_conserves_assets(spark):
    from kafka_streams_join_spark.queries.multimodal import (
        mm_dedup_exact_bytes,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = mm_dedup_exact_bytes(spark, SF01).collect()
    n_docs = load_table(spark, SF01, "documents").count()
    assert sum(r["n_assets"] for r in rows) == n_docs
    for r in rows:
        assert r["n_redundant"] == r["n_assets"] - r["n_distinct"] >= 0
        assert r["n_dup_groups"] <= r["n_redundant"] or r["n_redundant"] == 0


def test_size_quantiles_ordered(spark):
    from kafka_streams_join_spark.queries.multimodal import mm_size_quantiles

    rows = mm_size_quantiles(spark, SF01).collect()
    assert len(rows) == 3
    for r in rows:
        assert (
            r["min_bytes"]
            <= r["p50_bytes"]
            <= r["p90_bytes"]
            <= r["p99_bytes"]
            <= r["max_bytes"]
        )
        assert r["total_bytes"] >= r["n_assets"] * r["min_bytes"]


# --------------------------------------------------------------------------
# wave 2: text insights
# --------------------------------------------------------------------------


def test_ngram_novelty_conservation(spark):
    """Every distinct shingle is first-seen exactly once, so Σ n_novel
    over buckets equals the corpus-wide distinct-shingle count; novelty
    never exceeds the bucket's shingle total."""
    from kafka_streams_join_spark.queries.text_insights import (
        text_ngram_novelty,
    )
    from kafka_streams_join_spark.queries.text import _TOKS
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = text_ngram_novelty(spark, SF).collect()
    assert rows
    total_novel = sum(r["n_novel"] for r in rows)
    distinct_shingles = (
        load_table(spark, SF, "documents")
        .select(F.expr(f"transform({_TOKS}, t -> lower(t))").alias("toks"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(toks) - 2, 0)),"
                    " i -> concat_ws(' ', toks[i - 1], toks[i], toks[i + 1]))"
                )
            ).alias("s")
        )
        .distinct()
        .count()
    )
    assert total_novel == distinct_shingles
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_shingles"]
        assert 0 <= r["novelty_ppm"] <= 1_000_000


def test_jsd_bounds_and_order(spark):
    """JSD is bounded by ln 2 (693147 µnats) up to per-term rounding, and
    the report is rank-ordered."""
    from kafka_streams_join_spark.queries.text_insights import (
        text_js_divergence_sources,
    )

    rows = sorted(
        text_js_divergence_sources(spark, SF).collect(), key=lambda r: r["rnk"]
    )
    assert rows
    prev = None
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert -1000 <= r["jsd_micro"] <= 693147 + 1000
        key = (-r["jsd_micro"], r["src_a"], r["src_b"])
        assert prev is None or prev < key
        prev = key


def test_burstiness_nonnegative_ordered(spark):
    from kafka_streams_join_spark.queries.text_insights import (
        _BURST_MIN_CF,
        text_term_burstiness,
    )

    rows = text_term_burstiness(spark, SF01).collect()
    assert rows
    prev = None
    for r in rows:
        assert r["cf"] >= _BURST_MIN_CF
        assert r["df"] <= r["cf"]
        assert r["fano_milli"] >= 0  # variance is non-negative
        key = (-r["fano_milli"], r["token"])
        assert prev is None or prev < key
        prev = key


# --------------------------------------------------------------------------
# wave 2: analytics extensions
# --------------------------------------------------------------------------


def test_discount_uplift_baseline_is_zero(spark):
    from kafka_streams_join_spark.queries.analytics_ext import (
        orders_discount_uplift,
    )

    rows = {r["disc_pct"]: r for r in orders_discount_uplift(spark, SF01).collect()}
    assert 0 in rows and rows[0]["uplift_ppm"] == 0
    for r in rows.values():
        assert 0 <= r["disc_pct"] <= 10
        assert r["qty_milli"] > 0


def test_basket_histogram_conserves_orders(spark):
    from kafka_streams_join_spark.queries.analytics_ext import (
        orders_basket_size_histogram,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = orders_basket_size_histogram(spark, SF01).collect()
    n_orders = load_table(spark, SF01, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    assert sum(r["share_ppm"] for r in rows) <= 1_000_000
    assert all(r["basket_size"] >= 0 for r in rows)


def test_snapshot_diff_partitions_keys(spark):
    """added/removed/changed/unchanged partition the per-type key space;
    churn is their non-unchanged share."""
    from kafka_streams_join_spark.queries.analytics_ext import (
        pipeline_snapshot_diff,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = pipeline_snapshot_diff(spark, SF01).collect()
    keys = (
        load_table(spark, SF01, "events")
        .select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .count()
        .collect()
    )
    totals = {r["event_type"]: r["count"] for r in keys}
    for r in rows:
        parts = (
            r["n_added"] + r["n_removed"] + r["n_changed"] + r["n_unchanged"]
        )
        assert parts == totals[r["event_type"]]
        assert 0 <= r["churn_ppm"] <= 1_000_000


def test_benford_conserves_and_bounds(spark):
    from kafka_streams_join_spark.queries.analytics_ext import (
        dq_benford_audit,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = dq_benford_audit(spark, SF01).collect()
    assert sorted(r["digit"] for r in rows) == list(range(1, 10))
    n = load_table(spark, SF01, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n
    for r in rows:
        assert r["dev_ppm"] == abs(r["share_ppm"] - r["benford_ppm"])


def test_user_entropy_buckets_bounded(spark):
    """Entropy of a 5-outcome distribution is ≤ ln 5 ≈ 1.609e6 µnats, so
    buckets live in [0, 8]; users are conserved."""
    from kafka_streams_join_spark.queries.analytics_ext import (
        events_user_entropy,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = events_user_entropy(spark, SF01).collect()
    n_users = (
        load_table(spark, SF01, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    assert all(0 <= r["bucket"] <= 8 for r in rows)


def test_common_prefix_matches_bruteforce(spark):
    from collections import Counter

    from kafka_streams_join_spark.queries.analytics_ext import (
        _PFX_LEN,
        dedup_common_prefix,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    docs = load_table(spark, SF, "documents").collect()
    groups = Counter(r["text"][:_PFX_LEN] for r in docs)
    reps: dict[str, int] = {}
    for r in docs:
        p = r["text"][:_PFX_LEN]
        reps[p] = min(reps.get(p, r["doc_id"]), r["doc_id"])
    expect = sorted(
        ((n, p) for p, n in groups.items() if n > 1),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    rows = sorted(dedup_common_prefix(spark, SF).collect(), key=lambda r: r["rnk"])
    assert [(r["n_docs"], r["prefix"]) for r in rows] == expect
    for r in rows:
        assert r["representative"] == reps[r["prefix"]]


def test_map_eval_bounds(spark):
    from kafka_streams_join_spark.queries.evaluation import retrieval_map_eval
    from kafka_streams_join_spark.queries.similarity import TOP_K

    rows = retrieval_map_eval(spark, SF01).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_rel_top"] <= TOP_K
        assert 0.0 <= r["ap"] <= 1.0
        if r["n_rel_top"] == 0:
            assert r["ap"] == 0.0


def test_assortativity_matches_bruteforce(spark):
    """Differential: the BIGINT-sums Pearson equals a pure-Python Pearson
    over the collected sf0.001 edge list, at milli precision."""
    import math

    from kafka_streams_join_spark.queries.graph import (
        _edges,
        graph_assortativity,
    )

    edges = [(r["src"], r["dst"]) for r in _edges(spark, SF).collect()]
    deg: dict[int, int] = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    xs = [deg[u] for u, v in edges]
    ys = [deg[v] for u, v in edges]
    m = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    expect = round(
        1000.0
        * (m * sxy - sx * sy)
        / (math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy))
    )
    row = graph_assortativity(spark, SF).collect()[0]
    assert row["n_edges_directed"] == m
    assert row["assortativity_milli"] == expect
    assert abs(row["assortativity_milli"]) <= 1000


# --------------------------------------------------------------------------
# wave 3: BFS, range search, latency analytics
# --------------------------------------------------------------------------


def test_bfs_hops_monotone_and_bruteforce(spark):
    """Cumulative reach is non-decreasing, frontier ≤ reach, and hop-1
    equals the seed's degree + 1 check via a pure-Python BFS."""
    from collections import deque

    from kafka_streams_join_spark.queries.graph import _edges, graph_bfs_hops

    edges = [(r["src"], r["dst"]) for r in _edges(spark, SF).collect()]
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    seed = min(adj)
    dist = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    rows = sorted(graph_bfs_hops(spark, SF).collect(), key=lambda r: r["hop"])
    prev_reach = 1
    for r in rows:
        h = r["hop"]
        assert r["n_reached"] == sum(1 for d in dist.values() if d <= h)
        assert r["n_frontier"] == sum(1 for d in dist.values() if d == h)
        assert r["n_reached"] >= prev_reach
        prev_reach = r["n_reached"]


def test_range_search_matches_topk_scores(spark):
    """Every range hit re-verifies against a brute-force Python cosine,
    and every pair above threshold is present (exactness, not recall)."""
    import math

    from kafka_streams_join_spark.queries.emb_ext import (
        _RANGE_MIN_COS,
        sim_range_search,
    )
    from kafka_streams_join_spark.queries.similarity import QUERY_STRIDE
    from kafka_streams_join_spark.sources.parquet import load_table

    vecs = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, SF, "embeddings").collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in sim_range_search(spark, SF).collect()
    }

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(x) ** 2 for x in b))
        return round(dot / (na / 1 * nb), 3)

    expect = {}
    for q, qa in vecs.items():
        if q % QUERY_STRIDE != 0:
            continue
        for nid, nb_ in vecs.items():
            if nid == q:
                continue
            c = cos(qa, nb_)
            if c >= _RANGE_MIN_COS:
                expect[(q, nid)] = c
    assert got == expect and got


def test_ship_latency_nonnegative(spark):
    from kafka_streams_join_spark.queries.analytics_ext import (
        orders_ship_latency,
    )

    rows = orders_ship_latency(spark, SF01).collect()
    assert len(rows) == 5
    for r in rows:
        # the synthetic corpus generates shipdates independently of order
        # dates, so negative latency EXISTS — the query's job is to surface
        # it, the test's job is the quantile ordering
        assert r["min_days"] <= r["p50_days"] <= r["p90_days"] <= r["max_days"]


def test_freshness_lag_has_zero_row(spark):
    """Exactly the globally-freshest stream(s) lag zero; all lags are
    non-negative."""
    from kafka_streams_join_spark.queries.analytics_ext import (
        dq_freshness_lag,
    )

    rows = dq_freshness_lag(spark, SF01).collect()
    assert min(r["lag_seconds"] for r in rows) == 0
    assert all(r["lag_seconds"] >= 0 for r in rows)


def test_funnel_latency_bounds(spark):
    from kafka_streams_join_spark.queries.analytics_ext import (
        events_funnel_latency,
    )

    rows = {r["transition"]: r for r in events_funnel_latency(spark, SF01).collect()}
    assert set(rows) == {"view->click", "click->purchase"}
    for r in rows.values():
        assert r["n_users"] > 0
        assert 0 <= r["p50_s"] <= r["p90_s"]


def test_similarity_histogram_conserves_pairs(spark):
    from kafka_streams_join_spark.queries.emb_ext import (
        emb_similarity_histogram,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = emb_similarity_histogram(spark, SF01).collect()
    n = load_table(spark, SF01, "embeddings").count()
    assert sum(r["n_pairs"] for r in rows) == n - 1
    assert all(-10 <= r["bucket"] <= 10 for r in rows)


# --------------------------------------------------------------------------
# wave 4: AMS merge law, modularity bounds, reconciliation conservation
# --------------------------------------------------------------------------


def test_ams_counters_merge_law(spark):
    """AMS counters are sums, so counters(A ∪ B) = counters(A) +
    counters(B) exactly — the mergeable-sketch property, pinned on a
    disjoint user split; and the estimator is the mean of squares."""
    from kafka_streams_join_spark.queries.sketches import (
        _AMS_H_SPARK,
        _AMS_R,
        sketch_ams_f2,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    ev = load_table(spark, SF, "events").select(
        "user_id", F.expr(_AMS_H_SPARK).alias("hv")
    )

    def counters(df):
        return {
            r["j"]: r["z"]
            for r in df.select(
                "hv",
                F.explode(F.array(*[F.lit(j) for j in range(_AMS_R)])).alias(
                    "j"
                ),
            )
            .groupBy("j")
            .agg(F.expr("cast(sum(2 * ((hv >> j) & 1) - 1) as bigint)").alias("z"))
            .collect()
        }

    whole = counters(ev)
    a = counters(ev.filter(F.col("user_id") % 2 == 0))
    b = counters(ev.filter(F.col("user_id") % 2 == 1))
    assert {j: a[j] + b[j] for j in whole} == whole
    row = sketch_ams_f2(spark, SF).collect()[0]
    assert row["f2_est"] == sum(z * z for z in whole.values()) // _AMS_R
    assert row["f2_exact"] > 0


def test_modularity_bounds(spark):
    """Q ∈ [−1e6, 1e6] ppm, communities ≥ 1, and on this co-purchase
    graph the LPA partition must be at least as good as random (Q ≥ 0
    would be ideal; we only pin the hard bounds plus edge count parity)."""
    from kafka_streams_join_spark.queries.graph import (
        _edges,
        graph_modularity,
    )

    row = graph_modularity(spark, SF).collect()[0]
    assert 1 <= row["n_communities"]
    assert -1_000_000 <= row["q_ppm"] <= 1_000_000
    m = _edges(spark, SF).count() // 2
    assert row["m_edges"] == m


def test_reconciliation_conserves_orders(spark):
    from kafka_streams_join_spark.queries.analytics_ext import (
        dq_total_reconciliation,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = dq_total_reconciliation(spark, SF01).collect()
    n = load_table(spark, SF01, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n
    assert {r["bucket"] for r in rows} <= {
        "exact",
        "within_1pct",
        "within_10pct",
        "mismatch",
    }


def test_kfold_split_covers_and_balances(spark):
    from kafka_streams_join_spark.queries.analytics_ext import (
        _KFOLD_K,
        pipeline_kfold_split,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = pipeline_kfold_split(spark, SF01).collect()
    assert sorted(r["fold"] for r in rows) == list(range(_KFOLD_K))
    n = load_table(spark, SF01, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n
    for r in rows:
        assert r["imbalance_ppm"] == abs(
            r["doc_share_ppm"] - 1_000_000 // _KFOLD_K
        )
