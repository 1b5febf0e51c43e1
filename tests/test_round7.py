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
