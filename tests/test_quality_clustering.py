"""Semantics tests for the round-3 quality + clustering operators, on
hand-checkable inputs (the parametrized DuckDB parity in
test_oracle_parity.py covers them against the corpus)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_streams_join_spark.queries.clustering import (
    KMEANS_K,
    _assign,
    _update,
)
from kafka_streams_join_spark.queries.quality import (
    text_pii_scrub,
    text_repetition_stats,
)
from tests.conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_hand_computed(spark, monkeypatch, tmp_path):
    # "a a a b": top unigram 'a' 3/4; bigrams [a a, a a, a b] top 2/3;
    # no 5-grams -> row dropped by the inner join (needs >= 5 tokens)
    # "x y z w v u": all grams unique -> fractions 1/n, dup 0
    import kafka_streams_join_spark.queries.quality as q

    df = _docs(
        spark,
        [(1, "a a a b"), (2, "x y z w v u")],
    )
    monkeypatch.setattr(q, "load_table", lambda s, d, n: df)
    out = {
        r["doc_id"]: r
        for r in text_repetition_stats(spark, "unused").collect()
    }
    assert set(out) == {2}, "doc 1 has no 5-grams and must drop out"
    r2 = out[2]
    assert r2["top_unigram_frac"] == pytest.approx(round(1 / 6, 4))
    assert r2["top_bigram_frac"] == pytest.approx(0.2)
    assert r2["dup_5gram_frac"] == 0.0


def test_repetition_stats_detects_boilerplate(spark, monkeypatch):
    import kafka_streams_join_spark.queries.quality as q

    spam = " ".join(["buy now"] * 20)  # 40 tokens, 2 unigrams
    df = _docs(spark, [(1, spam)])
    monkeypatch.setattr(q, "load_table", lambda s, d, n: df)
    r = text_repetition_stats(spark, "unused").collect()[0]
    assert r["top_unigram_frac"] == 0.5
    # 39 bigrams: 20x 'buy now', 19x 'now buy'
    assert r["top_bigram_frac"] == pytest.approx(round(20 / 39, 4))
    # 36 5-grams but only 2 distinct (alternating phase)
    assert r["dup_5gram_frac"] == pytest.approx(round(1 - 2 / 36, 4))


def test_pii_scrub_counts_and_replaces(spark, monkeypatch):
    import kafka_streams_join_spark.queries.quality as q

    df = _docs(
        spark,
        [
            (1, "mail bob@example.com or 10.0.0.1 call 555-123-4567 customer"),
            (2, "customers keep their suppliers close"),  # word-bounded: no hits
        ],
    )
    monkeypatch.setattr(q, "load_table", lambda s, d, n: df)
    out = {r["doc_id"]: r for r in text_pii_scrub(spark, "unused").collect()}
    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_phone"]) == (1, 1, 1)
    assert out[1]["n_denied"] == 1
    assert (out[2]["n_email"], out[2]["n_denied"]) == (0, 0)
    # the hash is of the scrubbed text, not the original
    expected = "mail <EMAIL> or <IP> call <PHONE> <REDACTED>"
    got = df.filter("doc_id = 1").select(
        F.md5(F.lit(expected)).alias("h")
    ).collect()[0]["h"]
    assert out[1]["clean_hash"] == got


def test_kmeans_assignment_is_nearest_centroid(spark):
    # two obvious blobs on the first axis; centroids at the blob means
    emb = spark.createDataFrame(
        [
            (0, [0.0] * 64),
            (1, [1.0] + [0.0] * 63),
            (2, [10.0] + [0.0] * 63),
            (3, [11.0] + [0.0] * 63),
        ],
        "vec_id long, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [0.5] + [0.0] * 63), (1, [10.5] + [0.0] * 63)],
        "cl int, centroid array<double>",
    )
    a = {r["vec_id"]: r["cl"] for r in _assign(emb, cents).collect()}
    assert a == {0: 0, 1: 0, 2: 1, 3: 1}
    # update recovers the blob means
    cents2 = {
        r["cl"]: r["centroid"][0]
        for r in _update(_assign(emb, cents)).collect()
    }
    assert cents2[0] == pytest.approx(0.5)
    assert cents2[1] == pytest.approx(10.5)


def test_kmeans_corpus_run_is_total_and_stable(spark):
    from kafka_streams_join_spark.queries.clustering import (
        cluster_kmeans_embeddings,
    )

    out = cluster_kmeans_embeddings(spark, SF_SMOKE)
    rows = out.collect()
    n_vecs = len(rows)
    assert n_vecs == 500  # every vector assigned exactly once
    assert len({r["vec_id"] for r in rows}) == n_vecs
    assert {r["cluster"] for r in rows} <= set(range(KMEANS_K))
    # deterministic: a second build bit-matches
    again = {(r["vec_id"], r["cluster"]) for r in out.collect()}
    assert {(r["vec_id"], r["cluster"]) for r in rows} == again


def test_pq_recall_floor_vs_exact(spark):
    """PQ top-5 must overlap exact top-5 well above chance (chance is
    5/499 ~ 0.01 per slot on this corpus; we assert >= 0.15 overall).
    Unit-norm near-random vectors are PQ's worst case, so the floor is
    deliberately modest."""
    from kafka_streams_join_spark.queries.pq import sim_pq_topk
    from kafka_streams_join_spark.queries.similarity import sim_topk_bruteforce

    pq = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_pq_topk(spark, SF_SMOKE).collect()
    }
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_topk_bruteforce(spark, SF_SMOKE).collect()
    }
    assert len(bf) == 25
    assert len(pq & bf) / len(bf) >= 0.15


def test_ivfpq_recall_floor_and_containment(spark):
    """IVFADC recall floor vs exact, and the structural guarantee that
    pruning only ever REMOVES candidates: every IVFADC (query, neighbor)
    pair whose neighbor sits in a probed cell scores identically to
    exhaustive ADC, so ivfpq results rank consistently — and recall can
    only be <= plain PQ's. Floor is modest for the same reason as PQ's
    (near-random unit vectors are the worst case), but must beat chance
    (~0.01) clearly."""
    from kafka_streams_join_spark.queries.pq import sim_ivfpq_topk
    from kafka_streams_join_spark.queries.similarity import sim_topk_bruteforce

    ivfpq = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_ivfpq_topk(spark, SF_SMOKE).collect()
    }
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_topk_bruteforce(spark, SF_SMOKE).collect()
    }
    assert len(bf) == 25
    assert len(ivfpq & bf) / len(bf) >= 0.08


def test_ivfpq_residual_recall_floor(spark):
    """Residual encoding quantizes finer than raw-vector codes (lower
    residual energy per subspace), so the floor matches the non-residual
    variant's; on near-random unit vectors the gain is modest, which is
    why this asserts a floor rather than strict dominance."""
    from kafka_streams_join_spark.queries.pq import sim_ivfpq_residual_topk
    from kafka_streams_join_spark.queries.similarity import sim_topk_bruteforce

    rq = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_ivfpq_residual_topk(spark, SF_SMOKE).collect()
    }
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_topk_bruteforce(spark, SF_SMOKE).collect()
    }
    assert len(bf) == 25
    assert len(rq & bf) / len(bf) >= 0.08


def test_kmeans_inertia_monotone_nonincreasing(spark):
    """Lloyd's algorithm guarantee: each assign+update round cannot
    increase total within-cluster squared distance (inertia). Verified on
    the real corpus across the unrolled rounds (up to the 1e-6 centroid
    rounding, which perturbs inertia by < 1e-3 on these magnitudes)."""
    from pyspark.sql import functions as F

    from kafka_streams_join_spark.queries.clustering import (
        KMEANS_ITERS,
        _assign,
        _update,
    )
    from kafka_streams_join_spark.queries.clustering import (
        cluster_kmeans_embeddings as _,  # noqa: F401  (module import check)
    )
    from kafka_streams_join_spark.operators.staging import staged
    from kafka_streams_join_spark.queries.clustering import KMEANS_K
    from kafka_streams_join_spark.sources.parquet import load_table

    emb = staged(
        load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    )
    init_cells = (
        emb.select(
            (F.col("vec_id") % KMEANS_K).alias("cl"),
            F.posexplode("embedding").alias("d0", "x"),
        )
        .groupBy("cl", "d0")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("c"))
    )
    cents = init_cells.groupBy("cl").agg(
        F.expr("transform(array_sort(collect_list(struct(d0, c))), s -> s.c)").alias(
            "centroid"
        )
    )

    def inertia(cents_df):
        from kafka_streams_join_spark.queries.clustering import _DIST2_SPARK

        a = (
            emb.crossJoin(F.broadcast(cents_df))
            .select("vec_id", F.expr(_DIST2_SPARK).alias("dist2"))
            .groupBy("vec_id")
            .agg(F.min("dist2").alias("d"))
        )
        return a.agg(F.sum("d")).collect()[0][0]

    vals = [inertia(cents)]
    for _i in range(KMEANS_ITERS):
        cents = _update(_assign(emb, cents))
        vals.append(inertia(cents))
    for prev, nxt in zip(vals, vals[1:]):
        assert nxt <= prev + 1e-3, f"inertia increased: {vals}"
    # and it strictly improved from the hash-partition init
    assert vals[-1] < vals[0]


def test_kmeans_invariant_to_input_partitioning(spark):
    """The determinism contract must survive physical re-distribution:
    partial float sums aggregate in partition-dependent order, and the
    6-dp centroid rounding is what pins the result. Run the identical
    k-means over two very different input partitionings and require
    bit-identical assignments."""
    import kafka_streams_join_spark.queries.clustering as c
    from kafka_streams_join_spark.sources.parquet import load_table

    orig = c.load_table
    outs = []
    for parts in (2, 17):
        c.load_table = (
            lambda s, d, n, p=parts: load_table(s, d, n).repartition(p)
        )
        try:
            outs.append(
                {
                    (r["vec_id"], r["cluster"])
                    for r in c.cluster_kmeans_embeddings(spark, SF_SMOKE).collect()
                }
            )
        finally:
            c.load_table = orig
        spark.catalog.clearCache()
    assert outs[0] == outs[1]


def _py_repetition(tokens):
    from collections import Counter

    uni = Counter(tokens)
    bis = Counter(zip(tokens, tokens[1:]))
    fives = [tuple(tokens[i : i + 5]) for i in range(len(tokens) - 4)]
    out = {"top_unigram_frac": round(max(uni.values()) / len(tokens), 4)}
    out["top_bigram_frac"] = (
        round(max(bis.values()) / sum(bis.values()), 4) if bis else None
    )
    out["dup_5gram_frac"] = (
        round(1 - len(set(fives)) / len(fives), 4) if fives else None
    )
    return out


def test_repetition_stats_matches_python_model(spark, monkeypatch):
    """Differential check against an independent pure-Python model on
    seeded random corpora (shares no code with the Spark expressions or
    the DuckDB oracle)."""
    import random

    import kafka_streams_join_spark.queries.quality as q

    rng = random.Random(7)
    vocab = ["a", "b", "c", "dd", "eee"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 40))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(q, "load_table", lambda s, d, n: df)
    got = {
        r["doc_id"]: r for r in q.text_repetition_stats(spark, "unused").collect()
    }
    assert len(got) == 40  # every doc has >= 5 tokens by construction
    for doc_id, text in rows:
        want = _py_repetition(text.split(" "))
        r = got[doc_id]
        assert r["top_unigram_frac"] == pytest.approx(want["top_unigram_frac"])
        assert r["top_bigram_frac"] == pytest.approx(want["top_bigram_frac"])
        assert r["dup_5gram_frac"] == pytest.approx(want["dup_5gram_frac"])
