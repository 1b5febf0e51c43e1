"""Tests for the scale-extension operators (SURVEY §2.7): properties the
DuckDB oracle can't check — LSH recall vs brute force, mapInPandas
determinism/batch-independence, candidate-generation completeness."""

from __future__ import annotations

import pytest

from kafka_streams_join_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_minhash_lsh_recall_vs_exhaustive(spark):
    """LSH candidates must recover (almost) all true near-dup pairs; with
    32 hashes / 8 bands at J>=0.8 the collision probability is ~1, so on this
    corpus recall should be total."""
    exhaustive = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE).collect()
    }
    assert exhaustive, "corpus should contain planted near-dups"
    assert lsh == exhaustive  # full recall at these parameters


def test_lsh_ann_subset_of_bruteforce_space(spark):
    """ANN results are a subset of the vector ids, ranked 1..k per query,
    and bucket-restricted (so possibly fewer than k)."""
    ann = QUERIES["sim_lsh_ann_topk"](spark, SF_SMOKE).collect()
    assert ann
    by_query: dict = {}
    for r in ann:
        by_query.setdefault(r["query_id"], []).append(r["rnk"])
    for q, ranks in by_query.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


def test_ann_recall_at_5(spark):
    """Bucketed ANN recall vs brute force — approximate by design, but with
    4 planes/16 buckets it must find a nonzero share of true neighbors."""
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["sim_topk_bruteforce"](spark, SF_SMOKE).collect()
    }
    ann = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["sim_lsh_ann_topk"](spark, SF_SMOKE).collect()
    }
    assert bf
    recall = len(bf & ann) / len(bf)
    assert recall > 0.2, f"ANN recall collapsed: {recall}"


def test_mm_decode_deterministic_and_partition_independent(spark):
    """mapInPandas output must not depend on partitioning (batch shape)."""
    a = sorted(
        (r["doc_id"], r["n_bytes"], r["fake_width"], round(r["byte_mean"], 6))
        for r in QUERIES["mm_decode_features"](spark, SF_SMOKE).collect()
    )
    from kafka_streams_join_spark.queries.multimodal import _fake_decode
    from kafka_streams_join_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    doc = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
        .repartition(13)  # different batch shape
    )
    b = sorted(
        (r["doc_id"], r["n_bytes"], r["fake_width"], round(r["byte_mean"], 6))
        for r in doc.mapInPandas(
            _fake_decode,
            schema="doc_id long, n_bytes long, fake_width int, fake_height int,"
            " byte_mean double, byte_min int, byte_max int",
        ).collect()
    )
    assert a == b


def test_exact_dedup_covers_corpus(spark):
    """Representative set partitions the corpus: sum(n_copies) == row count."""
    rows = QUERIES["dedup_exact"](spark, SF_SMOKE).collect()
    from kafka_streams_join_spark.sources.parquet import load_table

    total = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r["n_copies"] for r in rows) == total
    assert len({r["rep_doc_id"] for r in rows}) == len(rows)
