"""Regression pins for the round-7 self-review fixes — each test targets a
contract the oracle hash can only certify on a corpus that happens to
exercise it, so the invariant is asserted directly here."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from kafka_streams_join_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_ahash_skips_empty_payloads():
    """Zero-byte blobs are unhashable: the oracle's generate_series(1, 0)
    emits no byte rows for them, so the stub must drop them too — an
    ahash=0 row would pair every empty blob with every other as a
    hamming-0 'near-dup'."""
    from kafka_streams_join_spark.queries.multimodal import _ahash_batches

    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "payload": [b"", b"abcdef" * 40, b""]}
    )
    out = pd.concat(list(_ahash_batches(iter([pdf]))))
    assert list(out["doc_id"]) == [2]
    assert str(out["doc_id"].dtype) == "int64"
    assert str(out["ahash"].dtype) == "int64"


def test_retrieval_evals_drop_unique_label_queries(spark):
    """Queries whose label is unique in the corpus have no relevant items
    (n_rel_corpus = 0): AP would be 0/0 = NaN, and the oracle's inner
    self-join drops them — so no output row may carry n_rel_corpus < 1,
    and every ap must be a real number."""
    import math

    for name in ("retrieval_map_eval", "retrieval_pr_at_k"):
        rows = QUERIES[name](spark, SF).collect()
        assert rows, name
        for r in rows:
            assert r["n_rel_corpus"] >= 1, (name, r)
        if name == "retrieval_map_eval":
            assert all(not math.isnan(r["ap"]) for r in rows)


def test_churn_risk_anchor_is_all_customer_max(spark):
    """days_since_last anchors to the max order day over ALL customers —
    filtering repeat customers first would use a stale anchor whenever the
    corpus's latest order belongs only to one-time customers. The customer
    with the globally latest order day (repeat or not) fixes the anchor:
    min(days_since_last) over the output equals corpus_max minus the max
    last-day among REPEAT customers, both recomputed independently."""
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey",
        F.expr("cast(unix_timestamp(o_orderdate) div 86400 as bigint)").alias(
            "day"
        ),
    )
    per = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"), F.max("day").alias("last_day")
    )
    corpus_max = per.agg(F.max("last_day")).collect()[0][0]
    repeat_max = (
        per.filter(F.col("n") >= 2).agg(F.max("last_day")).collect()[0][0]
    )
    rows = QUERIES["orders_churn_risk"](spark, SF).collect()
    assert rows
    assert min(r["days_since_last"] for r in rows) == corpus_max - repeat_max
    # and the spread certifies nonnegative anchoring for every row
    assert all(r["days_since_last"] >= 0 for r in rows)


def test_reconciliation_cents_are_summation_order_free(spark):
    """calc_cents must be an integer sum of per-line cent values, so
    repartitioning the input (different partial-aggregation order) cannot
    change any bucket count. Run the query twice under different shuffle
    partition counts and require identical output."""
    q = QUERIES["dq_total_reconciliation"]
    baseline = sorted(map(tuple, q(spark, SF).collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = sorted(map(tuple, q(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert baseline == again


def test_assortativity_cross_terms_survive_decimal_path(spark):
    """The DECIMAL(38,0) cross terms must still produce the exact same
    milli value the BIGINT path produced on small corpora (where BIGINT
    did not overflow), and the result is a correlation: |r| <= 1000."""
    row = QUERIES["graph_assortativity"](spark, SF).collect()[0]
    assert row["n_edges_directed"] > 0
    assert -1000 <= row["assortativity_milli"] <= 1000


def test_importance_weight_never_minus_zero(spark):
    """iw carries the trailing + 0.0 normalization: a doc whose mean
    log-likelihood ratio rounds to zero must surface as +0.0 (DuckDB's
    double rounding yields -0.0 there; Spark's BigDecimal path never
    does — the sf0.1 divergence this pins)."""
    import math

    rows = QUERIES["pipeline_importance_resample"](spark, SF).collect()
    assert rows
    for r in rows:
        if r["iw"] == 0.0:
            assert math.copysign(1.0, r["iw"]) == 1.0


def test_silhouette_mean_is_partition_order_free(spark):
    """mean_silhouette is floor(sum of exact integer micro-units / n):
    re-running under a different shuffle-partition count (different
    partial-aggregation order) must give identical output — the property
    round(avg(double)) lacked."""
    q = QUERIES["emb_silhouette_by_label"]
    baseline = sorted(map(tuple, q(spark, SF).collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        again = sorted(map(tuple, q(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert baseline == again
    # and the mean sits on the 1e-6 lattice the floor contract guarantees
    for row in baseline:
        v = row[2] * 1_000_000
        assert abs(v - round(v)) < 1e-6


def test_iqr_fences_six_dp_lattice(spark):
    """Fences of 2-dp money columns live on an eighth-cent lattice: every
    reported fence times 800 must be integral (within double slack) — the
    property that makes 6-dp rounding boundary-free where 4 dp was an
    exact .5 half-way case between the engines."""
    rows = QUERIES["dq_iqr_outliers"](spark, SF).collect()
    for r in rows:
        if r["col_name"] == "l_extendedprice":
            for c in ("q1", "q3", "iqr", "lo_fence", "hi_fence"):
                v = r[c] * 800
                assert abs(v - round(v)) < 1e-4, (c, r[c])
