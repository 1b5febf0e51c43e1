"""Round-6 property tests: invariants the oracle hash can't express —
cross-algorithm differentials, monotonicity, conservation laws — for the
round-6 operator wave, plus the components worst-case bound (VERDICT r5
task #5).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# --------------------------------------------------------------------------
# components: path-graph round bound + convergence error path
# --------------------------------------------------------------------------


def _path_edges(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )


def test_components_path_graph_linear_rounds(spark):
    """Min-label propagation is O(diameter): a 12-node path converges
    under the default cap with every node labeled 0."""
    from kafka_streams_join_spark.operators.components import (
        connected_components,
    )

    labels = connected_components(_path_edges(spark, 12)).collect()
    assert len(labels) == 12
    assert {r["component"] for r in labels} == {0}


def test_components_convergence_error_path(spark):
    """The same path with max_rounds=5 must raise, not silently return a
    half-propagated labeling — the guard that makes a high-diameter
    workload (where large-star/small-star would win) visible."""
    from kafka_streams_join_spark.operators.components import (
        connected_components,
    )

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_path_edges(spark, 12), max_rounds=5)


# --------------------------------------------------------------------------
# tokenizer apply
# --------------------------------------------------------------------------


def test_bpe_encode_known_word(spark):
    """The frozen merge chain encodes 'join' to ONE token: i n → j o →
    jo in (the mined merges compose, later ones consuming earlier
    outputs)."""
    from kafka_streams_join_spark.queries.tokenizer import (
        _SYM_SPARK,
        _apply_merges,
    )

    n = spark.sql(
        "SELECT size(split("
        + _apply_merges(_SYM_SPARK, "spark")
        + ", ' ')) AS n FROM (SELECT 'join' AS word)"
    ).collect()[0]["n"]
    assert n == 1


def test_bpe_encode_bounds(spark):
    """Per doc: 1 ≤ tokens-per-word (merges only shrink, a word is ≥ 1
    token), and the doc's BPE count never exceeds its character count."""
    from kafka_streams_join_spark.queries.tokenizer import (
        text_bpe_encode_apply,
    )

    rows = text_bpe_encode_apply(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_bpe_tokens"] >= r["n_words"]
        assert r["bpe_per_word_ppm"] >= 1_000_000


# --------------------------------------------------------------------------
# CDC merge ≡ rebuild (the Spark-side differential; the oracle proves it
# against DuckDB, this proves it against the batch rebuild query)
# --------------------------------------------------------------------------


def test_scd2_merge_equals_rebuild(spark):
    from kafka_streams_join_spark.queries.cdc import events_scd2_merge_apply
    from kafka_streams_join_spark.queries.events_analytics import (
        events_scd2_history,
    )

    merged = {tuple(r) for r in events_scd2_merge_apply(spark, SF).collect()}
    rebuilt = {tuple(r) for r in events_scd2_history(spark, SF).collect()}
    assert merged == rebuilt


# --------------------------------------------------------------------------
# sketches
# --------------------------------------------------------------------------


def test_quantile_sketch_within_bound_and_mergeable(spark):
    from kafka_streams_join_spark.queries.sketches import (
        agg_quantile_sketch_rollup,
    )

    rows = agg_quantile_sketch_rollup(spark, SF).collect()
    assert len(rows) == 18  # (5 types + ALL) × 3 quantiles
    # the one-bin bound holds wherever the covering bin's neighborhood is
    # populated: every p50/p90 row and the whole merged (dense) sketch.
    # Sparse per-type p99 TAILS may legitimately exceed it — that's what
    # the flag exists to report (and the oracle hash-certifies either way).
    for r in rows:
        if r["scope"] == "ALL" or r["q_ppm"] < 990_000:
            assert r["within_one_bin"] == 1, r
    # estimates ordered by quantile within each scope
    by_scope = {}
    for r in rows:
        by_scope.setdefault(r["scope"], []).append((r["q_ppm"], r["est"]))
    for ests in by_scope.values():
        ests = [e for _, e in sorted(ests)]
        assert ests == sorted(ests)


def test_count_min_never_undercounts(spark):
    from kafka_streams_join_spark.queries.sketches import agg_count_min_sketch

    rows = agg_count_min_sketch(spark, SF).collect()
    assert rows
    assert all(r["never_undercounts"] == 1 for r in rows)
    assert all(r["overcount"] >= 0 for r in rows)


def test_bloom_no_false_negatives(spark):
    from kafka_streams_join_spark.queries.sketches import agg_bloom_membership

    r = agg_bloom_membership(spark, SF).collect()[0]
    assert r["n_false_neg"] == 0
    assert r["n_hits"] >= r["n_members"]
    assert r["fpr_ppm"] < 1_000_000


# --------------------------------------------------------------------------
# evaluation harnesses
# --------------------------------------------------------------------------


def test_threshold_sweep_monotone(spark):
    """Raising the threshold can only shrink the positive set: tp and fp
    are non-increasing in the threshold, tp + fn is the constant positive
    count."""
    from kafka_streams_join_spark.queries.evaluation import (
        classifier_threshold_sweep,
    )

    rows = sorted(
        classifier_threshold_sweep(spark, SF).collect(),
        key=lambda r: r["thresh_ppm"],
    )
    assert len(rows) == 5
    tps = [r["tp"] for r in rows]
    fps = [r["fp"] for r in rows]
    assert tps == sorted(tps, reverse=True)
    assert fps == sorted(fps, reverse=True)
    assert len({r["tp"] + r["fn"] for r in rows}) == 1


def test_calibration_conserves_rows(spark):
    from kafka_streams_join_spark.queries.evaluation import (
        classifier_calibration_report,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = classifier_calibration_report(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs
    assert all(0 <= r["bin"] <= 9 for r in rows)
    assert all(r["n_pos"] <= r["n"] for r in rows)


def test_ndcg_bounds(spark):
    from kafka_streams_join_spark.queries.evaluation import retrieval_ndcg_eval

    rows = retrieval_ndcg_eval(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-9
        assert r["dcg"] <= r["idcg"] + 1e-9
        assert r["n_rel_top"] <= 5


def test_prf_expansion_shape(spark):
    from kafka_streams_join_spark.queries.evaluation import (
        retrieval_prf_expansion,
    )

    rows = sorted(
        retrieval_prf_expansion(spark, SF).collect(), key=lambda r: r["rnk"]
    )
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)


# --------------------------------------------------------------------------
# graph: triangle differential vs a brute-force triple join
# --------------------------------------------------------------------------


def test_triangle_count_matches_bruteforce(spark):
    from kafka_streams_join_spark.queries.graph import graph_triangle_count

    got = graph_triangle_count(spark, SF).collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF}/lineitem.parquet')"
    )
    brute = con.sql(
        """
        WITH basket AS (
          SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
        ),
        und AS (
          SELECT DISTINCT a.pkey AS u, b.pkey AS v
          FROM basket a JOIN basket b ON a.okey = b.okey AND a.pkey < b.pkey
        )
        SELECT count(*) FROM und e1
        JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
        JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v
        """
    ).fetchone()[0]
    assert got["n_triangles"] == brute


# --------------------------------------------------------------------------
# embeddings
# --------------------------------------------------------------------------


def test_pca_fixed_matches_fitted_on_training_corpus(spark):
    """The frozen eigenbasis WAS fitted on sf0.01, so the frozen-literal
    projection must reproduce the fit-then-project query bit-for-bit
    there — the strongest possible consistency check between the two
    halves."""
    from kafka_streams_join_spark.queries.embedding_ops import emb_pca_project
    from kafka_streams_join_spark.queries.emb_ext import emb_pca_project_fixed

    fixed = {tuple(r) for r in emb_pca_project_fixed(spark, SF01).collect()}
    fitted = {tuple(r) for r in emb_pca_project(spark, SF01).collect()}
    assert fixed == fitted


def test_silhouette_bounds_and_conservation(spark):
    from kafka_streams_join_spark.queries.emb_ext import emb_silhouette_by_label
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = emb_silhouette_by_label(spark, SF).collect()
    n = load_table(spark, SF, "embeddings").count()
    assert sum(r["n"] for r in rows) == n
    for r in rows:
        assert -1.0 <= r["mean_silhouette"] <= 1.0
        assert 0 <= r["n_misfit"] <= r["n"]


def test_dim_profile_shape(spark):
    from kafka_streams_join_spark.queries.emb_ext import emb_dim_profile

    rows = emb_dim_profile(spark, SF).collect()
    assert len(rows) == 64
    for r in rows:
        assert r["vmin"] <= r["mean"] <= r["vmax"]
        assert r["sd"] >= 0


# --------------------------------------------------------------------------
# events / orders
# --------------------------------------------------------------------------


def test_attribution_shares_conserve(spark):
    from kafka_streams_join_spark.queries.events_analytics import (
        events_attribution_last_touch,
    )

    rows = events_attribution_last_touch(spark, SF).collect()
    assert {r["attributed_type"] for r in rows} <= {"view", "click", "direct"}
    total = sum(r["share_ppm"] for r in rows)
    # floor division: the shares sum to 1e6 minus at most one ppm per row
    assert 1_000_000 - len(rows) < total <= 1_000_000


def test_active_streaks_conserve_users(spark):
    from kafka_streams_join_spark.queries.events_analytics import (
        events_active_streaks,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = events_active_streaks(spark, SF).collect()
    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    assert all(r["best_streak"] >= 1 for r in rows)


def test_reorder_intervals_ordered(spark):
    from kafka_streams_join_spark.queries.events_analytics import (
        orders_reorder_intervals,
    )

    r = orders_reorder_intervals(spark, SF).collect()[0]
    assert (
        r["min_days"]
        <= r["p25_days"]
        <= r["p50_days"]
        <= r["p75_days"]
        <= r["max_days"]
    )


# --------------------------------------------------------------------------
# dq / text / pipeline / mm
# --------------------------------------------------------------------------


def test_psi_nonnegative(spark):
    """(p2 − p1)·ln(p2/p1) ≥ 0 per bucket, so PSI ≥ 0 always."""
    from kafka_streams_join_spark.queries.data_quality import dq_psi_drift

    rows = dq_psi_drift(spark, SF).collect()
    assert len(rows) == 3
    assert all(r["psi"] >= 0 for r in rows)


def test_hapax_bounds(spark):
    from kafka_streams_join_spark.queries.text_ext import text_hapax_ratio

    rows = text_hapax_ratio(spark, SF).collect()
    for r in rows:
        assert r["n_hapax"] <= r["vocab_size"] <= r["n_tokens"]


def test_boilerplate_spans_ordered(spark):
    from kafka_streams_join_spark.queries.text_ext import text_boilerplate_spans

    rows = sorted(
        text_boilerplate_spans(spark, SF).collect(), key=lambda r: r["rnk"]
    )
    assert all(r["n_docs"] >= 2 for r in rows)
    keys = [(-r["n_docs"], -r["n_occ"], r["gram"]) for r in rows]
    assert keys == sorted(keys)


def test_length_buckets_partition_and_save(spark):
    """Buckets partition the corpus (doc counts and token totals sum to
    the global row) and bucketed padding never wastes more tokens than
    the pad-to-global-max baseline."""
    from kafka_streams_join_spark.queries.pipeline import (
        pipeline_length_bucket_batching,
    )

    rows = pipeline_length_bucket_batching(spark, SF).collect()
    g = next(r for r in rows if r["bucket"] == -1)
    bs = [r for r in rows if r["bucket"] != -1]
    assert sum(r["n_docs"] for r in bs) == g["n_docs"]
    assert sum(r["total_tokens"] for r in bs) == g["total_tokens"]
    assert sum(r["padded_tokens"] for r in bs) <= g["padded_tokens"]
    for r in bs:
        assert r["max_len"] < (1 << r["bucket"])


def test_shard_manifest_conserves(spark):
    from kafka_streams_join_spark.queries.multimodal import mm_shard_manifest
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = mm_shard_manifest(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_blobs"] for r in rows) == n_docs
    assert len({r["target_bytes"] for r in rows}) == 1


def test_tier_report_has_semantic_tier(spark):
    from kafka_streams_join_spark.queries.tier_report import dedup_tier_report
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = {r["tier"]: r for r in dedup_tier_report(spark, SF).collect()}
    assert set(rows) == {"exact", "normalized", "neardup_cluster", "semantic"}
    n_emb = load_table(spark, SF, "embeddings").count()
    n_doc = load_table(spark, SF, "documents").count()
    assert rows["semantic"]["n_docs"] == n_emb
    assert rows["exact"]["n_docs"] == n_doc
    for r in rows.values():
        assert r["removed"] == r["n_docs"] - r["survivors"]


def test_two_phase_rank_emits_bigint(spark):
    """ADVICE r5: the rank must be bigint (an int cast overflows past
    2^31-1 rows under ANSI)."""
    from kafka_streams_join_spark.queries.pipeline import (
        pipeline_curriculum_order,
    )

    schema = {
        f.name: f.dataType.simpleString()
        for f in pipeline_curriculum_order(spark, SF).schema.fields
    }
    assert schema["curriculum_rank"] == "bigint"
