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


# --------------------------------------------------------------------------
# wave 2: source affinity / SQ audit / MRR
# --------------------------------------------------------------------------


def test_source_affinity_conserves_pairs(spark):
    """Every near-dup pair lands in exactly one (source_a, source_b)
    cell: cell counts sum to the pair total, shares floor-sum to ≤ 1e6,
    and cells are unordered (a ≤ b)."""
    from kafka_streams_join_spark.queries.dedup import (
        dedup_ngram_jaccard,
        dedup_source_affinity,
    )

    cells = dedup_source_affinity(spark, SF01).collect()
    n_pairs = dedup_ngram_jaccard(spark, SF01).count()
    assert sum(r["n_pairs"] for r in cells) == n_pairs
    assert 0 < sum(r["share_ppm"] for r in cells) <= 1_000_000
    assert all(r["source_a"] <= r["source_b"] for r in cells)


def test_sq_reconstruction_error_bounds(spark):
    """Per-label mean/max squared error: non-negative, mean ≤ max, and
    below the analytic worst case 64·(0.5/127·nrm_max)² — rounding moves
    each cell by at most half a code step."""
    from kafka_streams_join_spark.queries.emb_ext import (
        emb_sq_reconstruction_error,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = emb_sq_reconstruction_error(spark, SF).collect()
    assert rows
    nrm_max = (
        load_table(spark, SF, "embeddings")
        .select(
            F.sqrt(
                F.expr(
                    "aggregate(transform(embedding, x -> cast(x as double)"
                    " * cast(x as double)), cast(0 as double),"
                    " (acc, v) -> acc + v)"
                )
            ).alias("nrm")
        )
        .agg(F.max("nrm"))
        .collect()[0][0]
    )
    bound = 64 * (0.5 / 127 * nrm_max) ** 2 + 1e-4
    for r in rows:
        assert 0.0 <= r["mean_err2"] <= r["max_err2"] <= bound, r


def test_mrr_bounds(spark):
    """0 ≤ P@1 ≤ MRR ≤ hit-rate ≤ 1: P@1 counts only rank-1 hits, MRR
    discounts later ones, hit-rate counts them all."""
    from kafka_streams_join_spark.queries.evaluation import retrieval_mrr_eval

    r = retrieval_mrr_eval(spark, SF).collect()[0]
    hit_rate = r["n_with_hit"] / r["n_queries"]
    assert 0.0 <= r["precision_at_1"] <= r["mrr"] + 1e-9
    assert r["mrr"] <= hit_rate + 1e-9 <= 1.0 + 1e-9


# --------------------------------------------------------------------------
# wave 2: cohort LTV / bot score
# --------------------------------------------------------------------------


def test_cohort_ltv_conserves_revenue(spark):
    """The triangle partitions ALL order revenue: cell cents sum to the
    corpus total and ages are non-negative."""
    from kafka_streams_join_spark.queries.events_analytics import (
        orders_cohort_ltv,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    cells = orders_cohort_ltv(spark, SF).collect()
    total = (
        load_table(spark, SF, "orders")
        .agg(
            F.sum(F.expr("cast(round(o_totalprice * 100, 0) as bigint)"))
        )
        .collect()[0][0]
    )
    assert sum(r["revenue_cents"] for r in cells) == total
    assert all(r["age_years"] >= 0 for r in cells)


def test_bot_score_flag_consistent(spark):
    """One row per user; the flag recomputes exactly from the row's own
    published counters (the thresholds are literals shared with the
    oracle)."""
    from kafka_streams_join_spark.queries.events_analytics import (
        _BOT_MAX_MEAN_GAP_S,
        _BOT_MIN_EVENTS,
        events_bot_score,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = events_bot_score(spark, SF).collect()
    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert len(rows) == n_users
    for r in rows:
        want = int(
            r["n_events"] >= _BOT_MIN_EVENTS
            and r["n_events"] > 1
            and r["mean_gap_s"] <= _BOT_MAX_MEAN_GAP_S
        )
        assert r["bot_flag"] == want, r
        if r["n_events"] > 1:
            assert r["mean_gap_s"] * (r["n_events"] - 1) <= r["span_s"], r


# --------------------------------------------------------------------------
# wave 2: graph
# --------------------------------------------------------------------------


def test_common_neighbors_excludes_existing_edges(spark):
    """No recommended pair may already be an edge, counts are positive,
    and the list is rank-ordered by (n_common desc, a, b)."""
    from kafka_streams_join_spark.queries.graph import (
        _edges,
        graph_common_neighbors,
    )

    rows = graph_common_neighbors(spark, SF).collect()
    edges = {
        (r["src"], r["dst"])
        for r in _edges(spark, SF).collect()
    }
    prev = None
    for r in sorted(rows, key=lambda r: r["rnk"]):
        assert (r["part_a"], r["part_b"]) not in edges, r
        assert r["n_common"] >= 1
        key = (-r["n_common"], r["part_a"], r["part_b"])
        assert prev is None or prev < key
        prev = key


def test_kcore_peel_monotone(spark):
    """Peeling only removes: node and edge counts are non-increasing in
    the round number and never negative."""
    from kafka_streams_join_spark.queries.graph import graph_kcore_peel

    rows = sorted(
        graph_kcore_peel(spark, SF).collect(), key=lambda r: r["round"]
    )
    assert [r["round"] for r in rows] == [1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        assert 0 <= b["n_nodes"] <= a["n_nodes"]
        assert 0 <= b["n_edges"] <= a["n_edges"]


# --------------------------------------------------------------------------
# wave 2: nearest as-of (brute-force differential)
# --------------------------------------------------------------------------


def test_asof_nearest_matches_bruteforce(spark):
    """Every click's chosen view minimizes |Δt| over ALL the user's
    views (ties → backward), checked against the full cross join at
    sf0.001."""
    from kafka_streams_join_spark.queries.reference import asof_nearest_view
    from kafka_streams_join_spark.sources.parquet import load_table

    got = {
        r["click_id"]: (r["view_id"], r["view_ts"])
        for r in asof_nearest_view(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    clicks = [
        r
        for r in ev.collect()
        if r["event_type"] == "click"
    ]
    views_by_user = {}
    for r in ev.collect():
        if r["event_type"] == "view":
            views_by_user.setdefault(r["user_id"], []).append(r)
    assert len(got) == len(clicks)
    for c in clicks:
        vs = views_by_user.get(c["user_id"], [])
        if not vs:
            assert got[c["event_id"]] == (None, None)
            continue
        best = min(
            vs,
            key=lambda v: (
                abs((v["ts"] - c["ts"]).total_seconds()),
                0 if v["ts"] <= c["ts"] else 1,
                -v["event_id"],
            ),
        )
        assert got[c["event_id"]][1] is not None
        assert abs(
            (got[c["event_id"]][1] - c["ts"]).total_seconds()
        ) == abs((best["ts"] - c["ts"]).total_seconds()), (c, best)


# --------------------------------------------------------------------------
# wave 2: retrieval QL / vocab overlap
# --------------------------------------------------------------------------


def test_query_likelihood_shape(spark):
    """Ranked 1..N with ql non-increasing; hits bounded by the query
    term count."""
    from kafka_streams_join_spark.queries.retrieval import (
        _BM25_TERMS,
        retrieval_query_likelihood,
    )

    rows = sorted(
        retrieval_query_likelihood(spark, SF).collect(),
        key=lambda r: r["rnk"],
    )
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a["ql"] >= b["ql"]
    assert all(0 <= r["n_terms_hit"] <= len(_BM25_TERMS) for r in rows)


def test_vocab_overlap_is_jaccard(spark):
    """Unordered pairs, intersection bounded by the top-V cap, and the
    ppm recomputes exactly from the published sizes."""
    from kafka_streams_join_spark.queries.text_ext import (
        _VOCAB_TOP,
        text_vocab_overlap_langs,
    )

    rows = text_vocab_overlap_langs(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["lang_a"] < r["lang_b"]
        assert 1 <= r["n_common"] <= _VOCAB_TOP
        assert 0 < r["jaccard_ppm"] <= 1_000_000


# --------------------------------------------------------------------------
# wave 3: KMV sketch / association rules / bigram LM / schema profile
# --------------------------------------------------------------------------


def test_kmv_scopes_and_flags(spark):
    """25 nation + 5 region + 1 global scope; sketch size = min(K,
    exact); estimate exact below K; the error ppm and 3σ flag recompute
    from the row's own published numbers."""
    from kafka_streams_join_spark.queries.sketches import (
        _KMV_K,
        _KMV_TOL_PPM,
        agg_kmv_distinct_rollup,
    )

    rows = agg_kmv_distinct_rollup(spark, SF).collect()
    kinds = {}
    for r in rows:
        kinds[r["scope_kind"]] = kinds.get(r["scope_kind"], 0) + 1
        assert r["n_sketch"] == min(_KMV_K, r["n_exact"]), r
        if r["n_exact"] < _KMV_K:
            assert r["n_est"] == r["n_exact"], r
        err = abs(r["n_est"] - r["n_exact"]) * 1_000_000 // r["n_exact"]
        assert r["rel_err_ppm"] == err, r
        assert r["within_3sigma"] == int(err <= _KMV_TOL_PPM), r
    assert kinds == {"nation": 25, "region": 5, "all": 1}


def test_kmv_merge_law(spark):
    """The min-K theorem in action: the global sketch built by rolling up
    region sketches equals the min-K computed directly over ALL distinct
    hashes — the merge introduces zero error."""
    from kafka_streams_join_spark.queries.sketches import (
        _KMV_H_SPARK,
        _KMV_K,
        agg_kmv_distinct_rollup,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    all_row = [
        r
        for r in agg_kmv_distinct_rollup(spark, SF).collect()
        if r["scope_kind"] == "all"
    ][0]
    direct = sorted(
        r["hv"]
        for r in load_table(spark, SF, "customer")
        .select(F.expr(_KMV_H_SPARK).alias("hv"))
        .distinct()
        .collect()
    )[: _KMV_K]
    assert all_row["n_sketch"] == len(direct)
    # the rollup's kth smallest hash is exactly the direct kth smallest
    est_direct = (
        len(direct)
        if len(direct) < _KMV_K
        else (_KMV_K - 1) * 1_099_511_627_776 // direct[-1]
    )
    assert all_row["n_est"] == est_direct


def test_association_rules_invariants(spark):
    """Rules are confidence-ordered, support-bounded by confidence, and
    every score sits in (0, 1e6] ppm except lift (which may exceed 1e6 by
    design)."""
    from kafka_streams_join_spark.queries.tpch_ext import (
        _RULE_MIN_CO,
        orders_association_rules,
    )

    rows = orders_association_rules(spark, SF).collect()
    assert rows
    prev = None
    for r in rows:
        assert r["co"] >= _RULE_MIN_CO
        assert 0 < r["support_ppm"] <= r["confidence_ppm"] <= 1_000_000, r
        assert r["lift_ppm"] > 0
        key = (-r["confidence_ppm"], r["antecedent"], r["consequent"])
        assert prev is None or prev < key
        prev = key


def test_bigram_lm_scores_every_multi_token_doc(spark):
    """One score row per ≥2-token doc, n_bigrams = n_tokens − 1, NLL
    non-negative, and the flag recomputes from the mean."""
    from kafka_streams_join_spark.queries.quality import (
        _LM_FLAG_MICRO_NLL,
        text_bigram_lm_score,
    )
    from kafka_streams_join_spark.queries.text import _TOKS
    from kafka_streams_join_spark.sources.parquet import load_table

    got = {r["doc_id"]: r for r in text_bigram_lm_score(spark, SF).collect()}
    ntok = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF, "documents")
        .select("doc_id", F.expr(f"size({_TOKS})").alias("n"))
        .collect()
    }
    expect = {d for d, n in ntok.items() if n >= 2}
    assert set(got) == expect
    for d, r in got.items():
        assert r["n_bigrams"] == ntok[d] - 1, r
        assert r["mean_nll_micro"] >= 0
        assert r["high_ppl_flag"] == int(
            r["mean_nll_micro"] > _LM_FLAG_MICRO_NLL
        )


def test_schema_profile_knows_its_keys(spark):
    """Six column rows sharing one n_rows; the PK column profiles as
    all-distinct/no-null; distinct and null counts never exceed rows."""
    from kafka_streams_join_spark.queries.data_quality import (
        _SCHEMA_PROFILE_COLS,
        dq_schema_profile,
    )

    rows = {r["col_name"]: r for r in dq_schema_profile(spark, SF).collect()}
    assert set(rows) == {c for c, _, _ in _SCHEMA_PROFILE_COLS}
    n_rows = {r["n_rows"] for r in rows.values()}
    assert len(n_rows) == 1
    pk = rows["o_orderkey"]
    assert pk["n_null"] == 0 and pk["n_distinct"] == pk["n_rows"]
    for r in rows.values():
        assert 0 <= r["n_null"] <= r["n_rows"]
        assert 0 <= r["n_distinct"] <= r["n_rows"]
        assert r["min_repr"] is not None and r["max_repr"] is not None
