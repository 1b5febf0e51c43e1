#!/usr/bin/env python
"""Headline benchmark — the driver's per-round feedback loop (BASELINE.md).

Runs the full registered query set at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints TWO JSON lines:
a compact (<200 char) ``{"metric", "value", "unit", "sf", "n_queries"}``
summary first, then the full
``{"queries": {...}, "spread": {...}, "metric", "value", "unit", "sf"}``
line with the headline fields LAST — so both a head-capture and a
tail-capture of the output recover the headline value.

Protocol (BASELINE.md): warm JVM — each query runs once as warm-up at the
start is amortized by running every query twice and keeping the best; value =
sum of per-query best seconds. Deterministic query set so rounds compare.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_streams_join_spark.queries import QUERIES  # noqa: E402
from kafka_streams_join_spark.session import get_spark  # noqa: E402

# Stable headline set: the reference core (joins), the relational surface's
# heavy hitters, and the scale extensions. Names absent from the registry are
# skipped (earlier rounds) but never renamed (comparability). ``value`` sums
# ONLY this set — the 12 queries BASELINE.md holds numbers for — so the
# headline ratio stays an apples-to-apples round-over-round comparison.
HEADLINE = [
    "j1_interval_join_inner",
    "j2_interval_join_left_outer",
    "j3_missed_anti",
    "agg_pricing_summary",
    "window_topk_per_group",
    "sessionize_events",
    "sort_topk_limit",
    "dedup_minhash_lsh",
    "dedup_exact",
    "sim_topk_bruteforce",
    "text_quality_score",
    "text_lang_id",
]

# Measured and reported in ``queries`` but excluded from ``value`` (no
# BASELINE row): the ANN path next to its brute-force baseline — the
# bucketed-beats-exact scale story under measurement, not assertion — and
# the bounded near-dup candidate stages reworked this round.
EXTRA = [
    "sim_lsh_ann_topk",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    # round-3 additions
    "text_repetition_stats",
    "text_pii_scrub",
    "cluster_kmeans_embeddings",
    "sim_pq_topk",
    # round-4 additions
    "sim_ivfpq_topk",
    "sim_ivfpq_residual_topk",
    "dedup_duplicate_passages",
    "text_remove_duplicate_passages",
    "dedup_semantic",
    # round-4b retrieval & data selection
    "sim_sq_topk",
    "text_bm25_search",
    "pipeline_importance_resample",
    "quality_classifier_logreg",
    "dedup_ngram_prefix_filter",
    "layout_zorder_key",
    "text_bpe_merge_mining",
    "pipeline_weighted_sample",
    "events_funnel_conversion",
    "events_cohort_retention",
    "events_scd2_history",
    "dq_constraint_checks",
    "pipeline_curation_funnel",
    # round-4c: incremental probe, training-order shuffle, bigram LM
    "dedup_incremental_minhash",
    "pipeline_global_shuffle",
    "text_bigram_surprisal",
    "dedup_fuzzy_edit_distance",
    "text_char_entropy",
    "pipeline_group_holdout_split",
    "retrieval_hybrid_rrf",
    "dq_table_profile",
    "pipeline_token_budget_plan",
    "events_markov_transitions",
    "text_pmi_collocations",
    "agg_incremental_merge",
    "sim_recall_report",
    "dedup_normalized_exact",
    "layout_compaction_plan",
]

# Coverage tier (round 5): every remaining registered query, so BENCH_r{N}
# rows exist for the whole registry. Measured with one warm-up + one timed
# run (RUNS_COVERAGE) to bound total bench wall-clock; the heavy hitters
# already live in EXTRA with full best-of-3 spreads.
COVERAGE = [
    "agg_approx_distinct",
    "agg_approx_percentile",
    "agg_cube",
    "agg_distinct_group",
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_rollup",
    "agg_sketch_rollup",
    "asof_latest_view",
    "asof_latest_view_tolerance",
    "asof_next_purchase",
    "dedup_cluster_canonical",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_ngram_containment",
    "emb_covariance",
    "emb_l2_normalize",
    "emb_pca_project",
    "emb_quantize_int8",
    "events_daily_gapfill",
    "events_dau_wau_stickiness",
    "events_hourly_seasonality",
    "events_value_outliers",
    "golden_scenarios",
    "j3_missed_outer_null",
    "j4_clicked_semi",
    "join_cross",
    "join_full_outer",
    "join_right_outer",
    "join_star_revenue",
    "latest_state_per_user",
    "mm_binary_meta",
    "mm_decode_features",
    "mm_frame_sample",
    "mm_modality_route",
    "p1_filter",
    "p2_mapvalues",
    "p3_value_construction",
    "pipeline_chunk_documents",
    "pipeline_corpus_curation",
    "pipeline_decontaminate",
    "pipeline_domain_mix",
    "pipeline_pack_sequences",
    "pipeline_stratified_sample",
    "pipeline_train_test_split",
    "pivot_status_revenue",
    "range_join_error_window",
    "range_join_quiet_purchases",
    "scalar_array_funcs",
    "scalar_case_when",
    "scalar_date_funcs",
    "scalar_json_funcs",
    "scalar_map_funcs",
    "scalar_math_funcs",
    "scalar_string_funcs",
    "set_except",
    "set_intersect",
    "set_union",
    "sim_ivf_topk",
    "sim_label_centroid_dist",
    "sim_lsh_bucket_histogram",
    "t1_shift_event_time",
    "text_bigram_top",
    "text_fingerprint",
    "text_tfidf_topterms",
    "text_token_count",
    "text_token_count_bpe",
    "text_unigram_surprisal",
    "text_vocab_growth",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_count",
    "tpch_q17_small_quantity",
    "tpch_q18_large_volume",
    "tpch_q19_disjunctive",
    "tpch_q20_excess_share_suppliers",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_priority_returns",
    "tpch_q5_local_supplier",
    "tpch_q6_revenue_forecast",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "udaf_geomean_price",
    "udtf_sentence_split",
    "window_rank_lag",
    "window_running_sum",
    "window_sliding_agg",
    "window_trailing_1h",
    "window_tumbling_agg",
    # round-5 widening batch
    "sim_hard_negatives",
    "dedup_band_recall_audit",
    "text_oov_rate",
    "text_readability",
    "corpus_length_histogram",
    "events_anomaly_zscore",
    "events_path_trigrams",
    "emb_label_outliers",
    "orders_copurchase_lift",
    "pipeline_curriculum_order",
    "sim_knn_label_accuracy",
    "text_zipf_slope",
    "events_rfm_segments",
    "events_power_user_share",
    "pipeline_mixture_temperature",
    "dedup_keep_longest",
    "text_lang_confusion",
    "pipeline_dataset_card",
    "graph_pagerank_parts",
    "events_daily_ewma",
    "pipeline_repeat_epochs",
    "dedup_tier_report",
    "events_interarrival_stats",
    "emb_centroid_drift",
    "pipeline_split_leakage_audit",
    "text_keyword_in_context",
    "window_dist_functions",
    "agg_mode_per_key",
    "events_audience_overlap",
]

RUNS_PER_QUERY = 3  # best-of-3: run 1 warms code paths; the min of the rest
# rides out transient co-tenant noise (observed >30% machine-level swings
# between identical runs minutes apart)
RUNS_COVERAGE = 2  # coverage tier: one warm-up + one timed run


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    # JVM warm-up: one tiny action so session startup isn't billed to query 1
    spark.range(1000).count()

    # per-query run spread, reported so a judge can tell co-tenant noise
    # from real drift without a re-run (this host shows multi-x swings)
    spread: dict[str, dict[str, float]] = {}

    def run_best(name: str, make_df, n_runs: int = RUNS_PER_QUERY) -> float:
        runs = []
        for _ in range(n_runs):
            # Cold cache per run: several queries stage a multi-consumer
            # aggregate with persist() (operators/staging.py). Clearing
            # between runs keeps best-of-N measuring the real one-pass
            # pipeline (scan → stage → fan-out) rather than a cache read,
            # so round-over-round numbers compare the same computation —
            # and dead caches from earlier queries can't accumulate.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            # count() forces full evaluation without driver-side row transfer
            make_df().count()
            runs.append(time.perf_counter() - t0)
        # spread over the WARM runs only (runs[1:]): run 1 pays one-time
        # code-path warm-up, and folding it in would report deliberate
        # warm-up cost as co-tenant noise; it is still listed as "cold"
        warm = sorted(runs[1:]) or runs
        # true median (mean of the middle two for even counts): with 2
        # warm runs, warm[len//2] would just repeat max
        mid = len(warm) // 2
        med = warm[mid] if len(warm) % 2 else (warm[mid - 1] + warm[mid]) / 2
        spread[name] = {
            "cold": round(runs[0], 3),
            "min": round(warm[0], 3),
            "med": round(med, 3),
            "max": round(warm[-1], 3),
        }
        # the headline value stays min-over-ALL-runs — the r1-r3 metric —
        # so round-over-round totals remain comparable
        return round(min(runs), 3)

    timings: dict[str, float] = {}
    for name in HEADLINE + EXTRA:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        timings[name] = run_best(name, lambda: fn(spark, sf_dir))
    for name in COVERAGE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        timings[name] = run_best(
            name, lambda: fn(spark, sf_dir), n_runs=RUNS_COVERAGE
        )

    # Skew micro-bench (reported, not summed): events funneled onto one hot
    # key (~90% of rows), joined to a per-key dim — salted_join spreads the
    # hot key over 16 reducers where the plain join funnels one.
    from pyspark.sql import functions as F  # noqa: E402

    from kafka_streams_join_spark.operators.skew import salted_join  # noqa: E402
    from kafka_streams_join_spark.sources.parquet import load_table  # noqa: E402

    skewed = (
        load_table(spark, sf_dir, "events")
        .withColumn(
            "hot_key",
            F.when(F.col("user_id") % 10 < 9, F.lit(0)).otherwise(F.col("user_id")),
        )
        .select("event_id", "hot_key", "value")
    )
    dim = skewed.groupBy("hot_key").agg(F.count(F.lit(1)).alias("n"))
    timings["skew_salted_join"] = run_best(
        "skew_salted_join",
        lambda: salted_join(skewed, dim, on="hot_key", buckets=16),
    )

    baseline_total = sum(timings[n] for n in HEADLINE if n in timings)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    # Two lines, truncation-robust both ways (round-4 lesson: a 2000-char
    # tail capture of the single long line lost the headline value):
    #  1. a compact (<200 char) summary line FIRST — survives head capture;
    #  2. the full per-query contract line, with the headline fields placed
    #     LAST in the object — survives tail capture.
    compact = {
        "metric": "headline_total",
        "value": round(baseline_total, 3),
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
    }
    print(json.dumps(compact))
    print(
        json.dumps(
            {
                "queries": timings,
                "spread": spread,
                "metric": "headline_total",
                "value": round(baseline_total, 3),
                "unit": "sec",
                "sf": sf_val,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
