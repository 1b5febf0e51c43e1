"""Scale-property tests: the plans Catalyst produces for our queries must be
the plans we'd want at 100 TB (SURVEY §4.3, brief's efficiency bar).

These are regression gates, not benchmarks: losing predicate pushdown or a
broadcast changes cost by orders of magnitude at scale while staying
invisible at test scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_join_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_no_single_partition_window_over,
    assert_no_wide_shuffle,
    assert_pushed_filters,
    assert_read_schema_pruned,
    assert_wholestage_codegen,
    explain_str,
)
from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def test_typed_event_scan_pushes_filter_and_prunes(spark):
    """The J1 side-scan must push event_type to parquet and read 4 columns."""
    df = QUERIES["j1_interval_join_inner"](spark, SF_SMOKE)
    assert_pushed_filters(df, "IsNotNull(event_type)")
    # events has 6 columns; each side needs 4 + the filter column (value is
    # the only fully-pruned one, and the scan must not read it)
    assert_read_schema_pruned(df, max_columns=5)


def test_p1_filter_pushed(spark):
    df = QUERIES["p1_filter"](spark, SF_SMOKE)
    assert_pushed_filters(df, "IsNotNull(event_type)", "IsNotNull(value)")
    assert_wholestage_codegen(df)


def test_interval_join_is_not_cartesian(spark):
    """The band predicate rides on the key equi-join — never a cross
    product."""
    for name in ("j1_interval_join_inner", "j2_interval_join_left_outer", "j3_missed_anti"):
        df = QUERIES[name](spark, SF_SMOKE)
        assert_no_cartesian(df)
        plan = explain_str(df)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_dim_join_broadcasts(spark):
    """Dimension-sized sides must broadcast (nation is 25 rows)."""
    cust = load_table(spark, SF_SMOKE, "customer")
    nation = load_table(spark, SF_SMOKE, "nation")
    j = cust.join(nation, cust.c_nationkey == nation.n_nationkey).select(
        "c_custkey", "n_name"
    )
    assert_broadcast_join(j, expect=True)


def test_topk_uses_take_ordered(spark):
    """Global ORDER BY + LIMIT must plan TakeOrderedAndProject (per-partition
    heap + driver merge), never a full sort."""
    df = QUERIES["sort_topk_limit"](spark, SF_SMOKE)
    assert "TakeOrderedAndProject" in explain_str(df)


def test_agg_is_partial_final(spark):
    """Aggregations must run partial (map-side) + final — two HashAggregate
    nodes around the exchange."""
    df = QUERIES["agg_pricing_summary"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert plan.count("HashAggregate") >= 2
    assert_pushed_filters(df, "IsNotNull(l_shipdate)")


def test_documents_scan_prunes_for_token_count(spark):
    """text ops project before the scan: ≤3 of documents' 5 columns read."""
    df = QUERIES["text_token_count"](spark, SF_SMOKE)
    assert_read_schema_pruned(df, max_columns=3)


def test_lsh_ann_join_is_hash_on_bucket(spark):
    """The ANN candidate join keys on the LSH bucket — an equi-join, not a
    cross join over the corpus."""
    df = QUERIES["sim_lsh_ann_topk"](spark, SF_SMOKE)
    assert_no_cartesian(df)


def test_star_join_broadcasts_all_dims(spark):
    """Every dimension in the star rollup must broadcast, the date filter
    must reach the parquet scan, and nothing may plan cartesian."""
    df = QUERIES["join_star_revenue"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert plan.count("BroadcastHashJoin") >= 3
    assert_pushed_filters(df, "IsNotNull(o_orderdate)")
    assert_no_cartesian(df)


def test_full_outer_join_shuffles_both_sides(spark):
    """Full outer can't broadcast — the plan must be a shuffle join (SMJ or
    shuffled hash), with the derived-set filters pushed to the scans."""
    df = QUERIES["join_full_outer"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "SortMergeJoin FullOuter" in plan or "ShuffledHashJoin FullOuter" in plan
    assert_pushed_filters(df, "IsNotNull(o_totalprice)", "IsNotNull(c_acctbal)")


def test_sliding_window_is_single_scan(spark):
    """The sliding window expands rows via a projection (window explode) —
    no self-join, one scan of events."""
    df = QUERIES["window_sliding_agg"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    for join in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert join not in plan
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1


def test_tpch_queries_broadcast_dims_no_cartesian(spark):
    """Q3/Q5/Q10: every dimension side broadcasts; the fact table never
    feeds a cartesian/nested-loop; date+segment filters reach the scans."""
    for name in (
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier",
        "tpch_q10_returned_items",
    ):
        df = QUERIES[name](spark, SF_SMOKE)
        assert_no_cartesian(df)
        assert_broadcast_join(df, expect=True)
        plan = explain_str(df)
        assert "SortMergeJoin" not in plan, f"{name} shuffled a dim join:\n{plan[:1500]}"
    q3 = QUERIES["tpch_q3_shipping_priority"](spark, SF_SMOKE)
    assert_pushed_filters(q3, "IsNotNull(l_shipdate)", "IsNotNull(c_mktsegment)")


def test_tpch_ext_plans(spark):
    """Round-2 TPC-H set: Q6 pushes every band predicate to the scan and
    reads ≤4 columns; Q7/Q16/Q18 broadcast all dimension/exclusion/filter
    sides and never plan cartesian."""
    q6 = QUERIES["tpch_q6_revenue_forecast"](spark, SF_SMOKE)
    assert_pushed_filters(
        q6, "IsNotNull(l_shipdate)", "IsNotNull(l_discount)", "IsNotNull(l_quantity)"
    )
    assert_read_schema_pruned(q6, max_columns=4)
    for name in (
        "tpch_q7_volume_shipping",
        "tpch_q16_supplier_part_count",
        "tpch_q18_large_volume",
    ):
        df = QUERIES[name](spark, SF_SMOKE)
        assert_no_cartesian(df)
        assert_broadcast_join(df, expect=True)


def test_tpch_q17_single_fact_shuffle(spark):
    """Q17's decorrelated subquery: the per-part average is one partial+final
    agg; part (brand-filtered) broadcasts into lineitem."""
    df = QUERIES["tpch_q17_small_quantity"](spark, SF_SMOKE)
    assert_no_cartesian(df)
    assert_broadcast_join(df, expect=True)
    plan = explain_str(df)
    assert "HashAggregate" in plan


def test_keyless_range_join_is_hash_not_nested_loop(spark):
    """The bucketed rewrite's reason to exist: the same predicate as a bare
    theta join plans BroadcastNestedLoopJoin; ours must plan a hash/SMJ on
    the bucket id."""
    df = QUERIES["range_join_error_window"](spark, SF_SMOKE)
    assert_no_cartesian(df)
    plan = explain_str(df)
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), plan
    # the naive formulation, for contrast, is the O(n·m) plan we refuse
    ev = load_table(spark, SF_SMOKE, "events")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    e = ev.filter(F.col("event_type") == "error").alias("e")
    naive = p.join(
        e,
        (F.col("p.ts") >= F.col("e.ts"))
        & (F.col("p.ts") < F.col("e.ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    assert "BroadcastNestedLoopJoin" in explain_str(naive)


def test_tpch_q17_runs_under_aqe(spark):
    """Q17's fact-fact (lineitem ⋈ per-part-avg) shuffle must execute under
    AQE: the adaptive plan re-optimizes with runtime shuffle statistics
    (partition coalescing, skew split) — the 100 TB safety net for the one
    join here whose both sides are fact-sized. Executing the query and
    checking the FINAL adaptive plan proves AQE engaged, not just that the
    conf is set."""
    df = QUERIES["tpch_q17_small_quantity"](spark, SF_SMOKE)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan isFinalPlan=true" in executed, executed[:1500]
    assert "Exchange" in executed  # the fact-fact shuffle AQE instruments


def test_simhash_pair_stage_is_equi_join(spark):
    """The pigeonhole chunk rewrite's reason to exist: candidates come from
    an equi self-join on (chunk_idx, chunk_value), never the O(n²)
    BroadcastNestedLoopJoin a bare doc_id < doc_id theta join plans."""
    df = QUERIES["dedup_simhash"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]
    assert_no_cartesian(df)
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), plan[:1500]


def test_embedding_lsh_dedup_joins_on_bucket(spark):
    """The scale path's contract: candidates come from an equi join on the
    LSH bucket id — the exact baseline's deliberate block cross-join must
    not leak into this plan."""
    df = QUERIES["dedup_embedding_lsh"](spark, SF_SMOKE)
    assert_no_cartesian(df)


def test_pipeline_chunking_never_shuffles(spark):
    """Chunking is a narrow transformation: explode+substring with ZERO
    Exchange — at 100 TB any shuffle here would move the whole corpus."""
    plan = explain_str(QUERIES["pipeline_chunk_documents"](spark, SF_SMOKE), "simple")
    assert "Exchange" not in plan, plan


def test_pipeline_split_single_rollup_shuffle(spark):
    """The split label is a projection; the only Exchange is the final
    (lang, split) rollup."""
    plan = explain_str(QUERIES["pipeline_train_test_split"](spark, SF_SMOKE), "simple")
    assert plan.count("Exchange") == 1, plan


def test_pipeline_packing_shuffles_only_on_shard(spark):
    """Packing: one Exchange into the per-shard running-sum window, one into
    the per-sequence rollup — never a global sort."""
    plan = explain_str(QUERIES["pipeline_pack_sequences"](spark, SF_SMOKE), "simple")
    assert plan.count("Exchange") <= 2, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_decontaminate_probe_is_broadcast(spark):
    """The benchmark shingle dictionary must broadcast: the train side is
    the 100 TB side and may not shuffle for the probe. Exactly the
    map-side-join shape the operator exists for."""
    df = QUERIES["pipeline_decontaminate"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert_no_cartesian(df)


def test_q21_decorrelation_stays_equi(spark):
    """Q21's EXISTS + NOT EXISTS must come out as equi-joins against the
    per-order aggregate — a correlated rewrite that plans a nested loop
    would be quadratic in the fact table."""
    for name in ("tpch_q12_shipmode_priority", "tpch_q21_suppliers_kept_waiting"):
        df = QUERIES[name](spark, SF_SMOKE)
        assert_no_cartesian(df)
        plan = explain_str(df)
        assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]


def test_q8_single_shuffle_join_tree(spark):
    """Q8's five dimension joins must all broadcast — the only Exchange pair
    allowed is the lineitem×orders fact-fact join. A dimension falling out
    of broadcast turns a 7-row-per-year aggregate into six full shuffles."""
    df = QUERIES["tpch_q8_market_share"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert plan.count("BroadcastHashJoin") >= 5, plan[:2000]
    assert_no_cartesian(df)


def test_pii_scrub_is_zero_shuffle_projection(spark):
    """The scrub chain must pipeline inside one codegen stage: no Exchange
    anywhere (pure per-row projection) and a 2-column pruned scan."""
    df = QUERIES["text_pii_scrub"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "Exchange" not in plan, plan[:1500]
    assert_read_schema_pruned(df, max_columns=2)
    assert_wholestage_codegen(df)


def test_repetition_stats_is_zero_shuffle_map_pass(spark):
    """The stats are strictly per-document, so the plan must be a pure
    map-side pass: ZERO Exchange (the r3 `weak` was a staged gram frame
    shuffled three times), exactly one corpus FileScan, no cache, and a
    2-column pruned read."""
    df = QUERIES["text_repetition_stats"](spark, SF_SMOKE)
    simple = explain_str(df, "simple")
    assert "Exchange" not in simple, simple[:1500]
    assert simple.count("FileScan parquet") == 1, simple[:1500]
    assert "InMemoryRelation" not in simple, simple[:1500]
    assert_read_schema_pruned(df, max_columns=2)


def test_kmeans_codebook_is_broadcast(spark):
    """Assignment must never shuffle the corpus: the K-row codebook is the
    broadcast side of every assignment join (BroadcastNestedLoopJoin over
    8 rows is the intended cross shape), and no CartesianProduct exists.
    Since round 13 the trained assignment is a cross-query staged TABLE —
    the registered query reads the materialized parquet, so the gate
    targets the BUILDER's plan (the training pipeline that actually
    executes at stage-build time)."""
    from kafka_streams_join_spark.queries.clustering import (
        _kmeans_assignments_build,
    )

    build = _kmeans_assignments_build(spark, SF_SMOKE)
    plan = explain_str(build)
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "Broadcast" in plan, plan[:1500]
    # corpus side reads only (vec_id, embedding)
    assert_read_schema_pruned(build, max_columns=2)


def test_pq_scoring_broadcasts_lut_no_cartesian_on_data_path(spark):
    """PQ/ADC: the corpus-sized codes relation must never shuffle for
    scoring — the LUT side broadcasts — and the only nested-loop joins are
    the K-row codebook cross joins (tiny build side, intended)."""
    df = QUERIES["sim_pq_topk"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert_read_schema_pruned(df, max_columns=2)


def test_duplicate_passages_never_shuffles_text(spark):
    """Passage dedup: the wide text column must die in the first map stage
    — no Exchange may carry it (only narrow (doc_id, pos, hash) rows
    move) — and no pair-forming join exists (no cartesian/BNLJ)."""
    df = QUERIES["dedup_duplicate_passages"](spark, SF_SMOKE)
    assert_no_cartesian(df)
    assert_no_wide_shuffle(df, "text")
    assert_no_wide_shuffle(df, "toks")
    assert_read_schema_pruned(df, max_columns=2)


def test_remove_passages_apply_side_stays_map_side(spark):
    """The remediation join must build on the (small) span side so the
    wide token arrays never enter an Exchange; the only shuffles are the
    narrow span-detector stages."""
    df = QUERIES["text_remove_duplicate_passages"](spark, SF_SMOKE)
    assert_no_cartesian(df)
    assert_no_wide_shuffle(df, "text")
    assert_no_wide_shuffle(df, "toks")


def test_semdedup_gemm_is_per_cell_equi_join(spark):
    """SemDeDup: the pair space must be confined to k-means cells — the
    block join is an equi-join on the cell id (never CartesianProduct /
    BNLJ over blocks) and the training codebook side broadcasts."""
    df = QUERIES["dedup_semantic"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan[:1500]
    # the K-row codebook cross joins are BNLJ by design (kmeans gate);
    # the cell-block PAIR join must instead be an EQUI join on the cell id
    # — Catalyst losing that key would all-pairs the blocks. Since the
    # round-13 staged assignment table, the block side is small enough
    # that Catalyst may pick BroadcastHashJoin (still keyed on cl).
    import re as _re

    assert _re.search(
        r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[cl#\d+L?\]",
        plan,
    ), plan[:2000]
    # reads the staged (vec_id, embedding, cl) assignment table
    assert_read_schema_pruned(df, max_columns=3)


def test_ivfpq_residual_one_wide_shuffle_and_broadcast_scoring(spark):
    """Residual IVFADC: the ONLY Exchange allowed to carry the embedding
    column is the index-build join that meets each vector with its home
    cell (residual projection); the query-side residual join broadcasts
    the probe set, scoring broadcasts the LUT, and no cartesian exists on
    the data path."""
    df = QUERIES["sim_ivfpq_residual_topk"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert_no_wide_shuffle(df, "embedding", max_exchanges=1)
    assert_read_schema_pruned(df, max_columns=2)


def test_ivfpq_prunes_before_scoring_and_never_shuffles_vectors(spark):
    """IVFADC: cell pruning and LUT scoring are broadcast hash joins, no
    cartesian on the data path, and — the load-bearing property — NO
    Exchange carries the 64-float embedding column: the wide corpus stays
    in place; only narrow (vec_id, cell/code) index frames shuffle."""
    df = QUERIES["sim_ivfpq_topk"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert_no_wide_shuffle(df, "embedding")
    assert_read_schema_pruned(df, max_columns=2)


def test_global_shuffle_one_exchange_no_total_order(spark):
    """The training-order shuffle must be ONE hash Exchange on the shard
    key feeding a per-shard local sort — never rangepartitioning (a global
    sort of the corpus) and never a second shuffle."""
    plan = explain_str(QUERIES["pipeline_global_shuffle"](spark, SF_SMOKE), "simple")
    assert plan.count("Exchange") == 1, plan[:1500]
    assert "rangepartitioning" not in plan.lower(), plan[:1500]


def test_incremental_minhash_probe_stays_equi(spark):
    """Batch-vs-base probe: the band-collision join and both verification
    joins are equi-joins (no cartesian/BNLJ anywhere), the shape that keeps
    the daily probe O(batch + collisions) instead of O(corpus)."""
    df = QUERIES["dedup_incremental_minhash"](spark, SF_SMOKE)
    assert_no_cartesian(df)
    plan = explain_str(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_bigram_surprisal_text_never_shuffles(spark):
    """The LM scoring pipeline shuffles only narrow key frames: no Exchange
    may carry the raw text column (the corpus payload), and nothing range
    partitions. The bigram-count join deliberately shuffles on (w1, w2) —
    key-bounded — rather than broadcasting a corpus-growing vocab."""
    df = QUERIES["text_bigram_surprisal"](spark, SF_SMOKE)
    assert_no_cartesian(df)
    assert_no_wide_shuffle(df, "text", max_exchanges=0)
    plan = explain_str(df, "simple")
    assert "rangepartitioning" not in plan.lower(), plan[:1500]


def test_fuzzy_edit_distance_blocks_before_verify(spark):
    """Edit-distance dedup: segment blocking and both verify joins are
    equi-joins (never a cartesian — Levenshtein may only run on blocked
    candidates), and the raw text column never enters an Exchange (only
    the derived match key and narrow (i, seg) frames move)."""
    df = QUERIES["dedup_fuzzy_edit_distance"](spark, SF_SMOKE)
    assert_no_cartesian(df)
    plan = explain_str(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert_no_wide_shuffle(df, "text", max_exchanges=0)


def test_char_entropy_is_zero_shuffle_map_pass(spark):
    """Char entropy is strictly per-document: ZERO Exchange, one corpus
    FileScan, 2-column pruned read — the same gate shape as the other
    quality filters in queries/quality.py."""
    df = QUERIES["text_char_entropy"](spark, SF_SMOKE)
    simple = explain_str(df, "simple")
    assert "Exchange" not in simple, simple[:1500]
    assert simple.count("FileScan parquet") == 1, simple[:1500]
    assert_read_schema_pruned(df, max_columns=2)


def test_group_holdout_single_rollup_shuffle(spark):
    """Fold assignment is a map-side hash of the group key; the only
    Exchange is the (source, fold) rollup — same gate as the per-doc
    split."""
    plan = explain_str(QUERIES["pipeline_group_holdout_split"](spark, SF_SMOKE), "simple")
    assert plan.count("Exchange") == 1, plan[:1500]


def test_hybrid_rrf_shares_one_token_scan(spark):
    """Both fusion legs must reuse the STAGED token/tf frames (every
    FileScan in the plan text sits under an InMemoryRelation — cached
    lineage, built once — so the corpus is read one time for both legs),
    and no cartesian anywhere. Textual FileScan counting would overcount
    here: a cached relation's display includes its build lineage."""
    df = QUERIES["retrieval_hybrid_rrf"](spark, SF_SMOKE)
    plan = explain_str(df)
    # the only nested-loop join allowed is the broadcast of the 1-row
    # corpus-stats aggregate (same shape as text_bm25_search); a true
    # cartesian of data-sized relations is still forbidden
    assert "CartesianProduct" not in plan, plan[:1500]
    simple = explain_str(df, "simple")
    assert "InMemoryRelation" in simple, simple[:1500]
    for line in simple.splitlines():
        if "FileScan parquet" in line:
            # indented under an InMemoryRelation subtree, never a root scan
            assert line.lstrip() != line, line


def test_table_profile_single_scan_expand(spark):
    """The 6-column exact-NDV profile must be ONE scan (Expand-based
    multi-distinct), never the oracle's 6 UNION'd scans: exactly one
    FileScan, an Expand node, and no rangepartitioning."""
    df = QUERIES["dq_table_profile"](spark, SF_SMOKE)
    simple = explain_str(df, "simple")
    assert simple.count("FileScan parquet") == 1, simple[:1500]
    assert "Expand" in simple, simple[:1500]
    assert "rangepartitioning" not in simple.lower(), simple[:1500]


def test_token_budget_plan_one_rollup_and_broadcast(spark):
    """Mixture planning: one (source) rollup; the corpus totals join back
    as a 1-row broadcast — never a shuffle of the per-source rows against
    the scalar frame."""
    df = QUERIES["pipeline_token_budget_plan"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan[:1500]
    simple = explain_str(df, "simple")
    assert "rangepartitioning" not in simple.lower(), simple[:1500]


def test_markov_transitions_prunes_props_and_stays_equi(spark):
    """The transition matrix reads only the 4 narrow event columns (props —
    the wide payload — must be pruned at the scan) and joins only on the
    vocabulary-sized from_type key."""
    df = QUERIES["events_markov_transitions"](spark, SF_SMOKE)
    assert_read_schema_pruned(df, max_columns=4)
    assert "CartesianProduct" not in explain_str(df)


def test_pmi_rank_window_runs_on_filtered_pairs_only(spark):
    """PMI's global top-k window is fed by the floor-filtered vocab-sized
    pair frame, never the corpus (no CartesianProduct of data relations;
    the 1-row totals broadcast like the BM25 stats)."""
    df = QUERIES["text_pmi_collocations"](spark, SF_SMOKE)
    assert "CartesianProduct" not in explain_str(df)


def test_compaction_plan_partitioned_window_no_global_sort(spark):
    """Compaction planning windows per partition key — one hash Exchange,
    never rangepartitioning (a global sort of the file catalog)."""
    plan = explain_str(QUERIES["layout_compaction_plan"](spark, SF_SMOKE), "simple")
    assert "rangepartitioning" not in plan.lower(), plan[:1500]
    assert plan.count("Exchange") == 1, plan[:1500]


def test_normalized_exact_dedup_is_aggregate_only(spark):
    """Normalization-exact dedup is a pure aggregation pipeline over a
    row-local projection: no joins, one FileScan, and at most the two
    key-bounded Exchanges Spark's distinct-count rewrite needs (partial
    (norm, raw) dedup, then the final norm_hash rollup)."""
    plan = explain_str(QUERIES["dedup_normalized_exact"](spark, SF_SMOKE), "simple")
    assert plan.count("Exchange") <= 2, plan[:1500]
    assert "Join" not in plan, plan[:1500]
    assert plan.count("FileScan parquet") == 1, plan[:1500]


def test_importance_resample_no_single_partition_rank(spark):
    """DSIR selection (round-5 rewrite of the r4 weak): the global rank is
    a two-phase rank — per-weight-level offsets over the bounded level
    frame + a window PARTITIONED by level — so the per-document frame must
    never funnel through an Exchange SinglePartition. The one allowed
    single-partition window runs over the model-sized level counts, which
    carry no doc_id."""
    df = QUERIES["pipeline_importance_resample"](spark, SF_SMOKE)
    assert_no_single_partition_window_over(df, "doc_id")
    plan = explain_str(df)
    # phase-2 window distributes on the weight level
    assert "hashpartitioning(iw" in plan, plan[:2000]


def test_vocab_growth_no_single_partition_prefix_sum(spark):
    """Heaps-law cumulative sums (round-5 rewrite of the r4 weak): the
    two-phase prefix sum windows per doc_id-range shard; the per-doc frame
    must never cross an Exchange SinglePartition (only the shard-totals
    offsets frame — bounded by shard count — may)."""
    df = QUERIES["text_vocab_growth"](spark, SF_SMOKE)
    assert_no_single_partition_window_over(df, "doc_id")
    plan = explain_str(df)
    assert "hashpartitioning(shard" in plan, plan[:2000]


def test_hybrid_rrf_legs_are_take_ordered(spark):
    """The RRF leg cap (top-N per ranker fed to fusion) must reach the
    plan as TakeOrderedAndProject on BOTH legs — per-partition heaps plus
    a driver merge of N rows, never a full global sort/rank of every
    matching document. (WindowGroupLimit cannot prune an unpartitioned
    rank window in this Spark build; ORDER BY + LIMIT is the correct
    physical shape for a global top-N, same as ``sort_topk_limit``.)"""
    df = QUERIES["retrieval_hybrid_rrf"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("TakeOrderedAndProject") >= 2, plan[:2000]


def test_hard_negatives_narrow_rows_and_pruned_scan(spark):
    """Hard-negative mining: the corpus scan reads only (vec_id, embedding,
    label); the BroadcastNestedLoopJoin is the intended bounded-Q plan (as
    in sim_sq_topk) but a CartesianProduct of data relations is forbidden,
    and the top-k window input must be narrow (no embedding column in any
    Exchange)."""
    df = QUERIES["sim_hard_negatives"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan[:1500]
    assert_read_schema_pruned(df, max_columns=3)
    assert_no_wide_shuffle(df, "embedding", max_exchanges=0)


def test_oov_vocab_is_take_ordered_and_broadcast(spark):
    """OOV rate: the top-V vocabulary must plan TakeOrderedAndProject (not
    a global sort) and probe back as a broadcast join."""
    df = QUERIES["text_oov_rate"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert "BroadcastHashJoin" in plan, plan[:1500]


def test_readability_single_scan_chain_no_cartesian(spark):
    """Readability: syllable counting is a codegen'd regexp chain (no
    Python evaluators in the plan) and the doc-level join is an equi-join."""
    df = QUERIES["text_readability"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan[:1500]
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in plan, plan[:1500]


def test_length_histogram_reads_two_columns(spark):
    """Length histogram: only (source, n_chars) may reach the scan; the
    totals join back as broadcast."""
    df = QUERIES["corpus_length_histogram"](spark, SF_SMOKE)
    assert_read_schema_pruned(df, max_columns=2)
    assert_broadcast_join(df, expect=True)


def test_anomaly_zscore_reads_two_columns_broadcast_stats(spark):
    """Anomaly z-score: (event_type, ts) scan, bounded daily aggregate,
    per-type stats broadcast back."""
    df = QUERIES["events_anomaly_zscore"](spark, SF_SMOKE)
    assert_read_schema_pruned(df, max_columns=2)
    assert_broadcast_join(df, expect=True)


def test_path_trigrams_one_window_then_take_ordered(spark):
    """Path trigrams: both leads share ONE window (single Window node),
    the top-N is TakeOrdered, props/value pruned at the scan."""
    df = QUERIES["events_path_trigrams"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("Window") == 1, plan[:1500]
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert_read_schema_pruned(df, max_columns=4)


def test_label_outliers_corpus_never_shuffles_vectors(spark):
    """Intra-class outliers: centroids and stats broadcast back; the wide
    embedding column never crosses an Exchange."""
    df = QUERIES["emb_label_outliers"](spark, SF_SMOKE)
    assert_no_wide_shuffle(df, "embedding", max_exchanges=0)
    assert "CartesianProduct" not in explain_str(df)


def test_copurchase_pair_stage_is_order_key_equi_join(spark):
    """Market-basket pairs join ON the order key (bounded baskets), never
    cartesian; the final top-N is TakeOrdered."""
    df = QUERIES["orders_copurchase_lift"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "TakeOrderedAndProject" in explain_str(df, "simple")


def test_curriculum_order_no_single_partition_rank(spark):
    """Curriculum ordering shares the two-phase rank operator: the
    per-doc frame must never cross an Exchange SinglePartition (only the
    bounded difficulty-level frame may)."""
    df = QUERIES["pipeline_curriculum_order"](spark, SF_SMOKE)
    assert_no_single_partition_window_over(df, "doc_id")
    assert "hashpartitioning(difficulty" in explain_str(df)


def test_knn_label_accuracy_narrow_and_bounded(spark):
    """1-NN label eval: bounded-Q broadcast scoring (no CartesianProduct,
    embedding never in an Exchange), label-sized output rollup."""
    df = QUERIES["sim_knn_label_accuracy"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan[:1500]
    assert_no_wide_shuffle(df, "embedding", max_exchanges=0)


def test_zipf_slope_vocab_sized_tail(spark):
    """Zipf fit: the top-N vocabulary must plan TakeOrderedAndProject; the
    regression runs over the LIMITed frame only."""
    plan = explain_str(QUERIES["text_zipf_slope"](spark, SF_SMOKE), "simple")
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_rfm_single_user_rollup_broadcast_fences(spark):
    """RFM: one user aggregate, exact-median fences broadcast back (BNLJ of
    the 1-row frame allowed, CartesianProduct not), 3-column scan."""
    df = QUERIES["events_rfm_segments"](spark, SF_SMOKE)
    assert "CartesianProduct" not in explain_str(df)
    assert_read_schema_pruned(df, max_columns=3)


def test_power_user_share_no_single_partition_rank(spark):
    """Pareto share ranks users through the two-phase rank: the per-user
    frame never crosses an Exchange SinglePartition."""
    df = QUERIES["events_power_user_share"](spark, SF_SMOKE)
    assert_no_single_partition_window_over(df, "user_id")
    assert_read_schema_pruned(df, max_columns=1)


def test_mixture_temperature_is_rollup_and_broadcast(spark):
    """Temperature mixture: one (source) rollup + 1-row broadcast total; no
    rangepartitioning, 2-column scan."""
    df = QUERIES["pipeline_mixture_temperature"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "rangepartitioning" not in plan.lower(), plan[:1500]
    assert_read_schema_pruned(df, max_columns=2)


def test_keep_longest_argmax_is_aggregate_not_window(spark):
    """Keep-best dedup: the per-cluster keeper must be the
    min(struct(-n_chars, doc_id)) AGGREGATE (map-side combining), never a
    rank window over the docs frame; no single-partition funnel."""
    df = QUERIES["dedup_keep_longest"](spark, SF_SMOKE)
    assert_no_single_partition_window_over(df, "doc_id")
    assert "CartesianProduct" not in explain_str(df)


def test_registry_wide_no_data_sized_global_funnel(spark):
    """Registry-wide meta-gate (round 5): NO registered query may move a
    data-sized frame through a single-partition or range exchange. "Data-
    sized" is detected by the per-row id columns of the corpus tables
    (doc_id / vec_id / user_id / event_id / lineitem keys) appearing in the
    Exchange input — bounded side frames (level counts, shard totals, group
    rollups) never carry them. This is the generalization of the per-query
    single-partition gates: a future registration cannot reintroduce the
    round-4 weak shape without failing here.

    Global ORDER BY of a GROUP-sized result (e.g. TPC-H Q1's sort on its
    4-row output) is allowed — those frames carry group keys, not row ids.
    TakeOrderedAndProject never plans an Exchange, so top-k queries pass by
    construction."""
    import re

    # per-row ids INCLUDING the alias families queries rename them to —
    # a renamed frame must not evade the gate (review finding, round 5)
    ids = (
        "doc_id", "vec_id", "user_id", "event_id", "l_orderkey", "l_partkey",
        "doc_a", "doc_b", "query_id", "neighbor_id", "part_a", "part_b",
        "okey", "pkey", "src", "dst",
    )
    offenders = []
    for name, fn in QUERIES.items():
        try:
            plan = explain_str(fn(spark, SF_SMOKE))
        except Exception as e:  # noqa: BLE001 — a broken query fails parity, not this gate
            offenders.append((name, f"explain failed: {e}"))
            continue
        for m in re.finditer(
            r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]\n"
            r"Arguments: (SinglePartition|rangepartitioning)",
            plan,
        ):
            cols, kind = m.group(1), m.group(2)
            hit = [i for i in ids if re.search(rf"\b{i}#", cols)]
            if hit:
                offenders.append((name, f"{kind} carries {hit}"))
        # round-14 addition (same explain pass): no CartesianProduct
        # anywhere. Data x data cartesians are the O(n^2) killer; even a
        # literal x literal cartesian schedules LEFT x RIGHT partitions
        # (two 32-partition 3-row literals = 1024 near-empty tasks, ~34 s
        # of measured scheduling overhead before the sketch_histogram_
        # bins_sweep fix). Verified zero hits over all 340 plans — keep
        # it that way: build literal grids as ONE coalesced frame.
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        # round-14 addition (same explain pass): no Python-backed local
        # relations (Scan ExistingRDD) in any registered plan. A
        # createDataFrame literal plans as a defaultParallelism-partition
        # Python-fed RDD — measured 4.9-7.4 s PER ACTION for a 3-row
        # frame under the old coalesce(1) spelling vs 0.1 s as a VALUES
        # LocalTableScan (functions/literals.py::values_frame is the
        # sanctioned builder). BatchEvalPython stays allowed ONLY for
        # the deliberate UDTF-surface query (udtf_sentence_split).
        if "ExistingRDD" in plan:
            offenders.append((name, "Scan ExistingRDD (Python-backed literal)"))
        if "BatchEvalPython" in plan and name != "udtf_sentence_split":
            offenders.append((name, "BatchEvalPython (row-at-a-time UDF)"))
    assert not offenders, offenders


def test_staged_builders_no_data_sized_global_funnel(spark):
    """The cross-query staged tables (round 13) execute their builders'
    plans at stage-build time, OUTSIDE the registered queries the meta-
    gate above sweeps — so the same funnel check runs here on each
    builder's plan directly (a bad Exchange must not hide inside a
    stage build)."""
    import re

    from kafka_streams_join_spark.queries.clustering import (
        _kmeans_assignments_build,
    )
    from kafka_streams_join_spark.queries.dedup import (
        dedup_ngram_jaccard,
    )
    from kafka_streams_join_spark.queries.graph import _baskets, _pair_fanout
    from kafka_streams_join_spark.operators.components import (
        connected_components,
    )
    from pyspark.sql import functions as F

    ids = (
        "doc_id", "vec_id", "doc_a", "doc_b", "okey", "pkey", "src", "dst",
    )
    pairs = _pair_fanout(_baskets(spark, SF_SMOKE), "src", "dst").distinct()
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ndp = dedup_ngram_jaccard(spark, SF_SMOKE).select("doc_a", "doc_b")
    labels = connected_components(
        ndp.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    ).toDF("doc_id", "label")
    builders = {
        "graph_edges": edges,
        "neardup_labels": labels,
        "kmeans_assignments": _kmeans_assignments_build(spark, SF_SMOKE),
    }
    offenders = []
    for name, df in builders.items():
        plan = explain_str(df)
        for m in re.finditer(
            r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]\n"
            r"Arguments: (SinglePartition|rangepartitioning)",
            plan,
        ):
            cols, kind = m.group(1), m.group(2)
            hit = [i for i in ids if re.search(rf"\b{i}#", cols)]
            if hit:
                offenders.append((name, f"{kind} carries {hit}"))
    assert not offenders, offenders


def test_lang_confusion_is_rollup_on_rowlocal_pred(spark):
    """Lang confusion: the prediction is a row-local projection in the
    scan; the matrix is one langs²-bounded aggregate — no join of
    data-sized relations, no Python evaluators."""
    df = QUERIES["text_lang_confusion"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan[:1500]
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in plan, plan[:1500]


def test_dataset_card_single_expand_scan(spark):
    """Dataset card: the multi-distinct aggregate runs as ONE Expand-based
    scan (the dq_table_profile shape), plus the source rollup — at most
    two FileScans, no rangepartitioning."""
    df = QUERIES["pipeline_dataset_card"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "Expand" in plan, plan[:1500]
    assert plan.count("FileScan parquet") <= 2, plan[:1500]
    assert "rangepartitioning" not in plan.lower(), plan[:1500]


def test_pagerank_iterations_are_equi_joins(spark):
    """PageRank: every iteration is an edges ⋈ ranks equi-join + one
    map-side-combined sum — no cartesian, no data-sized global funnel."""
    df = QUERIES["graph_pagerank_parts"](spark, SF_SMOKE)
    assert_no_cartesian(df)
    # the graph frames rename l_partkey at the scan — gate the alias chain
    for col in ("node", "src", "dst", "pkey"):
        assert_no_single_partition_window_over(df, col)


def test_ewma_fold_is_rowlocal_after_one_rollup(spark):
    """EWMA: one (type, day) aggregate feeds a row-local fold — no joins,
    no Python evaluators, no data-sized global funnel."""
    df = QUERIES["events_daily_ewma"](spark, SF_SMOKE)
    plan = explain_str(df)
    for bad in ("CartesianProduct", "SortMergeJoin", "ShuffledHashJoin",
                "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, plan[:1500]
    assert_read_schema_pruned(df, max_columns=2)


def test_repeat_epochs_single_rollup(spark):
    """Epoch planning: one (source) rollup + 1-row broadcast; no
    rangepartitioning, 2-column scan."""
    df = QUERIES["pipeline_repeat_epochs"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "rangepartitioning" not in plan.lower(), plan[:1500]
    assert_read_schema_pruned(df, max_columns=2)


def test_interarrival_partitioned_window_and_pruned_scan(spark):
    """Inter-arrival gaps: the lag window partitions by (type, user) — no
    data-sized global funnel — and the scan reads 4 columns."""
    df = QUERIES["events_interarrival_stats"](spark, SF_SMOKE)
    assert_no_single_partition_window_over(df, "event_id")
    assert_read_schema_pruned(df, max_columns=4)


def test_centroid_drift_corpus_never_joins(spark):
    """Drift: all joins run on the bounded centroid cell frame; the wide
    embedding column never crosses an Exchange."""
    df = QUERIES["emb_centroid_drift"](spark, SF_SMOKE)
    assert_no_wide_shuffle(df, "embedding", max_exchanges=0)
    assert "CartesianProduct" not in explain_str(df)


def test_split_leakage_tagging_is_rowlocal(spark):
    """Leakage audit: split tagging is a row-local hash on the (tiny) pair
    list; the only corpus-sized work is the already-gated near-dup
    pipeline — no cartesian of data relations."""
    df = QUERIES["pipeline_split_leakage_audit"](spark, SF_SMOKE)
    assert "CartesianProduct" not in explain_str(df)


def test_mode_per_key_is_aggregate_only(spark):
    """Per-key mode: two map-side-combined aggregates, no window, no join."""
    plan = explain_str(QUERIES["agg_mode_per_key"](spark, SF_SMOKE), "simple")
    assert "Window" not in plan, plan[:1500]
    assert "Join" not in plan, plan[:1500]
    assert plan.count("FileScan parquet") == 1, plan[:1500]


def test_audience_overlap_pair_join_on_user(spark):
    """Audience overlap: the pair stage is a user-keyed equi-join — never
    cartesian; size lookups broadcast."""
    df = QUERIES["events_audience_overlap"](spark, SF_SMOKE)
    assert "CartesianProduct" not in explain_str(df)
    assert_broadcast_join(df, expect=True)


def test_dist_functions_two_phase_no_type_funnel(spark):
    """The distribution trio must NOT sort each type's whole share in one
    window task: the only per-row window partitions by the FINE
    (type, value) key, the coarse windows run over the bounded level
    frame, and no data-sized column crosses a SinglePartition exchange."""
    df = QUERIES["window_dist_functions"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert_no_single_partition_window_over(df, "event_id")
    # the per-row rank window partitions on BOTH keys
    assert "hashpartitioning(event_type" in plan and "value2" in plan, plan[:2000]


def test_kwic_per_term_rank_is_group_limited(spark):
    """KWIC's first-k per term must plan Partial+Final WindowGroupLimit —
    each input partition forwards at most k rows per term into the 3-key
    shuffle, never a term's full hit list."""
    plan = explain_str(QUERIES["text_keyword_in_context"](spark, SF_SMOKE), "simple")
    assert plan.count("WindowGroupLimit") >= 2, plan[:2000]


# --------------------------------------------------------------------------
# round-6 gates
# --------------------------------------------------------------------------


def test_bpe_encode_runs_on_vocab_not_corpus(spark):
    """Tokenizer apply: the 12-merge replace chain must hang off the
    DISTINCT-word aggregate (vocab-sized), never the exploded corpus; no
    Python evaluators; the scan reads only (doc_id, text)."""
    df = QUERIES["text_bpe_encode_apply"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in plan, plan[:1500]
    assert_read_schema_pruned(df, max_columns=2)
    # the merge chain sits above HashAggregate(keys=[word...]) — i.e. the
    # replace() calls appear AFTER the distinct, not in the explode stage
    assert "replace" in plan


def test_scd2_merge_windows_stay_user_partitioned(spark):
    """CDC merge: every lag/lead window is user-partitioned; no
    single-partition funnel over the event ids, no cartesian."""
    df = QUERIES["events_scd2_merge_apply"](spark, SF_SMOKE)
    assert_no_cartesian(df)
    for col in ("user_id", "event_id"):
        assert_no_single_partition_window_over(df, col)


def test_quantile_sketch_rollup_is_sketch_sized(spark):
    """Quantile sketch: after the binning scans, everything is bin-sized —
    no rangepartitioning, no cartesian (the 1-row range frame broadcasts
    as BroadcastNestedLoopJoin, the documented 1-row-stats allowance)."""
    df = QUERIES["agg_quantile_sketch_rollup"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "rangepartitioning" not in plan.lower(), plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_cms_and_bloom_broadcast_their_sketches(spark):
    """CMS probe and Bloom probe both join the BROADCAST sketch — the
    corpus side never reshuffles for the lookup."""
    for name in ("agg_count_min_sketch", "agg_bloom_membership"):
        df = QUERIES[name](spark, SF_SMOKE)
        plan = explain_str(df)
        assert "BroadcastHashJoin" in plan, (name, plan[:1500])
        assert "CartesianProduct" not in plan, (name, plan[:1500])


def test_prf_expansion_terms_broadcast(spark):
    """PRF: both BM25 rounds probe with BROADCAST term tables (the
    feedback-doc and expansion-term frames are top-k/term-set bounded);
    no cartesian anywhere in the two-round plan."""
    df = QUERIES["retrieval_prf_expansion"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    assert "CartesianProduct" not in plan


def test_triangle_count_all_equi_joins(spark):
    """Degree-oriented triangle counting: wedge build and wedge close are
    equi-joins on node keys; the only nested-loop joins are the 1-row
    stats rollups at the very top (the documented broadcast-stats
    allowance) — no CartesianProduct anywhere."""
    df = QUERIES["graph_triangle_count"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    # the data-path joins (edge x deg, wedge build, wedge close) are hash
    assert plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") >= 4


def test_pca_fixed_is_exchange_free(spark):
    """The frozen-basis projection is ONE scan + a codegen'd projection:
    literally no Exchange in the plan (the strongest shuffle gate in the
    repo), and no Python."""
    df = QUERIES["emb_pca_project_fixed"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "Exchange" not in plan, plan[:1500]
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in plan
    assert_wholestage_codegen(df)


def test_silhouette_centroids_broadcast(spark):
    """Centroid silhouette: the K=10 centroid table broadcasts into the
    scoring pass (assign_to_codebook shape); corpus vectors are never the
    build side."""
    df = QUERIES["emb_silhouette_by_label"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dim_profile_single_pruned_scan(spark):
    """Dimension profile: one scan reading ONLY the embedding column into
    a partial+final 64-group aggregate."""
    df = QUERIES["emb_dim_profile"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan[:1500]
    assert_read_schema_pruned(df, max_columns=1)


def test_attribution_is_one_user_window_pass(spark):
    """Last-touch attribution: the running max is a user-partitioned
    window — no purchases×touches self-join (exactly one scan of events),
    no single-partition funnel."""
    df = QUERIES["events_attribution_last_touch"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    # both consumers (per-type counts + the total) read the one STAGED
    # grouped frame; the events scan lives inside that single cached plan
    # (it prints once per InMemoryRelation occurrence, but runs once)
    assert plan.count("InMemoryTableScan") >= 2, plan[:1500]
    assert "CartesianProduct" not in plan, plan[:1500]
    for col in ("user_id", "event_id"):
        assert_no_single_partition_window_over(df, col)


def test_active_streaks_user_partitioned(spark):
    """Gaps-and-islands: the rank window is user-partitioned over the
    per-DAY frame; no single-partition funnel over user ids."""
    df = QUERIES["events_active_streaks"](spark, SF_SMOKE)
    assert_no_single_partition_window_over(df, "user_id")
    assert_read_schema_pruned(df, max_columns=2)


def test_shard_manifest_bytes_never_shuffle(spark):
    """Shard manifest: octet_length is computed IN the scan; only narrow
    (shard, n_bytes) rows reach the aggregate exchange — the text/binary
    column itself never crosses an Exchange."""
    df = QUERIES["mm_shard_manifest"](spark, SF_SMOKE)
    assert_no_wide_shuffle(df, col="text")


def test_length_buckets_single_scan(spark):
    """Padding planner: one corpus scan; the global row re-aggregates the
    staged BUCKET frame instead of rescanning the corpus."""
    df = QUERIES["pipeline_length_bucket_batching"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    # both union branches read the one STAGED bucket aggregate (the
    # corpus scan lives inside the single InMemoryRelation)
    assert plan.count("InMemoryTableScan") >= 2, plan[:1500]


def test_psi_histograms_are_bucket_sized(spark):
    """PSI: after the staged scan, the per-period histograms and their
    full-outer merge are bucket-cardinality frames — no rangepartitioning,
    no cartesian beyond the broadcast 1-row count frames."""
    df = QUERIES["dq_psi_drift"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "rangepartitioning" not in plan.lower(), plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_boilerplate_topn_is_take_ordered(spark):
    """Boilerplate report: the corpus-wide top-N must plan
    TakeOrderedAndProject (per-partition heaps); the rank window runs on
    the 10-row result only."""
    df = QUERIES["text_boilerplate_spans"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan[:1500]


# --------------------------------------------------------------------------
# round-6 wave-2 gates
# --------------------------------------------------------------------------


def test_source_affinity_composes_gated_pipeline(spark):
    """Source affinity rides the already-gated near-dup candidate
    pipeline: since round 13 the pair list is a cross-query staged TABLE
    (operators/staging.py staged_table), so the plan fans out from scans
    of the materialized parquet (two consumers: the tag join and the
    total) instead of InMemoryTableScans; the source tags are narrow id
    joins, and no cartesian appears anywhere."""
    df = QUERIES["dedup_source_affinity"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("ksj_staged_") >= 2, plan[:1500]
    assert "CartesianProduct" not in plan, plan[:1500]


def test_sq_reconstruction_error_is_row_local(spark):
    """SQ audit: one pruned scan, row-local arithmetic, a
    label-cardinality aggregate — the embedding column never crosses an
    Exchange and no Python evaluator appears."""
    df = QUERIES["emb_sq_reconstruction_error"](spark, SF_SMOKE)
    assert_no_wide_shuffle(df, col="embedding")
    plan = explain_str(df)
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in plan, plan[:1500]
    assert_read_schema_pruned(df, max_columns=2)


def test_mrr_eval_composes_ranking_no_cartesian(spark):
    """MRR: the ranking legs and two narrow label joins — equi-joins
    only; the sole nested-loop shapes allowed are the 1-row stats
    broadcasts inside the composed ranking plan (so this gates
    CartesianProduct, not BroadcastNestedLoopJoin)."""
    df = QUERIES["retrieval_mrr_eval"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]


def test_cohort_ltv_reuses_custkey_partitioning(spark):
    """Cohort LTV: first-order aggregate and fact join share the
    o_custkey hash partitioning — exactly ONE exchange on o_custkey
    feeds both (no re-shuffle for the join); scan pruned to 3 columns."""
    df = QUERIES["orders_cohort_ltv"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.lower().count("hashpartitioning(o_custkey") <= 2, plan[:2000]
    assert "CartesianProduct" not in plan
    assert_read_schema_pruned(df, max_columns=3)


def test_bot_score_single_scan_no_window(spark):
    """Bot score: ONE map-side-combined aggregate over a 3-column scan —
    no window function, no join, no second scan."""
    df = QUERIES["events_bot_score"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan[:1500]
    assert "Window" not in plan, plan[:1500]
    assert_read_schema_pruned(df, max_columns=3)


def test_common_neighbors_topn_is_take_ordered(spark):
    """Common neighbors: the corpus-wide top-N plans
    TakeOrderedAndProject (per-partition heaps before the 1-partition
    collect of 20 rows); wedge build and anti-join are equi-joins."""
    df = QUERIES["graph_common_neighbors"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert "CartesianProduct" not in plan, plan[:1500]


def test_kcore_rounds_stay_node_keyed(spark):
    """k-core (round-7 rework): every peeling round is two hash-partitioned
    window counts over the staged edge frame — no node-set joins at all;
    no rangepartitioning, no cartesian (the per-round 1-row count
    crossJoins broadcast)."""
    df = QUERIES["graph_kcore_peel"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "rangepartitioning" not in plan.lower(), plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_asof_nearest_single_shuffle_per_side(spark):
    """Nearest as-of: two one-sided as-of runs (each ONE user_id
    exchange + sort) joined on the click key — never a clicks×views
    pair blowup (no cartesian, no nested loop on data-sized frames)."""
    df = QUERIES["asof_nearest_view"](spark, SF_SMOKE)
    assert_no_cartesian(df)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]


def test_query_likelihood_model_frames_broadcast(spark):
    """Query likelihood (round-15 one-aggregate form): per-term tfs are
    conditional-count COLUMNS of the one per-doc aggregate, so there is
    NO (doc, term)-keyed join at all — the only join left is the 1-row
    prior broadcast cross; the global rank runs over the scored doc
    frame once (TakeOrdered shape)."""
    df = QUERIES["retrieval_query_likelihood"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert "BroadcastHashJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    # one corpus aggregate + the 1-row stats rollup — nothing else shuffles
    assert plan.count(") Exchange") <= 2, plan[:2000]


def test_vocab_overlap_topv_is_group_limited(spark):
    """Vocab overlap: the per-lang top-V rank is a PARTITIONED window —
    Partial+Final WindowGroupLimit prunes per-partition heaps before the
    lang shuffle; the pair join runs over the staged top-V frame."""
    df = QUERIES["text_vocab_overlap_langs"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("WindowGroupLimit") >= 2, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


# --------------------------------------------------------------------------
# round-6 wave-3 gates
# --------------------------------------------------------------------------


def test_kmv_nation_rank_is_group_limited(spark):
    """KMV: the per-nation min-K rank is a PARTITIONED window —
    Partial+Final WindowGroupLimit prunes each input partition to ≤ K
    rows per nation before the shuffle. Rollup windows above it run on
    sketch-sized (≤ scopes·K) frames only."""
    df = QUERIES["agg_kmv_distinct_rollup"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("WindowGroupLimit") >= 2, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "rangepartitioning" not in plan.lower(), plan[:2000]


def test_association_rules_topn_is_take_ordered(spark):
    """Association rules: basket-bounded pair stage (order-key
    equi-join), part-key frequency joins, 1-row total broadcast, and a
    TakeOrdered top-N — the copurchase_lift gate extended to the
    directed-rule union."""
    df = QUERIES["orders_association_rules"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert "CartesianProduct" not in plan, plan[:1500]


def test_bigram_lm_fans_out_from_staged_frames(spark):
    """Bigram LM: the token scan and the exploded bigram frame are each
    STAGED and fanned into their consumers (counts + scoring) —
    InMemoryTableScan appears for both; no Python evaluator, no
    cartesian beyond the broadcast 1-row vocab frame."""
    df = QUERIES["text_bigram_lm_score"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("InMemoryTableScan") >= 3, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in plan, plan[:1500]


def test_schema_profile_is_one_scan(spark):
    """Schema profile: ONE FileScan feeds every column's stats (the
    multi-distinct plans as Expand — a bounded row multiplication, not
    extra scans); the per-column rows unpivot from the 1-row frame."""
    df = QUERIES["dq_schema_profile"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan[:2000]
    assert "Expand" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


# --------------------------------------------------------------------------
# round-7 wave 1: graph communities/similarity, sketches, multimodal
# --------------------------------------------------------------------------


def test_common_neighbors_cap_is_window_group_limit(spark):
    """Round-7 rework: the per-node top-d adjacency cap plans as
    WindowGroupLimit (partial per-partition heaps + final), so the wedge
    stage never sees more than _CN_CAP neighbors per node. Round 14: the
    cap lives in the shared cross-query adj0 stage, so the gate runs on
    the stage BUILD plan (the plan that executes at stage-build time);
    the query plan itself is gated cartesian-free."""
    from kafka_streams_join_spark.queries.graph import _capped_adj0_build

    build = explain_str(_capped_adj0_build(spark, SF_SMOKE))
    assert build.count("WindowGroupLimit") >= 2, build[:2000]
    df = QUERIES["graph_common_neighbors"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan[:2000]


def test_label_propagation_bounded_chain(spark):
    """LPA rounds are equi-joins + hash aggregates on the staged edge
    frame: no rangepartitioning, no cartesian, top-N via TakeOrdered."""
    df = QUERIES["graph_label_propagation"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "rangepartitioning" not in plan.lower(), plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_jaccard_neighbors_cap_and_take_ordered(spark):
    # the cap's WindowGroupLimit is gated on the shared adj0 BUILD plan
    # (see test_common_neighbors_cap_is_window_group_limit); the query
    # plan reads the staged table
    df = QUERIES["graph_jaccard_neighbors"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_local_clustering_no_cartesian_take_ordered(spark):
    df = QUERIES["graph_local_clustering"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_hash_sample_sketch_is_one_scan_no_window(spark):
    """The hash-Bernoulli rank sketch is one scan + one hash aggregate:
    the sample filter is map-side, no window, no join, pruned read."""
    df = QUERIES["sketch_hash_sample_quantiles"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan[:1500]
    assert "Window" not in plan, plan[:1500]
    assert "Join" not in plan, plan[:1500]
    # 4 = value + group + the two row-key columns the sample hash digests
    assert_read_schema_pruned(df, max_columns=4)


def test_theta_intersection_sketch_joins_only(spark):
    """Theta sketches build via WindowGroupLimit; the pair frame is a
    |types|-row broadcast (BroadcastNestedLoopJoin allowed on the tiny
    kth frames), never a data-sized cartesian."""
    df = QUERIES["sketch_theta_intersection"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert plan.count("WindowGroupLimit") >= 2, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_phash_neardup_bands_equi_join_payload_stays_local(spark):
    """Perceptual near-dup: candidates come from an equi-join on
    (band, band_val) — no cartesian, no broadcast-nested-loop on the
    data-sized band frames; the binary payload never crosses an
    Exchange (only doc_id + 64-bit hash shuffle)."""
    df = QUERIES["mm_phash_neardup"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "payload" not in _exchange_sections(plan), plan[:2000]


def _exchange_sections(plan: str) -> str:
    """Concatenated text of Exchange plan lines (cheap proxy for 'what
    crosses a shuffle')."""
    return "\n".join(
        line for line in plan.splitlines() if "Exchange" in line
    )


def test_mm_profile_queries_prune_to_metadata(spark):
    """Exact-bytes dedup and size quantiles read only the columns they
    digest (text + n_chars), one scan each, no joins."""
    for name in ("mm_dedup_exact_bytes", "mm_size_quantiles"):
        df = QUERIES[name](spark, SF_SMOKE)
        plan = explain_str(df, "simple")
        assert plan.count("FileScan parquet") == 1, (name, plan[:1500])
        assert "Join" not in plan, (name, plan[:1500])
        assert_read_schema_pruned(df, max_columns=2)


# --------------------------------------------------------------------------
# round-7 wave 2: text insights, analytics extensions, MAP, assortativity
# --------------------------------------------------------------------------


def test_round7_wave2_no_cartesians(spark):
    """Blanket gate for the wave: no data-sized cartesian anywhere (1-row
    broadcast stats crossJoins plan BroadcastNestedLoopJoin, allowed)."""
    for name in (
        "text_ngram_novelty",
        "text_js_divergence_sources",
        "text_term_burstiness",
        "orders_discount_uplift",
        "orders_basket_size_histogram",
        "dq_benford_audit",
        "events_user_entropy",
        "dedup_common_prefix",
        "retrieval_map_eval",
        "graph_assortativity",
    ):
        df = QUERIES[name](spark, SF_SMOKE)
        assert "CartesianProduct" not in explain_str(df), name


def test_snapshot_diff_is_one_scan(spark):
    """Both snapshot counts ride ONE conditional aggregate — one scan,
    no self-join, no second pass."""
    df = QUERIES["pipeline_snapshot_diff"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan[:1500]
    assert "Join" not in plan, plan[:1500]
    assert_read_schema_pruned(df, max_columns=3)


def test_common_prefix_is_exact_dedup_shape(spark):
    """Prefix dedup never enumerates pairs: one scan, hash aggregate on
    the prefix key, TakeOrdered top-N."""
    df = QUERIES["dedup_common_prefix"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan[:1500]
    assert "Join" not in plan, plan[:1500]
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert_read_schema_pruned(df, max_columns=2)


def test_jsd_sources_joins_on_token_take_ordered(spark):
    """The JSD pair stage is a token-keyed equi-join (never all-pairs of
    rows); per-source totals broadcast; top-N is TakeOrdered."""
    df = QUERIES["text_js_divergence_sources"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]


def test_novelty_first_occurrence_is_aggregate_not_pairs(spark):
    """First-occurrence novelty joins shingles to a min-aggregate on the
    shingle key — no shingle-pair enumeration, staged shingle frame."""
    df = QUERIES["text_ngram_novelty"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "InMemoryTableScan" in plan, plan[:1500]
    assert "CartesianProduct" not in plan, plan[:1500]


# --------------------------------------------------------------------------
# round-7 wave 3: BFS, range search, latency/freshness analytics
# --------------------------------------------------------------------------


def test_round7_wave3_no_cartesians(spark):
    for name in (
        "graph_bfs_hops",
        "orders_ship_latency",
        "dq_freshness_lag",
        "events_funnel_latency",
        "emb_similarity_histogram",
    ):
        df = QUERIES[name](spark, SF_SMOKE)
        assert "CartesianProduct" not in explain_str(df), name


def test_funnel_latency_is_one_scan(spark):
    """All three first-stage timestamps ride ONE conditional aggregate."""
    df = QUERIES["events_funnel_latency"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") <= 2, plan[:1500]
    assert "Join" not in plan, plan[:1500]


def test_similarity_histogram_pairs_by_equi_join(spark):
    """The pair sample joins on vec_id + 1 — an equi-join, never the N²
    nested loop; wide embedding columns stay out of Exchanges (meta-gate
    double-checks registry-wide)."""
    df = QUERIES["emb_similarity_histogram"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_range_search_prunes_query_side(spark):
    """The stride filter reaches the query-side scan (PushedFilters), so
    the pair space is |Q|·N, not N²."""
    df = QUERIES["sim_range_search"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan or "vec_id" in plan, plan[:1500]
    assert "PushedFilters" in plan, plan[:1500]


# --------------------------------------------------------------------------
# round-7 wave 4: AMS, modularity, reconciliation, k-fold
# --------------------------------------------------------------------------


def test_round7_wave4_no_cartesians(spark):
    for name in (
        "graph_modularity",
        "sketch_ams_f2",
        "dq_total_reconciliation",
        "pipeline_kfold_split",
    ):
        df = QUERIES[name](spark, SF_SMOKE)
        assert "CartesianProduct" not in explain_str(df), name


def test_kfold_split_is_one_scan(spark):
    df = QUERIES["pipeline_kfold_split"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") <= 2, plan[:1500]
    assert_read_schema_pruned(df, max_columns=2)


# --------------------------------------------------------------------------
# round-7 wave 5: concentration/cadence analytics, SQL surface, sketches
# --------------------------------------------------------------------------

_W5_NAMES = (
    "events_bounce_rate",
    "events_autocorr_daily",
    "events_value_drawdown",
    "orders_pareto_share",
    "orders_churn_risk",
    "orders_mom_growth",
    "dq_iqr_outliers",
    "scalar_bitwise_funcs",
    "agg_filtered_aggregates",
    "set_ops_all",
    "sketch_linear_counting",
    "retrieval_pr_at_k",
    "dedup_passage_containment",
)


def test_round7_wave5_no_cartesians(spark):
    """Blanket gate for the wave: no data-sized cartesian anywhere (1-row
    broadcast stat frames plan as BNLJ, which the gate allows)."""
    for name in _W5_NAMES:
        df = QUERIES[name](spark, SF_SMOKE)
        assert "CartesianProduct" not in explain_str(df), name


def test_bitwise_scan_prunes_to_two_columns(spark):
    """Pure scalar query: the parquet scan must read exactly the two key
    columns, everything else codegen."""
    df = QUERIES["scalar_bitwise_funcs"](spark, SF_SMOKE)
    assert_read_schema_pruned(df, max_columns=2)
    assert_wholestage_codegen(df)


def test_filtered_aggregates_single_scan(spark):
    """FILTER-clause aggregates must stay ONE grouped pass over one scan —
    the entire point of the clause vs N filtered scans."""
    df = QUERIES["agg_filtered_aggregates"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan[:1500]


def test_set_ops_all_pushes_split_predicate(spark):
    """Both legs must push the shipdate split to the parquet scan."""
    df = QUERIES["set_ops_all"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan
    assert "CartesianProduct" not in plan


def test_churn_and_mom_windows_are_bounded(spark):
    """orders_churn_risk is window-free; orders_mom_growth's lone
    unpartitioned window runs on the post-aggregate month frame (bounded
    by the calendar), which the single-partition meta-gate exempts only
    because the aggregate precedes it — assert that shape (an Aggregate
    below the Window in the optimized plan)."""
    churn = QUERIES["orders_churn_risk"](spark, SF_SMOKE)
    assert "Window" not in explain_str(churn, "simple")
    mom = QUERIES["orders_mom_growth"](spark, SF_SMOKE)
    opt = mom._jdf.queryExecution().optimizedPlan().toString()
    assert opt.index("Window") < opt.index("Aggregate")


def test_pareto_rank_has_no_global_sort_of_customers(spark):
    """The customer frame must reach its rank via two_phase_rank's
    level-offset join, never a rangepartitioning Exchange."""
    df = QUERIES["orders_pareto_share"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "rangepartitioning" not in plan.lower().replace(" ", ""), plan[:2000]


def test_linear_counting_single_scan_grouping_sets(spark):
    """Per-type and merged scopes must come from ONE scan (Expand), not a
    union of two aggregates."""
    df = QUERIES["sketch_linear_counting"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan[:1500]
    assert "Expand" in plan


def test_passage_containment_text_never_shuffles(spark):
    """The wide text column must die in the map stage: no Exchange row
    carries `text` (the window-hash frame is (doc_id, whash) only)."""
    df = QUERIES["dedup_passage_containment"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line
