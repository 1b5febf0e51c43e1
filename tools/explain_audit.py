#!/usr/bin/env python
"""Regenerate EXPLAINS.md: physical-plan evidence for the headline queries.

For each audited query this captures the scale-relevant skeleton of the
formatted plan — scans (with PushedFilters / ReadSchema), joins, aggregates,
exchanges, codegen markers — so the plan properties the tests gate
(tests/test_plans.py) are also visible as a reviewable artifact.

Usage: python tools/explain_audit.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_join_spark.plans import explain_str  # noqa: E402
from kafka_streams_join_spark.queries import QUERIES  # noqa: E402
from kafka_streams_join_spark.session import get_spark  # noqa: E402

AUDITED = [
    ("j1_interval_join_inner", "flagship interval equi-join (equi key + time band)"),
    ("j3_missed_anti", "absence detection as left-anti"),
    ("agg_pricing_summary", "partial+final hash aggregate"),
    ("window_topk_per_group", "rank-window top-k (single shuffle)"),
    ("sort_topk_limit", "global top-k via TakeOrderedAndProject"),
    ("join_star_revenue", "star join, all dims broadcast"),
    ("tpch_q6_revenue_forecast", "banded scan-aggregate, full pushdown"),
    ("tpch_q18_large_volume", "HAVING subquery → broadcast semi join"),
    ("dedup_minhash_lsh", "MinHash+LSH: map-side signatures, band self-join"),
    ("dedup_simhash", "multi-index Hamming probe equi-join (no nested loop)"),
    ("sim_lsh_ann_topk", "bucket-pruned ANN + per-bucket GEMM"),
    ("pipeline_chunk_documents", "zero-Exchange narrow chunking"),
    ("pipeline_decontaminate", "benchmark shingle dict broadcast, map-side probe"),
    ("tpch_q21_suppliers_kept_waiting", "double-EXISTS decorrelated to one per-order agg"),
    ("tpch_q8_market_share", "one fact-fact shuffle + five broadcast dims"),
    # round 3
    ("dedup_ngram_jaccard", "staged shingle sets: one corpus scan, fanned consumers"),
    ("text_repetition_stats", "zero-shuffle row-local repetition fractions (r4 rework)"),
    ("text_pii_scrub", "zero-Exchange codegen'd scrub projection"),
    ("cluster_kmeans_embeddings", "broadcast-codebook Lloyd assignment (no corpus shuffle)"),
    ("sim_pq_topk", "PQ/ADC: broadcast LUT scoring join, integer distances"),
    ("dedup_ngram_containment", "asymmetric containment over the shared candidate stage"),
    ("pipeline_domain_mix", "map-side integer keep decision, one partial+final agg"),
    # round 4
    ("dedup_duplicate_passages", "map-side window hashes; text never shuffles; island merge"),
    ("text_remove_duplicate_passages", "row-local span cut; broadcast span side, doc side map-side"),
    ("dedup_semantic", "k-means cell blocking + per-cell equi-joined GEMM verify"),
    ("sim_ivfpq_topk", "cell-pruned ADC: broadcast LUT, no wide shuffle"),
    ("sim_ivfpq_residual_topk", "residual IVFADC: one wide index-build Exchange only"),
    # round 4b: retrieval & data selection
    ("sim_sq_topk", "int8 SQ ANN: broadcast query codes, WindowGroupLimit top-k"),
    ("text_bm25_search", "BM25: map-side term filter, broadcast df/stats"),
    ("pipeline_importance_resample", "DSIR: B-row LM tables broadcast, one doc_id shuffle"),
    ("quality_classifier_logreg", "logreg GD: broadcast model, 4-cell gradient aggregates"),
    ("dedup_ngram_prefix_filter", "PPJoin prefix index: lossless candidate bound, narrow shuffles"),
    ("layout_zorder_key", "z-order keys: stats broadcast, no data repartition"),
    ("text_bpe_merge_mining", "BPE rounds on the vocab: corpus scanned once"),
    ("events_funnel_conversion", "funnel: pushed type filters, narrow user_id joins"),
    ("events_cohort_retention", "cohort matrix: one signup shuffle, broadcast sizes"),
    ("dq_constraint_checks", "union'd audit: anti-join FKs, single-agg uniqueness"),
    ("pipeline_curation_funnel", "7-gate funnel: row-local flags, bounded pair stage"),
    ("dedup_incremental_minhash", "batch-vs-base probe: band-index equi-join, candidate-only verify"),
    ("pipeline_global_shuffle", "training-order shuffle: one hash Exchange, per-shard sort"),
    ("text_bigram_surprisal", "bigram LM: key-bounded (w1,w2) shuffles, text never moves"),
    ("dedup_fuzzy_edit_distance", "edit-distance dedup: segment blocking, threshold Levenshtein verify"),
    ("text_char_entropy", "char-entropy gate: zero-shuffle ordered-fold projection"),
    ("pipeline_group_holdout_split", "group-holdout split: map-side key hash, one rollup Exchange"),
    ("retrieval_hybrid_rrf", "RRF fusion: one staged token scan feeds both rankers"),
    ("dq_table_profile", "ANALYZE profile: one Expand scan, not 6 union'd scans"),
    ("pipeline_token_budget_plan", "mixture planning: one rollup, 1-row broadcast, all-integer"),
    ("events_markov_transitions", "transition matrix: one user shuffle, vocab-sized normalize"),
    ("text_pmi_collocations", "PMI collocations: Zipf-bounded counts, floor-filtered rank"),
    ("agg_incremental_merge", "IVM merge: staged split scan, group-key-sized certification"),
    ("sim_recall_report", "ANN recall audit: both legs as registered, result-sized join"),
    ("dedup_normalized_exact", "normalized exact dedup: row-local chain, aggregate-only plan"),
    ("layout_compaction_plan", "compaction planning: per-partition window, no global sort"),
    ("sketch_countmin_point_error", "Count-Min heavy-hitter audit: sketch built from aggregated counts, broadcast point queries"),
    ("sketch_histogram_quantiles", "frozen-domain histogram quantiles: bounded value-domain windows only"),
    ("mm_resize_decoded", "decode + NN-resize thumbnail: row-local mapInPandas, zero Exchange"),
]

# Round 5: the audit covers the WHOLE registry. Any registered query not
# curated above is appended with its docstring headline as the blurb, so a
# new registration can never silently miss the audit again (the round-4
# coverage gap was exactly this — curated-list drift).
_curated = {n for n, _ in AUDITED}
AUDITED += [
    (
        n,
        ((QUERIES[n].__doc__ or "").strip().splitlines() or ["registered query"])[
            0
        ].rstrip("."),
    )
    for n in sorted(QUERIES)
    if n not in _curated
]

# plan lines worth showing: node heads and the pushdown/pruning facts
_KEEP = re.compile(
    r"^\s*(\(\d+\)|\+-|:-|PushedFilters:|ReadSchema:|Arguments:)|"
    r"(Scan parquet|Join|HashAggregate|Exchange|TakeOrdered|Window|Sort |"
    r"ArrowEvalPython|MapInPandas|Generate|Expand|WholeStageCodegen)"
)
_NODE = re.compile(
    r"Scan parquet|SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct|HashAggregate|ObjectHashAggregate|"
    r"SortAggregate|Exchange|BroadcastExchange|TakeOrderedAndProject|Window|"
    r"Expand|Generate|MapInPandas|PushedFilters: \[[^\]]*\]|ReadSchema: \S+"
)


def skeleton(plan: str, max_lines: int = 40) -> list[str]:
    out: list[str] = []
    for line in plan.splitlines():
        m = _NODE.search(line)
        if not m:
            continue
        frag = m.group(0)
        # count duplicates compactly rather than repeating
        if out and out[-1].startswith(frag):
            base, _, n = out[-1].partition(" ×")
            if base == frag:
                out[-1] = f"{frag} ×{int(n or 1) + 1}"
                continue
        out.append(frag)
        if len(out) >= max_lines:
            out.append("…")
            break
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain_audit")
    lines = [
        "# EXPLAINS — physical-plan audit of the headline queries",
        "",
        f"Generated by `tools/explain_audit.py` on `{sf_dir}`. Each section is the",
        "scale-relevant skeleton of `df.explain(\"formatted\")` — scans with their",
        "pushed filters and read schemas, join/aggregate/exchange nodes in plan",
        "order. The properties shown here are gated by `tests/test_plans.py`;",
        "this file is the reviewable evidence.",
        "",
    ]
    for name, why in AUDITED:
        plan = explain_str(QUERIES[name](spark, sf_dir))
        lines += [f"## {name}", "", f"_{why}_", "", "```"]
        lines += skeleton(plan)
        lines += ["```", ""]
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAINS.md"
    )
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path} ({len(lines)} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
