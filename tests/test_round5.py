"""Round-5 properties: the bounded query-batch ANN path, the two-phase
global ranks that replaced the round-4 single-partition windows, and the
RRF leg cap.

The batch-union law is the contract that makes ``query_batch`` a real
production path instead of an API ornament: per-query ANN results are
independent, so running the query set in bounded batches and unioning must
reproduce the full run byte-for-byte.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.queries.similarity import (
    QUERY_STRIDE,
    query_admission,
)
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _query_ids(spark):
    return [
        r.vec_id
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .select("vec_id")
        .orderBy("vec_id")
        .collect()
    ]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# sim_topk_bruteforce is the cheapest leg and sim_ivfpq_residual_topk the
# most composite — if the law holds at both ends it holds for the family
# (every member admits queries through the same query_admission helper).
@pytest.mark.parametrize(
    "name",
    ["sim_topk_bruteforce", "sim_sq_topk", "sim_ivfpq_residual_topk"],
)
def test_ann_batched_union_equals_full_run(spark, name):
    """Splitting the query set into two bounded batches and unioning the
    per-batch results must equal the full (default stride) run."""
    ids = _query_ids(spark)
    assert len(ids) >= 2, "smoke corpus must yield at least 2 query ids"
    mid = len(ids) // 2
    fn = QUERIES[name]
    full = _rows(fn(spark, SF_SMOKE))
    spark.catalog.clearCache()
    part1 = _rows(fn(spark, SF_SMOKE, query_batch=ids[:mid]))
    spark.catalog.clearCache()
    part2 = _rows(fn(spark, SF_SMOKE, query_batch=ids[mid:]))
    assert sorted(part1 + part2) == full


def test_query_admission_modes(spark):
    """The helper's two modes: default = the stride slice; explicit batch =
    stride ∩ batch; empty batch is rejected (a silent empty broadcast would
    score nothing and look like a recall bug)."""
    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id")
    ids = _query_ids(spark)
    assert [r.vec_id for r in query_admission(emb).orderBy("vec_id").collect()] == ids
    got = query_admission(emb, query_batch=ids[:1] + [ids[0] + 1]).collect()
    # the off-stride id (ids[0]+1) must NOT slip in through the batch
    assert [r.vec_id for r in got] == ids[:1]
    with pytest.raises(ValueError):
        query_admission(emb, query_batch=[])


def test_importance_resample_two_phase_rank_matches_window(spark):
    """The round-5 two-phase sel_rank (level offsets + within-level rank)
    must equal a direct global row_number over (iw desc, doc_id) — the
    formulation the DuckDB oracle still uses."""
    from pyspark.sql import Window

    out = QUERIES["pipeline_importance_resample"](spark, SF_SMOKE).select(
        "doc_id", "iw", "sel_rank"
    )
    w = Window.orderBy(F.col("iw").desc(), F.col("doc_id"))
    direct = out.select(
        "doc_id", F.row_number().over(w).alias("expect_rank")
    )
    diff = (
        out.join(direct, "doc_id")
        .filter(F.col("sel_rank") != F.col("expect_rank"))
        .count()
    )
    assert diff == 0


def test_vocab_growth_prefix_sums_are_monotone_and_total(spark):
    """The sharded prefix sums must end at the global totals and be
    strictly monotone in doc_id order (cum_tokens strictly — every doc has
    ≥1 token; vocab_size weakly)."""
    out = (
        QUERIES["text_vocab_growth"](spark, SF_SMOKE)
        .orderBy("doc_id")
        .collect()
    )
    toks = [r.cum_tokens for r in out]
    vocab = [r.vocab_size for r in out]
    assert all(b > a for a, b in zip(toks, toks[1:]))
    assert all(b >= a for a, b in zip(vocab, vocab[1:]))
    # the last cumulative row IS the corpus total
    # align with the query's tokenizer (queries/text.py::_TOKS): totals must
    # match the corpus-wide token count and distinct-lowercase-token count
    from kafka_streams_join_spark.queries.text import _TOKS

    tok = load_table(spark, SF_SMOKE, "documents").select(
        F.explode(F.expr(_TOKS)).alias("t")
    )
    total_toks = tok.count()
    total_vocab = tok.select(F.lower("t").alias("t")).distinct().count()
    assert toks[-1] == total_toks
    assert vocab[-1] == total_vocab


# ---------------------------------------------------------------------------
# round-5 widening batch: semantic properties at smoke scale
# ---------------------------------------------------------------------------


def test_hard_negatives_cross_label_only(spark):
    """Every mined negative must carry a label different from its query's,
    and ranks run 1..K per query with cosine in [-1, 1]."""
    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "label")
    out = QUERIES["sim_hard_negatives"](spark, SF_SMOKE)
    q = emb.select(F.col("vec_id").alias("query_id"), F.col("label").alias("ql"))
    n = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nl"))
    joined = out.join(q, "query_id").join(n, "neighbor_id").collect()
    assert joined, "hard negatives must produce rows"
    for r in joined:
        assert r.ql != r.nl
        assert 1 <= r.rnk <= 3
        assert -1.0001 <= r.cos <= 1.0001


def test_oov_rate_arithmetic_and_bounds(spark):
    rows = QUERIES["text_oov_rate"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert r.oov_ppm == r.n_oov * 1_000_000 // r.n_tokens


def test_readability_recomputes_from_integer_sums(spark):
    rows = QUERIES["text_readability"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.sum_words > 0 and r.sum_sents > 0 and r.sum_syll > 0
        expect = round(
            206.835
            - 1.015 * (r.sum_words / r.sum_sents)
            - 84.6 * (r.sum_syll / r.sum_words),
            2,
        )
        assert abs(r.flesch - expect) < 1e-9


def test_length_histogram_shares_sum_per_source(spark):
    rows = QUERIES["corpus_length_histogram"](spark, SF_SMOKE).collect()
    from collections import defaultdict

    per_src = defaultdict(lambda: [0, 0])
    for r in rows:
        per_src[r.source][0] += r.n
        per_src[r.source][1] += r.share_ppm
    docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(v[0] for v in per_src.values()) == docs
    for src, (_, ppm) in per_src.items():
        # floor-division shares undershoot by < n_buckets ppm
        assert 1_000_000 - len(rows) <= ppm <= 1_000_000, (src, ppm)


def test_anomaly_flag_consistent_with_zscore(spark):
    rows = QUERIES["events_anomaly_zscore"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r.is_anomaly:
            assert abs(r.zscore) >= 1.9995  # flag uses the unrounded z
        else:
            assert abs(r.zscore) <= 2.0005


def test_path_trigrams_shape(spark):
    rows = QUERIES["events_path_trigrams"](spark, SF_SMOKE).collect()
    assert rows
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert r.path.count(">") == 2
        assert r.n >= 1


def test_label_outliers_are_tail_events(spark):
    out = QUERIES["emb_label_outliers"](spark, SF_SMOKE)
    total = load_table(spark, SF_SMOKE, "embeddings").count()
    rows = out.collect()
    # a z>=2 one-sided tail is a small minority by Chebyshev (<= 25%)
    assert 0 < len(rows) <= total // 4
    for r in rows:
        assert r.zscore >= 1.9995


def test_copurchase_pairs_ordered_and_lift_positive(spark):
    rows = QUERIES["orders_copurchase_lift"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.part_a < r.part_b
        assert r.co >= 1
        assert r.lift_ppm > 0


def test_curriculum_rank_is_permutation_and_monotone(spark):
    rows = sorted(
        QUERIES["pipeline_curriculum_order"](spark, SF_SMOKE).collect(),
        key=lambda r: r.curriculum_rank,
    )
    assert [r.curriculum_rank for r in rows] == list(range(1, len(rows) + 1))
    diffs = [r.difficulty for r in rows]
    assert diffs == sorted(diffs)
    assert all(0 <= r.decile <= 9 for r in rows)
    # decile is exact integer arithmetic on the rank
    n = len(rows)
    for r in rows:
        assert r.decile == (r.curriculum_rank - 1) * 10 // n


def test_band_recall_audit_set_algebra(spark):
    row = QUERIES["dedup_band_recall_audit"](spark, SF_SMOKE).collect()[0]
    assert row.n_hit <= min(row.n_true, row.n_lsh)
    # both legs verify at the same Jaccard threshold over the same shingle
    # contract, so every LSH-verified pair IS a true pair (precision 1.0)
    assert row.n_hit == row.n_lsh
    if row.n_lsh:
        assert row.precision_ppm == 1_000_000


def test_knn_label_accuracy_bounds(spark):
    rows = QUERIES["sim_knn_label_accuracy"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_agree <= r.n_queries
        assert r.acc_ppm == r.n_agree * 1_000_000 // r.n_queries


def test_zipf_slope_is_negative_power_law(spark):
    row = QUERIES["text_zipf_slope"](spark, SF_SMOKE).collect()[0]
    # rank-frequency over any natural-ish corpus slopes downward
    assert row.zipf_slope < 0
    assert row.n > 10


def test_rfm_segment_string_matches_flags(spark):
    rows = QUERIES["events_rfm_segments"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        expect = (
            ("R" if r.r_hot else "-")
            + ("F" if r.f_hot else "-")
            + ("M" if r.m_hot else "-")
        )
        assert r.segment == expect
        assert r.recency_days >= 0 and r.frequency >= 1


def test_power_user_share_bounds(spark):
    row = QUERIES["events_power_user_share"](spark, SF_SMOKE).collect()[0]
    assert row.top_decile_events <= row.total_events
    # the selected users are the MOST active, so their event share is at
    # least their user-count share (average argument); the selection is
    # rank*10 <= n_users, i.e. floor(n_users/10) users
    selected = row.n_users // 10
    assert selected >= 1
    assert row.top_decile_events * row.n_users >= selected * row.total_events
    assert row.top_decile_share_ppm <= 1_000_000


def test_mixture_temperature_flattens_the_head(spark):
    rows = QUERIES["pipeline_mixture_temperature"](spark, SF_SMOKE).collect()
    assert rows
    total = sum(r.sample_ppm for r in rows)
    assert 1_000_000 - len(rows) <= total <= 1_000_000
    # temperature < 1 up-weights small sources, down-weights large ones
    big = max(rows, key=lambda r: r.n_chars)
    small = min(rows, key=lambda r: r.n_chars)
    if big.n_chars > small.n_chars:
        assert big.sample_ppm <= big.natural_ppm
        assert small.sample_ppm >= small.natural_ppm


def test_keep_longest_agrees_with_canonical_clusters(spark):
    """Keep-best and canonical share the same transitive clusters — only
    the keep rule differs: keeper has the max length in its cluster (tie
    min id), exactly one keeper per cluster, and singletons keep."""
    best = {
        r.doc_id: r
        for r in QUERIES["dedup_keep_longest"](spark, SF_SMOKE).collect()
    }
    canon = {
        r.doc_id: r.canonical_id
        for r in QUERIES["dedup_cluster_canonical"](spark, SF_SMOKE).collect()
    }
    assert set(best) == set(canon)
    # identical cluster partitions (cluster_id == canonical min-id label)
    for d, r in best.items():
        assert r.cluster_id == canon[d]
    from collections import defaultdict

    lens = {
        r.doc_id: r.n_chars
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    clusters = defaultdict(list)
    for d, r in best.items():
        clusters[r.cluster_id].append(d)
    for cid, members in clusters.items():
        keepers = {best[d].keeper_id for d in members}
        assert len(keepers) == 1
        keeper = keepers.pop()
        expect = min(members, key=lambda d: (-lens[d], d))
        assert keeper == expect
        assert sum(best[d].kept for d in members) == 1


def test_lang_confusion_mass_and_diag(spark):
    rows = QUERIES["text_lang_confusion"](spark, SF_SMOKE).collect()
    assert rows
    docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n for r in rows) == docs
    for r in rows:
        assert r.diag_ppm == (1_000_000 if r.true_lang == r.pred_lang else 0)


def test_dataset_card_recomputes(spark):
    row = QUERIES["pipeline_dataset_card"](spark, SF_SMOKE).collect()[0]
    doc = load_table(spark, SF_SMOKE, "documents")
    assert row.n_docs == doc.count()
    assert row.n_sources == doc.select("source").distinct().count()
    assert row.mean_chars == row.total_chars // row.n_docs
    assert 0 <= row.exact_dup_ppm < 1_000_000
    # the head source holds at least its proportional share
    assert row.top_source_ppm * row.n_sources >= 1_000_000 - row.n_sources


def test_pagerank_integer_fixpoint_properties(spark):
    """Every node's rank is at least the teleport mass; ranks stay within
    the total start mass (floor divisions only lose mass, never create
    it); higher-degree hubs outrank leaves on average."""
    from kafka_streams_join_spark.queries.graph import PR_BASE, PR_START

    rows = QUERIES["graph_pagerank_parts"](spark, SF_SMOKE).collect()
    assert rows
    total = sum(r.rank_nano for r in rows)
    assert all(r.rank_nano >= PR_BASE for r in rows)
    assert total <= len(rows) * PR_START
    assert total >= len(rows) * PR_BASE


def test_ewma_recursion_exact(spark):
    """Replay the published recursion per type: ewma_i =
    (n_i + 3·ewma_{i−1}) div 4, seeded with day 1."""
    from collections import defaultdict

    rows = QUERIES["events_daily_ewma"](spark, SF_SMOKE).collect()
    assert rows
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r.day)
        e = rs[0].n
        assert rs[0].ewma == e
        for r in rs[1:]:
            e = (r.n + 3 * e) // 4
            assert r.ewma == e
            assert r.dev_ppm == abs(r.n - r.ewma) * 1_000_000 // max(1, r.ewma)


def test_repeat_epochs_arithmetic_and_cap(spark):
    rows = QUERIES["pipeline_repeat_epochs"](spark, SF_SMOKE).collect()
    assert rows
    total_tokens = sum(r.n_tokens for r in rows)
    for r in rows:
        expect_target = total_tokens * 3 * r.share_ppm // 1_000_000
        assert r.target_tokens == expect_target
        raw = expect_target * 1000 // r.n_tokens
        assert r.epochs_milli == min(raw, 8_000)
        assert r.capped == (1 if raw > 8_000 else 0)
    # a 3x budget with temperature flattening must push at least one small
    # source above 3 epochs-equivalent (3000 milli)
    assert any(r.epochs_milli > 3000 for r in rows)


def test_two_phase_rank_randomized_vs_direct_window(spark):
    """Property (hypothesis-driven): for ANY (level, id) frame — duplicate
    levels, negative values, NULL levels, both directions — two_phase_rank
    equals the direct global row_number with Spark's null ordering. Runs
    the hypothesis loop over locally generated cases and checks each
    against a pure-Python reference (one Spark job per case is too slow
    for @given, so cases are drawn once here)."""
    import random

    from kafka_streams_join_spark.operators.ranking import two_phase_rank

    rng = random.Random(20260814)
    for trial in range(6):
        n = rng.randint(1, 40)
        rows = []
        for i in range(n):
            lvl = rng.choice([None] + [round(rng.uniform(-2, 2), 1) for _ in range(3)])
            rows.append((i, lvl))
        for ascending in (True, False):
            df = spark.createDataFrame(rows, "id long, lvl double")
            got = {
                r.id: r.rank
                for r in two_phase_rank(
                    df, level_col="lvl", id_col="id",
                    rank_col="rank", ascending=ascending,
                    # this property deliberately exercises the Spark-only
                    # NULL-level placement (round-7 guard opt-out)
                    allow_null_levels=True,
                ).collect()
            }
            # Spark null ordering: NULLS FIRST ascending, NULLS LAST desc
            def key(row):
                i, lvl = row
                if ascending:
                    return (0 if lvl is None else 1, lvl if lvl is not None else 0.0, i)
                return (0 if lvl is not None else 1, -(lvl if lvl is not None else 0.0), i)

            expect = {
                row[0]: k + 1 for k, row in enumerate(sorted(rows, key=key))
            }
            assert got == expect, (trial, ascending, rows, got, expect)


def test_two_phase_rank_null_level_fails_loudly_by_default(spark):
    """Round-7 guard (ADVICE r6): a NULL level under the default contract
    raises at run time instead of silently diverging from a DuckDB
    oracle's NULLS LAST ordering; non-null frames are untouched."""
    import pytest

    from kafka_streams_join_spark.operators.ranking import two_phase_rank

    df = spark.createDataFrame([(1, 2.0), (2, None)], "id long, lvl double")
    with pytest.raises(Exception, match="NULL-ordering contract"):
        two_phase_rank(df, level_col="lvl", id_col="id").collect()
    ok = spark.createDataFrame([(1, 2.0), (2, 1.0)], "id long, lvl double")
    ranks = {
        r.id: r.rank
        for r in two_phase_rank(ok, level_col="lvl", id_col="id").collect()
    }
    assert ranks == {2: 1, 1: 2}


def test_dedup_tier_report_orders_and_recomputes(spark):
    """The two containment theorems hold and the ppm arithmetic is exact:
    every byte-identical pair is (a) normalization-identical and (b)
    shares all shingles, hence clusters — so exact removes ≤ either looser
    tier. (normalized ≤ neardup is NOT asserted: the normalizer lowercases
    but shingles are case-sensitive, so a case-only twin is a
    normalization dup yet may share no shingle.)"""
    rows = {r.tier: r for r in QUERIES["dedup_tier_report"](spark, SF_SMOKE).collect()}
    # round 6 added the semantic tier (embedding-corpus removal rate)
    assert set(rows) == {"exact", "normalized", "neardup_cluster", "semantic"}
    for r in rows.values():
        assert r.survivors + r.removed == r.n_docs
        assert r.removed_ppm == r.removed * 1_000_000 // r.n_docs
    assert rows["exact"].removed <= rows["normalized"].removed
    assert rows["exact"].removed <= rows["neardup_cluster"].removed


def test_interarrival_stats_ordered(spark):
    rows = QUERIES["events_interarrival_stats"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.min_gap_s <= r.median_gap_s <= r.p95_gap_s <= r.max_gap_s
        assert r.min_gap_s >= 0 and r.n_gaps >= 1


def test_centroid_drift_triangle_bound(spark):
    """||ca − cb|| ≤ ||ca|| + ||cb|| (triangle inequality on the rounded
    values, with rounding slack)."""
    rows = QUERIES["emb_centroid_drift"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.shift_l2 <= r.norm_a + r.norm_b + 1e-5
        assert r.shift_l2 >= 0


def test_split_leakage_audit_consistency(spark):
    row = QUERIES["pipeline_split_leakage_audit"](spark, SF_SMOKE).collect()[0]
    assert 0 <= row.n_leaking <= row.n_pairs
    assert 0 <= row.n_test_docs_leaked <= row.n_test
    # a leaked test doc requires at least one straddling pair
    if row.n_test_docs_leaked:
        assert row.n_leaking >= 1
    assert row.test_leak_ppm == row.n_test_docs_leaked * 1_000_000 // max(
        1, row.n_test
    )


def test_kwic_context_windows(spark):
    """Every concordance row: the term matches, contexts are ≤3 tokens,
    and re-slicing the document at pos reproduces them."""
    rows = QUERIES["text_keyword_in_context"](spark, SF_SMOKE).collect()
    assert rows
    docs = {
        r.doc_id: r.toks
        for r in load_table(spark, SF_SMOKE, "documents")
        .selectExpr(
            "doc_id",
            "transform(split(regexp_replace(trim(text), '\\\\s+', ' '), ' '),"
            " t -> lower(t)) as toks",
        )
        .collect()
    }
    for r in rows:
        toks = docs[r.doc_id]
        i = r.pos - 1
        assert toks[i] == r.term
        assert r.left_ctx == " ".join(toks[max(0, i - 3):i])
        assert r.right_ctx == " ".join(toks[i + 1:min(len(toks), i + 4)])


def test_window_dist_functions_bounds(spark):
    rows = QUERIES["window_dist_functions"](spark, SF_SMOKE).collect()
    assert rows
    from collections import defaultdict

    per_type = defaultdict(list)
    for r in rows:
        assert 0.0 <= r.pct_rank <= 1.0
        assert 0.0 < r.cume <= 1.0
        assert 1 <= r.quartile <= 4
        per_type[r.event_type].append(r)
    for rs in per_type.values():
        # quartiles split near-evenly: sizes differ by at most 1
        sizes = [sum(1 for r in rs if r.quartile == q) for q in (1, 2, 3, 4)]
        assert max(sizes) - min(sizes) <= 1


def test_mode_per_key_is_true_argmax(spark):
    from collections import Counter, defaultdict

    got = {
        r.user_id: (r.modal_type, r.modal_n)
        for r in QUERIES["agg_mode_per_key"](spark, SF_SMOKE).collect()
    }
    counts = defaultdict(Counter)
    for r in (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type")
        .collect()
    ):
        counts[r.user_id][r.event_type] += 1
    assert set(got) == set(counts)
    for u, (t, n) in got.items():
        best = min(counts[u].items(), key=lambda kv: (-kv[1], kv[0]))
        assert (t, n) == (best[0], best[1])


def test_audience_overlap_set_algebra(spark):
    rows = QUERIES["events_audience_overlap"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b
        assert r.n_both <= min(r.n_a, r.n_b)
        assert r.jaccard_ppm == r.n_both * 1_000_000 // (r.n_a + r.n_b - r.n_both)
