"""Round-4b retrieval/data-selection operators: plan gates + semantic
floors. Oracle parity itself is covered by test_oracle_parity.py's sweep;
these tests pin the SCALE claims (what shuffles, what broadcasts) and the
semantic quality floors that the hash oracle cannot express."""

from __future__ import annotations

from kafka_streams_join_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_wide_shuffle,
    explain_str,
)
from tests.conftest import SF_SMOKE


def test_sq_topk_codes_never_shuffle(spark):
    """The int8 code arrays are broadcast (query side) or stay in the scan
    pipeline (corpus side); only narrow (q_id, vec_id, idot) rows reach
    the per-query top-k Exchange. The BroadcastNestedLoopJoin is the
    intended bounded-Q scoring plan (see the docstring), so there is no
    no-cartesian gate here — the gate is that nothing wide moves."""
    from kafka_streams_join_spark.queries.retrieval import sim_sq_topk

    df = sim_sq_topk(spark, SF_SMOKE)
    assert_no_wide_shuffle(df, col="embedding", max_exchanges=0)
    assert_no_wide_shuffle(df, col="cc", max_exchanges=0)
    assert_no_wide_shuffle(df, col="qc", max_exchanges=0)
    # note: no codegen gate — the scoring projection is higher-order-function
    # lambdas (zip_with/aggregate), which Spark evaluates outside
    # whole-stage codegen by design; the plan's win is WindowGroupLimit
    # (partial top-k before the narrow Exchange), asserted implicitly by
    # the wide-shuffle gates above.


def test_sq_topk_recall_floor_vs_exact(spark):
    """int8 scalar quantization of unit vectors is nearly lossless (worst
    per-cell error 1/254), so unlike PQ's modest floor the SQ top-5 must
    essentially reproduce the exact top-5. Floor 0.8 leaves room only for
    boundary flips between near-tied neighbors."""
    from kafka_streams_join_spark.queries.retrieval import sim_sq_topk
    from kafka_streams_join_spark.queries.similarity import sim_topk_bruteforce

    sq = {
        (r["q_id"], r["vec_id"])
        for r in sim_sq_topk(spark, SF_SMOKE).collect()
        if r["rnk"] <= 5
    }
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_topk_bruteforce(spark, SF_SMOKE).collect()
    }
    assert len(bf) == 25
    assert len(sq & bf) / len(bf) >= 0.8


def test_tfidf_text_never_shuffles_and_df_broadcasts(spark):
    from kafka_streams_join_spark.queries.retrieval import text_tfidf_topterms

    df = text_tfidf_topterms(spark, SF_SMOKE)
    assert_no_wide_shuffle(df, col="text", max_exchanges=0)
    assert_broadcast_join(df)


def test_bm25_term_filter_is_pushed_into_scan_side(spark):
    """The 3-literal term filter must run map-side BEFORE the tf aggregate
    (only matching tokens shuffle), and document text must never enter an
    Exchange; df/stats broadcast."""
    from kafka_streams_join_spark.queries.retrieval import text_bm25_search

    import re

    df = text_bm25_search(spark, SF_SMOKE)
    assert_no_wide_shuffle(df, col="text", max_exchanges=0)
    assert_broadcast_join(df)
    plan = explain_str(df)
    # the 3-literal IN-filter on token exists as a Filter condition (i.e.
    # applied in the scan pipeline, not reconstructed after a shuffle)
    assert re.search(r"token#\d+ IN \(", plan), plan[:2000]


def test_bm25_ranking_is_rounded_before_rank(spark):
    """The global ranking must be over the ROUNDED score (engine-stable
    ordering contract): re-ranking the collected rows by (bm25 desc,
    doc_id) must reproduce rnk exactly."""
    from kafka_streams_join_spark.queries.retrieval import text_bm25_search

    rows = text_bm25_search(spark, SF_SMOKE).collect()
    assert rows, "BM25 must match at least one document on this corpus"
    ranked = sorted(rows, key=lambda r: (-r["bm25"], r["doc_id"]))
    assert [r["rnk"] for r in ranked] == list(range(1, len(rows) + 1))


def test_dsir_lm_tables_broadcast_and_keep_fraction(spark):
    """Both hashed-LM count tables are B-row aggregates that broadcast;
    document text never shuffles. The ppm keep rule selects exactly
    ceil-free integer fraction: kept count = floor-style ppm bound."""
    from kafka_streams_join_spark.queries.retrieval import (
        _DSIR_KEEP_PPM,
        pipeline_importance_resample,
    )

    df = pipeline_importance_resample(spark, SF_SMOKE)
    assert_no_wide_shuffle(df, col="text", max_exchanges=0)
    assert_broadcast_join(df)
    rows = df.collect()
    n = len(rows)
    kept = [r for r in rows if r["kept"] == 1]
    # rank*1e6 <= n*ppm  ⇒  kept = floor(n * ppm / 1e6)
    assert len(kept) == (n * _DSIR_KEEP_PPM) // 1_000_000
    # the kept set is exactly the top ranks
    assert {r["sel_rank"] for r in kept} == set(range(1, len(kept) + 1))


def test_dsir_weights_favor_target_sources(spark):
    """Semantic floor: documents from the target sources must have a higher
    mean importance weight than the rest — the whole point of DSIR. (Both
    groups share a vocabulary, so the gap is small but must be positive.)"""
    from kafka_streams_join_spark.queries.retrieval import (
        _DSIR_TARGET_SOURCES,
        pipeline_importance_resample,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    w = pipeline_importance_resample(spark, SF_SMOKE)
    src = load_table(spark, SF_SMOKE, "documents").select("doc_id", "source")
    joined = w.join(src, "doc_id").collect()
    tgt = [r["iw"] for r in joined if r["source"] in _DSIR_TARGET_SOURCES]
    rest = [r["iw"] for r in joined if r["source"] not in _DSIR_TARGET_SOURCES]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_weighted_sample_favors_heavy_docs_and_is_deterministic(spark):
    """Efraimidis–Spirakis with weight = n_chars: the sample's mean weight
    must exceed the corpus mean (heavier docs proportionally likelier),
    and a second run must reproduce the sample exactly (hash-seeded u)."""
    from kafka_streams_join_spark.queries.retrieval import (
        _WS_K,
        pipeline_weighted_sample,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = pipeline_weighted_sample(spark, SF_SMOKE).collect()
    assert len(rows) == _WS_K
    sample_mean = sum(r["w"] for r in rows) / len(rows)
    corpus = load_table(spark, SF_SMOKE, "documents").collect()
    corpus_mean = sum(r["n_chars"] for r in corpus) / len(corpus)
    assert sample_mean > corpus_mean
    again = pipeline_weighted_sample(spark, SF_SMOKE).collect()
    assert {(r["rnk"], r["doc_id"]) for r in rows} == {
        (r["rnk"], r["doc_id"]) for r in again
    }
