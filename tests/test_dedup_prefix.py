"""PPJoin-style prefix filtering: losslessness vs the DF-cap variant,
candidate-stage size reduction, and plan gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_join_spark.plans.inspect import assert_no_wide_shuffle
from tests.conftest import SF_SMOKE


def test_prefix_filter_result_identical_to_jaccard(spark):
    """Prefix filtering is LOSSLESS (a theorem, not a contract): the
    result set must be byte-identical to dedup_ngram_jaccard's."""
    from kafka_streams_join_spark.queries.dedup import dedup_ngram_jaccard
    from kafka_streams_join_spark.queries.dedup_prefix import (
        dedup_ngram_prefix_filter,
    )

    pf = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup_ngram_prefix_filter(spark, SF_SMOKE).collect()
    }
    jc = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup_ngram_jaccard(spark, SF_SMOKE).collect()
    }
    assert pf == jc
    assert pf  # non-vacuous: the corpus has near-dup pairs


def test_prefix_index_is_fraction_of_full_index(spark):
    """The point of the filter: with tau=0.8 each doc indexes
    n - ceil(0.8 n) + 1 ~ n/5 + 1 shingles. Assert the prefix index is
    under 40% of the full index (loose bound: small docs pay the +1)."""
    from kafka_streams_join_spark.queries.dedup_prefix import (
        _TAU_DEN,
        _TAU_NUM,
    )
    from kafka_streams_join_spark.queries.dedup import _SHINGLE_ARRAY
    from kafka_streams_join_spark.queries.text import _TOKS
    from kafka_streams_join_spark.sources.parquet import load_table

    doc = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.expr(_TOKS).alias("toks")
    )
    sizes = (
        doc.select("doc_id", F.explode(F.expr(_SHINGLE_ARRAY)).alias("s"))
        .groupBy("doc_id")
        .agg(F.size(F.collect_set("s")).alias("n"))
        .collect()
    )
    full = sum(r["n"] for r in sizes)
    prefix = sum(
        r["n"] - ((r["n"] * _TAU_NUM + (_TAU_DEN - 1)) // _TAU_DEN) + 1
        for r in sizes
    )
    assert prefix / full < 0.4


def test_prefix_filter_text_never_shuffles(spark):
    from kafka_streams_join_spark.queries.dedup_prefix import (
        dedup_ngram_prefix_filter,
    )

    df = dedup_ngram_prefix_filter(spark, SF_SMOKE)
    assert_no_wide_shuffle(df, col="text", max_exchanges=0)
    assert_no_wide_shuffle(df, col="toks", max_exchanges=0)


def test_curation_funnel_is_monotone_and_complete(spark):
    """Cumulative gates can only lose docs/tokens; all 7 stages present;
    stage 1 equals the corpus size."""
    from kafka_streams_join_spark.queries.curation_funnel import (
        pipeline_curation_funnel,
    )
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = sorted(
        pipeline_curation_funnel(spark, SF_SMOKE).collect(),
        key=lambda r: r["stage_ord"],
    )
    assert [r["stage_ord"] for r in rows] == list(range(1, 8))
    docs = [r["n_docs"] for r in rows]
    toks = [r["n_tokens"] for r in rows]
    assert all(a >= b for a, b in zip(docs, docs[1:]))
    assert all(a >= b for a, b in zip(toks, toks[1:]))
    assert docs[0] == load_table(spark, SF_SMOKE, "documents").count()
    assert docs[-1] > 0  # the funnel keeps a real corpus
