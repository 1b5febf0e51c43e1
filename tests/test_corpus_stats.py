"""Engagement/corpus statistics: semantic invariants."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_stickiness_bounded_and_wau_covers_dau(spark):
    from kafka_streams_join_spark.queries.corpus_stats import (
        events_dau_wau_stickiness,
    )

    rows = events_dau_wau_stickiness(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["wau"] >= r["dau"] > 0  # a day's actives are in its week
        assert 0 < r["stickiness_ppm"] <= 1_000_000


def test_hourly_shares_sum_to_a_type_total(spark):
    from kafka_streams_join_spark.queries.corpus_stats import (
        events_hourly_seasonality,
    )

    rows = events_hourly_seasonality(spark, SF_SMOKE).collect()
    by_type: dict = {}
    for r in rows:
        assert 0 <= r["hour_of_day"] <= 23
        by_type.setdefault(r["event_type"], []).append(r["share_ppm"])
    for t, shares in by_type.items():
        # floor division loses at most 1 ppm per bucket
        assert 1_000_000 - len(shares) <= sum(shares) <= 1_000_000, t


def test_vocab_growth_is_monotone_and_concave_ish(spark):
    """Heaps-law shape: both curves are non-decreasing, the vocabulary
    never exceeds the tokens consumed, and the final vocab equals the
    corpus's distinct lowercase token count."""
    from pyspark.sql import functions as F

    from kafka_streams_join_spark.queries.corpus_stats import text_vocab_growth
    from kafka_streams_join_spark.queries.text import _TOKS
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = sorted(
        text_vocab_growth(spark, SF_SMOKE).collect(), key=lambda r: r["doc_id"]
    )
    assert rows
    prev_t = prev_v = 0
    for r in rows:
        assert r["cum_tokens"] >= prev_t and r["vocab_size"] >= prev_v
        assert r["vocab_size"] <= r["cum_tokens"]
        prev_t, prev_v = r["cum_tokens"], r["vocab_size"]
    distinct = (
        load_table(spark, SF_SMOKE, "documents")
        .select(F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias("t"))
        .distinct()
        .count()
    )
    assert rows[-1]["vocab_size"] == distinct
