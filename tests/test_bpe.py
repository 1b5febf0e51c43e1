"""BPE merge mining: structural and monotonicity properties + plan gate.
Oracle parity is covered by the sweep; these pin the trainer semantics."""

from __future__ import annotations

from kafka_streams_join_spark.plans.inspect import assert_no_wide_shuffle
from tests.conftest import SF_SMOKE


def _rows(spark):
    from kafka_streams_join_spark.queries.bpe import text_bpe_merge_mining

    return text_bpe_merge_mining(spark, SF_SMOKE).collect()


def test_bpe_rounds_are_complete_and_winners_distinct(spark):
    from kafka_streams_join_spark.queries.bpe import (
        _BPE_ROUNDS,
        _TOP_PER_ROUND,
    )

    rows = _rows(spark)
    assert len(rows) == _BPE_ROUNDS * _TOP_PER_ROUND
    winners = [r["pair"] for r in rows if r["rnk"] == 1]
    assert len(winners) == _BPE_ROUNDS
    assert len(set(winners)) == _BPE_ROUNDS  # a merged pair cannot win again


def test_bpe_winner_frequencies_non_increasing(spark):
    """Any pair created by merging (x, ab) occurs at a subset of the
    positions where (x, a) was adjacent, and (x, a) was bounded by the
    round's winner — so winner frequencies can never increase."""
    rows = _rows(spark)
    winners = sorted(
        ((r["merge_round"], r["freq"]) for r in rows if r["rnk"] == 1)
    )
    freqs = [f for _, f in winners]
    assert all(a >= b for a, b in zip(freqs, freqs[1:]))
    assert all(f > 0 for f in freqs)


def test_bpe_text_never_shuffles(spark):
    from kafka_streams_join_spark.queries.bpe import text_bpe_merge_mining

    df = text_bpe_merge_mining(spark, SF_SMOKE)
    assert_no_wide_shuffle(df, col="text", max_exchanges=0)
