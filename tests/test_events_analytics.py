"""Funnel + cohort retention: semantic invariants and scan pruning."""

from __future__ import annotations

from kafka_streams_join_spark.plans.inspect import (
    assert_broadcast_join,
    assert_read_schema_pruned,
)
from tests.conftest import SF_SMOKE


def test_funnel_stages_are_monotone_and_scan_pruned(spark):
    """Each funnel step can only lose users (ordered within-window
    matching), and the scan must read only (user_id, event_type, ts) —
    the wide props payload never leaves the parquet reader."""
    from kafka_streams_join_spark.queries.events_analytics import (
        events_funnel_conversion,
    )

    df = events_funnel_conversion(spark, SF_SMOKE)
    assert_read_schema_pruned(df, 3)
    rows = df.collect()
    assert rows
    assert {r["stage"] for r in rows} <= {1, 2, 3}
    n1 = len(rows)  # every row reached at least stage 1 (a view)
    n2 = sum(1 for r in rows if r["stage"] >= 2)
    n3 = sum(1 for r in rows if r["stage"] >= 3)
    assert n1 >= n2 >= n3
    # sequencing invariant: the recorded step timestamps are ordered
    for r in rows:
        if r["c_ts"] is not None:
            assert r["c_ts"] > r["v_ts"]
        if r["p_ts"] is not None:
            assert r["p_ts"] > r["c_ts"]


def test_cohort_week0_is_full_and_ppm_bounded(spark):
    """Week 0 contains each user's own signup event, so retention_ppm
    must be exactly 1,000,000 for every cohort at offset 0, and no cell
    can exceed it."""
    from kafka_streams_join_spark.queries.events_analytics import (
        events_cohort_retention,
    )

    df = events_cohort_retention(spark, SF_SMOKE)
    assert_broadcast_join(df)
    assert_read_schema_pruned(df, 3)
    rows = df.collect()
    assert rows
    week0 = [r for r in rows if r["week_offset"] == 0]
    assert week0
    assert all(r["retention_ppm"] == 1_000_000 for r in week0)
    assert all(0 < r["retention_ppm"] <= 1_000_000 for r in rows)
