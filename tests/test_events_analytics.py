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


def test_scd2_intervals_tile_the_timeline(spark):
    """SCD2 invariants: per user exactly one open (is_current) row, and
    the validity intervals tile without gaps — each row's valid_to equals
    the next row's valid_from."""
    from kafka_streams_join_spark.queries.events_analytics import (
        events_scd2_history,
    )

    rows = events_scd2_history(spark, SF_SMOKE).collect()
    assert rows
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, hist in by_user.items():
        hist.sort(key=lambda r: r["valid_from"])
        assert sum(1 for r in hist if r["is_current"] == 1) == 1, user
        assert hist[-1]["is_current"] == 1 and hist[-1]["valid_to"] is None
        for a, b in zip(hist, hist[1:]):
            assert a["valid_to"] == b["valid_from"], user
            assert a["state"] != b["state"], user  # change-only rows


def test_dq_checks_all_pass_on_clean_corpus(spark):
    """The generated corpus satisfies its own schema: every constraint
    reports zero violations — and the check NAMES cover uniqueness, FKs,
    null, and domain classes."""
    from kafka_streams_join_spark.queries.data_quality import (
        dq_constraint_checks,
    )

    rows = dq_constraint_checks(spark, SF_SMOKE).collect()
    assert len(rows) == 6
    assert all(r["violations"] == 0 for r in rows), rows


def test_dq_checks_catch_injected_violations(spark):
    """Liveness: the same check expressions flag deliberately broken data
    (a dangling FK and a duplicated PK) — the audit is not trivially
    zero. (Per the sketch-flag-liveness advice: a contract column must be
    shown to flip.)"""
    from pyspark.sql import functions as F
    from kafka_streams_join_spark.sources.parquet import load_table

    orders = load_table(spark, SF_SMOKE, "orders").limit(10)
    customer = load_table(spark, SF_SMOKE, "customer")
    broken = orders.withColumn("o_custkey", F.col("o_custkey") + 1_000_000)
    dangling = broken.join(
        customer, broken.o_custkey == customer.c_custkey, "left_anti"
    ).count()
    assert dangling == 10
    dup = orders.unionAll(orders)
    pk_violations = dup.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v")
    ).collect()[0]["v"]
    assert pk_violations == 10
