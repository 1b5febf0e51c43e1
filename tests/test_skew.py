"""Salted join / salted agg must be row-identical to their unsalted forms —
the salt changes the shuffle layout, never the result."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_join_spark.operators.skew import salted_agg, salted_join
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_join(spark):
    """events (hot user_ids) ⋈ a per-user dim — salted result == plain."""
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    dim = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    plain = ev.join(dim, "user_id").select("event_id", "user_id", "n_events")
    salted = salted_join(ev, dim, on="user_id", buckets=8).select(
        "event_id", "user_id", "n_events"
    )
    assert _sorted(salted) == _sorted(plain)


def test_salted_join_left_outer_keeps_unmatched(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    dim = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("is_buyer", F.lit(1))
    )
    plain = ev.join(dim, "user_id", "left").select("event_id", "is_buyer")
    salted = salted_join(ev, dim, on="user_id", buckets=4, how="left").select(
        "event_id", "is_buyer"
    )
    assert _sorted(salted) == _sorted(plain)


def test_salted_agg_matches_plain_agg(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    plain = ev.groupBy("event_type").agg(
        F.sum("value").alias("sum_value"),
        F.count("event_id").alias("count_event_id"),
        F.max("ts").alias("max_ts"),
    )
    salted = salted_agg(
        ev,
        keys=["event_type"],
        aggs={"value": "sum", "event_id": "count", "ts": "max"},
        buckets=8,
    )
    p = {r["event_type"]: r for r in plain.collect()}
    s = {r["event_type"]: r for r in salted.collect()}
    assert set(p) == set(s)
    for k in p:
        assert s[k]["count_event_id"] == p[k]["count_event_id"]
        assert s[k]["max_ts"] == p[k]["max_ts"]
        assert abs(s[k]["sum_value"] - p[k]["sum_value"]) < 1e-6


def test_salted_join_rejects_replication_unsafe_how(spark):
    """right/full outer would emit each unmatched ``other`` row buckets×
    null-padded — the helper must refuse rather than silently duplicate."""
    import pytest

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    dim = ev.select("user_id").distinct()
    for how in ("right", "right_outer", "full", "full_outer", "outer", "cross"):
        with pytest.raises(ValueError, match="not replication-safe"):
            salted_join(ev, dim, on="user_id", how=how)
