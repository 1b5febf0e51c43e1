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


def _dim_with_orphans(spark):
    """A per-user dim plus synthetic keys matching NO event — the rows
    right/full must preserve null-padded."""
    ev = load_table(spark, SF_SMOKE, "events")
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    orphans = spark.createDataFrame(
        [(-1, 0), (-2, 0)], "user_id long, n_events long"
    )
    return dim.unionByName(orphans)


def test_salted_join_right_outer_matches_plain(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    dim = _dim_with_orphans(spark)
    plain = ev.join(dim, "user_id", "right").select(
        "user_id", "event_id", "n_events"
    )
    salted = salted_join(ev, dim, on="user_id", buckets=8, how="right").select(
        "user_id", "event_id", "n_events"
    )
    assert _sorted(salted) == _sorted(plain)
    # the orphan keys surface exactly once, null-padded
    orphan_rows = [t for t in _sorted(salted) if t[0] < 0]
    assert orphan_rows == [(-2, None, 0), (-1, None, 0)]


def test_salted_join_full_outer_matches_plain(spark):
    # drop half the dim's keys so the skewed side ALSO has unmatched rows
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    dim = _dim_with_orphans(spark).filter(
        (F.col("user_id") % 2 == 0) | (F.col("user_id") < 0)
    )
    plain = ev.join(dim, "user_id", "full").select(
        "user_id", "event_id", "n_events"
    )
    salted = salted_join(ev, dim, on="user_id", buckets=8, how="full").select(
        "user_id", "event_id", "n_events"
    )
    assert _sorted(salted) == _sorted(plain)
    rows = _sorted(salted)
    assert any(t[2] is None for t in rows)  # skewed-side-only rows kept
    assert any(t[1] is None for t in rows)  # other-side-only rows kept


def test_salted_join_property_full_matrix(spark):
    """Property test over adversarial mini-frames: for EVERY supported
    how, salted == plain — exercised on key distributions the corpus
    doesn't produce (all-one-hot-key, keys only on one side, empty
    sides, null-bearing payloads). Frames are seeded-random but fixed
    per run (hypothesis's DataFrame interop is poor, so the generator
    is a plain PRNG with a pinned seed)."""
    import random

    rng = random.Random(123)
    hows = ["inner", "left", "left_semi", "left_anti", "right", "full"]
    for case in range(4):
        n_keys = [1, 3, 8, 2][case]  # case 0 = one giant hot key
        left_rows = [
            (rng.randrange(n_keys), rng.randrange(100), f"l{i}")
            for i in range(rng.randrange(0, 40))
        ]
        right_rows = [
            (rng.randrange(n_keys + 2), rng.randrange(100))  # +2: orphan keys
            for _ in range(rng.randrange(0, 20))
        ]
        left = spark.createDataFrame(
            left_rows or [(None, None, None)],
            "k long, v long, tag string",
        )
        right = spark.createDataFrame(
            right_rows or [(None, None)], "k long, w long"
        )
        for how in hows:
            plain = left.join(right, "k", how)
            salted = salted_join(left, right, on="k", buckets=4, how=how)
            assert sorted(salted.columns) == sorted(plain.columns), how
            got = _sorted(salted.select(*plain.columns))
            want = _sorted(plain)
            assert got == want, f"case={case} how={how}"


def test_salted_join_right_resolves_keys_case_insensitively(spark):
    """Spark resolves join keys case-insensitively by default; the
    right/full pad/rest construction must too, or a case-mismatched key
    name null-pads a duplicate key column."""
    left = spark.createDataFrame([(1, "a")], "k long, tag string")
    right = spark.createDataFrame([(1, 10), (2, 20)], "k long, w long")
    plain = _sorted(left.join(right, "K", "right").select("k", "tag", "w"))
    salted = _sorted(
        salted_join(left, right, on="K", how="right").select("k", "tag", "w")
    )
    assert salted == plain == [(1, "a", 10), (2, None, 20)]


def test_salted_join_rejects_cross(spark):
    """cross has no keys to salt on — the helper must refuse."""
    import pytest

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    dim = ev.select("user_id").distinct()
    with pytest.raises(ValueError, match="not replication-safe"):
        salted_join(ev, dim, on="user_id", how="cross")
