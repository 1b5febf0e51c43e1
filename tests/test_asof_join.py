"""As-of join unit + equivalence + plan tests (operators/asof_join.py).

Golden cases nail the edge semantics (inclusive equal-ts match, tie-break to
max tiebreak, no-match null padding, tolerance null-out, forward direction);
the randomized check proves the one-shuffle union formulation equivalent to
the naive interval-join + row_number reference implementation on real data;
the plan gate pins the scale property the operator exists for — exactly one
Exchange, no join node at all.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_streams_join_spark.operators.asof_join import asof_join
from kafka_streams_join_spark.plans.inspect import explain_str
from kafka_streams_join_spark.sources.parquet import load_table

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "key string, id long, ts timestamp"


def _s(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


def _rows(df, cols=("l_id", "r_id")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_backward_golden(spark):
    left = spark.createDataFrame(
        [("a", 1, _s(10)), ("a", 2, _s(20)), ("b", 3, _s(10)), ("c", 4, _s(10))],
        SCHEMA,
    )
    right = spark.createDataFrame(
        # key a: matches at 5 and 10 (equal-ts inclusive → 11 wins for l=1);
        # key b: only a LATER right row → no backward match;
        # key c: absent entirely.
        [("a", 10, _s(5)), ("a", 11, _s(10)), ("a", 12, _s(15)), ("b", 13, _s(11))],
        SCHEMA,
    )
    out = asof_join(left, right, on="key", right_tiebreak="id")
    assert _rows(out) == [(1, 11), (2, 12), (3, None), (4, None)]


def test_equal_ts_tiebreak_max_wins(spark):
    left = spark.createDataFrame([("a", 1, _s(10))], SCHEMA)
    right = spark.createDataFrame(
        [("a", 20, _s(10)), ("a", 22, _s(10)), ("a", 21, _s(10))], SCHEMA
    )
    out = asof_join(left, right, on="key", right_tiebreak="id")
    assert _rows(out) == [(1, 22)]


def test_tolerance_nulls_out_stale_match(spark):
    left = spark.createDataFrame([("a", 1, _s(100)), ("a", 2, _s(12))], SCHEMA)
    right = spark.createDataFrame([("a", 10, _s(10))], SCHEMA)
    out = asof_join(left, right, on="key", tolerance="5 seconds")
    # l=1 is 90s after the only right row → nulled; l=2 is 2s after → kept.
    assert _rows(out, ("l_id", "r_id", "r_ts")) == [
        (1, None, None),
        (2, 10, _s(10)),
    ]


def test_forward_golden(spark):
    left = spark.createDataFrame([("a", 1, _s(10)), ("a", 2, _s(16))], SCHEMA)
    right = spark.createDataFrame(
        [("a", 10, _s(5)), ("a", 11, _s(12)), ("a", 12, _s(15))], SCHEMA
    )
    out = asof_join(left, right, on="key", direction="forward", right_tiebreak="id")
    # l=1 → nearest at-or-after is ts=12 (id 11); l=2 at 16 → nothing after.
    assert _rows(out) == [(1, 11), (2, None)]


def _naive_asof(left, right):
    """Reference implementation: band-free left join + row_number() = 1."""
    lp = left.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    rp = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    j = lp.join(
        rp, (F.col("l_key") == F.col("r_key")) & (F.col("r_ts") <= F.col("l_ts")),
        "left",
    )
    w = Window.partitionBy("l_id").orderBy(
        F.col("r_ts").desc_nulls_last(), F.col("r_id").desc_nulls_last()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def test_equivalent_to_naive_on_real_data(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").alias("id"),
        "ts",
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").alias("id"),
        "ts",
    )
    fast = _rows(asof_join(clicks, views, on="key", right_tiebreak="id"))
    naive = _rows(_naive_asof(clicks, views))
    assert fast == naive and len(fast) > 0


def test_plan_single_exchange_no_join(spark):
    """The operator's reason to exist: one shuffle, zero join nodes.

    The naive formulation shuffles both sides into a join AND again for the
    window dedup; at 100 TB its intermediate is O(|band matches|). The union
    plan is one Exchange on the key and a per-partition sort, independent of
    match density.
    """
    left = spark.createDataFrame([("a", 1, _s(10))], SCHEMA)
    right = spark.createDataFrame([("a", 10, _s(5))], SCHEMA)
    plan = explain_str(asof_join(left, right, on="key"), "simple")
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
