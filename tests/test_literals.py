"""functions/literals.py — VALUES LocalRelation literal frames (round 14).

The optimization contract: ``values_frame`` must return the same rows and
column types as the ``createDataFrame(rows, schema)`` spelling it replaced
(16 registry call sites), while planning as a JVM LocalTableScan — no
Python-backed RDD, single partition (so literal × literal cross joins
cannot schedule a partition-grid of near-empty tasks)."""

import datetime as dt

from kafka_streams_join_spark.functions.literals import values_frame
from kafka_streams_join_spark.plans import explain_str


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_values_frame_matches_createdataframe_types(spark):
    rows = [(1, 2**40, 0.25, "a'b", True), (2, -3, 1.5e-3, "", False)]
    schema = "i int, l long, d double, s string, b boolean"
    vf = values_frame(spark, rows, schema)
    cdf = spark.createDataFrame(rows, schema)
    assert [f.dataType for f in vf.schema.fields] == [
        f.dataType for f in cdf.schema.fields
    ]
    assert vf.columns == cdf.columns
    assert _rows(vf) == _rows(cdf)


def test_values_frame_timestamp_microseconds(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0),
        (2, t0 + dt.timedelta(seconds=0.5)),
        (3, t0 + dt.timedelta(seconds=2)),
    ]
    vf = values_frame(spark, rows, "k int, ts timestamp")
    cdf = spark.createDataFrame(rows, "k int, ts timestamp")
    assert _rows(vf) == _rows(cdf)


def test_values_frame_is_local_relation(spark):
    vf = values_frame(spark, [(50,), (90,), (99,)], "q int")
    plan = explain_str(vf, "simple")
    # a JVM LocalTableScan — no Scan ExistingRDD / Python-backed relation
    # (the createDataFrame form plans as Scan ExistingRDD over
    # defaultParallelism Python-fed partitions)
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan
    # partitioning bounded by the row count, not defaultParallelism — a
    # literal x literal cross join can't schedule a 32x32 task grid
    assert vf.rdd.getNumPartitions() <= 3


def test_values_frame_null_and_quote_rendering(spark):
    vf = values_frame(
        spark, [(None, "it's"), (7, None)], "n long, s string"
    )
    rows = {tuple(r) for r in vf.collect()}
    assert rows == {(None, "it's"), (7, None)}
