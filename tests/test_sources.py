"""Round-trip tests for the file connectors: write → read preserves rows and
types; partitioned writes prune at the scan."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_streams_join_spark.plans import explain_str
from kafka_streams_join_spark.sources.files import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
    write_parquet,
)

SCHEMA = "id bigint, name string, score double"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sources_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", None)], SCHEMA
    )


def _rows(df):
    return sorted(df.collect(), key=lambda r: r["id"])


def test_csv_round_trip(spark, tmpdir, sample):
    path = os.path.join(tmpdir, "t.csv")
    write_csv(sample, path)
    got = read_csv(spark, path, SCHEMA)
    assert _rows(got) == _rows(sample)
    assert got.schema == sample.schema


def test_jsonl_round_trip(spark, tmpdir, sample):
    path = os.path.join(tmpdir, "t.jsonl")
    write_jsonl(sample, path)
    got = read_jsonl(spark, path, SCHEMA)
    assert _rows(got) == _rows(sample)
    assert got.schema == sample.schema


def test_partitioned_parquet_prunes(spark, tmpdir, sample):
    path = os.path.join(tmpdir, "t.parquet")
    write_parquet(sample.withColumn("part", F.col("id") % 2), path,
                  partition_by=["part"])
    got = spark.read.parquet(path).filter(F.col("part") == 0)
    assert [r["id"] for r in _rows(got)] == [2]
    # partition filter prunes directories, not rows: one partition dir read
    assert "PartitionFilters: [isnotnull(part" in explain_str(got)


def test_idempotent_writer_replay_is_harmless(spark, tmpdir, sample):
    """Replaying a micro-batch (the at-least-once failure mode) must leave
    the sink byte-identical — no duplicate rows."""
    from kafka_streams_join_spark.streaming.sinks import IdempotentParquetWriter

    path = os.path.join(tmpdir, "sink")
    writer = IdempotentParquetWriter(path)
    writer(sample, batch_id=0)
    writer(sample.limit(2), batch_id=1)
    # simulate checkpoint replay of batch 1
    writer(sample.limit(2), batch_id=1)
    got = spark.read.parquet(path)
    assert got.count() == 5
    assert got.filter(F.col("batch_id") == 1).count() == 2
