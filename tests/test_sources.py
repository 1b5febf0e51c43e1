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


def test_checkpoint_restart_is_exactly_once(spark, tmpdir):
    """End-to-end recovery: stop a streaming query, append more input,
    restart from the SAME checkpoint — every record lands in the sink
    exactly once (offsets replay from the checkpoint; the idempotent sink
    makes any replayed batch harmless). This is the exactly-once upgrade
    over the reference's retries=0 at-most-once producer
    (KafkaUtils.scala:58)."""
    from kafka_streams_join_spark.streaming.harness import FileStream
    from kafka_streams_join_spark.streaming.sinks import IdempotentParquetWriter

    src = FileStream(spark, tmpdir, "events")
    sink_path = os.path.join(tmpdir, "sink")
    cp = os.path.join(tmpdir, "cp")
    writer = IdempotentParquetWriter(sink_path)

    def start_query():
        return (
            src.df()
            .writeStream.foreachBatch(writer)
            .option("checkpointLocation", cp)
            .start()
        )

    src.add_batch([{"key": "a", "value": "1", "ts": "2024-01-01T00:00:00"}])
    src.add_batch([{"key": "b", "value": "2", "ts": "2024-01-01T00:00:01"}])
    q1 = start_query()
    q1.processAllAvailable()
    q1.stop()

    src.add_batch([{"key": "c", "value": "3", "ts": "2024-01-01T00:00:02"}])
    q2 = start_query()  # same checkpoint: resumes after the committed offsets
    q2.processAllAvailable()
    q2.stop()

    got = spark.read.parquet(sink_path)
    assert sorted(r["key"] for r in got.collect()) == ["a", "b", "c"]


def test_orc_round_trip_with_pushdown(spark, tmpdir, sample):
    """ORC round trip preserves rows/types; a filter on the read pushes down
    to the ORC scan like parquet."""
    from kafka_streams_join_spark.sources.files import read_orc, write_orc

    path = os.path.join(tmpdir, "t.orc")
    write_orc(sample, path)
    got = read_orc(spark, path)
    assert [tuple(r) for r in _rows(got)] == [tuple(r) for r in _rows(sample)]
    filtered = got.filter(F.col("id") >= 2)
    assert "PushedFilters" in explain_str(filtered)
    assert filtered.count() == 2


def test_read_text_lines_and_whole(spark, tmpdir):
    from kafka_streams_join_spark.sources.files import read_text

    p = os.path.join(tmpdir, "docs")
    os.makedirs(p)
    with open(os.path.join(p, "a.txt"), "w") as f:
        f.write("alpha\nbeta\n")
    with open(os.path.join(p, "b.txt"), "w") as f:
        f.write("gamma\n")
    lines = read_text(spark, p)
    assert sorted(r.value for r in lines.collect()) == ["alpha", "beta", "gamma"]
    whole = read_text(spark, p, whole=True)
    vals = sorted(r.value for r in whole.collect())
    assert vals == ["alpha\nbeta\n", "gamma\n"]


def test_read_binary_files_glob_filters_at_listing(spark, tmpdir):
    from kafka_streams_join_spark.sources.files import read_binary_files

    p = os.path.join(tmpdir, "media")
    os.makedirs(p)
    with open(os.path.join(p, "x.png"), "wb") as f:
        f.write(b"\x89PNG...fake")
    with open(os.path.join(p, "y.wav"), "wb") as f:
        f.write(b"RIFF...fake")
    df = read_binary_files(spark, p, glob="*.png")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].path.endswith("x.png")
    assert bytes(rows[0].content) == b"\x89PNG...fake"
    assert rows[0].length == len(b"\x89PNG...fake")
