"""Opt-in live-broker smoke test for the Kafka adapters.

The sandbox has no broker (and no spark-sql-kafka connector jar), so the
adapters in ``streaming/kafka.py`` are config-only here and their
semantics ride on the file/memory twins. Anyone running against a real
cluster can execute this end-to-end round-trip by opting in:

    SPARK_GRAFT_KAFKA=broker:9092 python -m pytest tests/test_kafka_smoke.py

It exercises the full adapter surface the reference harness uses
(``KafkaUtils.scala:50-94``): batch produce (S7), batch read-from-earliest
(S8), streaming source → streaming sink (S1-S4), and checks the values
round-trip byte-exactly with the broker-assigned timestamp present.

One-command broker on any Docker machine (round 13 — checked-in recipe):

    docker compose -f docker-compose.kafka.yml up -d --wait
    SPARK_GRAFT_KAFKA=localhost:9092 python -m pytest tests/test_kafka_smoke.py -v

``session.py`` adds the matching ``spark-sql-kafka-0-10`` connector via
``spark.jars.packages`` automatically when ``SPARK_GRAFT_KAFKA`` is set
(first run fetches it from Maven Central); the test fails loudly, rather
than skipping, once the env var opts in — a misconfigured broker should
not look like a pass.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest

BROKERS = os.environ.get("SPARK_GRAFT_KAFKA")

pytestmark = pytest.mark.skipif(
    not BROKERS,
    reason="live-broker smoke is opt-in: set SPARK_GRAFT_KAFKA=host:port "
    "(no broker exists in the sandbox; file/memory twins carry the "
    "semantics tests)",
)


def test_kafka_roundtrip_batch_and_stream(spark):
    from kafka_streams_join_spark.streaming.kafka import (
        kafka_stream_sink,
        kafka_stream_source,
        read_batch_from_topic,
        write_batch_to_topic,
    )

    topic_in = f"graft-smoke-in-{uuid.uuid4().hex[:8]}"
    topic_out = f"graft-smoke-out-{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="kafka_smoke_")
    try:
        # S7: batch produce
        rows = [(f"k{i}", f"v{i}") for i in range(10)]
        write_batch_to_topic(
            spark.createDataFrame(rows, "key string, value string"),
            BROKERS,
            topic_in,
        )
        # S8: batch read-from-earliest sees every record with a broker ts
        got = read_batch_from_topic(spark, BROKERS, topic_in).collect()
        assert sorted((r["key"], r["value"]) for r in got) == sorted(rows)
        assert all(r["ts"] is not None for r in got)

        # S1-S4: stream the topic into another topic, then verify by a
        # second batch read (the reference's writeToTopic/readFromTopic
        # choreography, KafkaUtils.scala:50-94)
        src = kafka_stream_source(spark, BROKERS, topic_in)
        q = kafka_stream_sink(
            src, BROKERS, topic_out, os.path.join(ckpt, "sink")
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = read_batch_from_topic(spark, BROKERS, topic_out).collect()
        assert sorted((r["key"], r["value"]) for r in out) == sorted(rows)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
