"""kafka_streams_join_spark — PySpark-native rebuild of ncolomer/kafka-streams-join.

The reference (366 LoC of Kafka Streams 0.10 Scala, see SURVEY.md) provides two
streaming-query capabilities — event-time interval equi-join between two streams
(TimeoutJoinTest.scala:75-79) and join-timeout / absence detection
(TimeoutJoinTest.scala:82-92 + TopicShifter.scala) — plus the delay/shift
primitive and a test harness. This package re-expresses those Spark-first:

- ``operators/``  — batch DataFrame operators (interval joins, shift, dedup,
  similarity, text analysis) with DuckDB-oracle-checkable semantics.
- ``streaming/``  — Structured Streaming topologies (watermarked stream-stream
  joins subsuming the reference's hand-rolled TopicShifter watermark).
- ``sources/``    — parquet/memory/kafka source + sink adapters.
- ``functions/``  — column-expression helpers (JSON payloads, vector math,
  text heuristics), all built on pyspark.sql.functions (JVM-side, codegen'd).
- ``plans/``      — plan-inspection helpers (explain, shuffle/pushdown checks).
"""

__version__ = "0.1.0"
