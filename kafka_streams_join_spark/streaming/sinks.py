"""Exactly-once file sinks (SURVEY §2.6 "Exactly-once" row).

The reference is at-most-once (kafka-streams 0.10 predates EOS; producer
``retries=0``, ``KafkaUtils.scala:58``). Structured Streaming gives
at-least-once replay from the checkpoint; end-to-end exactly-once needs the
sink to make replays harmless:

- the built-in file sink is already exactly-once (its _spark_metadata log
  records committed files per batch);
- for ``foreachBatch`` (where arbitrary logic runs), the contract is
  *idempotence per (batch_id)*: :class:`IdempotentParquetWriter` writes each
  micro-batch to a ``batch_id=N`` partition with dynamic partition
  overwrite, so a replayed batch replaces its own output byte-for-byte
  instead of appending duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IdempotentParquetWriter:
    """``foreachBatch`` target: exactly-once parquet via batch-partition
    overwrite. Readers see ``path`` as ordinary parquet (the ``batch_id``
    partition column is metadata a consumer may drop)."""

    def __init__(self, path: str) -> None:
        self.path = path

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.path)
        )
