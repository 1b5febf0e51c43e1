"""Staging for multi-consumer stages (the multi-pass pattern).

Several pipelines funnel one expensive corpus-derived stage (shingle sets,
signatures, gram frames, codebooks, cell assignments) into multiple
downstream consumers. Left lazy, Spark recomputes the full
scan+transform+aggregate once PER CONSUMER — measured as 6 FileScans of
the corpus inside a single near-dup query — and ``ReuseExchange`` does not
reliably deduplicate these shapes. At 100 TB that is six reads of the
dataset; staging the (much smaller) derived form and fanning out from it
is the standard multi-pass design.

``persist(MEMORY_AND_DISK)`` is the in-session mechanism: Spark's cache
manager keys entries on the canonicalized plan, so repeated invocations of
the same query share one materialization instead of stacking copies. LRU
eviction bounds the MEMORY footprint, but disk-spilled blocks live until
unpersist or session end — long multi-query sessions (the bench, the
parity sweep) therefore call ``spark.catalog.clearCache()`` between
queries rather than trusting eviction. (A production pipeline would write
the stage as a table — checkpointing across jobs — but within one query
plan the cache is the idiomatic Spark tool.)
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def staged(df: DataFrame) -> DataFrame:
    return df.persist(StorageLevel.MEMORY_AND_DISK)
