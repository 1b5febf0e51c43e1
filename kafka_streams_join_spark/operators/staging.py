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
unpersist or session end. Lifecycle contract for long-lived multi-query
sessions: every ``staged()`` frame is tracked in a registry, and
callers release blocks between queries with either
``spark.catalog.clearCache()`` (the bench and the parity sweep — global,
also drops caches staged elsewhere) or :func:`unpersist_staged` (scoped
to this module's frames — what the pytest suite runs after each test).
(A production pipeline would write the stage as a table — checkpointing
across jobs — but within one query plan the cache is the idiomatic Spark
tool.)
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# STRONG references, not a WeakSet: staged frames are locals of query
# builder functions and the downstream DataFrames hold no Python
# reference to their parents, so weak entries die the moment the builder
# returns — a weak registry is empty by the time cleanup runs (it would
# silently release nothing). The held objects are tiny plan handles; the
# registry is bounded by unpersist_staged() calls between queries.
_STAGED: list[DataFrame] = []


def staged(df: DataFrame) -> DataFrame:
    _STAGED.append(df)
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def unpersist_staged(blocking: bool = False) -> int:
    """Unpersist every frame ``staged()`` has handed out since the last
    call and clear the registry; returns how many were released. The
    per-query cleanup hook for sessions that outlive single queries
    (notebooks, sweeps) — without it, disk-backed cache blocks accumulate
    until session end."""
    n = 0
    while _STAGED:
        _STAGED.pop().unpersist(blocking)
        n += 1
    return n
