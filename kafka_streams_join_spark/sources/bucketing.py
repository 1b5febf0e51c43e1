"""Bucketed tables: co-located, shuffle-free fact-fact joins.

Broadcast handles dim joins; for repeated **fact ⋈ fact** joins on the same
key (events⋈events attribution, orders⋈lineitem), the 100 TB answer is to
pay the partitioning once at write time: ``bucketBy(k, key)`` hash-splits
each table into the same k buckets, and a join between two tables bucketed
on the join key runs with **zero Exchange** — every task reads bucket i of
both sides. ``sortBy(key)`` additionally pre-sorts within buckets so a
sort-merge join skips its sort.

Bucket counts must match (or divide evenly) across join sides, and
``spark.sql.shuffle.partitions`` should be a multiple of the bucket count
so downstream stages keep the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted) catalog
    table. Bucketed layout only survives through the catalog
    (``saveAsTable``) — a plain path write drops the metadata."""
    w = df.write.format(fmt).mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
