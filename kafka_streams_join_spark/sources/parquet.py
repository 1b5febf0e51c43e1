"""Parquet table loaders over the driver corpus (TESTDATA.md).

The reference has Kafka-only I/O (SURVEY §2.1 S1-S8); the rebuild's batch
surface runs on the driver's parquet star schema. ``spark.read.parquet`` gives
vectorized scans with predicate pushdown and column pruning for free — callers
should filter/select immediately after load so Catalyst pushes both into the
scan (check with plans.assert_pushed_filters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Tables whose parquet footer declares TIMESTAMP(NANOS) — Spark's parquet
# reader rejects nanos outright (PARQUET_TYPE_ILLEGAL), so we read them as
# raw int64 nanos (legacy conf) and convert at the scan with a codegen'd
# timestamp_micros cast. Data is µs-granular (verified: no sub-µs components),
# so the ns→µs division is lossless.
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table; `name` must be in TABLES."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _NANOS_TS_COLUMNS.get(name, ())
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # Corpora vary by generation: TIMESTAMP(NANOS) footers load as raw
        # int64 under nanosAsLong and need the ns→µs conversion; µs footers
        # load as a timestamp directly and must be left alone. Integer `div`
        # (truncation) matches DuckDB's ns→µs read behavior; float division
        # would round and drift by 1µs on half the rows.
        if c in df.columns and df.schema[c].dataType.simpleString() == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    # Normalize TIMESTAMP_NTZ → TIMESTAMP (LTZ). Corpora generated with µs
    # footers load as NTZ, which forbids cast-to-long / unix_micros and
    # changes function semantics mid-engine. Session TZ is pinned UTC
    # (session.py), so the cast is value-identical and restores one uniform
    # timestamp type across corpus generations.
    for field in df.schema.fields:
        if field.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
