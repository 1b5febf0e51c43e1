"""CSV / JSON-lines / parquet file connectors (batch + streaming).

The reference has Kafka-only I/O (SURVEY §2.1); a usable engine also needs
file formats. These are thin, declarative wrappers over ``spark.read`` /
``readStream`` — the point is the defaults, not new machinery:

- **Always pass an explicit schema.** Schema inference reads the data twice
  (a full extra pass at 100 TB) and makes column types data-dependent;
  streaming sources refuse to infer at all.
- Write paths default to snappy parquet — the only format with vectorized
  scans, predicate pushdown, and column pruning; CSV/JSON are interchange
  formats, not analytics formats.
- ``partition_by`` on writes is the cheap half of partition pruning: queries
  filtering on a partition column skip whole directories at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), **options)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str, **options: str
) -> DataFrame:
    return spark.read.schema(schema).options(**options).json(path)


def stream_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .options(header=str(header).lower(), **options)
        .csv(path)
    )


def stream_jsonl(
    spark: SparkSession, path: str, schema: StructType | str, **options: str
) -> DataFrame:
    return spark.readStream.schema(schema).options(**options).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "error", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """ORC — the other columnar format with vectorized scans, predicate
    pushdown, and column pruning (built into Spark, no extra package). Like
    parquet, the schema travels with the files, so no explicit schema is
    required."""
    return spark.read.options(**options).orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
