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


def read_text(
    spark: SparkSession,
    path: str,
    whole: bool = False,
    line_sep: str | None = None,
    **options: str,
) -> DataFrame:
    """Raw text ingestion — one row per line (default) or per file
    (``whole=True``), a single ``value: string`` column. The entry format
    for unstructured corpora before any parsing; pair with
    ``input_file_name()`` for provenance. ``whole=True`` keeps documents
    intact for shingling/dedup but makes a file the parallelism unit — fine
    for many small docs, wrong for a single 100 GB file."""
    # wholetext/lineSep go through .text()'s own kwargs — the method re-sets
    # both options from its signature, silently overriding any .option() set
    # earlier on the reader.
    return spark.read.options(**options).text(path, wholetext=whole, lineSep=line_sep)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    **options: str,
) -> DataFrame:
    """Opaque media ingestion via Spark's ``binaryFile`` source: one row per
    file with (path, modificationTime, length, content: binary) — the
    loading half of the multimodal story (queries/multimodal.py decodes the
    ``content`` column batch-wise over mapInPandas). Push a
    ``pathGlobFilter`` ('*.png') instead of filtering post-scan: the filter
    runs at file listing, before any bytes are read. Spark caps a task at
    one file here — parallelism is file-count-bound, so shard media into
    many objects, not one tar."""
    r = spark.read.format("binaryFile").options(**options)
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)
