"""Data-layout operators: z-order (Morton) clustering keys.

At 100 TB the scan you avoid is worth more than the scan you optimize.
Single-column sort layouts prune one predicate dimension; a Z-ORDER
(Morton) key interleaves the bits of two dimensions so that files/row
groups written in z-key order are simultaneously clustered on BOTH —
the layout primitive behind Delta's ``OPTIMIZE ZORDER BY`` and
Iceberg's sort-order rewrite. A range predicate on either dimension then
touches a bounded band of z-buckets instead of the whole table, and
parquet min/max statistics per file do the pruning for free.

Each dimension is first quantized to {_QBITS} bits against its corpus
min/max (what Delta's range-based z-ordering does): interleaving RAW
values would put all the entropy of a small-domain column (custkey <
2^11 here) into low bit positions, so coarse buckets — the file
boundaries — would be sliced by only the OTHER dimension and one
predicate class would never prune. The quantization stats are a 1-row
broadcast aggregate, exact integer arithmetic end to end, so both
engines compute identical keys.

The operator is otherwise a map-side projection; its one Exchange is the
stats broadcast (plan-gated: no hash/range repartition of the data). The
locality payoff is pytest-proven: a narrow range on EITHER dimension
touches a bounded fraction of z-buckets, where a date-sorted layout
serves only the date (tests/test_layout.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_QBITS = 8  # per-dimension quantization width
_QLEVELS = 1 << _QBITS
_EPOCH = "1995-01-01"  # corpus min order date — the day-number origin
_ZBUCKET_SHIFT = 8  # coarse block id = top 8 of the 16 z bits

# bit-interleave of the quantized dims cq/dq: cq bits land on even
# positions, dq bits on odd. Disjoint targets, so the combine is a plain
# sum — identical in both engines and free of precedence traps. Spark's
# bit shift is the function shiftright(x, i); DuckDB's is x >> i.
_Z_SPARK = " + ".join(
    term
    for i in range(_QBITS)
    for term in (
        f"(((shiftright(cq, {i})) & 1) * cast({1 << (2 * i)} as bigint))",
        f"(((shiftright(dq, {i})) & 1) * cast({1 << (2 * i + 1)} as bigint))",
    )
)
_Z_SQL = " + ".join(
    term
    for i in range(_QBITS)
    for term in (
        f"(((cq >> {i}) & 1) * {1 << (2 * i)})",
        f"(((dq >> {i}) & 1) * {1 << (2 * i + 1)})",
    )
)

# exact integer min/max quantization: q = (x - lo) * LEVELS div (hi - lo + 1)
_QUANT_SQL = "(({x} - {lo}) * {n}) // ({hi} - {lo} + 1)"
_QUANT_SPARK = "(({x} - {lo}) * {n}) div ({hi} - {lo} + 1)"


@register(
    "layout_zorder_key",
    oracle=f"""
    WITH d AS (
      SELECT o_orderkey, o_custkey,
             date_diff('day', DATE '{_EPOCH}', CAST(o_orderdate AS DATE)) AS dday
      FROM orders
    ),
    stats AS (
      SELECT min(o_custkey) clo, max(o_custkey) chi,
             min(dday) dlo, max(dday) dhi
      FROM d
    ),
    q AS (
      SELECT o_orderkey, o_custkey, dday,
             {_QUANT_SQL.format(x="o_custkey", lo="clo", hi="chi", n=_QLEVELS)} AS cq,
             {_QUANT_SQL.format(x="dday", lo="dlo", hi="dhi", n=_QLEVELS)} AS dq
      FROM d, stats
    )
    SELECT o_orderkey, o_custkey, dday,
           {_Z_SQL} AS zkey,
           ({_Z_SQL}) // {1 << _ZBUCKET_SHIFT} AS zbucket
    FROM q
    """,
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-order key over (o_custkey, order day number): both
    dimensions min/max-quantized to {_QBITS} bits, bit-interleaved as
    exact integer arithmetic (cq on even bit positions, dq on odd), plus
    the coarse z-bucket (zkey >> {_ZBUCKET_SHIFT}) standing in for the
    file a z-ordered write would place the row in. Map-side projection —
    the only Exchange is the 1-row stats broadcast; the write path is
    ``repartitionByRange("zkey")`` + write, at which point parquet
    min/max stats prune BOTH dimensions' predicates."""
    d = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit(_EPOCH).cast("date")).alias(
            "dday"
        ),
    )
    stats = d.agg(
        F.min("o_custkey").alias("clo"),
        F.max("o_custkey").alias("chi"),
        F.min("dday").alias("dlo"),
        F.max("dday").alias("dhi"),
    )
    q = d.crossJoin(F.broadcast(stats)).select(
        "o_orderkey",
        "o_custkey",
        "dday",
        F.expr(
            _QUANT_SPARK.format(x="o_custkey", lo="clo", hi="chi", n=_QLEVELS)
        ).alias("cq"),
        F.expr(_QUANT_SPARK.format(x="dday", lo="dlo", hi="dhi", n=_QLEVELS)).alias(
            "dq"
        ),
    )
    return q.select(
        "o_orderkey",
        "o_custkey",
        "dday",
        F.expr(_Z_SPARK).alias("zkey"),
        (F.expr(_Z_SPARK) / (1 << _ZBUCKET_SHIFT)).cast("long").alias("zbucket"),
    )


_COMPACT_TARGET = 65536  # merged-file target size (chars stand in for bytes)


@register(
    "layout_compaction_plan",
    oracle=f"""
    WITH files AS (
      SELECT source, doc_id, n_chars,
             CAST((sum(n_chars) OVER (
                PARTITION BY source
                ORDER BY n_chars DESC, doc_id
                ROWS UNBOUNDED PRECEDING
              ) - n_chars) // {_COMPACT_TARGET} AS BIGINT) AS file_group
      FROM documents
    )
    SELECT source, file_group,
           count(*) AS n_files,
           CAST(sum(n_chars) AS BIGINT) AS group_bytes
    FROM files GROUP BY 1, 2
    """,
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the OPTIMIZE / rewrite-data-files
    maintenance primitive every lakehouse runs: within each partition
    (source), lay the files end-to-end in size-DESCENDING order (the
    first-fit-decreasing heuristic's ordering, so large files anchor
    groups and small files pack the remainders) and cut a merge group
    every ~{_COMPACT_TARGET} bytes. Emits the per-group manifest
    (n_files, group_bytes) a rewrite job would execute; documents stand
    in for data files with n_chars as the size column.

    Plan: same shape as pipeline_pack_sequences — one shuffle on the
    partition key feeds a per-partition running-sum window (never a
    global sort); the grouping is exact integer floor division, the
    manifest rollup reuses the same partitioning. Deterministic: the
    (size DESC, doc_id) order is a pure function of the catalog rows, so
    re-planning yields the identical manifest — safe to re-run after a
    failed rewrite."""
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive prefix sum (cum - own size), then exact BIGINT floor
    # division — Spark `div` ≡ the oracle's `//`
    excl_prefix = (
        F.sum(F.col("n_chars").cast("long")).over(w) - F.col("n_chars")
    ).cast("long")
    files = d.select("source", "doc_id", "n_chars").withColumn(
        "file_group", excl_prefix
    ).withColumn("file_group", F.expr(f"file_group div {_COMPACT_TARGET}"))
    return files.groupBy("source", "file_group").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_chars").alias("group_bytes"),
    )
