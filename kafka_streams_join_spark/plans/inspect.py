"""Inspect formatted physical plans for scale-critical properties.

Works on ``df._jdf.queryExecution()`` output via ``explain`` capture — no
private APIs beyond the stable explain formats.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain(mode)`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear in a PushedFilters clause of the scan.

    A filter that isn't pushed re-reads every row group at 100 TB; this is
    the difference between scanning a partition and scanning the lake.
    """
    plan = explain_str(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    missing = [f for f in fragments if f not in pushed]
    if missing:
        raise AssertionError(
            f"filters not pushed to scan: {missing}\nPushedFilters found: {pushed or '(none)'}"
        )


def assert_read_schema_pruned(df: DataFrame, max_columns: int) -> None:
    """The parquet ReadSchema must carry at most ``max_columns`` columns —
    column pruning reached the scan."""
    plan = explain_str(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if not schemas:
        raise AssertionError(f"no ReadSchema in plan:\n{plan[:2000]}")
    for s in schemas:
        ncols = len([c for c in s.split(",") if ":" in c])
        if ncols > max_columns:
            raise AssertionError(
                f"scan reads {ncols} columns (> {max_columns}): struct<{s}>"
            )


def assert_broadcast_join(df: DataFrame, expect: bool = True) -> None:
    """Assert a BroadcastHashJoin is (or is not) in the plan — dimension
    joins must broadcast; fact-fact joins must not."""
    plan = explain_str(df)
    has = "BroadcastHashJoin" in plan
    if has != expect:
        raise AssertionError(
            f"BroadcastHashJoin {'missing' if expect else 'present'} in plan:\n"
            + plan[:2000]
        )


def assert_no_cartesian(df: DataFrame) -> None:
    """No CartesianProduct / BroadcastNestedLoopJoin on the data path (the
    O(n²) plans that never survive a scale-up)."""
    plan = explain_str(df)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if bad in plan:
            raise AssertionError(f"{bad} in plan:\n{plan[:2000]}")


def assert_no_wide_shuffle(
    df: DataFrame, col: str = "embedding", max_exchanges: int = 0
) -> None:
    """At most ``max_exchanges`` Exchange nodes may carry ``col`` — wide
    payload columns (vector arrays, document text) must be dropped or
    broadcast before shuffling; only narrow index/key frames move freely.
    ``max_exchanges=0`` (default) forbids it outright; an index-build
    pass that legitimately co-locates the corpus once can gate with 1.
    Formatted explain lists each node's input columns, so parse the
    Exchange entries."""
    plan = explain_str(df)
    hits = []
    for m in re.finditer(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", plan
    ):
        cols = m.group(1)
        if re.search(rf"\b{re.escape(col)}#", cols):
            hits.append(cols)
    if len(hits) > max_exchanges:
        raise AssertionError(
            f"{len(hits)} Exchanges shuffle wide column {col!r} "
            f"(allowed {max_exchanges}): {hits}"
        )


def assert_no_single_partition_window_over(
    df: DataFrame, col: str = "doc_id"
) -> None:
    """No ``Exchange SinglePartition`` node may carry ``col`` — the marker
    column of a data-sized frame (e.g. ``doc_id`` for per-document rows).

    An unpartitioned ``Window.orderBy`` funnels its whole input through one
    task; that is fine for a model-sized side frame (per-level counts,
    per-shard totals) but is the canonical driver-adjacent bottleneck when
    the input is a row per corpus document. Gating on the *column* in the
    Exchange input separates the two: bounded side frames never carry the
    per-row id."""
    plan = explain_str(df)
    hits = []
    for m in re.finditer(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]\nArguments: SinglePartition",
        plan,
    ):
        cols = m.group(1)
        if re.search(rf"\b{re.escape(col)}#", cols):
            hits.append(cols)
    if hits:
        raise AssertionError(
            f"Exchange SinglePartition carries data-sized column {col!r} "
            f"(single-partition global sort of a per-row frame): {hits}"
        )


def assert_wholestage_codegen(df: DataFrame) -> None:
    """At least one WholeStageCodegen span — expression work stays JVM-side.

    The simple explain marks codegen stages with ``*(n)``; formatted mode
    uses ``(codegen id : n)`` — accept either.
    """
    formatted = explain_str(df)
    simple = explain_str(df, "simple")
    if "codegen id" not in formatted and "*(" not in simple:
        raise AssertionError(f"no WholeStageCodegen span:\n{simple[:2000]}")
