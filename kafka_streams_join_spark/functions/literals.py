"""Literal DataFrames as JVM LocalRelations (round 14, guide §4).

``spark.createDataFrame(rows, schema)`` builds a defaultParallelism-
partition Python-backed local relation: every action on it pays
Python-worker round trips, and the earlier ``.coalesce(1)`` mitigation
(added for the literal × literal cartesian task-grid trap) made it worse —
one task computing all 32 parent partitions serially, measured ~5 s per
action at local[32] for a 3-row frame vs ~0.1 s for the same rows spelled
as a SQL ``VALUES`` clause. ``values_frame`` builds the latter: a pure JVM
LocalRelation — no Python boundary at plan or run time, single partition
by construction (no task-grid trap, no ``coalesce`` needed), eligible for
broadcast and constant folding.

Values are rendered as SQL literals and CAST to the declared type, so the
resulting schema matches the ``createDataFrame`` spelling it replaces.
Intended for the registry's small frozen parameter grids (quantile
targets, sweep thresholds, seed terms) — a few dozen rows, never data.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession

_TYPE_SQL = {
    "int": "INT",
    "integer": "INT",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "STRING",
    "timestamp": "TIMESTAMP",
    "boolean": "BOOLEAN",
}


# A deliberate ceiling: this helper renders every value into SQL text and
# is meant for frozen parameter grids, never data-sized frames (which
# belong in parquet/staged tables — and a megabyte SQL string would also
# bloat plan/analysis time).
_MAX_ROWS = 1000


def _render(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # inf/nan have no SQL literal spelling; repr() would render
        # unparseable SQL (ADVICE r14) — reject loudly instead.
        if v != v or v in (float("inf"), float("-inf")):
            raise ValueError(f"non-finite float has no SQL literal: {v!r}")
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, _dt.datetime):
        return "TIMESTAMP '" + v.strftime("%Y-%m-%d %H:%M:%S.%f") + "'"
    # Backslashes must be doubled BEFORE quote-escaping: with the default
    # parser (escapedStringLiterals=false) a lone backslash in a VALUES
    # literal is an escape prefix and silently corrupts the value.
    s = str(v).replace("\\", "\\\\").replace("'", "''")
    return f"'{s}'"


def values_frame(
    spark: SparkSession, rows: list[tuple], schema: str
) -> DataFrame:
    """A literal DataFrame from ``rows`` with the DDL-style ``schema``
    ("name type, name type"), planned as a single-partition JVM
    LocalRelation (see module docstring)."""
    cols = []
    for part in schema.split(","):
        name, typ = part.strip().rsplit(" ", 1)
        cols.append((name.strip(), _TYPE_SQL[typ.strip().lower()]))
    if not rows:
        raise ValueError("values_frame needs at least one row ('FROM VALUES' "
                         "with an empty list is a SQL parse error)")
    if len(rows) > _MAX_ROWS:
        raise ValueError(
            f"values_frame got {len(rows)} rows (max {_MAX_ROWS}): literal "
            "frames are for frozen parameter grids, not data"
        )
    for i, row in enumerate(rows):
        if len(row) != len(cols):
            raise ValueError(
                f"row {i} has {len(row)} values but schema {schema!r} "
                f"declares {len(cols)} columns"
            )
    vals = ", ".join(
        "(" + ", ".join(_render(v) for v in row) + ")" for row in rows
    )
    sel = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols)
    names = ", ".join(n for n, _ in cols)
    return spark.sql(f"SELECT {sel} FROM VALUES {vals} AS t({names})")
