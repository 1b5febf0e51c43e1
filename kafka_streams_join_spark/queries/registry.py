"""Registry mapping query names → (PySpark callable, DuckDB oracle SQL).

The driver runs each callable at sf=0.01 and hash-compares against the oracle
(CORRECTNESS_r{N}.json). Rules enforced here by convention:

- every computed column is aliased identically in Spark and SQL (the driver
  sorts columns by name before hashing);
- double-typed outputs are rounded (default 4 dp) so engine-order-dependent
  floating-point summation can't flip the hash;
- ``oracle=None`` registers a rows-only check (for genuinely
  non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
