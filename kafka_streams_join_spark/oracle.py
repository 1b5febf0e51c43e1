"""Local mirror of the driver's DuckDB oracle check (SURVEY §5.2 item 1).

Runs a registered Spark query and its oracle SQL side-by-side on the same
parquet corpus and compares row count + order-insensitive values, with the
same normalizations the registry promises (columns sorted by name, doubles
pre-rounded in the queries themselves).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from .sources.parquet import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with every corpus table registered as a view, mirroring the
    driver's pre-registered views."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_canon)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _canon(v: object) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "<NULL>"
    if isinstance(v, float):
        # Deliberately dtype-strict: a float NEVER collapses to an int string,
        # so an int64-vs-float64 result-type mismatch (DuckDB ceil/floor →
        # DOUBLE, windowed sum(int) → HUGEINT→float) fails locally exactly
        # like the driver's hash does ("26.0" vs "26"). Fix the oracle SQL
        # with CASTs, not this formatter.
        return f"{v:.6f}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


@dataclass
class ParityResult:
    name: str
    spark_rows: int
    oracle_rows: int
    match: bool
    detail: str = ""


def check_parity(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    query_fn,
    oracle: str,
    sf_dir: str,
) -> ParityResult:
    sdf = _normalize(query_fn(spark, sf_dir).toPandas())
    odf = _normalize(con.sql(oracle).df())
    if len(sdf) != len(odf):
        return ParityResult(name, len(sdf), len(odf), False, "row count mismatch")
    if list(sdf.columns) != list(odf.columns):
        return ParityResult(
            name, len(sdf), len(odf), False,
            f"columns differ: spark={list(sdf.columns)} oracle={list(odf.columns)}",
        )
    if len(sdf) == 0:
        # both empty: equals() would still compare dtypes, which differ
        # between an empty toPandas() and an empty duckdb .df()
        return ParityResult(name, 0, 0, True)
    if not sdf.equals(odf):
        neq = (sdf != odf).any(axis=1)
        idx = neq[neq].index[:3].tolist()
        samples = [
            f"row {i}: spark={sdf.loc[i].to_dict()} oracle={odf.loc[i].to_dict()}"
            for i in idx
        ]
        return ParityResult(name, len(sdf), len(odf), False, "; ".join(samples))
    return ParityResult(name, len(sdf), len(odf), True)
