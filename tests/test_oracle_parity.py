"""The driver's correctness gate, as a local pytest: every registered query
runs against its DuckDB oracle at sf0.001 (the smoke scale — the driver
re-runs the same comparison at sf0.01). One parametrized test per query so a
failure names the operator. Rows-only queries (no oracle) are checked to at
least execute and return a stable, non-erroring DataFrame."""

from __future__ import annotations

import pytest

from kafka_streams_join_spark.oracle import check_parity, duckdb_connection
from kafka_streams_join_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    r = check_parity(spark, duck, name, QUERIES[name], ORACLES[name], SF_SMOKE)
    assert r.match, f"{name}: {r.detail}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_executes(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0
    assert df.schema.fieldNames()
