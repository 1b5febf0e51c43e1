"""The driver's correctness gate, as a local pytest: every registered query
runs against its DuckDB oracle at sf0.001 (the smoke scale — the driver
re-runs the same comparison at sf0.01). One parametrized test per query so a
failure names the operator. Since round 10 the registry is 100%
oracle-paired (the lone rows-only query, emb_pca_project, was retired by
its hash-green emb_covariance + emb_pca_project_fixed pair) — enforced by
test_every_query_is_oracle_paired."""

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


def test_every_query_is_oracle_paired():
    """§5.2 registration hygiene: a query without an oracle gets only the
    driver's weak rows-only check — since r10 none is allowed."""
    assert set(QUERIES) == set(ORACLES)
