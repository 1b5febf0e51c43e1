"""Unit tests for distributed connected components (operators/components.py)
on crafted graphs — shapes the corpus data can't guarantee to exercise."""

from __future__ import annotations

import pytest

from kafka_streams_join_spark.operators.components import connected_components

SCHEMA = "src long, dst long"


def _components(spark, edges, **kw):
    df = connected_components(spark.createDataFrame(edges, SCHEMA), **kw)
    return sorted((r.node, r.component) for r in df.collect())


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter > 1 forces multiple propagation rounds.
    out = _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert out == [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)]


def test_cycle_terminates(spark):
    out = _components(spark, [(1, 2), (2, 3), (3, 1)])
    assert out == [(1, 1), (2, 1), (3, 1)]


def test_disjoint_components_keep_separate_labels(spark):
    out = _components(spark, [(1, 2), (10, 11), (11, 12)])
    assert out == [(1, 1), (2, 1), (10, 10), (11, 10), (12, 10)]


def test_direction_is_irrelevant(spark):
    # min id only ever appears as dst: symmetric closure must still pull
    # every node down to 1.
    out = _components(spark, [(5, 1), (4, 1), (3, 4)])
    assert out == [(1, 1), (3, 1), (4, 1), (5, 1)]


def test_round_cap_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], max_rounds=1)
