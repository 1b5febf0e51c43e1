from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_join_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(autouse=True)
def _release_staged_frames():
    """Unpersist staged() frames after every test: the session lives for
    the whole suite, and ~100 queries' disk-backed cache blocks would
    otherwise accumulate until session end (operators/staging.py
    lifecycle contract)."""
    yield
    from kafka_streams_join_spark.operators.guards import clear_ceiling_counts
    from kafka_streams_join_spark.operators.staging import (
        clear_staged_tables,
        unpersist_staged,
    )

    unpersist_staged()
    clear_ceiling_counts()
    # staged_table() keys on (name, sf_dir) only — tests that monkeypatch
    # load_table inject DIFFERENT data under the same dummy sf_dir, so a
    # table carried across tests would be stale. Inside one test (and in
    # the real harnesses, where data per sf_dir is immutable) reuse is
    # safe; across tests, drop everything.
    clear_staged_tables()
