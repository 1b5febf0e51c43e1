"""Round-14 semantic pins: the five round-13 ADVICE fixes.

1. KMV estimator denominators are guarded (greatest(kth, 1)) in BOTH
   engines — re-certified by parity; here we pin the Spark-side guard
   exists so a refactor can't silently drop one side.
2. ``streaming/kmv.py`` imports bisect at module scope (hot-loop fix).
3. ``session._kafka_connector_coordinate`` derives the Scala suffix from
   the Spark major version and refuses unreleased versions.
4. ``operators/staging`` folds a source-dir content fingerprint into the
   staged-table key when ``src_dir`` is given.
5. ``operators/guards.enforce_row_ceiling`` memoizes its count per
   (op, cache_key) so bench reps / plan-gate paths don't pay a corpus
   scan per invocation.
"""

from __future__ import annotations

import os

import pytest


def test_kmv_spark_denominators_guarded():
    import inspect

    from kafka_streams_join_spark.queries import kmv_sweep

    src = inspect.getsource(kmv_sweep)
    # every truncating div by a kth-minimum is wrapped
    assert "div kth" not in src.replace("div greatest(kth", "")
    assert "// kth" not in src.replace("// greatest(kth", "")


def test_streaming_kmv_bisect_module_scope():
    import kafka_streams_join_spark.streaming.kmv as kmv

    assert hasattr(kmv, "bisect")
    import inspect

    assert "import bisect" not in inspect.getsource(kmv.kmv_insert)


def test_kafka_coordinate_scala_suffix(monkeypatch):
    import pyspark

    from kafka_streams_join_spark.session import _kafka_connector_coordinate

    monkeypatch.setattr(pyspark, "__version__", "4.1.2")
    assert (
        _kafka_connector_coordinate()
        == "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2"
    )
    monkeypatch.setattr(pyspark, "__version__", "3.5.1")
    assert (
        _kafka_connector_coordinate()
        == "org.apache.spark:spark-sql-kafka-0-10_2.12:3.5.1"
    )
    monkeypatch.setattr(pyspark, "__version__", "4.2.0.dev1")
    with pytest.raises(RuntimeError, match="released pyspark"):
        _kafka_connector_coordinate()


def test_dir_fingerprint_tracks_content(tmp_path):
    from kafka_streams_join_spark.operators.staging import _dir_fingerprint

    assert _dir_fingerprint(str(tmp_path / "nope")) == "absent"
    p = tmp_path / "t.parquet"
    p.write_bytes(b"aa")
    f1 = _dir_fingerprint(str(tmp_path))
    p.write_bytes(b"bbb")  # size change
    f2 = _dir_fingerprint(str(tmp_path))
    assert f1 != f2
    os.utime(p, ns=(1, 1))  # mtime change, same size
    f3 = _dir_fingerprint(str(tmp_path))
    assert f3 not in (f1, f2)
    # non-parquet files are ignored
    (tmp_path / "notes.txt").write_text("x")
    assert _dir_fingerprint(str(tmp_path)) == f3


def test_budget_audit_modes_byte_identical(spark):
    """VERDICT r13 task 2: the direct and materialized candidate-budget
    audits must produce IDENTICAL reports — same rows, same values, same
    schema — because the materialized mode only changes WHERE the pair
    frames are read from, never what they contain."""
    from kafka_streams_join_spark.queries.candidate_budget import (
        dedup_candidate_budget_audit,
        dedup_candidate_budget_audit_materialized,
    )

    sf = "/root/testdata/sf0.001"
    direct = dedup_candidate_budget_audit(spark, sf)
    mat = dedup_candidate_budget_audit_materialized(spark, sf)
    assert direct.schema == mat.schema
    key = lambda r: r["tier"]  # noqa: E731
    d_rows = sorted((r.asDict() for r in direct.collect()), key=key)
    m_rows = sorted((r.asDict() for r in mat.collect()), key=key)
    assert d_rows == m_rows
    assert len(d_rows) == 3
    # second materialized invocation (the production shape: tables exist)
    # still identical
    m2 = sorted(
        (
            r.asDict()
            for r in dedup_candidate_budget_audit_materialized(
                spark, sf
            ).collect()
        ),
        key=key,
    )
    assert m2 == d_rows


def test_enforce_row_ceiling_memoizes():
    from kafka_streams_join_spark.operators.guards import (
        TestScaleCeilingError,
        clear_ceiling_counts,
        enforce_row_ceiling,
    )

    class FakeDF:
        calls = 0

        def count(self):
            FakeDF.calls += 1
            return 7

    clear_ceiling_counts()
    df = FakeDF()
    kw = dict(op_name="op", ceiling=10, scale_path="sp", cache_key="sf")
    assert enforce_row_ceiling(df, **kw) == 7
    assert enforce_row_ceiling(df, **kw) == 7
    assert FakeDF.calls == 1  # memo hit, no second count job
    # distinct cache_key recounts; no cache_key always counts
    enforce_row_ceiling(df, op_name="op", ceiling=10, scale_path="sp")
    assert FakeDF.calls == 2
    clear_ceiling_counts()
    assert enforce_row_ceiling(df, **kw) == 7
    assert FakeDF.calls == 3
    # the ceiling still raises through the memo path

    class BigDF:
        def count(self):
            return 11

    clear_ceiling_counts()
    with pytest.raises(TestScaleCeilingError, match="sp2"):
        enforce_row_ceiling(
            BigDF(), op_name="op", ceiling=10, scale_path="sp2", cache_key="sf"
        )
