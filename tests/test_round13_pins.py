"""Round-13 pins: ADVICE-r12 fixes and the new quadratic-baseline guards.

Each test pins a specific contract introduced or repaired this round so a
regression is caught by name, not by a downstream parity diff.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kafka_streams_join_spark.streaming.heavy_hitters import (
    MG_K,
    _mg_fn,
    mg_step,
)


class _FakeState:
    """Minimal GroupState stand-in: _mg_fn touches exists/get/update only."""

    def __init__(self):
        self.exists = False
        self._tuple = None

    @property
    def get(self):
        return self._tuple

    def update(self, t):
        self._tuple = t
        self.exists = True


def test_mg_decrement_storm_emits_no_empty_frame():
    """ADVICE-r12: k counters at 1 plus one unseen key empties the summary;
    the operator must emit NOTHING (not a 0-row object-dtype frame)."""
    state = _FakeState()
    rows = [(t, t, t) for t in range(1, MG_K + 1)] + [(99, 99, 99)]
    pdf = pd.DataFrame(rows, columns=["ts_us", "event_id", "user_id"])
    out = list(_mg_fn((0,), iter([pdf]), state))
    assert out == []
    keys, counts, e, n_seen, batch_seq = state.get
    assert list(keys) == [] and list(counts) == []
    assert e == 1 and n_seen == MG_K + 1 and batch_seq == 1
    # and the reference automaton agrees the summary is empty
    counters: dict[int, int] = {}
    e2 = 0
    for _, _, uid in rows:
        e2 = mg_step(counters, MG_K, uid, e2)
    assert counters == {} and e2 == 1


def test_mg_nonempty_snapshot_still_emits():
    """The guard must not suppress normal snapshots."""
    state = _FakeState()
    pdf = pd.DataFrame(
        [(1, 1, 7), (2, 2, 7), (3, 3, 8)],
        columns=["ts_us", "event_id", "user_id"],
    )
    (out,) = list(_mg_fn((5,), iter([pdf]), state))
    assert sorted(zip(out["user_id"], out["est"])) == [(7, 2), (8, 1)]
    assert set(out["shard"]) == {5}
    # dtypes must be integral (Arrow coercion to the long schema is exact)
    for c in ["shard", "batch_seq", "user_id", "est", "e_shard", "n_seen"]:
        assert out[c].dtype.kind == "i", (c, out[c].dtype)


def test_gate_score_total_on_empty_document(spark):
    """ADVICE-r12: the shared quality-score formula must be total — a
    zero-token / zero-char document divides by greatest(x,1) so Spark and
    DuckDB agree (unguarded, Spark yields NULL but DuckDB yields inf)."""
    from kafka_streams_join_spark.queries.gate_sweep import _SCORE_E4_SQL

    feat = "SELECT 0 AS n_tokens, 0 AS n_stop, 0 AS n_punct, 0 AS n_char"
    spark_val = (
        spark.sql(f"SELECT cast({_SCORE_E4_SQL} as bigint) AS q FROM ({feat})")
        .collect()[0]["q"]
    )
    duck_val = duckdb.sql(
        f"SELECT CAST({_SCORE_E4_SQL} AS BIGINT) AS q FROM ({feat})"
    ).fetchone()[0]
    assert spark_val is not None and spark_val == duck_val == 2000
    # (0.2 weight survives: n_punct*10/max(n_char,1) = 0 → term = 0.2)


SF_DIR = "/root/testdata/sf0.001"


def test_row_ceiling_guard_raises_and_passes(spark):
    from kafka_streams_join_spark.operators.guards import (
        TestScaleCeilingError,
        enforce_row_ceiling,
    )

    df = spark.range(10)
    assert (
        enforce_row_ceiling(df, op_name="x", ceiling=10, scale_path="y") == 10
    )
    with pytest.raises(TestScaleCeilingError, match="the_scale_path"):
        enforce_row_ceiling(
            df, op_name="x", ceiling=9, scale_path="the_scale_path"
        )


def test_quadratic_baselines_enforce_ceiling(spark, monkeypatch):
    """The two exact baselines must refuse past their ceilings — the
    docstring contract is executable (VERDICT r12 item 3)."""
    import kafka_streams_join_spark.queries.dedup as dedup
    import kafka_streams_join_spark.queries.similarity as sim
    from kafka_streams_join_spark.operators.guards import (
        TestScaleCeilingError,
    )

    with monkeypatch.context() as m:
        m.setattr(dedup, "_COS_CEILING", 1)
        with pytest.raises(TestScaleCeilingError, match="dedup_embedding_lsh"):
            dedup.dedup_embedding_cosine(spark, SF_DIR)
    with monkeypatch.context() as m:
        m.setattr(sim, "_BRUTE_CEILING", 1)
        with pytest.raises(TestScaleCeilingError, match="sim_lsh_ann_topk"):
            sim.sim_topk_bruteforce(spark, SF_DIR)
    # and at the real ceilings the test corpora are far inside the bound
    assert dedup.dedup_embedding_cosine(spark, SF_DIR).count() > 0
