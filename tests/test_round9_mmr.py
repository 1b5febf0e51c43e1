"""sim_mmr_rerank semantic pin: an independent numpy reimplementation
of candidate generation AND the greedy MMR walk on the sf0.001 corpus,
plus diversification property checks and plan gates."""

from __future__ import annotations

import math

import numpy as np

from kafka_streams_join_spark.plans import (
    assert_no_single_partition_window_over,
    explain_str,
)
from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _round_half_up(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _mmr_bruteforce(spark):
    rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    X = X / np.sqrt((X * X).sum(1))[:, None]
    cos = X @ X.T
    expect = []
    for qi in np.where(ids % 100 == 0)[0]:
        qid = int(ids[qi])
        mask = ids != qid
        cand_ids = ids[mask]
        cand_cos = cos[qi][mask]
        order = np.lexsort((cand_ids, -cand_cos))[:5]
        cids = [int(cand_ids[i]) for i in order]
        # the engines round HALF_UP at both stages (3-dp cos, then milli);
        # Python's round() is banker's, so mirror with the half-up helper
        # (one-stage: the second rounding acts on an exact milli integer)
        rel = {
            int(cand_ids[i]): _round_half_up(cand_cos[i] * 1000)
            for i in order
        }
        idx = {int(v): k for k, v in enumerate(ids)}
        psim = {
            (a, b): _round_half_up(1000 * cos[idx[a]][idx[b]])
            for a in cids
            for b in cids
            if a != b
        }
        sel = [cids[0]]
        expect.append((qid, 1, cids[0], 7 * rel[cids[0]]))
        for step in (2, 3):
            best = None
            for c in cids:
                if c in sel:
                    continue
                ms = max(psim[(c, s)] for s in sel)
                score = 7 * rel[c] - 3 * ms
                if best is None or score > best[0] or (
                    score == best[0] and c < best[1]
                ):
                    best = (score, c)
            sel.append(best[1])
            expect.append((qid, step, best[1], best[0]))
    return expect


def test_mmr_matches_bruteforce(spark):
    expect = sorted(_mmr_bruteforce(spark))
    df = QUERIES["sim_mmr_rerank"](spark, SF_SMOKE)
    got = sorted(
        (r.query_id, r.step, r.selected_id, r.mmr_milli) for r in df.collect()
    )
    assert got == expect
    # shape: exactly 3 steps per query, no candidate selected twice
    by_q: dict[int, list] = {}
    for qid, step, sid, _ in got:
        by_q.setdefault(qid, []).append((step, sid))
    for qid, steps in by_q.items():
        assert [s for s, _ in sorted(steps)] == [1, 2, 3], qid
        assert len({sid for _, sid in steps}) == 3, qid
    # MMR scores are non-increasing along the greedy walk (greedy argmax
    # over a shrinking pool with a growing penalty term)
    scores_by_q: dict[int, list] = {}
    for qid, step, _, m in got:
        scores_by_q.setdefault(qid, []).append((step, m))
    for qid, sm in scores_by_q.items():
        ordered = [m for _, m in sorted(sm)]
        assert ordered[0] >= ordered[1] >= ordered[2], (qid, ordered)
    # every selection window partitions by query_id
    assert_no_single_partition_window_over(df, col="vec_id")
    assert "Exchange SinglePartition" not in explain_str(df)
