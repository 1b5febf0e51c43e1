"""Semantics tests for the round-4 dedup operators on hand-checkable
inputs (test_oracle_parity.py covers them against the corpus)."""

from __future__ import annotations

import pytest

from kafka_streams_join_spark.queries.dedup_passages import PASSAGE_W


def _passage(n, tag):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_duplicate_passages_hand_computed(spark, monkeypatch):
    """A 12-token passage shared by two docs yields 3 duplicated W=10
    windows per doc, merged into one span covering exactly the passage;
    a doc repeating the passage twice (separated by > W unique tokens)
    yields two islands; a unique doc is absent."""
    import kafka_streams_join_spark.queries.dedup_passages as dp

    P = _passage(12, "p")  # the shared passage
    rows = [
        (1, _passage(5, "a") + " " + P + " " + _passage(13, "b")),  # pos 6..17
        (2, _passage(3, "c") + " " + P + " " + _passage(2, "d")),  # pos 4..15
        (3, _passage(20, "u")),  # fully unique
        (4, P + " " + _passage(11, "e") + " " + P),  # pos 1..12 and 24..35
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(dp, "load_table", lambda s, d, n: df)
    out = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["n_windows"]
        for r in dp.dedup_duplicate_passages(spark, "unused").collect()
    }
    assert PASSAGE_W == 10  # spans below are computed for W=10
    assert out == {
        (1, 6, 17): 3,
        (2, 4, 15): 3,
        (4, 1, 12): 3,
        (4, 24, 35): 3,
    }


def test_remove_duplicate_passages_hand_computed(spark, monkeypatch):
    """The remediation must cut exactly the detected spans: doc 1 keeps
    its prefix+suffix, doc 3 is untouched, doc 4 (passage twice) keeps
    only the middle filler."""
    import hashlib

    import kafka_streams_join_spark.queries.dedup_passages as dp

    P = _passage(12, "p")
    d1_pre, d1_suf = _passage(5, "a"), _passage(13, "b")
    d3 = _passage(20, "u")
    d4_mid = _passage(11, "e")
    rows = [
        (1, d1_pre + " " + P + " " + d1_suf),
        (2, _passage(3, "c") + " " + P + " " + _passage(2, "d")),
        (3, d3),
        (4, P + " " + d4_mid + " " + P),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(dp, "load_table", lambda s, d, n: df)
    out = {
        r["doc_id"]: r
        for r in dp.text_remove_duplicate_passages(spark, "unused").collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert (out[1]["n_tokens"], out[1]["n_removed"]) == (30, 12)
    assert out[1]["clean_hash"] == md5(d1_pre + " " + d1_suf)
    assert (out[3]["n_tokens"], out[3]["n_removed"]) == (20, 0)
    assert out[3]["clean_hash"] == md5(d3)
    assert (out[4]["n_tokens"], out[4]["n_removed"]) == (35, 24)
    assert out[4]["clean_hash"] == md5(d4_mid)


def test_semdedup_keep_rule_hand_computed(spark, monkeypatch):
    """Two identical vectors collapse into one cluster; the lower id is
    kept, the higher dropped; an orthogonal vector stays kept."""
    import kafka_streams_join_spark.queries.clustering as cl

    e1 = [1.0] + [0.0] * 63
    e2 = [0.0, 1.0] + [0.0] * 62
    df = spark.createDataFrame(
        [(0, e1), (1, e1), (2, e2)], "vec_id long, embedding array<float>"
    )
    monkeypatch.setattr(cl, "load_table", lambda s, d, n: df)
    from kafka_streams_join_spark.queries.semdedup import dedup_semantic

    out = {r["vec_id"]: r["kept"] for r in dedup_semantic(spark, "unused").collect()}
    assert out == {0: 1, 1: 0, 2: 1}


def _py_spans(texts_by_id, W):
    """Independent pure-Python model of the passage detector (shares no
    code with the Spark expressions or the DuckDB oracle)."""
    from collections import defaultdict

    wins = {}  # doc -> [(pos, window-tuple)]
    docs_of = defaultdict(set)
    for doc_id, text in texts_by_id.items():
        toks = text.split(" ")
        rows = [
            (i + 1, tuple(toks[i : i + W])) for i in range(len(toks) - W + 1)
        ]
        wins[doc_id] = rows
        for _, w in rows:
            docs_of[w].add(doc_id)
    out = {}
    for doc_id, rows in wins.items():
        hits = sorted(p for p, w in rows if len(docs_of[w]) >= 2)
        spans = []
        for p in hits:
            if spans and p - spans[-1][1] <= W:
                s, prev, n = spans[-1]
                spans[-1] = (s, p, n + 1)
            else:
                spans.append((p, p, 1))
        for s, e, n in spans:
            out[(doc_id, s, e + W - 1)] = n
    return out


def test_duplicate_passages_matches_python_model(spark, monkeypatch):
    import random

    import kafka_streams_join_spark.queries.dedup_passages as dp

    rng = random.Random(11)
    vocab = ["x", "y", "z"]  # tiny vocab -> heavy cross-doc window overlap
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randrange(4, 40)))
        for i in range(30)
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    monkeypatch.setattr(dp, "load_table", lambda s, d, n: df)
    got = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["n_windows"]
        for r in dp.dedup_duplicate_passages(spark, "unused").collect()
    }
    assert got == _py_spans(texts, dp.PASSAGE_W)
    assert got  # the corpus must actually exercise the operator


def test_semdedup_selection_is_consistent(spark):
    """On the corpus: exactly one kept representative per duplicate group
    — every dropped vector must have a kept lower-id cosine-duplicate in
    its own cluster is hard to check directly without pairs, but the
    cheap structural invariants hold: one row per vector, kept is 0/1,
    and at least one vector per non-empty cluster is kept."""
    from kafka_streams_join_spark.queries.semdedup import dedup_semantic
    from tests.conftest import SF_SMOKE

    rows = dedup_semantic(spark, SF_SMOKE).collect()
    assert len(rows) == 500
    assert {r["kept"] for r in rows} <= {0, 1}
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r["kept"])
    for c, kept in by_cluster.items():
        assert any(kept), f"cluster {c} lost every member"
    # the minimum id of every cluster is always kept (no lower id exists)
    for c in by_cluster:
        min_id = min(r["vec_id"] for r in rows if r["cluster"] == c)
        (row,) = [r for r in rows if r["vec_id"] == min_id]
        assert row["kept"] == 1
