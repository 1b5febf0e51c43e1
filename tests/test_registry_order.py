"""Guards on the driver-facing query registry: the correctness sweep covers
only the first 50 registrations (CORRECTNESS_r01 evidence), so ordering IS
coverage. These tests pin the invariants the ordering logic in
queries/__init__.py exists to provide."""

from __future__ import annotations

from kafka_streams_join_spark.queries import ORACLES, QUERIES

SWEEP_WINDOW = 50


def test_registry_has_no_duplicates_and_oracles_subset():
    names = list(QUERIES)
    assert len(names) == len(set(names))
    assert set(ORACLES) <= set(QUERIES)


def test_sweep_window_covers_unproven_surface():
    """Everything that lacked a driver-green row after round 1 — the whole
    dedup/similarity/text/multimodal/pipeline surface, the four unswept
    TPC-H queries, the two hash-fix queries, and the golden scenarios —
    must sit inside the first SWEEP_WINDOW registrations."""
    window = set(list(QUERIES)[:SWEEP_WINDOW])
    # round-2+ additions, deliberately registered at the end, awaiting a
    # sweep rotation once earlier entries have driver-green rows
    late_additions = {
        "dedup_embedding_lsh",
        "emb_l2_normalize",
        "emb_quantize_int8",
        "text_unigram_surprisal",
    }
    must_be_swept = [
        n
        for n in QUERIES
        if n.split("_")[0] in {"dedup", "sim", "emb", "text", "mm", "pipeline"}
        and n not in late_additions
    ] + [
        "tpch_q4_priority_returns",
        "tpch_q14_promo_share",
        "tpch_q17_small_quantity",
        "tpch_q19_disjunctive",
        "sessionize_events",
        "scalar_math_funcs",
        "golden_scenarios",
    ]
    missing = [n for n in must_be_swept if n not in window]
    assert not missing, f"outside the sweep window: {missing}"


def test_ordering_is_stable_under_late_registration():
    """New queries must register at the END (outside the window) until
    rotated in deliberately — the window head is the proven §2.7 surface."""
    names = list(QUERIES)
    assert names[0].startswith("dedup")
    assert names[49] == "golden_scenarios"
