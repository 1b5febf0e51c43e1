"""Round-8 wave 1 (seasonal profile, JL projection, reservoir sample,
cluster-size histogram, CDC chunking, matryoshka recall): semantic
brute-force pins against pure-Python reimplementations + plan gates.
The oracle hashes certify engine parity; these certify the SEMANTICS so
a shared misreading between the Spark plan and its oracle SQL can't
slip through (the test_temporal.py discipline)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyspark.sql.functions as F

from kafka_streams_join_spark.plans import (
    assert_no_wide_shuffle,
    assert_read_schema_pruned,
    assert_wholestage_codegen,
    explain_str,
)
from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE

_R8_WAVE1 = (
    "events_dow_hour_profile",
    "emb_jl_project",
    "emb_jl_distortion",
    "pipeline_reservoir_sample",
    "dedup_component_size_histogram",
    "dedup_cdc_chunks",
    "dedup_cdc_cross_source",
    "sim_prefix_dim_recall",
)


def _md5rank(salt: str, key: int) -> int:
    """The repo's 60-bit md5 rank: first 15 hex chars as an int."""
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:15], 16)


# --------------------------------------------------------------------------
# events_dow_hour_profile
# --------------------------------------------------------------------------


def test_dow_formula_is_monday_zero():
    # 2024-01-01 (epoch 1704067200) was a Monday
    assert (1704067200 // 86400 + 3) % 7 == 0
    # 1970-01-01 was a Thursday
    assert (0 // 86400 + 3) % 7 == 3


def test_dow_hour_profile_matches_bruteforce(spark):
    ts = [
        r.t
        for r in load_table(spark, SF_SMOKE, "events")
        .select(F.unix_timestamp("ts").alias("t"))
        .collect()
    ]
    cells = Counter(((t // 86400 + 3) % 7, (t // 3600) % 24) for t in ts)
    dow_tot = defaultdict(int)
    for (d, _h), n in cells.items():
        dow_tot[d] += n
    ranks = {}
    for d in dow_tot:
        ordered = sorted(
            ((h, n) for (dd, h), n in cells.items() if dd == d),
            key=lambda x: (-x[1], x[0]),
        )
        for i, (h, _n) in enumerate(ordered, 1):
            ranks[(d, h)] = i
    got = QUERIES["events_dow_hour_profile"](spark, SF_SMOKE).collect()
    assert len(got) == len(cells)
    for r in got:
        assert r.n_events == cells[(r.dow, r.hod)]
        assert r.dow_share_ppm == r.n_events * 1_000_000 // dow_tot[r.dow]
        assert r.peak_rank == ranks[(r.dow, r.hod)]


def test_dow_profile_aggregates_before_windows(spark):
    """Both windows must run on the ≤168-row post-aggregate frame."""
    df = QUERIES["events_dow_hour_profile"](spark, SF_SMOKE)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.index("Window") < opt.index("Aggregate")
    assert_read_schema_pruned(df, max_columns=1)  # only ts is read


# --------------------------------------------------------------------------
# emb_jl_project / emb_jl_distortion
# --------------------------------------------------------------------------


def test_jl_project_matches_python(spark, monkeypatch):
    import kafka_streams_join_spark.queries.jl_projection as m

    vecs = {
        1: [((i * 37 + d * 11) % 19 - 9) / 7.0 for d in range(64) for i in (1,)],
        2: [((2 * 37 + d * 13) % 23 - 11) / 5.0 for d in range(64)],
    }
    emb = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    monkeypatch.setattr(m, "load_table", lambda s, dd, n: emb)
    got = {r.vec_id: r for r in m.emb_jl_project(spark, SF_SMOKE).collect()}
    import struct

    for vid, v in vecs.items():
        # float32 storage round-trip: what Spark's array<float> keeps
        v32 = [struct.unpack("f", struct.pack("f", x))[0] for x in v]
        for k in range(m._JL_OUT):
            acc = 0.0
            for d in range(m._JL_IN):
                acc = acc + m.JL_SIGNS[k][d] * v32[d]
            exp = float(
                Decimal(repr(acc)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
            assert got[vid][f"j{k}"] == exp, (vid, k)


def test_jl_distortion_basis_vector_is_exact_expectation(spark, monkeypatch):
    """For a standard basis vector x = e_d: ||Sx||² = Σ_k s_kd² = 16 and
    16·||x||² = 16 → ratio exactly 1e6 ppm, bucket 4."""
    import kafka_streams_join_spark.queries.jl_projection as m

    rows = []
    for i in range(6):
        v = [0.0] * 64
        v[i * 7] = 1.0
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    monkeypatch.setattr(m, "load_table", lambda s, dd, n: emb)
    got = m.emb_jl_distortion(spark, SF_SMOKE).collect()
    assert len(got) == 1
    assert got[0].bucket == 4
    assert got[0].n_vecs == 6
    assert got[0].min_ppm == got[0].max_ppm == 1_000_000


def test_jl_project_plan_zero_shuffle(spark):
    df = QUERIES["emb_jl_project"](spark, SF_SMOKE)
    assert "Exchange" not in explain_str(df, "simple")
    assert_read_schema_pruned(df, max_columns=2)
    assert_wholestage_codegen(df)


def test_jl_distortion_plan_narrow_agg_only(spark):
    df = QUERIES["emb_jl_distortion"](spark, SF_SMOKE)
    assert_no_wide_shuffle(df, "embedding", max_exchanges=0)
    assert_read_schema_pruned(df, max_columns=1)  # vec_id not even needed


# --------------------------------------------------------------------------
# pipeline_reservoir_sample
# --------------------------------------------------------------------------


def test_reservoir_matches_python_md5_order(spark, monkeypatch):
    import kafka_streams_join_spark.queries.sampling_ext as m

    rows = [
        (lang_i * 1000 + i, f"l{lang_i}", 10 + i)
        for lang_i in range(3)
        for i in range(30)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long"
    )
    monkeypatch.setattr(m, "load_table", lambda s, dd, n: docs)
    got = m.pipeline_reservoir_sample(spark, SF_SMOKE).collect()
    by_lang = defaultdict(list)
    for doc_id, lang, _n in rows:
        by_lang[lang].append(doc_id)
    expect = {}
    for lang, ids in by_lang.items():
        ordered = sorted(ids, key=lambda i: (_md5rank("res8_", i), i))
        for slot, doc_id in enumerate(ordered[: m._RES_K], 1):
            expect[(lang, slot)] = doc_id
    assert len(got) == 3 * m._RES_K
    for r in got:
        assert expect[(r.lang, r.slot)] == r.doc_id


def test_reservoir_plan_is_window_group_limit(spark):
    """The rank filter must plan as WindowGroupLimit (partial + final) —
    that per-task truncation IS the distributed reservoir."""
    df = QUERIES["pipeline_reservoir_sample"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert plan.count("WindowGroupLimit") >= 2, plan[:2000]
    assert_read_schema_pruned(df, max_columns=3)  # text never read


# --------------------------------------------------------------------------
# dedup_component_size_histogram
# --------------------------------------------------------------------------


def test_component_histogram_mass_conserved(spark):
    out = QUERIES["dedup_component_size_histogram"](spark, SF_SMOKE).collect()
    total = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in out) == total
    for r in out:
        assert r.cluster_size >= 1
        assert r.n_docs == r.cluster_size * r.n_clusters
        assert r.doc_share_ppm == r.n_docs * 1_000_000 // total


# --------------------------------------------------------------------------
# CDC chunking
# --------------------------------------------------------------------------

_LOREM = (
    "content defined chunking cuts where the content says so and a small "
    "edit only reshapes the chunks that touch it while every other chunk "
    "keeps its fingerprint which is the whole point of the rsync family "
    "of algorithms and the reason chunk stores deduplicate so well"
)


def test_cdc_chunks_reassemble_and_survive_edit(spark, monkeypatch):
    import kafka_streams_join_spark.queries.cdc_chunking as m

    docs = {
        1: ("s1", _LOREM),
        2: ("s2", _LOREM),  # exact copy, other source
        3: ("s1", _LOREM[:150] + " INSERTED WORDS " + _LOREM[150:]),
        4: ("s2", "tiny"),  # shorter than the window -> single chunk
    }
    frame = spark.createDataFrame(
        [(k, s, t) for k, (s, t) in docs.items()],
        "doc_id long, source string, text string",
    )
    monkeypatch.setattr(m, "load_table", lambda s, dd, n: frame)
    rows = m._chunk_frame(spark, SF_SMOKE).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append((r.h, r.clen))
    # chunks tile the document exactly
    for doc_id, (_s, text) in docs.items():
        assert sum(c for _h, c in by_doc[doc_id]) == len(text), doc_id
    # identical text -> identical chunk multiset, regardless of source
    assert sorted(by_doc[1]) == sorted(by_doc[2])
    # a middle insertion keeps some chunks and changes some
    h1 = Counter(h for h, _c in by_doc[1])
    h3 = Counter(h for h, _c in by_doc[3])
    assert sum((h1 & h3).values()) > 0, "no chunk survived the edit"
    assert h1 != h3
    # sub-window doc -> one chunk spanning the whole text
    assert by_doc[4] == [(by_doc[4][0][0], 4)]


def test_cdc_plans_text_never_shuffles(spark):
    for name in ("dedup_cdc_chunks", "dedup_cdc_cross_source"):
        df = QUERIES[name](spark, SF_SMOKE)
        assert_no_wide_shuffle(df, "text", max_exchanges=0)
        assert "CartesianProduct" not in explain_str(df), name


# --------------------------------------------------------------------------
# sim_prefix_dim_recall
# --------------------------------------------------------------------------


def test_prefix_recall_perfect_when_info_is_in_prefix(spark, monkeypatch):
    """Vectors whose dims 16..63 are all zero make the prefix cosine
    IDENTICAL to the full cosine — recall must be exactly 1e6 ppm."""
    import kafka_streams_join_spark.queries.matryoshka as mk
    import kafka_streams_join_spark.queries.similarity as sim

    rows = []
    for vid in [0, 100, 200] + list(range(1, 28)):
        v = [((vid * 31 + d * 17) % 97 + 1) / 97.0 for d in range(16)]
        rows.append((vid, v + [0.0] * 48))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    monkeypatch.setattr(mk, "load_table", lambda s, dd, n: emb)
    monkeypatch.setattr(sim, "load_table", lambda s, dd, n: emb)
    got = mk.sim_prefix_dim_recall(spark, SF_SMOKE).collect()
    assert sorted(r.query_id for r in got) == [0, 100, 200]
    for r in got:
        assert r.n_match == sim.TOP_K
        assert r.recall_ppm == 1_000_000


def test_prefix_recall_bounds_on_corpus(spark):
    got = QUERIES["sim_prefix_dim_recall"](spark, SF_SMOKE).collect()
    from kafka_streams_join_spark.queries.similarity import TOP_K

    assert got, "query stride produced no queries"
    for r in got:
        assert 0 <= r.n_match <= TOP_K
        assert r.recall_ppm == r.n_match * (1_000_000 // TOP_K)


# --------------------------------------------------------------------------
# blanket plan gate
# --------------------------------------------------------------------------


def test_round8_wave1_no_cartesians(spark):
    for name in _R8_WAVE1:
        df = QUERIES[name](spark, SF_SMOKE)
        assert "CartesianProduct" not in explain_str(df), name
