"""Property tests for the round-4c additions: the deterministic global
shuffle, incremental (batch-vs-base) minhash dedup, and the bigram LM
surprisal. Values are hash-certified by the DuckDB oracles; these tests pin
the SEMANTIC contracts the oracles can't state (determinism across runs,
cross-query consistency, structural invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_join_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_global_shuffle_is_a_permutation(spark):
    """Every document appears exactly once, and within each shard the
    positions are exactly 1..count (contiguous, no gaps/ties)."""
    out = QUERIES["pipeline_global_shuffle"](spark, SF_SMOKE).cache()
    try:
        n_docs = out.count()
        assert out.select("doc_id").distinct().count() == n_docs
        bad = (
            out.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"), F.min("pos").alias("lo"),
                 F.max("pos").alias("hi"), F.count_distinct("pos").alias("d"))
            .filter((F.col("lo") != 1) | (F.col("hi") != F.col("n"))
                    | (F.col("d") != F.col("n")))
            .count()
        )
        assert bad == 0
    finally:
        out.unpersist()


def test_global_shuffle_is_rerun_stable(spark):
    """Re-running yields the identical (shard, pos) address for every doc —
    the property rand()-based shuffles cannot give and the whole reason the
    order is an id-hash."""
    a = QUERIES["pipeline_global_shuffle"](spark, SF_SMOKE)
    b = QUERIES["pipeline_global_shuffle"](spark, SF_SMOKE)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_incremental_minhash_agrees_with_full_self_join(spark):
    """Cross-query consistency: the incremental probe and the full-corpus
    self-join share one signature contract, so a batch doc's n_dups must
    equal the number of (batch, base) pairs the full dedup_minhash_lsh
    emits for it. One admission row per batch doc, kept <=> n_dups = 0."""
    inc = QUERIES["dedup_incremental_minhash"](spark, SF_SMOKE).cache()
    try:
        rows = {r.doc_id: r for r in inc.collect()}
        batch_ids = set(rows)
        assert all(r.kept == (r.n_dups == 0) for r in rows.values())
        assert all(d % 10 == 3 for d in batch_ids)

        pairs = QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE).collect()
        expected: dict[int, int] = {d: 0 for d in batch_ids}
        for p in pairs:
            for me, other in ((p.doc_a, p.doc_b), (p.doc_b, p.doc_a)):
                if me % 10 == 3 and other % 10 != 3:
                    expected[me] += 1
        assert {d: r.n_dups for d, r in rows.items()} == expected
    finally:
        inc.unpersist()


def test_bigram_surprisal_counts_and_bounds(spark):
    """n_bigrams = n_tokens - 1 for every scored doc (docs with < 2 tokens
    are absent), and MLE conditional surprisal is never negative."""
    bs = QUERIES["text_bigram_surprisal"](spark, SF_SMOKE).cache()
    try:
        assert bs.filter(F.col("avg_bigram_surprisal") < 0).count() == 0
        tc = QUERIES["text_token_count"](spark, SF_SMOKE).select(
            "doc_id", "n_tokens"
        )
        joined = bs.join(tc, "doc_id", "full")
        assert joined.filter(
            (F.col("n_tokens") >= 2) & (F.col("n_bigrams") != F.col("n_tokens") - 1)
        ).count() == 0
        assert joined.filter(
            (F.col("n_tokens") < 2) & F.col("n_bigrams").isNotNull()
        ).count() == 0
    finally:
        bs.unpersist()


def test_fuzzy_edit_distance_independently_verified(spark):
    """Every emitted pair re-checked by an independent pure-Python DP
    Levenshtein over the same match keys: distances must agree exactly and
    respect the threshold; pairs are canonical (doc_a < doc_b)."""
    from kafka_streams_join_spark.queries.fuzzy import KEY_LEN, MAX_EDIT_DIST

    pairs = QUERIES["dedup_fuzzy_edit_distance"](spark, SF_SMOKE).collect()
    assert pairs, "smoke corpus should contain fuzzy pairs"
    from kafka_streams_join_spark.sources.parquet import load_table

    titles = {
        r.doc_id: r.title
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.lower(F.substring("text", 1, KEY_LEN)).alias("title"))
        .collect()
    }

    def lev(s: str, t: str) -> int:
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    for p in pairs:
        assert p.doc_a < p.doc_b
        assert 0 <= p.edit_dist <= MAX_EDIT_DIST
        assert lev(titles[p.doc_a], titles[p.doc_b]) == p.edit_dist


def test_char_entropy_information_bounds(spark):
    """0 <= H <= ln(n_distinct_chars) for every doc (4-dp slack), and a
    single-character text has exactly zero entropy."""
    import math

    rows = QUERIES["text_char_entropy"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert -1e-4 <= r.char_entropy <= math.log(r.n_distinct_chars) + 1e-4, r
    one = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    from kafka_streams_join_spark.queries.quality import text_char_entropy  # noqa: F401
    ent = one.selectExpr(
        "round(-aggregate(array_sort(array_distinct(split(text, ''))), 0.0D,"
        " (acc, ch) -> acc + (size(filter(split(text, ''), x -> x = ch)) * 1.0"
        "   / size(split(text, ''))) * ln(size(filter(split(text, ''), x -> x = ch))"
        "   * 1.0 / size(split(text, '')))), 4) AS h"
    ).collect()[0].h
    assert ent == 0.0


def test_group_holdout_isolates_every_source(spark):
    """The leakage contract: every source maps to exactly ONE fold, folds
    cover the corpus, and fold membership is a pure function of the
    source name (rerun-stable)."""
    rows = QUERIES["pipeline_group_holdout_split"](spark, SF_SMOKE).collect()
    assert rows
    folds: dict[str, set] = {}
    for r in rows:
        folds.setdefault(r.source, set()).add(r.fold)
    assert all(len(v) == 1 for v in folds.values()), folds
    again = {
        (r.source, r.fold) for r in
        QUERIES["pipeline_group_holdout_split"](spark, SF_SMOKE).collect()
    }
    assert again == {(r.source, r.fold) for r in rows}


def test_char_entropy_negative_zero_normalized():
    """Regression pin for the -0.0 parity trap: a constant-character doc
    has exactly zero entropy, and the DuckDB oracle's negated DOUBLE fold
    must canonicalize to +0.0 (not -0.0) after the `+ 0.0` normalization,
    matching Spark's 0.0 under the float-formatted parity hash."""
    import math
    import duckdb

    v = duckdb.sql(
        "SELECT round(-list_sum(list_transform(['a'],"
        " ch -> (1 * 1.0 / 1) * ln(1 * 1.0 / 1))), 4) + 0.0"
    ).fetchone()[0]
    assert v == 0.0 and math.copysign(1.0, v) == 1.0


def test_hybrid_rrf_fuses_both_rankers(spark):
    """RRF sanity: fused scores equal the reciprocal-rank formula applied
    to the emitted leg ranks, ordering follows the fused score, and a doc
    leading BOTH legs must lead the fusion."""
    rows = QUERIES["retrieval_hybrid_rrf"](spark, SF_SMOKE).collect()
    assert rows
    from kafka_streams_join_spark.queries.retrieval import _RRF_K

    for r in rows:
        expect = 0.0
        if r.rnk_bm25 is not None:
            expect += 1.0 / (_RRF_K + r.rnk_bm25)
        if r.rnk_tfidf is not None:
            expect += 1.0 / (_RRF_K + r.rnk_tfidf)
        assert abs(r.rrf - round(expect, 6)) < 1e-9, r
    ordered = sorted(rows, key=lambda r: (-r.rrf, r.doc_id))
    assert [r.rnk for r in ordered] == list(range(1, len(rows) + 1))
    both_first = [r for r in rows if r.rnk_bm25 == 1 and r.rnk_tfidf == 1]
    if both_first:
        assert both_first[0].rnk == 1


def test_table_profile_invariants(spark):
    """One row per profiled column; n_distinct <= n_nonnull <= n_rows;
    the primary key profiles as fully distinct and fully non-null."""
    rows = {r.column_name: r for r in QUERIES["dq_table_profile"](spark, SF_SMOKE).collect()}
    from kafka_streams_join_spark.queries.data_quality import _PROFILE_COLS

    assert set(rows) == set(_PROFILE_COLS)
    for r in rows.values():
        assert r.n_distinct <= r.n_nonnull <= r.n_rows, r
    pk = rows["event_id"]
    assert pk.n_distinct == pk.n_nonnull == pk.n_rows


def test_token_budget_plan_respects_budget_and_caps(spark):
    """The planned mixture must (a) never exceed any source's inventory,
    (b) cap rates at 100%, and (c) land the total planned tokens at or
    under the budget (floor division only rounds down)."""
    rows = QUERIES["pipeline_token_budget_plan"](spark, SF_SMOKE).collect()
    assert rows
    corpus_tokens = sum(r.total_tokens for r in rows)
    budget = corpus_tokens // 4
    for r in rows:
        assert 0 <= r.rate_ppm <= 1_000_000, r
        assert r.planned_tokens <= r.total_tokens, r
        assert r.planned_tokens <= r.target_tokens or r.rate_ppm == 1_000_000, r
    assert sum(r.planned_tokens for r in rows) <= budget


def test_markov_transition_mass_conserved(spark):
    """Each user's event sequence of length L contributes exactly L-1
    transitions, and per-from_type ppm rows can never exceed 1e6 total
    (floor division only loses mass, never invents it)."""
    from kafka_streams_join_spark.sources.parquet import load_table

    pairs = QUERIES["events_markov_transitions"](spark, SF_SMOKE).collect()
    assert pairs
    ev = load_table(spark, SF_SMOKE, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(p.n for p in pairs) == n_events - n_users
    by_from: dict[str, int] = {}
    for p in pairs:
        by_from[p.from_type] = by_from.get(p.from_type, 0) + p.prob_ppm
    assert all(v <= 1_000_000 for v in by_from.values()), by_from


def test_pmi_floor_and_ordering(spark):
    """Every collocation respects the frequency floor and the rank order
    follows (pmi desc, w1, w2) exactly."""
    from kafka_streams_join_spark.queries.text_ext import _PMI_MIN_COUNT

    rows = QUERIES["text_pmi_collocations"](spark, SF_SMOKE).collect()
    assert rows
    assert all(r.c2 >= _PMI_MIN_COUNT for r in rows)
    ordered = sorted(rows, key=lambda r: (-r.pmi, r.w1, r.w2))
    assert [r.rnk for r in ordered] == list(range(1, len(rows) + 1))


def test_incremental_merge_consistent_and_flag_live(spark):
    """All merged groups must certify consistent — and the flag is LIVE:
    merging only the old batch (a deliberately broken merge that drops the
    delta) must disagree with the from-scratch aggregate."""
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = QUERIES["agg_incremental_merge"](spark, SF_SMOKE).collect()
    assert rows
    assert all(r.merge_consistent == 1 for r in rows)

    li = load_table(spark, SF_SMOKE, "lineitem")
    cutoff = F.lit("1997-01-01").cast("date")
    old_only = (
        li.filter(F.col("l_shipdate") < cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    full = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    assert {(r.l_returnflag, r.l_linestatus): r.cnt for r in old_only} != {
        (r.l_returnflag, r.l_linestatus): r.cnt for r in full
    }


def test_recall_report_bounds_and_agreement(spark):
    """Per-query recall is in [0, 1e6] ppm, n_hit <= n_bf <= TOP_K, and the
    aggregate recall agrees with the existing recall-floor contract (the
    report can't claim less than the floor the ANN tests pin)."""
    from kafka_streams_join_spark.queries.similarity import TOP_K

    rows = QUERIES["sim_recall_report"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hit <= r.n_bf <= TOP_K, r
        assert r.recall_ppm == r.n_hit * 1_000_000 // r.n_bf, r
    # claim (c): the report's aggregate recall honors the same floor the
    # ANN suite pins (test_extensions.test_ann_recall_at_5 uses 0.2)
    agg = sum(r.n_hit for r in rows) / sum(r.n_bf for r in rows)
    assert agg > 0.2, f"aggregate recall collapsed: {agg}"


def test_compaction_plan_groups_are_bounded_and_cover(spark):
    """Total bytes are conserved, every partition starts at group 0, and
    the running-sum CUT RULE holds: for every non-final group id g, the
    cumulative bytes of all groups with id <= g reach (g+1)*TARGET —
    otherwise the next group's first file could not have crossed the
    boundary. (Group ids may legitimately SKIP: one file larger than 2x
    the target jumps several boundaries at once, so contiguity is NOT an
    invariant and is deliberately not asserted.)"""
    from kafka_streams_join_spark.queries.layout import _COMPACT_TARGET
    from kafka_streams_join_spark.sources.parquet import load_table

    rows = QUERIES["layout_compaction_plan"](spark, SF_SMOKE).collect()
    assert rows
    total = sum(r.group_bytes for r in rows)
    assert total == load_table(spark, SF_SMOKE, "documents").agg(
        F.sum("n_chars")
    ).collect()[0][0]
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for src, grps in by_source.items():
        grps.sort(key=lambda g: g.file_group)
        assert grps[0].file_group == 0, (src, grps[0])
        cum = 0
        for g in grps[:-1]:
            cum += g.group_bytes
            assert cum >= (g.file_group + 1) * _COMPACT_TARGET, (src, g, cum)


def test_normalized_dedup_collapses_at_least_as_much_as_exact(spark):
    """Normalization can only merge groups, never split them: the
    normalized group count is <= the raw-exact group count, and every
    group's n_raw_variants is >= 1."""
    norm = QUERIES["dedup_normalized_exact"](spark, SF_SMOKE).collect()
    exact = QUERIES["dedup_exact"](spark, SF_SMOKE).collect()
    assert len(norm) <= len(exact)
    assert all(r.n_raw_variants >= 1 for r in norm)
    assert sum(r.n_copies for r in norm) == sum(r.n_copies for r in exact)


def test_fuzzy_dedup_randomized_differential(spark, tmp_path):
    """Randomized differential test: on synthetic corpora of base strings
    plus edited variants, the Spark query must equal a brute-force Python
    reference that applies the SAME blocking contract (shared kept segment
    at equal position, DF cap) and exact DP distances — catching any drift
    between the distributed plan and the documented candidate semantics."""
    import itertools
    import random

    from kafka_streams_join_spark.queries.fuzzy import (
        KEY_LEN,
        MAX_EDIT_DIST,
        SEG_DF_CAP,
        SEG_LEN,
        _N_SEGS,
    )

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    rng = random.Random(1234)
    alphabet = "abcdef "
    docs = []
    doc_id = 0
    for base_i in range(6):
        base = "".join(rng.choice(alphabet) for _ in range(KEY_LEN + 20))
        for variant in range(rng.randint(1, 3)):
            s = list(base)
            for _ in range(rng.randint(0, 5)):
                op = rng.choice("sid")
                pos = rng.randrange(len(s))
                if op == "s":
                    s[pos] = rng.choice(alphabet)
                elif op == "i":
                    s.insert(pos, rng.choice(alphabet))
                elif len(s) > 1:
                    del s[pos]
            docs.append((doc_id, "".join(s), "en", f"src{base_i}", len(s)))
            doc_id += 1

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    got = {
        (r.doc_a, r.doc_b, r.edit_dist)
        for r in QUERIES["dedup_fuzzy_edit_distance"](spark, sf_dir).collect()
    }

    titles = {d: t[:KEY_LEN].lower() for d, t, *_ in docs}
    segs = {
        d: [t[SEG_LEN * i : SEG_LEN * (i + 1)] for i in range(_N_SEGS)]
        for d, t in titles.items()
    }
    df_count: dict[tuple, int] = {}
    for d, ss in segs.items():
        for i, s in enumerate(ss):
            df_count[(i, s)] = df_count.get((i, s), 0) + 1
    expected = set()
    for a, b in itertools.combinations(sorted(titles), 2):
        blocked = any(
            sa == sb and df_count[(i, sa)] <= SEG_DF_CAP
            for i, (sa, sb) in enumerate(zip(segs[a], segs[b]))
        )
        if not blocked:
            continue
        d = lev(titles[a], titles[b])
        if d <= MAX_EDIT_DIST:
            expected.add((a, b, d))
    assert got == expected


def test_compaction_plan_oversized_file_skips_group_ids(spark, tmp_path):
    """A file larger than 2x the target jumps several group boundaries at
    once: ids legitimately SKIP (the invariant contiguity would wrongly
    forbid), each oversized file sits alone in its group, and the cut-rule
    cumulative bound still holds. Smoke data never exercises this path —
    this synthetic corpus does."""
    from kafka_streams_join_spark.queries.layout import _COMPACT_TARGET

    t = _COMPACT_TARGET
    sizes = [3 * t + 10, 100, 90, t // 2, t // 2]  # one whale, small fry
    docs = [
        (i, "x", "en", "srcA", n) for i, n in enumerate(sizes)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    rows = sorted(
        QUERIES["layout_compaction_plan"](spark, sf_dir).collect(),
        key=lambda r: r.file_group,
    )
    ids = [r.file_group for r in rows]
    # whale (size-desc first) fills groups 0-3's span alone: next file's
    # exclusive prefix is 3t+10 -> group 3; so ids are {0, 3, ...} — skipped
    assert ids[0] == 0 and rows[0].n_files == 1 and rows[0].group_bytes == 3 * t + 10
    assert ids[1] == 3, ids
    assert ids != list(range(len(ids)))  # the contiguity assumption is false
    cum = 0
    for r in rows[:-1]:
        cum += r.group_bytes
        assert cum >= (r.file_group + 1) * t, (r, cum)
    assert sum(r.group_bytes for r in rows) == sum(sizes)


def test_token_budget_plan_zero_token_source_guarded(spark, tmp_path):
    """A source whose documents are all empty (0 estimated tokens) must
    plan rate 0 / planned 0 — not divide by zero (DuckDB errors on //0,
    Spark div yields NULL; either would break parity without the guard)."""
    docs = [(0, "", "en", "empty_src", 0), (1, "", "en", "empty_src", 0)] + [
        (i, "x" * 400, "en", "full_src", 400) for i in range(2, 10)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    rows = {r.source: r for r in QUERIES["pipeline_token_budget_plan"](spark, sf_dir).collect()}
    empty = rows["empty_src"]
    assert empty.total_tokens == 0
    assert empty.rate_ppm == 0 and empty.planned_tokens == 0
    full = rows["full_src"]
    assert full.total_tokens > 0 and full.rate_ppm > 0
