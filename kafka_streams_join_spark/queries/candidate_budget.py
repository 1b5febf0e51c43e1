"""Candidate-budget audit across the blocked dedup tiers (round 13).

Every near-dup tier in this engine is CANDIDATE-GENERATION + VERIFY: the
scale contract is that candidates come from bounded buckets (minhash band
collisions, SimHash multi-index chunk collisions, DF-capped rare-shingle
co-occurrence), never an all-pairs stage. That makes the CANDIDATE COUNT —
not the survivor count — the tier's cost driver at 100 TB: verification
work, shuffle bytes, and state all scale with it. This audit measures each
tier's budget in one report:

- ``n_candidates``     — distinct pairs the bucket stage emits (the cost),
- ``cand_per_doc_ppm`` — candidates per corpus document × 10⁶ (the dial an
  operator tracks as the corpus grows: a tier whose candidates-per-doc
  RISES with scale is drifting toward quadratic and needs its knobs — band
  count, probe radius, DF cap — retightened; the SCALING.md ledger is the
  cross-SF view of the same number),
- ``n_survivors`` / ``precision_ppm`` — verified pairs and survivors per
  candidate: LOW precision means the tier burns verification work on false
  candidates (loosen = cheaper, tighten = more recall; the recall side is
  ``dedup_band_recall_audit``'s job).

The candidate stages are the REGISTERED tiers' own builders, shared
verbatim (``_ngram_candidates``, ``_minhash_bands`` over
``_doc_shingle_sets``, ``_simhash_mih_pairs``), and the survivor counts
compose the registered oracle SQL verbatim — the ``sim_recall_report``
pattern — so this audit certifies the production code paths, not copies.

Scale: three bucket-bounded candidate stages (each already individually
plan-gated), six 1-row aggregates, a 3-row report. Counts widen to
DECIMAL(38,0)/HUGEINT before the ppm products (candidate counts at the
100-TB contract exceed 2⁶³ ÷ 10⁶).

Two registered modes (round 14, VERDICT r13 task 2):

- ``dedup_candidate_budget_audit`` — DIRECT: recomputes both legs in one
  query. Deliberately UNSTAGED between the candidate and survivor legs
  (the ``_doc_shingle_sets`` recompute-beats-persist call, re-measured in
  round 13): persisting the wide INTERMEDIATE frames (the ~4.8M-row
  simhash MIH pair frame, the docsets frame) made the audit 2-4× SLOWER
  (16.9-40.6 s vs 7.3-9.0 s best-of-3) — the persisted forms are as large
  as the work above them.
- ``dedup_candidate_budget_audit_materialized`` — PRODUCTION shape: the
  audit reads its counts off materialized pair TABLES (candidates and
  survivors per tier), which at 100 TB already exist because the pipeline
  wrote them when the tiers ran. Here ``staged_table`` (the
  ``dedup_tier_report`` destage pattern) materializes each FINAL pair
  list — small, unlike the intermediates above — once per process; the
  ngram survivor table IS the shared ``neardup_pairs`` stage five other
  queries read. First invocation pays the one-time stage build; every
  later invocation is six counts over tiny parquet tables. Both modes
  are pytest-proven byte-identical and share one oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged_table
from ..sources.parquet import load_table
from .dedup import (
    _HASH_PARAMS,
    _MINHASH_SQL_PARAMS,
    _P,
    _SHINGLE_ARRAY,
    _TOKS as _TOKS_DEDUP,
    _TOKS_SQL,
    JACCARD_THRESHOLD,
    SHINGLE_DF_CAP,
    SIMHASH_BITS,
    SIMHASH_MAX_HAMMING,
    SIMHASH_MIH_CHUNKS,
    _MIH_WIDTH,
    _SHINGLES_SQL,
    _BANDS,
    _K,
    _doc_shingle_sets,
    _minhash_bands,
    _mih_probe_masks,
    _ngram_candidates,
    _simhash_mih_pairs,
    dedup_minhash_lsh,
    dedup_simhash,
    neardup_pairs,
)
from .registry import ORACLES, register

_MASKS = ", ".join(str(m) for m in _mih_probe_masks())

_MH_CAND_SQL = f"""
    {_SHINGLES_SQL},
    hashed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h32
      FROM sh
    ),
    params(i, a, b) AS (VALUES {_MINHASH_SQL_PARAMS}),
    mh AS (
      SELECT doc_id, i AS hash_idx, min((a * h32 + b) % {_P}) AS mh
      FROM hashed, params GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, hash_idx // {_K // _BANDS} AS band,
             md5(string_agg(mh::VARCHAR, ',' ORDER BY hash_idx)) AS band_sig
      FROM mh GROUP BY doc_id, hash_idx // {_K // _BANDS}
    )
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id
"""

_NG_CAND_SQL = f"""
    {_SHINGLES_SQL},
    df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
    rare AS (
      SELECT s.doc_id, s.shingle FROM sh s
      JOIN df ON df.shingle = s.shingle AND df.df <= {SHINGLE_DF_CAP}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM rare a JOIN rare b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
"""

_SH_CAND_SQL = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents
    ),
    th AS (
      SELECT doc_id, CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS h
      FROM tok
    ),
    bits AS (
      SELECT doc_id, j, sum(((h >> j) & 1) * 2 - 1) AS s
      FROM th, unnest(generate_series(0, {SIMHASH_BITS - 1})) AS t(j)
      GROUP BY doc_id, j
    ),
    sig AS (
      SELECT doc_id,
             sum(CASE WHEN s > 0 THEN 1::BIGINT << j ELSE 0 END) AS simhash
      FROM bits GROUP BY doc_id
    ),
    chunks AS (
      SELECT doc_id, t.ck,
             (simhash >> (t.ck * {_MIH_WIDTH})) & {(1 << _MIH_WIDTH) - 1} AS cv
      FROM sig, unnest(generate_series(0, {SIMHASH_MIH_CHUNKS - 1})) AS t(ck)
    ),
    probes AS (
      SELECT doc_id, ck, xor(cv, m.m) AS cv
      FROM chunks, unnest([{_MASKS}]) AS m(m)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM probes a JOIN chunks b
      ON a.ck = b.ck AND a.cv = b.cv AND a.doc_id < b.doc_id
"""


_BUDGET_ORACLE = f"""
    WITH pop AS (SELECT count(*) AS n_docs FROM documents),
    t AS (
      SELECT 'minhash_band' AS tier,
             (SELECT count(*) FROM ({_MH_CAND_SQL})) AS n_candidates,
             (SELECT count(*)
              FROM ({ORACLES["dedup_minhash_lsh"]})) AS n_survivors
      UNION ALL
      SELECT 'ngram_rare_shingle',
             (SELECT count(*) FROM ({_NG_CAND_SQL})),
             (SELECT count(*) FROM ({ORACLES["dedup_ngram_jaccard"]}))
      UNION ALL
      SELECT 'simhash_mih',
             (SELECT count(*) FROM ({_SH_CAND_SQL})),
             (SELECT count(*) FROM ({ORACLES["dedup_simhash"]}))
    )
    SELECT t.tier,
           CAST(pop.n_docs AS BIGINT) AS n_docs,
           CAST(t.n_candidates AS BIGINT) AS n_candidates,
           CAST(CAST(t.n_candidates AS HUGEINT) * 1000000 // pop.n_docs
                AS BIGINT) AS cand_per_doc_ppm,
           CAST(t.n_survivors AS BIGINT) AS n_survivors,
           CAST(CAST(t.n_survivors AS HUGEINT) * 1000000
                // greatest(t.n_candidates, 1) AS BIGINT) AS precision_ppm
    FROM t CROSS JOIN pop
    """


def _mh_candidates(
    spark: SparkSession, sf_dir: str, bands: DataFrame | None = None
) -> DataFrame:
    """The minhash band-collision candidate stage (distinct pairs), shared
    verbatim with ``dedup_minhash_lsh``'s candidate leg. ``bands`` lets a
    caller that already built the band frame (the direct audit's combined
    shingle aggregate) reuse it — one definition for both modes, so the
    candidate spelling cannot drift (ADVICE r14)."""
    mh_bands = (
        bands
        if bands is not None
        else _minhash_bands(_doc_shingle_sets(spark, sf_dir))
    )
    # merge hint: corpus-scaled self-join sides, never broadcastable at
    # production scale (round 14; see dedup._simhash_mih_pairs).
    x, y = mh_bands.alias("x").hint("merge"), mh_bands.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_sig") == F.col("y.band_sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def _report_tail(
    spark: SparkSession, sf_dir: str, t: DataFrame
) -> DataFrame:
    """The shared exact-integer ppm projection over a (tier, n_candidates,
    n_survivors) count frame — one corpus-count crossJoin, DECIMAL(38,0)
    widening before the ppm products (module docstring)."""
    pop = F.broadcast(
        load_table(spark, sf_dir, "documents").agg(
            F.count(F.lit(1)).alias("n_docs")
        )
    )
    return t.crossJoin(pop).select(
        "tier",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_candidates").cast("bigint").alias("n_candidates"),
        F.expr(
            "cast(cast(n_candidates as decimal(38,0)) * 1000000 div n_docs"
            " as bigint)"
        ).alias("cand_per_doc_ppm"),
        F.col("n_survivors").cast("bigint").alias("n_survivors"),
        F.expr(
            "cast(cast(n_survivors as decimal(38,0)) * 1000000"
            " div greatest(n_candidates, 1) as bigint)"
        ).alias("precision_ppm"),
    )


def _budget_report(
    spark: SparkSession,
    sf_dir: str,
    tiers: list[tuple[str, DataFrame, DataFrame]],
) -> DataFrame:
    """The 3-row report over (tier, candidates, survivors) PAIR-FRAME
    pairs — six 1-row aggregates (the materialized mode's shape: each
    count is a scan of an already-written pair table)."""

    def tier(name: str, cand: DataFrame, surv: DataFrame) -> DataFrame:
        return (
            cand.agg(F.count(F.lit(1)).alias("n_candidates"))
            .crossJoin(
                F.broadcast(surv.agg(F.count(F.lit(1)).alias("n_survivors")))
            )
            .select(F.lit(name).alias("tier"), "n_candidates", "n_survivors")
        )

    t = tier(*tiers[0])
    for row in tiers[1:]:
        t = t.unionByName(tier(*row))
    return _report_tail(spark, sf_dir, t)


def _verified_report(
    spark: SparkSession,
    sf_dir: str,
    tiers: list[tuple[str, DataFrame]],
) -> DataFrame:
    """The 3-row report over VERIFIED candidate frames (doc_a, doc_b, ok):
    one distinct pair per row, ``ok`` = 1 iff the pair survives the tier's
    exact verification. ``n_candidates`` and ``n_survivors`` come out of
    ONE conditional aggregate per tier — the round-14 direct-mode rework
    (guide §2.4): the candidate stage, the tier's dominant cost, executes
    once instead of once per leg (counting distinct candidates and then
    re-deriving the same frame under the survivor leg doubled every
    tier's bucket self-join; ReuseExchange does not dedupe across the
    union branches)."""

    def tier(name: str, verified: DataFrame) -> DataFrame:
        return verified.agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.coalesce(F.sum("ok"), F.lit(0)).cast("long").alias(
                "n_survivors"
            ),
        ).select(F.lit(name).alias("tier"), "n_candidates", "n_survivors")

    t = tier(*tiers[0])
    for row in tiers[1:]:
        t = t.unionByName(tier(*row))
    return _report_tail(spark, sf_dir, t)


def _combined_shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE corpus shingle pass feeding BOTH shingle-keyed tiers (round 15,
    guide §2.4): the minhash tier's 32 permutation minima + 60-bit verify
    sets (``_doc_shingle_sets``' exact expressions) and the ngram tier's
    xxhash64 shingle sets (``_ngram_candidates``' exact expression) come
    out of a single explode → project → groupBy(doc_id) aggregate. Every
    per-tier hash value is unchanged — the tiers' candidate sets and
    verification ratios are bit-identical to the standalone builders —
    but the corpus is tokenized, shingled and shuffled ONCE instead of
    once per tier, and all six downstream consumers (bands, sa/sb, the
    inverted index, ga/gb) hang off one reusable Exchange."""
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TOKS_DEDUP).alias("toks")
    )
    sh = doc.select(
        "doc_id", F.explode(F.expr(_SHINGLE_ARRAY)).alias("shingle")
    )
    hashed = sh.select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10)
        .cast("long")
        .alias("h32"),
        F.xxhash64(F.md5("shingle")).alias("h60"),
        F.xxhash64("shingle").alias("hx"),
    )
    minhash_cols = [
        F.min(((F.lit(a) * F.col("h32") + F.lit(b)) % _P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(_HASH_PARAMS)
    ]
    return hashed.groupBy("doc_id").agg(
        *minhash_cols,
        F.collect_set("h60").alias("hs60"),
        F.collect_set("hx").alias("hs"),
    )


@register("dedup_candidate_budget_audit", oracle=_BUDGET_ORACLE)
def dedup_candidate_budget_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per dedup tier: candidate-pair budget, candidates per document, and
    verification precision — the numbers that decide whether a tier's
    knobs survive the next 10× of corpus growth (module docstring). The
    DIRECT mode, one-pass form (round 14): each tier builds its candidate
    frame ONCE, verifies every candidate, and a single conditional
    aggregate reads off both counts — the candidate count is the row
    count and the survivor count is the count of verified rows, exactly
    the relation the registered member queries define (``ok`` is the
    member's own verification predicate over the member's own frames).
    Round 15: the two shingle-keyed tiers share ONE combined shingle
    aggregate (``_combined_shingle_sets``) instead of tokenizing and
    shingling the corpus once each. Still deliberately unstaged between
    stages (intermediates out-size the work above them — measured,
    round 13)."""
    # one corpus shingle pass for tiers 1+2; per-tier hash values unchanged
    comb = _combined_shingle_sets(spark, sf_dir)
    # minhash tier: candidates = band collisions; ok = exact Jaccard >= t
    # over the same docsets frame (dedup_minhash_lsh's verification)
    docsets = comb.select(
        "doc_id", *[f"mh{i}" for i in range(_K)], "hs60"
    )
    mh_cand = _mh_candidates(spark, sf_dir, bands=_minhash_bands(docsets))
    sa, sb = docsets.alias("sa"), docsets.alias("sb")
    mh_inter = F.size(F.expr("array_intersect(sa.hs60, sb.hs60)"))
    mh_union = F.size(F.col("sa.hs60")) + F.size(F.col("sb.hs60")) - mh_inter
    mh_verified = (
        mh_cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (mh_inter / mh_union >= JACCARD_THRESHOLD)
            .cast("int")
            .alias("ok"),
        )
    )
    # ngram tier: candidates = rare-shingle co-occurrence; ok = exact
    # Jaccard >= t over the shared docsets (dedup_ngram_jaccard's verify);
    # the docsets frame is the combined aggregate's xxhash64 sets
    ng_cand, ng_sets = _ngram_candidates(
        spark,
        sf_dir,
        docsets=comb.select("doc_id", "hs", F.size("hs").alias("n")),
    )
    ga, gb = ng_sets.alias("ga"), ng_sets.alias("gb")
    ng_inter = F.size(F.expr("array_intersect(ga.hs, gb.hs)"))
    ng_jac = ng_inter / (F.col("ga.n") + F.col("gb.n") - ng_inter)
    ng_verified = (
        ng_cand.join(ga, F.col("doc_a") == F.col("ga.doc_id"))
        .join(gb, F.col("doc_b") == F.col("gb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (ng_jac >= JACCARD_THRESHOLD).cast("int").alias("ok"),
        )
    )
    # simhash tier: candidates = MIH chunk collisions; ok = exact Hamming
    # <= max (dedup_simhash's verify). ``ok`` is a function of the pair's
    # signatures, so the distinct lands one row per candidate pair.
    sh_verified = (
        _simhash_mih_pairs(spark, sf_dir)
        .select(
            "doc_a",
            "doc_b",
            (F.expr("bit_count(ha ^ hb)") <= SIMHASH_MAX_HAMMING)
            .cast("int")
            .alias("ok"),
        )
        .distinct()
    )
    return _verified_report(
        spark,
        sf_dir,
        [
            ("minhash_band", mh_verified),
            ("ngram_rare_shingle", ng_verified),
            ("simhash_mih", sh_verified),
        ],
    )


@register("dedup_candidate_budget_audit_materialized", oracle=_BUDGET_ORACLE)
def dedup_candidate_budget_audit_materialized(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The audit in its PRODUCTION shape (module docstring): every count
    reads off a materialized pair table. At 100 TB these tables exist
    because the pipeline wrote them when the tiers ran; here
    ``staged_table`` materializes each FINAL pair list once per process —
    the ngram survivor table is the shared ``neardup_pairs`` stage —
    and the report itself is six counts over tiny parquet scans.
    Byte-identical to the direct mode (pytest-pinned) and certified by
    the same oracle."""

    def tbl(key: str, df: DataFrame) -> DataFrame:
        return staged_table(df, f"{key}::{sf_dir}", src_dir=sf_dir)

    ng_cand, _ = _ngram_candidates(spark, sf_dir)
    return _budget_report(
        spark,
        sf_dir,
        [
            (
                "minhash_band",
                tbl("budget_cand_minhash", _mh_candidates(spark, sf_dir)),
                tbl(
                    "budget_surv_minhash",
                    dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b"),
                ),
            ),
            (
                "ngram_rare_shingle",
                tbl("budget_cand_ngram", ng_cand),
                neardup_pairs(spark, sf_dir),
            ),
            (
                "simhash_mih",
                tbl(
                    "budget_cand_simhash",
                    _simhash_mih_pairs(spark, sf_dir)
                    .select("doc_a", "doc_b")
                    .distinct(),
                ),
                tbl(
                    "budget_surv_simhash",
                    dedup_simhash(spark, sf_dir).select("doc_a", "doc_b"),
                ),
            ),
        ],
    )
