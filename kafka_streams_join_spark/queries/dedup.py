"""Deduplication operators (SURVEY §2.7) — exact through near-dup.

The large-scale-training-pipeline surface: exact hash dedup, n-gram Jaccard,
MinHash+LSH banding, SimHash hamming, and embedding-cosine near-dup. Every
stage is built from JVM-side expressions (md5/conv/explode/bit ops) so the
identical integer pipeline runs in the DuckDB oracle — no RNG at query time,
no Python in the hot path.

Scale design (100 TB):
- exact dedup shuffles once on the content hash (1024-way bucket key exposed
  by text_fingerprint);
- MinHash: explode to (doc, shingle) → hash-agg to signatures → shuffle on
  (band, signature) → candidate pairs; state per reducer is one band bucket,
  never the corpus. Verification joins only candidates — the O(n²) step is
  gone, which is the whole point of LSH;
- SimHash: two hash-aggs (doc×bit → doc), then the pigeonhole chunk
  equi-join (d=10 over 60 bits → 11 chunks, ≥1 must match exactly) for
  candidates, exact hamming verified on candidates only — no O(n²) stage;
- brute-force O(n²) variants exist only as oracle-checkable baselines.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.components import connected_components
from ..operators.guards import enforce_row_ceiling
from ..operators.staging import staged as _staged
from ..operators.staging import staged_table
from ..sources.parquet import load_table
from .registry import register

# --- shared tokenization / shingling contract (identical in oracles) -------
_TOKS = "split(regexp_replace(trim(text), '\\\\s+', ' '), ' ')"
_TOKS_SQL = "string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')"

# --- MinHash parameters: k hash functions h_i(x) = (a_i*x + b_i) mod P -----
# Deterministic (seeded) and inlined identically into Spark and oracle SQL.
_P = 2147483647  # 2^31 - 1 (Mersenne prime)
_K = 32
_BANDS = 8  # 8 bands x 4 rows
_rng = random.Random(42)
_HASH_PARAMS = [(_rng.randrange(1, 1 << 30), _rng.randrange(0, _P)) for _ in range(_K)]

JACCARD_THRESHOLD = 0.8

# The 3-word shingle array over ``toks`` — THE shingling contract, used by
# every near-dup query (its SQL twin is _SHINGLES_SQL below). ``toks`` is
# materialized as a column first so the regex split runs once per row, not
# once per lambda element. The CASE guards <3-token docs: ``sequence(1, 0)``
# in Spark counts DOWN ([1,0]), which would fabricate shingles DuckDB's
# generate_series(1,0)=[] does not.
_SHINGLE_ARRAY = (
    "CASE WHEN size(toks) < 3 THEN array()"
    " ELSE transform(sequence(1, size(toks) - 2),"
    "   i -> concat_ws(' ', toks[i - 1], toks[i], toks[i + 1])) END"
)


# Inverted-index DF cap (dedup_ngram_jaccard candidate stage): shingles in
# more documents than this are boilerplate and skip candidate generation —
# they'd contribute O(df²) pairs each. Verification always recounts on the
# full index, so the cap can only lose pairs whose EVERY shared shingle is
# hotter than the cap; the uncapped oracle certifies it loses none here.
SHINGLE_DF_CAP = 100
SIMHASH_BITS = 60
SIMHASH_MAX_HAMMING = 10
COSINE_DUP_THRESHOLD = 0.4


_SHINGLES_SQL = f"""
  WITH tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
  sh AS (
    SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS shingle
    FROM tok, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS t(i)
  )
"""


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text)      AS text_hash,
           min(doc_id)    AS rep_doc_id,
           count(*)       AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the lowest doc_id as the
    representative. One shuffle on the hash; dropDuplicates() plans the same."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _ngram_candidates(spark: SparkSession, sf_dir: str, docsets=None):
    """(cand, docsets): the shared candidate stage of the n-gram near-dup
    family — staged per-doc shingle-hash sets, the DF-capped inverted
    index, and the distinct candidate pair list. Jaccard and containment
    verify different ratios over the same machinery. A caller that already
    holds an equivalent (doc_id, hs, n) frame (the budget audit's combined
    shingle aggregate, round 15) passes it as ``docsets`` and the builder
    reuses it unstaged — the candidate/verify logic stays defined HERE so
    the two spellings cannot drift (ADVICE r14)."""
    if docsets is None:
        doc = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.expr(_TOKS).alias("toks")
        )
        hashed = doc.select(
            "doc_id",
            F.explode(
                F.expr(_SHINGLE_ARRAY)
            ).alias("shingle"),
        ).select("doc_id", F.xxhash64("shingle").alias("h"))
        # collect_set dedups per-doc shingles inside the aggregate — no
        # separate distinct() shuffle of raw shingle rows
        docsets = hashed.groupBy("doc_id").agg(F.collect_set("h").alias("hs"))
        docsets = _staged(
            docsets.select("doc_id", "hs", F.size("hs").alias("n"))
        )
    # the inverted index, re-derived from the aggregated arrays (map-side
    # explode of docsets' output — NOT a second corpus scan)
    exploded = docsets.select("doc_id", F.explode("hs").alias("h"))
    # document frequency per shingle via a COUNT window over the one
    # h-partitioned exchange (round 15, guide §2.4): the previous
    # aggregate-then-self-join spelling shuffled the index for the join
    # AND shuffled the (h, count) aggregate separately; the window
    # computes the same df on the already-sorted join layout, so the
    # rare (sub-cap) index comes out of a single Exchange
    rare = (
        exploded.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("df") <= SHINGLE_DF_CAP)
        .select("doc_id", "h")
    )
    # merge hint: both sides are the corpus-scaled rare-shingle index —
    # never broadcastable at production scale (see _simhash_mih_pairs).
    a = rare.alias("a").hint("merge")
    b = rare.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return cand, docsets


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE c * 1.0 / (sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup by exact 3-gram Jaccard >= 0.8, via the inverted
    (shingle → docs) index with a document-frequency cap.

    Two stages:
    1. **Candidate generation** over shingles appearing in ≤ SHINGLE_DF_CAP
       documents. An uncapped inverted index is quadratic in the hottest
       shingle (a boilerplate trigram in 10⁶ docs alone emits 5·10¹¹ pairs);
       the cap bounds every shingle's contribution to DF_CAP²/2 pairs, which
       is what keeps the self-join viable at 100 TB.
    2. **Exact verification**: candidates join back onto the FULL shingle
       index to recount the true intersection — the cap prunes pairs, never
       distorts a surviving pair's Jaccard. Integer ratio → engine-stable
       hash.

    Recall contract (why the output matches the uncapped oracle): a pair is
    missed only if EVERY shared shingle sits in > DF_CAP documents. Docs
    whose overlap is pure high-DF boilerplate are either exact dups (caught
    by dedup_exact) or below the 0.8 bar; the uncapped DuckDB oracle proves
    the cap loses nothing on this corpus, and DF_CAP is sized an order of
    magnitude above the corpus's true near-dup cluster width.

    Plan topology (the 100 TB property): the corpus is scanned ONCE. The
    tokenize→shingle→hash pipeline feeds a single hash-aggregate whose
    ``collect_set`` both dedups shingles per doc and materializes the
    verification sets; the inverted (shingle → docs) index is re-derived by
    exploding those arrays — a post-shuffle projection, not a rescan — so
    every downstream stage (DF counts, candidate self-join, verification)
    hangs off one Exchange that Spark's ReuseExchange then shares. The
    previous shape recomputed the scan+explode+distinct six times."""
    # shingles as 64-bit hashes: the inverted index and all joins key on a
    # long, not the 3-word string — same shuffle topology, ~10× less key data.
    # xxhash64 (JVM-native, codegen'd) rather than md5+hex-conv: the hash
    # never reaches the output — DF counts, candidate pairs, and Jaccard
    # ratios are all hash-independent — so the cheapest collision-free
    # (~2^-65/pair) function wins; the md5-keyed DuckDB oracle certifies no
    # collision bites at this corpus
    cand, docsets = _ngram_candidates(spark, sf_dir)
    sa = docsets.alias("sa")
    sb = docsets.alias("sb")
    inter = F.size(F.expr("array_intersect(sa.hs, sb.hs)"))
    jac = inter / (F.col("sa.n") + F.col("sb.n") - inter)
    return (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def _doc_shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hs32, hs60): distinct shingle-hash sets per document.

    Hashing happens on the exploded rows — a whole-stage-codegen'd tight
    loop — NOT inside array lambdas after collection (the interpreted-lambda
    md5 was the sf0.1 hot spot). One groupBy builds both sets: the 32-bit
    hashes feed the minhash permutations (products stay < 2^62), the 60-bit
    hashes give collision-free (~2^-61/pair) exact-Jaccard verification.
    """
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TOKS).alias("toks")
    )
    sh = doc.select(
        "doc_id",
        F.explode(
            F.expr(_SHINGLE_ARRAY)
        ).alias("shingle"),
    ).select("doc_id", F.md5("shingle").alias("m"))
    # h32 MUST stay md5-derived — the DuckDB oracle recomputes the same
    # minhash permutations from it, and band signatures (candidate sets)
    # depend on the values. h60 only feeds intersection COUNTS, which are
    # hash-independent, so the cheaper codegen'd xxhash64 over the md5
    # string replaces a second hex conv (same collision-freedom).
    hashed = sh.select(
        "doc_id",
        F.conv(F.substring("m", 1, 8), 16, 10).cast("long").alias("h32"),
        F.xxhash64("m").alias("h60"),
    )
    # minhash minima as K plain min() aggregate columns — partial+final hash
    # aggregate, fully whole-stage-codegen'd (no interpreted array lambdas),
    # map-side combined before the single shuffle on doc_id
    minhash_cols = [
        F.min(((F.lit(a) * F.col("h32") + F.lit(b)) % _P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(_HASH_PARAMS)
    ]
    # Deliberately NOT staged: measured interleaved at sf0.1 (cold cache),
    # recompute beats persist here every round (best 2.13s vs 2.40s) — the
    # staged form is WIDE (32 minhash columns + the hs60 array ≈ the full
    # shingle data), so the cache write costs more than the two extra
    # consumer recomputes save. Staging pays when the staged form is much
    # smaller than the work above it (ngram's docsets, PQ codebooks); at
    # 100 TB this table would be written once as a signatures table anyway.
    return hashed.groupBy("doc_id").agg(
        *minhash_cols, F.collect_set("h60").alias("hs60")
    )


def _band_sig_exprs() -> list[tuple[int, str]]:
    """(band, md5-SQL) per LSH band over the mh0..mh{K-1} columns — the
    banding contract shared by the batch self-join and the streaming
    row-local twin (streaming/neardup.py)."""
    rows_per_band = _K // _BANDS
    return [
        (
            b,
            "md5(concat_ws(',', {cols}))".format(
                cols=", ".join(
                    f"cast(mh{b * rows_per_band + r} as string)"
                    for r in range(rows_per_band)
                )
            ),
        )
        for b in range(_BANDS)
    ]


def minhash_signature_cols(df: DataFrame, text_col: str) -> DataFrame:
    """Adds mh0..mh{K-1} as ROW-LOCAL expressions over ``text_col`` — the
    per-record twin of ``_doc_shingle_sets``' aggregate minima, for inputs
    where each record IS one document (streams). Identical values by
    construction: the same tokenize/shingle/md5-h32 contract, and the min
    of each permutation over the shingle multiset equals the min over the
    distinct set. Pure projection (no shuffle, no state), so it composes
    with streaming frames unchanged. Docs with < 3 tokens have no
    shingles; their minima are NULL and the caller picks the fallback."""
    toks = f"split(regexp_replace(trim({text_col}), '\\\\s+', ' '), ' ')"
    shingle_arr = _SHINGLE_ARRAY.replace("toks", "_toks")
    df = df.withColumn("_toks", F.expr(toks)).withColumn(
        "_h32s",
        F.expr(
            f"transform({shingle_arr},"
            " s -> cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint))"
        ),
    )
    # one select, not K chained withColumns — identical result, O(1)
    # analysis depth instead of K nested projections
    mh = [
        F.expr(f"array_min(transform(_h32s, h -> ({a} * h + {b}) % {_P}))").alias(
            f"mh{i}"
        )
        for i, (a, b) in enumerate(_HASH_PARAMS)
    ]
    return df.select("*", *mh).drop("_toks", "_h32s")


def _minhash_bands(docsets: DataFrame) -> DataFrame:
    """(doc_id, band, band_sig) from the K minhash columns: md5 over each
    band's comma-joined minima, one explode per band, zero extra shuffles —
    at 100 TB the whole signature pipeline is map-side."""
    band_structs = ", ".join(
        f"named_struct('band', {b}, 'band_sig', {sig})"
        for b, sig in _band_sig_exprs()
    )
    return (
        docsets.select("doc_id", F.explode(F.expr(f"array({band_structs})")).alias("bs"))
        .select("doc_id", F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))
    )


_MINHASH_SQL_PARAMS = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(_HASH_PARAMS)
)

@register(
    "dedup_minhash_lsh",
    oracle=f"""
    {_SHINGLES_SQL},
    hashed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT)  AS h32,
             CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h60
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
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id
    ),
    sizes AS (SELECT doc_id, count(DISTINCT h60) AS n FROM hashed GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(DISTINCT a.h60) AS c
      FROM cand c
      JOIN hashed a ON a.doc_id = c.doc_a
      JOIN hashed b ON b.doc_id = c.doc_b AND b.h60 = a.h60
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE c * 1.0 / (sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup: shingle sets → 32 minhashes → 8 bands of 4 →
    candidates collide on a band signature → exact-Jaccard verification of
    candidates only, via array_intersect on the collected shingle sets.

    Scale path: ONE shuffle builds the per-doc sets; signatures are pure
    map-side expressions; the only joins are the (band, sig) self-join —
    key-bounded, bucket-sized state — and two broadcast-sized lookups of the
    (tiny) candidate list back onto the sets. No all-pairs stage anywhere."""
    docsets = _doc_shingle_sets(spark, sf_dir)
    bands = _minhash_bands(docsets)
    # merge hint: both sides are the corpus-scaled band frame (see
    # _simhash_mih_pairs for the sf10 AQE-broadcast failure this pins out).
    x = bands.alias("x").hint("merge")
    y = bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_sig") == F.col("y.band_sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = docsets.alias("sa")
    sb = docsets.alias("sb")
    inter = F.size(F.expr("array_intersect(sa.hs60, sb.hs60)"))
    union = F.size(F.col("sa.hs60")) + F.size(F.col("sb.hs60")) - inter
    jac = inter / union
    return (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# Multi-index Hamming search (Norouzi/Punjani/Fleet, "Fast Search in Hamming
# Space with Multi-Index Hashing", CVPR'12): split the signature into m
# chunks; a pair within total distance d has SOME chunk within per-chunk
# distance floor(d/m) (pigeonhole on the chunk distances). Candidates then
# come from an equi-join where one side also emits every chunk value within
# that per-chunk radius (XOR masks of weight ≤ r). Versus the naive d+1
# exact-match chunking (11 chunks of 5-6 bits → 32-64 buckets per chunk,
# nearly no pruning at corpus scale), 4 chunks of 15 bits give 32768 buckets
# per chunk at the cost of a bounded 121× probe-side explode — candidate
# volume drops ~16× and the explode is map-side, never shuffled twice.
#
# Chunk-count trade, measured (sf0.1, warm best-of-3): 6 chunks of 10 bits
# shrink the probe explode 484→66 rows/doc and run ~15% faster HERE
# (3.2 s vs 3.7 s, identical 334k-pair output) — but 10-bit chunks have
# only 1024 buckets, so at 10⁹ docs a bucket holds ~10⁶ docs and candidate
# pairs explode quadratically per bucket. MIH's own guidance is
# chunks ≈ bits/log₂(n); for the 100 TB target n, FEWER, WIDER chunks win,
# so 4×15 stands and the local delta is deliberately not taken.
SIMHASH_MIH_CHUNKS = 4
_MIH_WIDTH = SIMHASH_BITS // SIMHASH_MIH_CHUNKS
_MIH_RADIUS = SIMHASH_MAX_HAMMING // SIMHASH_MIH_CHUNKS


def _mih_probe_masks() -> list[int]:
    """All XOR masks of weight ≤ _MIH_RADIUS over a _MIH_WIDTH-bit chunk
    (radius 2 over 15 bits: 1 + 15 + 105 = 121 masks). Enumerated from the
    radius, not hardcoded, so changing SIMHASH_MAX_HAMMING cannot silently
    drop the higher-weight masks the recall guarantee needs."""
    from itertools import combinations

    return [
        sum(1 << i for i in bits)
        for k in range(_MIH_RADIUS + 1)
        for bits in combinations(range(_MIH_WIDTH), k)
    ]


@register(
    "dedup_simhash",
    oracle=f"""
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
      SELECT doc_id, sum(CASE WHEN s > 0 THEN 1::BIGINT << j ELSE 0 END) AS simhash
      FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 60-bit signature (token-frequency weighted bit
    votes), pairs within hamming distance 10.

    Scale path (multi-index Hamming search; the oracle's O(n²) join verifies
    it): the signature splits into 4 chunks of 15 bits — a pair within
    hamming 10 has some chunk within per-chunk distance floor(10/4) = 2
    (pigeonhole), so the probe side emits each chunk value XOR'd with every
    weight-≤2 mask (121 per chunk) and candidates come from an equi self-join
    on (chunk_idx, chunk_value) — SortMergeJoin, never BroadcastNestedLoop /
    cartesian (gated in tests/test_plans.py). Exact hamming is then verified
    on candidates only, and multi-chunk collisions dedup'd. Signature build
    is two hash-aggs; both explodes are map-side, each row shuffled once."""
    pairs = _simhash_mih_pairs(spark, sf_dir)
    ham = F.expr("bit_count(ha ^ hb)")
    return (
        pairs.filter(ham <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .distinct()
    )


def _simhash_mih_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-index-Hamming CANDIDATE stage of ``dedup_simhash``:
    signature build + chunk/probe explode + the (chunk, value) equi
    self-join, BEFORE the exact-Hamming verify and the multi-chunk-
    collision distinct. Shared with ``dedup_candidate_budget_audit``,
    which counts this stage — the cost driver at scale — separately from
    the verified survivors."""
    doc = load_table(spark, sf_dir, "documents")
    tok = doc.select("doc_id", F.explode(F.expr(_TOKS)).alias("token"))
    th = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    # per-bit votes as 60 plain sum() columns (the minhash-minima trick):
    # partial+final hash aggregate over the token rows, fully codegen'd —
    # an explode to (token × bit) rows would push 60× the rows through the
    # shuffle for the same 60 numbers
    vote_cols = [
        F.sum(F.expr(f"(shiftright(h, {j}) & 1) * 2 - 1")).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    votes = th.groupBy("doc_id").agg(*vote_cols)
    sig_expr = "cast(" + " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j}L ELSE 0L END)" for j in range(SIMHASH_BITS)
    ) + " as bigint)"
    sig = _staged(votes.select("doc_id", F.expr(sig_expr).alias("simhash")))
    mask = 2**_MIH_WIDTH - 1
    chunk_structs = ", ".join(
        f"named_struct('ck', {i}, 'cv',"
        f" shiftright(simhash, {i * _MIH_WIDTH}) & {mask})"
        for i in range(SIMHASH_MIH_CHUNKS)
    )
    exact = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.expr(f"array({chunk_structs})")).alias("c"),
    ).select("doc_id", "simhash", F.col("c.ck").alias("ck"), F.col("c.cv").alias("cv"))
    probe_masks = ", ".join(str(m) for m in _mih_probe_masks())
    probe = exact.select(
        "doc_id",
        "simhash",
        "ck",
        F.explode(
            F.expr(f"transform(array({probe_masks}), m -> cv ^ m)")
        ).alias("cv"),
    )
    # merge hint (round 14): BOTH sides of the MIH candidate self-join
    # scale with the corpus, so broadcast is never the right physical
    # strategy here — yet AQE's runtime conversion sees the exact side's
    # highly-compressible shuffle bytes under the 10 MB threshold and
    # broadcasts it; at the sf10 scale ledger the decompressed build
    # relation exceeded spark.driver.maxResultSize (>1 GiB) and killed
    # the query. The hint pins SortMergeJoin, which the static planner
    # already chose (SCALING.md second decade, the round-14 finding).
    a = probe.alias("a").hint("merge")
    b = exact.alias("b")
    return a.join(
        b,
        (F.col("a.ck") == F.col("b.ck"))
        & (F.col("a.cv") == F.col("b.cv"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.simhash").alias("ha"),
        F.col("b.simhash").alias("hb"),
    )


# cosine in the oracle: float32 in, float64 accumulation (list_sum)
_COS_SQL = (
    "list_sum(list_transform(list_zip(a.embedding, b.embedding),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    " / sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    "   * list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


_COS_BLOCK = 500  # vectors per GEMM block: B² pair-scores per task

# Executable test-scale ceiling for the exact all-pairs baseline: 100k
# vectors is already ~1e10 pair scores (hours of cluster GEMM) — anything
# larger is a misuse of the exact baseline, not a bigger test.
_COS_CEILING = 100_000


def _block_cosine_batches(it):
    """mapInPandas kernel: one float64 GEMM per block-pair row; emits pairs
    (vec_a < vec_b) at or above COSINE_DUP_THRESHOLD. blk = vec_id / B is
    monotone, so x_blk < y_blk already implies vec_a < vec_b; the id mask
    only prunes the diagonal block."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(
        {
            "vec_a": pd.Series(dtype="int64"),
            "vec_b": pd.Series(dtype="int64"),
            "cos_raw": pd.Series(dtype="float64"),
        }
    )
    for pdf in it:
        outs = []
        for _, row in pdf.iterrows():
            ida = np.array([r["vec_id"] for r in row["x_rows"]], dtype=np.int64)
            idb = np.array([r["vec_id"] for r in row["y_rows"]], dtype=np.int64)
            A = np.stack(
                [np.asarray(r["embedding"], dtype=np.float64) for r in row["x_rows"]]
            )
            B = np.stack(
                [np.asarray(r["embedding"], dtype=np.float64) for r in row["y_rows"]]
            )
            cos = (A @ B.T) / np.sqrt(
                (A * A).sum(1)[:, None] * (B * B).sum(1)[None, :]
            )
            ii, jj = np.nonzero(
                (cos >= COSINE_DUP_THRESHOLD) & (ida[:, None] < idb[None, :])
            )
            if len(ii):
                outs.append(
                    pd.DataFrame(
                        {"vec_a": ida[ii], "vec_b": idb[jj], "cos_raw": cos[ii, jj]}
                    )
                )
        yield pd.concat(outs) if outs else empty


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_COS_SQL}, 3) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_COS_SQL} >= {COSINE_DUP_THRESHOLD}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: all pairs with cosine >= 0.4, as a blocked
    GEMM — vectors grouped into blocks of ``_COS_BLOCK``, block-pairs joined
    with ``x.blk <= y.blk`` (the triangular pair space, each unordered pair
    exactly once), and each block-pair scored with one NumPy float64 matmul
    inside ``mapInPandas``.

    This replaced a pure-expression (zip_with/aggregate) BNLJ that was 35×
    slower: interpreted per-pair array lambdas are the slow path; one Arrow
    batch + BLAS per block-pair is the documented fast path for arithmetic
    Catalyst can't vectorize. Scale: block-pairs grow as (N/B)², but each
    task is an independent B×B GEMM — the pair space distributes evenly and
    no task ever holds more than two blocks (2·B·dim floats) in memory. The
    true 100 TB path prunes the pair space first (sim_lsh_ann's bucketing);
    this is the exact baseline it's measured against — and that test-scale
    contract is EXECUTABLE: past ``_COS_CEILING`` corpus rows the operator
    raises ``TestScaleCeilingError`` naming ``dedup_embedding_lsh``
    (queries/dedup_scale.py) as the scale path, instead of silently
    building an (N/B)**2 plan."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    enforce_row_ceiling(
        emb,
        op_name="dedup_embedding_cosine",
        ceiling=_COS_CEILING,
        scale_path="dedup_embedding_lsh (queries/dedup_scale.py) — "
        "hyperplane-LSH bucketed candidates, linear in the corpus",
        cache_key=sf_dir,
    )
    blks = (
        emb.withColumn("blk", (F.col("vec_id") / _COS_BLOCK).cast("int"))
        .groupBy("blk")
        .agg(F.collect_list(F.struct("vec_id", "embedding")).alias("rows"))
    )
    x = blks.select(F.col("blk").alias("x_blk"), F.col("rows").alias("x_rows"))
    y = blks.select(F.col("blk").alias("y_blk"), F.col("rows").alias("y_rows"))
    pairs = x.join(y, F.col("x_blk") <= F.col("y_blk"))
    scored = pairs.mapInPandas(
        _block_cosine_batches, "vec_a bigint, vec_b bigint, cos_raw double"
    )
    return scored.select("vec_a", "vec_b", F.round("cos_raw", 3).alias("cos"))


def neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The certified near-dup pair list (``dedup_ngram_jaccard``'s output,
    id columns only), materialized ONCE per process via ``staged_table``:
    five registered queries consume this frame (cluster canonical, keep
    longest, band recall audit, source affinity, split leakage audit), and
    the bench/parity harnesses clear the block cache between queries, so a
    cache-level stage could never be shared across them. The parquet stage
    is pair-list-sized (orders of magnitude below the corpus)."""
    return staged_table(
        dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b"),
        f"neardup_pairs::{sf_dir}",
        src_dir=sf_dir,
    )


def neardup_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component labels (doc_id, label) over the near-dup pair
    graph, materialized once per process — the O(diameter) min-label
    propagation is the most expensive shared stage in the dedup family
    (consumed by ``dedup_cluster_canonical``, ``dedup_keep_longest``,
    ``dedup_component_size_histogram``, ``dedup_tier_report``)."""
    return staged_table(
        connected_components(
            neardup_pairs(spark, sf_dir).select(
                F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
            )
        ).toDF("doc_id", "label"),
        f"neardup_labels::{sf_dir}",
        src_dir=sf_dir,
    )


_CC_PAIRS_SQL = f"""
  sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
  inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ),
  pairs AS (
    SELECT i.doc_a, i.doc_b
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= {JACCARD_THRESHOLD}
  ),
  edges AS (
    SELECT doc_a AS s, doc_b AS d FROM pairs
    UNION
    SELECT doc_b AS s, doc_a AS d FROM pairs
  ),
  reach AS (
    SELECT DISTINCT s AS n, s AS m FROM edges
    UNION
    SELECT e.s AS n, r.m FROM edges e JOIN reach r ON r.n = e.d
  ),
  comp AS (SELECT n AS doc_id, min(m) AS canonical_id FROM reach GROUP BY n)
"""


@register(
    "dedup_cluster_canonical",
    # WITH RECURSIVE: the shingle fragment opens the WITH list; reach is the
    # recursive member (UNION dedup terminates it on cyclic components).
    oracle=_SHINGLES_SQL.replace("WITH ", "WITH RECURSIVE ", 1)
    + ","
    + _CC_PAIRS_SQL
    + """
    SELECT d.doc_id AS doc_id,
           coalesce(c.canonical_id, d.doc_id) AS canonical_id,
           CAST(c.canonical_id IS NOT NULL AND c.canonical_id <> d.doc_id
                AS INTEGER) AS is_duplicate
    FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    """,
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the near-dup pair graph: every document labeled
    with its cluster's canonical (minimum) doc_id. Pair detection alone
    under-deletes — if A~B and B~C, the corpus keeps two of the three unless
    clusters are closed transitively, which is why corpus dedup ends with
    connected components.

    Scale design: distributed min-label propagation — per iteration one
    edges⋈labels shuffle and a min-aggregate, converging in O(graph
    diameter) rounds (near-dup components are shallow; the cap is a safety
    rail). Lineage is truncated every round with localCheckpoint(), the
    make-or-break detail for iterative DataFrame algorithms (an uncut plan
    doubles per round and the final job replans 2^rounds of joins). The
    driver-side loop only ever sees a scalar `changed` count — all data
    stays distributed.
    """
    labels = neardup_labels(spark, sf_dir)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("label", F.col("doc_id")).alias("canonical_id"),
        (
            F.col("label").isNotNull() & (F.col("label") != F.col("doc_id"))
        )
        .cast("int")
        .alias("is_duplicate"),
    )


CONTAINMENT_THRESHOLD = 0.9


@register(
    "dedup_ngram_containment",
    # The oracle mirrors the DF-capped candidate rule (cand CTE), so the
    # operator's contract — not an uncapped ideal — is what parity
    # certifies, at ANY corpus scale. See the docstring for why the
    # excluded case (a doc composed ENTIRELY of >cap boilerplate shingles)
    # is deliberately out of scope.
    oracle=f"""
    {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
    rare AS (
      SELECT s.doc_id, s.shingle FROM sh s
      JOIN df ON df.shingle = s.shingle AND df.df <= {SHINGLE_DF_CAP}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM rare a JOIN rare b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS c
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(c * 1.0 / sa.n, 4) AS cont_a_in_b,
           round(c * 1.0 / sb.n, 4) AS cont_b_in_a
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE c * 1.0 / least(sa.n, sb.n) >= {CONTAINMENT_THRESHOLD}
    """,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: shingle CONTAINMENT (|A∩B| / |A|) at ≥ 0.9 on
    the smaller side. Jaccard misses size-mismatched duplication — a
    paragraph fully quoted inside a much longer document scores low
    Jaccard but containment 1.0 — and containment is how training corpora
    catch boilerplate wrappers, quoted reposts, and doc-in-doc subsets
    (Broder's original resemblance/containment pair, STOC'97).

    Same machinery as ``dedup_ngram_jaccard`` (one staged shingle-set
    build, DF-capped inverted-index candidates, exact verification on the
    full sets) — only the verified ratio differs. Unlike Jaccard, the
    DF cap IS part of this operator's contract, and the oracle mirrors it:
    a pair whose EVERY shared shingle sits in > SHINGLE_DF_CAP documents
    (i.e. the smaller doc is ≥90% composed of corpus-wide boilerplate) is
    deliberately out of scope — that document is the repetition/boilerplate
    gates' job (text_repetition_stats), and including it would force the
    O(df²) hot-shingle blowup the cap exists to prevent. Mirroring the cap
    makes parity certify the actual contract at any corpus scale, instead
    of coinciding with an uncapped ideal only while the corpus lacks the
    excluded case."""
    cand, docsets = _ngram_candidates(spark, sf_dir)
    sa = docsets.alias("sa")
    sb = docsets.alias("sb")
    inter = F.size(F.expr("array_intersect(sa.hs, sb.hs)"))
    return (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(inter / F.least(F.col("sa.n"), F.col("sb.n")) >= CONTAINMENT_THRESHOLD)
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / F.col("sa.n"), 4).alias("cont_a_in_b"),
            F.round(inter / F.col("sb.n"), 4).alias("cont_b_in_a"),
        )
    )


@register(
    "dedup_normalized_exact",
    oracle="""
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS norm_hash,
           min(doc_id)    AS rep_doc_id,
           count(*)       AS n_copies,
           count(DISTINCT md5(text)) AS n_raw_variants
    FROM documents
    GROUP BY 1
    """,
)
def dedup_normalized_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-exact dedup: byte-exact dedup AFTER whitespace
    collapsing, trimming, and casefolding — the standard stage between
    ``dedup_exact`` (raw bytes) and the near-dup family, catching
    trivially-reformatted copies (re-wrapped lines, case-changed headers,
    trailing-space churn) that hash differently raw but are the same
    document. ``n_raw_variants`` counts how many distinct RAW byte forms
    collapsed into each normalized group — the audit column that shows
    what normalization bought over plain exact dedup (1 everywhere means
    it bought nothing).

    Plan: the normalization chain is a codegen'd row-local projection in
    the scan pipeline; the whole query is ONE hash-aggregate on the
    normalized hash — at 100 TB identical cost to dedup_exact. The
    normalization contract (collapse ``\\s+`` to one space, trim, lower)
    is the tokenizer contract's whitespace rule applied to the raw text,
    so a doc and its normalized twin tokenize identically downstream."""
    doc = load_table(spark, sf_dir, "documents")
    norm = F.md5(
        F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    )
    return (
        doc.select(norm.alias("norm_hash"), "doc_id", F.md5("text").alias("raw_hash"))
        .groupBy("norm_hash")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.count_distinct("raw_hash").alias("n_raw_variants"),
        )
    )


# --------------------------------------------------------------------------
# dedup_band_recall_audit — MinHash banding quality vs exact ground truth
# --------------------------------------------------------------------------

from .registry import ORACLES as _DEDUP_ORACLES  # noqa: E402  (both legs above)


@register(
    "dedup_band_recall_audit",
    oracle=f"""
    WITH truth AS ({_DEDUP_ORACLES["dedup_ngram_jaccard"]}),
         lsh AS ({_DEDUP_ORACLES["dedup_minhash_lsh"]}),
         hit AS (
           SELECT count(*) AS n_hit
           FROM lsh JOIN truth
             ON lsh.doc_a = truth.doc_a AND lsh.doc_b = truth.doc_b
         )
    SELECT (SELECT count(*) FROM truth) AS n_true,
           (SELECT count(*) FROM lsh) AS n_lsh,
           hit.n_hit,
           CAST(hit.n_hit * 1000000 // greatest(1, (SELECT count(*) FROM truth))
                AS BIGINT) AS recall_ppm,
           CAST(hit.n_hit * 1000000 // greatest(1, (SELECT count(*) FROM lsh))
                AS BIGINT) AS precision_ppm
    FROM hit
    """,
)
def dedup_band_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-auditing dedup (the ``sim_recall_report`` pattern applied to
    the near-dup family): MinHash-LSH's verified pairs measured against
    the exact-Jaccard ground truth, as recall/precision ppm. Banding is
    probabilistic — a true pair whose 32 minhashes never agree on a full
    band is missed — so this is the operator that tells a pipeline owner
    whether the (bands, rows) trade is adequate BEFORE deleting data at
    scale. Both legs compose the REGISTERED oracles verbatim, so the
    audit can never drift from what the driver certifies; precision < 1e6
    would mean the two legs' shingle contracts diverged (both verify at
    the same Jaccard threshold — a regression canary, not a tolerance).

    Scale: both legs are the already-gated bounded-candidate pipelines;
    the audit adds only pair-list-sized joins and 1-row aggregates."""
    # truth comes off the cross-query staged table (two consumers here:
    # hit join + its own count — scans of the materialized pair list);
    # the lsh leg is query-local, so cache-level staging still applies.
    truth = neardup_pairs(spark, sf_dir)
    lsh = _staged(dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b"))
    hit = lsh.join(truth, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    return (
        n_true.crossJoin(n_lsh)
        .crossJoin(hit)
        .select(
            "n_true",
            "n_lsh",
            "n_hit",
            F.expr(
                "cast(n_hit * 1000000 div greatest(1, n_true) as bigint)"
            ).alias("recall_ppm"),
            F.expr(
                "cast(n_hit * 1000000 div greatest(1, n_lsh) as bigint)"
            ).alias("precision_ppm"),
        )
    )


@register(
    "dedup_keep_longest",
    # same recursive-component front end as dedup_cluster_canonical; the
    # keep rule changes from min-id to argmax(n_chars, tie min doc_id)
    oracle=_SHINGLES_SQL.replace("WITH ", "WITH RECURSIVE ", 1)
    + ","
    + _CC_PAIRS_SQL
    + """,
    allrows AS (
      SELECT d.doc_id, coalesce(c.canonical_id, d.doc_id) AS cluster_id,
             d.n_chars
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    keep AS (
      SELECT cluster_id, doc_id AS keeper_id FROM (
        SELECT cluster_id, doc_id,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY n_chars DESC, doc_id) AS r
        FROM allrows) WHERE r = 1
    )
    SELECT f.doc_id, f.cluster_id, k.keeper_id,
           CAST(f.doc_id = k.keeper_id AS INTEGER) AS kept
    FROM allrows f JOIN keep k USING (cluster_id)
    """,
)
def dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup removal with a KEEP-BEST rule: within each transitive
    near-dup cluster, keep the LONGEST document (ties → lowest doc_id)
    instead of the lowest-id one — the rule real curation uses, because
    the longest variant of a scraped page is usually the least truncated
    (``dedup_cluster_canonical`` is the id-deterministic twin; this is
    the quality-aware one). Every document is emitted with its cluster,
    its cluster's keeper, and its own kept flag, so the downstream filter
    is a row-local ``kept = 1``.

    Scale: the cluster labels come from the same min-label-propagation
    components; the keeper per cluster is a map-side-combining
    ``min(struct(-n_chars, doc_id))`` aggregate (the argmin-as-aggregate
    trick from ``assign_to_codebook`` — no rank window over the corpus),
    joined back on the cluster key."""
    labels = neardup_labels(spark, sf_dir).withColumnRenamed(
        "label", "cluster_id"
    )
    full = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
            "n_chars",
        )
    )
    keep = (
        full.groupBy("cluster_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("n_chars")).alias("neg_len"),
                    F.col("doc_id").alias("d"),
                )
            ).alias("mn")
        )
        .select("cluster_id", F.col("mn.d").alias("keeper_id"))
    )
    return full.join(keep, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "keeper_id",
        (F.col("doc_id") == F.col("keeper_id")).cast("int").alias("kept"),
    )


# dedup_tier_report moved to queries/tier_report.py (round 6): its oracle
# now composes the dedup_semantic contract, which registers after this
# module (semdedup.py imports from dedup.py, so the composition must live
# in a later-imported module).


# --------------------------------------------------------------------------
# dedup_source_affinity — who scrapes whom (round 6)
# --------------------------------------------------------------------------


@register(
    "dedup_source_affinity",
    oracle=f"""
    WITH pairs AS ({_DEDUP_ORACLES["dedup_ngram_jaccard"]}),
    src AS (SELECT doc_id, source FROM documents),
    tagged AS (
      SELECT least(sa.source, sb.source) AS source_a,
             greatest(sa.source, sb.source) AS source_b
      FROM pairs p
      JOIN src sa ON sa.doc_id = p.doc_a
      JOIN src sb ON sb.doc_id = p.doc_b
    )
    SELECT source_a, source_b, count(*) AS n_pairs,
           CAST(count(*) * 1000000
                // (SELECT count(*) FROM pairs) AS BIGINT) AS share_ppm
    FROM tagged GROUP BY source_a, source_b
    """,
)
def dedup_source_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup affinity between SOURCES: every verified near-dup pair
    tagged with its two documents' sources (unordered), counted per
    source pair with the exact-ppm share — the who-scrapes-whom matrix. A
    hot off-diagonal cell means two crawls ingest the same upstream site
    (dedup them jointly, or drop the lower-quality one); the diagonal is
    within-source boilerplate. Composes the REGISTERED near-dup contract
    verbatim (the ``pipeline_split_leakage_audit`` pattern applied to
    provenance instead of splits).

    Scale: the pair list is the already-gated bounded-candidate pipeline;
    tagging is two narrow id joins; the matrix is ≤ sources² rows."""
    pairs = neardup_pairs(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("s_a"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("s_b"))
    n = pairs.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least(F.col("s_a"), F.col("s_b")).alias("source_a"),
            F.greatest(F.col("s_a"), F.col("s_b")).alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .join(F.broadcast(n))
        .select(
            "source_a",
            "source_b",
            "n_pairs",
            F.expr("cast(n_pairs * 1000000 div n_total as bigint)").alias(
                "share_ppm"
            ),
        )
    )
