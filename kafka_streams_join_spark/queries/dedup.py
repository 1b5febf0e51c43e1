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
- SimHash: two hash-aggs (doc×bit → doc), then pairs only within hamming
  range; at scale the pair join would be bucketed by simhash prefix
  (pigeonhole: d<=8 over 4 chunks of 15 bits → one exact-match chunk);
- brute-force O(n²) variants exist only as oracle-checkable baselines.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
SIMHASH_BITS = 60
SIMHASH_MAX_HAMMING = 10
COSINE_DUP_THRESHOLD = 0.4


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, shingle) pairs — 3-word shingles."""
    doc = load_table(spark, sf_dir, "documents")
    return doc.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(size({_TOKS}) - 2, 0)),"
                f" i -> concat_ws(' ', {_TOKS}[i - 1], {_TOKS}[i], {_TOKS}[i + 1]))"
            )
        ).alias("shingle"),
    ).distinct()


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
    """Near-dup by exact 3-gram Jaccard >= 0.8. Candidate generation via the
    inverted (shingle → docs) join — only pairs sharing a shingle are scored,
    the classic all-pairs-similarity pruning. Jaccard is an integer ratio, so
    the value hash is engine-stable."""
    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("c") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def _minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band, band_sig): LSH band signatures from K minhashes."""
    sh = _shingles(spark, sf_dir)
    hashed = sh.select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    params = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), F.lit(a).alias("a"), F.lit(b).alias("b")
            )
            for i, (a, b) in enumerate(_HASH_PARAMS)
        ]
    )
    perm = hashed.select(
        "doc_id", "h", F.explode(params).alias("p")
    ).select(
        "doc_id",
        F.col("p.i").alias("hash_idx"),
        ((F.col("p.a") * F.col("h") + F.col("p.b")) % _P).alias("hv"),
    )
    mh = perm.groupBy("doc_id", "hash_idx").agg(F.min("hv").alias("mh"))
    rows_per_band = _K // _BANDS
    return (
        mh.withColumn("band", (F.col("hash_idx") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.expr(
                        "transform(array_sort(collect_list(struct(hash_idx, mh))),"
                        " x -> cast(x.mh as string))"
                    ),
                )
            ).alias("band_sig")
        )
    )


_MINHASH_SQL_PARAMS = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(_HASH_PARAMS)
)

@register(
    "dedup_minhash_lsh",
    oracle=f"""
    {_SHINGLES_SQL},
    hashed AS (
      SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h
      FROM sh
    ),
    params(i, a, b) AS (VALUES {_MINHASH_SQL_PARAMS}),
    mh AS (
      SELECT doc_id, i AS hash_idx, min((a * h + b) % {_P}) AS mh
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
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS c
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
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
    """MinHash + LSH near-dup: shingle → 32 minhashes → 8 bands of 4 →
    candidates collide on a band signature → exact-Jaccard verification of
    candidates only. The scale path: no all-pairs stage anywhere; shuffles are
    (shingle), (doc,hash), (band,sig) — all key-bounded."""
    bands = _minhash_sigs(spark, sf_dir)
    x = bands.alias("x")
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
    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        cand.join(a, F.col("doc_a") == F.col("a.doc_id"))
        .join(b, (F.col("doc_b") == F.col("b.doc_id")) & (F.col("b.shingle") == F.col("a.shingle")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("c") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


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
    """SimHash near-dup: 60-bit signature (token-frequency weighted bit votes),
    pairs within hamming distance 10. Signature build is two hash-aggs; at
    100 TB the pair stage buckets by signature prefix (pigeonhole) instead of
    the O(n²) join used at oracle scale."""
    doc = load_table(spark, sf_dir, "documents")
    tok = doc.select("doc_id", F.explode(F.expr(_TOKS)).alias("token"))
    th = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    bits = (
        th.select(
            "doc_id",
            F.explode(F.expr(f"sequence(0, {SIMHASH_BITS - 1})")).alias("j"),
            "h",
        )
        .groupBy("doc_id", "j")
        .agg(F.sum(F.expr("((h >> j) & 1) * 2 - 1")).alias("s"))
    )
    sig = bits.groupBy("doc_id").agg(
        F.sum(F.expr("CASE WHEN s > 0 THEN shiftleft(cast(1 as bigint), j) ELSE 0 END")).alias(
            "simhash"
        )
    )
    a = sig.alias("a")
    b = sig.alias("b")
    ham = F.expr("bit_count(a.simhash ^ b.simhash)")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(ham <= SIMHASH_MAX_HAMMING)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
    )


# cosine over float32 vectors, accumulated left-to-right in float64 —
# identical fold order in Spark's aggregate() and the oracle's explicit sums
_COS_SPARK = (
    "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0 as double), (acc, v) -> acc + v)"
    " / sqrt(aggregate(transform(a.embedding, x -> cast(x as double) * cast(x as double)),"
    "         cast(0 as double), (acc, v) -> acc + v)"
    "   * aggregate(transform(b.embedding, x -> cast(x as double) * cast(x as double)),"
    "         cast(0 as double), (acc, v) -> acc + v))"
)

_COS_SQL = (
    "list_sum(list_transform(list_zip(a.embedding, b.embedding),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    " / sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    "   * list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


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
    """Embedding-cosine near-dup: pairs with cosine >= 0.4, pure JVM lambda
    arithmetic (zip_with/aggregate), no UDF. The all-pairs join is the
    oracle-scale baseline; the scale path is sim_lsh_ann's bucketing."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.alias("a")
    b = emb.alias("b")
    cos = F.expr(_COS_SPARK)
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(cos >= COSINE_DUP_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 3).alias("cos"),
        )
    )
