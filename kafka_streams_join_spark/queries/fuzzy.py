"""Edit-distance (fuzzy) near-dup — the dedup class the n-gram family
can't express.

Jaccard/MinHash/SimHash all measure SET overlap of shingles, which is blind
to the *kind* of difference: a doc with 4 scattered single-character typos
and a doc with a replaced sentence can score identically. Edit distance
measures the minimal character-level rewrite, the right notion for
catching OCR noise, typo variants, and template instantiations of the same
title/header — the classic record-linkage operator (Gravano et al.
VLDB'01's q-gram joins; Li et al. PassJoin VLDB'11).

Relational shape at 100 TB: Levenshtein is O(|s|·|t|) per pair, so the
candidate stage must bound pairs long before any verify. Each doc keys on
its {_N_SEGS} contiguous segments of the match key; two docs that share a
segment VALUE at the same position become a candidate. Segments whose
document frequency exceeds {SEG_DF_CAP} (boilerplate headers) are excluded
— the same DF-cap CONTRACT as ``dedup_ngram_jaccard``, mirrored in the
oracle so both engines compute the identical (slightly recall-bounded)
result. The positional-equality blocking is itself a recall contract, NOT
a lossless bound: an insertion early in the key shifts every later
segment, so heavily-shifted variants can escape (PassJoin's shifted
substring probes would close that; the lossless upgrade path is the same
argument as dedup_ngram_prefix_filter vs the capped Jaccard stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register

KEY_LEN = 192  # match key: first chars of the doc, lowercased
_N_SEGS = 3
SEG_LEN = KEY_LEN // _N_SEGS
SEG_DF_CAP = 20  # boilerplate-segment exclusion threshold (contract)
MAX_EDIT_DIST = 8


@register(
    "dedup_fuzzy_edit_distance",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lower(substr(text, 1, {KEY_LEN})) AS title FROM documents
    ),
    segs AS (
      SELECT doc_id, i, substr(title, 1 + {SEG_LEN} * i, {SEG_LEN}) AS seg
      FROM t, unnest(generate_series(0, {_N_SEGS - 1})) AS g(i)
    ),
    df AS (SELECT i, seg, count(*) AS n FROM segs GROUP BY i, seg),
    keep AS (SELECT i, seg FROM df WHERE n <= {SEG_DF_CAP}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM segs a JOIN keep k USING (i, seg)
      JOIN segs b ON b.i = a.i AND b.seg = a.seg AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(levenshtein(ta.title, tb.title) AS INT) AS edit_dist
    FROM cand
    JOIN t ta ON ta.doc_id = doc_a
    JOIN t tb ON tb.doc_id = doc_b
    WHERE levenshtein(ta.title, tb.title) <= {MAX_EDIT_DIST}
    """,
)
def dedup_fuzzy_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup pairs: docs whose {KEY_LEN}-char lowercased match keys
    are within Levenshtein distance {MAX_EDIT_DIST}, found via positional
    segment blocking (share one of {_N_SEGS} exact {SEG_LEN}-char segments,
    segment DF <= {SEG_DF_CAP}) and verified with the exact distance.

    Plan: the segment frame is a narrow posexplode ({_N_SEGS} rows/doc of
    (i, seg)); the DF filter is one hash-agg over segment values; blocking
    is a (i, seg) EQUI self-join — key-bounded, <= cap²/2 pairs per kept
    segment; verification joins only candidate ids back to the {KEY_LEN}-char
    keys and runs Spark's codegen'd ``levenshtein`` WITH the threshold
    argument (early-abandon: the DP loop exits once the distance provably
    exceeds {MAX_EDIT_DIST}, turning O(L²) per pair into O(L·k)). The raw
    text column never leaves the scan projection.

    Both multi-consumer frames are staged (operators/staging.py): ``t``
    feeds the segment build plus the two verify joins and ``segs`` feeds
    the DF filter plus both sides of the blocking self-join, so the corpus
    parquet is scanned ONCE per run instead of ~8 times — and unlike
    dedup_minhash_lsh's measured staging revert, the staged forms here
    (192-char keys, 64-char segments) are far smaller than the text scan
    they replace."""
    t = _staged(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.lower(F.substring("text", 1, KEY_LEN)).alias("title")
        )
    )
    seg_arr = ", ".join(
        f"substring(title, {1 + SEG_LEN * i}, {SEG_LEN})" for i in range(_N_SEGS)
    )
    segs = _staged(
        t.select(
            "doc_id", F.posexplode(F.expr(f"array({seg_arr})")).alias("i", "seg")
        )
    )
    keep = (
        segs.groupBy("i", "seg")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= SEG_DF_CAP)
        .select("i", "seg")
    )
    a = segs.join(keep, ["i", "seg"]).alias("a")
    b = segs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ta = t.alias("ta")
    tb = t.alias("tb")
    dist = F.levenshtein(F.col("ta.title"), F.col("tb.title"), MAX_EDIT_DIST)
    return (
        cand.join(ta, F.col("doc_a") == F.col("ta.doc_id"))
        .join(tb, F.col("doc_b") == F.col("tb.doc_id"))
        .filter(dist >= 0)
        .select("doc_a", "doc_b", dist.alias("edit_dist"))
    )
