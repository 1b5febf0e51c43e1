"""Substring-level exact dedup: duplicated-PASSAGE detection.

The training-data operator class doc-granular dedup misses (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL 2022):
repeated passages inside otherwise-distinct documents — licence headers,
quoted reposts, templated boilerplate — that survive MinHash/SimHash
because the host documents differ, yet still cause memorization. The
reference engine has no text surface (SURVEY §2.7 extension).

Relational formulation (vs the paper's suffix arrays): hash every
W-token window of every document, keep window-hashes seen in >= 2
distinct documents, and merge each document's duplicated positions into
maximal (doc_id, span) ranges with a gaps-and-islands window pass.

Scale design (100 TB):
- the window frame is (doc_id, pos, hash) — one narrow row per token,
  ~3 int64s, built map-side in one scan. That linear blow-up is the
  honest cost of substring-granular dedup (the paper's suffix array is
  8x corpus bytes); it is staged once and consumed twice.
- NO DF cap, by design: unlike the pair-emitting near-dup operators
  (dedup_ngram_jaccard's candidate stage is O(df^2) per hot shingle,
  hence SHINGLE_DF_CAP), this operator never forms document PAIRS — a
  window hash shared by 10^6 documents contributes 10^6 span rows, not
  10^12 pair rows. Output stays linear in corpus size, so the most
  widely duplicated passages — exactly the ones worth removing — are
  kept in scope. The cap is a pair-stage contract, not a dedup-family
  constant.
- hashing is engine-local (Spark: codegen'd xxhash64; oracle: md5) —
  hashes only define equality classes and never appear in the output,
  so parity is hash-independent, the same argument as dedup_simhash's
  signature stage (dedup.py).
- the island merge shuffles only duplicated (doc_id, pos) hits — in a
  curated corpus a small fraction of all windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register

# tokenization contract — text.py is the single source of truth
from .text import _TOKS, _TOKS_SQL

PASSAGE_W = 10  # window width in tokens; Lee et al. use 50 on web-scale
# text — this corpus averages ~54 tokens/doc, so W=10 keeps multi-window
# passages observable. A span is "duplicated" iff each of its W-windows
# appears verbatim in >= 2 distinct documents.


# The WITH-body through the merged islands — shared by both oracles.
_SPANS_CTES = f"""
    WITH tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    win AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(toks[i:i + {PASSAGE_W - 1}], ' ')) AS whash
      FROM tok,
           unnest(generate_series(1, greatest(len(toks) - {PASSAGE_W} + 1, 0))) AS t(i)
    ),
    dup AS (
      SELECT whash FROM win GROUP BY whash HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT w.doc_id, w.pos FROM win w JOIN dup d USING (whash)),
    brk AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       <= {PASSAGE_W} THEN 0 ELSE 1 END AS is_new
      FROM hits
    ),
    isl AS (
      SELECT doc_id, pos,
             sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM brk
    ),
    spans AS (
      SELECT doc_id, min(pos) AS span_start,
             max(pos) + {PASSAGE_W} - 1 AS span_end,
             count(*) AS n_windows
      FROM isl GROUP BY doc_id, island
    )"""


@register(
    "dedup_duplicate_passages",
    oracle=_SPANS_CTES
    + """
    SELECT doc_id, span_start, span_end, n_windows FROM spans
    """,
)
def dedup_duplicate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-passage spans: every maximal token range [span_start,
    span_end] whose W-token windows each appear verbatim in at least one
    OTHER document, with the count of duplicated windows merged into the
    span. Downstream, a pipeline cuts these ranges out of the text (the
    Lee-et-al. remediation) — emitting the spans keeps the operator
    composable with both drop-passage and drop-document policies.

    Three narrow shuffles, all linear: window-hash frequency (partial+
    final agg), the dup-hash semi-join back, and the per-doc island
    window. The wide text column never leaves the first map stage."""
    return _duplicate_spans(spark, sf_dir)


def _duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, span_start, span_end, n_windows) — shared by the span
    detector above and the remediation operator below. Islands are merged
    with gap <= W, so emitted spans are disjoint and non-adjacent."""
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TOKS).alias("toks")
    )
    # size guard: sequence(1, 0) is the descending-range trap (dedup.py)
    win = doc.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN size(toks) >= {PASSAGE_W}"
                f" THEN transform(sequence(1, size(toks) - {PASSAGE_W} + 1),"
                f"   i -> xxhash64(concat_ws(' ', slice(toks, i, {PASSAGE_W}))))"
                " ELSE array() END"
            )
        ).alias("p0", "whash"),
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("pos"), "whash")
    # staged: the frequency agg and the hit join both consume the frame
    win = _staged(win)
    dup = (
        win.groupBy("whash")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("whash")
    )
    hits = win.join(dup, "whash").select("doc_id", "pos")
    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans = (
        hits.withColumn(
            "is_new",
            F.when(
                F.col("pos") - F.lag("pos").over(w_ord) <= PASSAGE_W, F.lit(0)
            ).otherwise(F.lit(1)),
        )
        .withColumn("island", F.sum("is_new").over(w_run))
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + PASSAGE_W - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "n_windows")
    )
    return spans


@register(
    "text_remove_duplicate_passages",
    oracle=_SPANS_CTES
    + """,
    rm AS (
      SELECT DISTINCT doc_id, span_start + k AS i
      FROM spans, unnest(generate_series(0, span_end - span_start)) AS t(k)
    ),
    pos AS (
      SELECT doc_id, i, toks[i] AS tok
      FROM tok, unnest(generate_series(1, len(toks))) AS t(i)
    ),
    kept AS (
      SELECT p.doc_id, p.i, p.tok
      FROM pos p LEFT JOIN rm ON rm.doc_id = p.doc_id AND rm.i = p.i
      WHERE rm.i IS NULL
    ),
    cleaned AS (
      SELECT doc_id, count(*) AS n_kept,
             md5(string_agg(tok, ' ' ORDER BY i)) AS clean_hash
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           len(t.toks)                                AS n_tokens,
           len(t.toks) - coalesce(c.n_kept, 0)        AS n_removed,
           coalesce(c.clean_hash, md5(''))            AS clean_hash
    FROM tok t LEFT JOIN cleaned c USING (doc_id)
    """,
)
def text_remove_duplicate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lee-et-al. REMEDIATION: cut every duplicated span out of each
    document, emitting per-doc token counts (before / removed) and the
    hash of the cleaned text — the hash keeps the compared output narrow
    while certifying every byte of the edit (the ``text_pii_scrub``
    convention). One row per document; untouched docs carry n_removed=0
    and the hash of their original normalized text.

    The cut itself is ROW-LOCAL: spans collapse to one array per doc
    (disjoint by construction), then a higher-order filter drops token
    positions covered by any span — no token-level explode on the apply
    side. Only the span detector shuffles; the remediation adds one
    broadcast-sized join (spans exist only for docs with duplicated
    passages) and a map-side projection. The oracle rebuilds the cleaned
    text independently via position anti-join + ordered string_agg."""
    spans_per_doc = (
        _duplicate_spans(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("spans")
        )
    )
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TOKS).alias("toks")
    )
    kept = (
        "filter(transform(sequence(1, size(toks)),"
        " i -> named_struct('i', cast(i as bigint), 't', toks[i - 1])),"
        " x -> NOT exists(coalesce(spans, array()),"
        "   s -> x.i >= s.span_start AND x.i <= s.span_end))"
    )
    return doc.join(spans_per_doc, "doc_id", "left").select(
        "doc_id",
        F.expr("size(toks)").cast("long").alias("n_tokens"),
        F.expr(f"size(toks) - size({kept})").cast("long").alias("n_removed"),
        F.expr(f"md5(concat_ws(' ', transform({kept}, x -> x.t)))").alias(
            "clean_hash"
        ),
    )


# --------------------------------------------------------------------------
# dedup_passage_containment — doc-level containment-fraction report (r7)
# --------------------------------------------------------------------------


@register(
    "dedup_passage_containment",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    win AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(toks[i:i + {PASSAGE_W - 1}], ' ')) AS whash
      FROM tok,
           unnest(generate_series(1, greatest(len(toks) - {PASSAGE_W} + 1, 0))) AS t(i)
    ),
    firstd AS (SELECT whash, min(doc_id) AS first_doc FROM win GROUP BY whash),
    per AS (
      SELECT w.doc_id,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN f.first_doc < w.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_contained
      FROM win w JOIN firstd f USING (whash)
      GROUP BY w.doc_id
    )
    SELECT doc_id, n_windows, n_contained,
           CAST(n_contained * 1000000 // n_windows AS BIGINT)
             AS containment_ppm
    FROM per
    """,
)
def dedup_passage_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level containment report over the passage-window hashes: for
    every document with at least one W-token window, the exact-ppm
    fraction of its windows that already appear in a LOWER-doc_id
    document — the keep-first containment policy at document granularity
    (a doc near 1e6 ppm is a suffix/near-copy of earlier corpus content
    even when no single span is long enough for the passage cutter).
    Composes ``dedup_duplicate_passages``' window-hash stage; containment
    is hash-function-independent (equal windows, not equal hashes, drive
    the min-doc comparison — the engines' different hashes induce the
    same equality classes), the same argument as the span detector's.

    Scale: window-hash map stage (wide text never shuffles), one
    per-hash min aggregate, one hash-keyed join back, one per-doc
    aggregate — all linear, no pair enumeration; the min-doc frame is
    the persisted band-index shape ``dedup_incremental_minhash`` probes
    in production."""
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TOKS).alias("toks")
    )
    win = doc.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) >= {PASSAGE_W}"
                f" THEN transform(sequence(1, size(toks) - {PASSAGE_W} + 1),"
                f"   i -> xxhash64(concat_ws(' ', slice(toks, i, {PASSAGE_W}))))"
                " ELSE array() END"
            )
        ).alias("whash"),
    )
    win = _staged(win)
    firstd = win.groupBy("whash").agg(F.min("doc_id").alias("first_doc"))
    per = (
        win.join(firstd, "whash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.sum(
                F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_contained"),
        )
    )
    return per.select(
        "doc_id",
        "n_windows",
        "n_contained",
        F.expr("cast(n_contained * 1000000 div n_windows as bigint)").alias(
            "containment_ppm"
        ),
    )
