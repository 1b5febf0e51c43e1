"""Dedup aggressiveness sweep (round 12): near-duplicate pair and
removal counts at five CONTAINMENT thresholds (0.2–0.9) over the
certified n-gram candidate machinery — the dial behind
``dedup_ngram_containment``'s frozen constant. Containment
(|A∩B| / min(|A|,|B|), the asymmetric measure) is the right axis for a
sweep on real corpora: Jaccard collapses to a bimodal exact-dup-vs-
noise split (a Jaccard dial barely moves — measured on this corpus
before choosing the axis), while containment exposes the
partial-overlap band (templates, quoted passages, subset documents)
where the threshold decision actually changes what gets deleted. One
candidate generation + one exact verification pass; the sweep itself is
five conditional aggregates, not five reruns.

Thresholding is EXACT RATIONAL arithmetic — a pair qualifies at t
(milli) iff 1000·|A∩B| ≥ t·min(|A|,|B|) on exact integer set sizes — so
no float ratio is ever compared across engines. Flagged docs per
threshold follow the keep-lowest-id convention (a doc is flagged iff it
is the HIGHER id of some qualifying pair — the greedy removal set);
removal_ppm is a truncating div over the corpus count.

Scale contract (inherited from `dedup.py:_ngram_candidates` and stated
there): candidates come from the DF-capped inverted index — never
all-pairs — and verification recounts |A∩B| on the staged full shingle
sets via array_intersect. The pair frame entering the sweep is the
lowest-threshold (0.2) subset. Cap recall weakens as t drops (a
0.2-pair has more room to hide behind hot shingles than a 0.9-pair);
measured on this corpus: ZERO cap-lost qualifying pairs at any SF (the
uncapped oracle certifies it per run, the same certification
dedup_ngram_jaccard carries for its 0.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _SHINGLES_SQL, _ngram_candidates
from .registry import register

_T_MILLI = (200, 300, 500, 700, 900)


@register(
    "dedup_containment_sweep",
    oracle=f"""
    {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
              FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b, c, least(sa.n, sb.n) AS mn
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE 1000 * c >= {_T_MILLI[0]} * least(sa.n, sb.n)
    ),
    ts AS (SELECT unnest([{", ".join(str(t) for t in _T_MILLI)}]) AS t),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    sweep AS (
      SELECT ts.t,
             CAST(count(p.doc_b) AS BIGINT) AS n_pairs,
             CAST(count(DISTINCT p.doc_b) AS BIGINT) AS n_docs_flagged
      FROM ts LEFT JOIN pairs p ON 1000 * p.c >= ts.t * p.mn
      GROUP BY ts.t
    )
    SELECT CAST(s.t AS BIGINT) AS threshold_milli, s.n_pairs,
           s.n_docs_flagged,
           CAST(CAST(s.n_docs_flagged AS HUGEINT) * 1000000 // nd.n_docs
                AS BIGINT)
             AS removal_ppm
    FROM sweep s CROSS JOIN nd
    """,
)
def dedup_containment_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per containment threshold {ts}: qualifying near-dup pairs, docs
    flagged for removal (higher id of a qualifying pair), and the
    corpus removal fraction in exact ppm — one candidate pass, exact
    rational thresholding. Module docstring has the containment-axis,
    integer-ratio, keep-lowest-id, and cap-recall contracts."""
    from ..functions.literals import values_frame
    from ..sources.parquet import load_table

    cand, docsets = _ngram_candidates(spark, sf_dir)
    sa = docsets.alias("sa")
    sb = docsets.alias("sb")
    c = F.size(F.expr("array_intersect(sa.hs, sb.hs)")).cast("long")
    pairs = (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            c.alias("c"),
            F.least(F.col("sa.n"), F.col("sb.n")).cast("long").alias("mn"),
        )
        .filter(F.lit(1000) * F.col("c") >= _T_MILLI[0] * F.col("mn"))
    )
    ts = values_frame(spark, [(t,) for t in _T_MILLI], "t long")
    sweep = (
        pairs.crossJoin(F.broadcast(ts))
        .groupBy("t")
        .agg(
            F.sum(
                F.when(F.lit(1000) * F.col("c") >= F.col("t") * F.col("mn"), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_pairs"),
            F.countDistinct(
                F.when(
                    F.lit(1000) * F.col("c") >= F.col("t") * F.col("mn"),
                    F.col("doc_b"),
                )
            )
            .cast("bigint")
            .alias("n_docs_flagged"),
        )
    )
    # thresholds with zero qualifying pairs must still report (the sweep
    # contract): left-join the full dial back in
    sweep_full = ts.join(sweep, "t", "left").select(
        "t",
        F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
        F.coalesce("n_docs_flagged", F.lit(0))
        .cast("bigint")
        .alias("n_docs_flagged"),
    )
    nd = (
        load_table(spark, sf_dir, "documents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    return sweep_full.crossJoin(F.broadcast(nd)).select(
        F.col("t").cast("bigint").alias("threshold_milli"),
        "n_pairs",
        "n_docs_flagged",
        F.expr("cast(cast(n_docs_flagged as decimal(38,0)) * 1000000 div n_docs"
            " as bigint)").alias(
            "removal_ppm"
        ),
    )


dedup_containment_sweep.__doc__ = dedup_containment_sweep.__doc__.replace(
    "{ts}", "/".join(f"0.{t // 100}" for t in _T_MILLI)
)
