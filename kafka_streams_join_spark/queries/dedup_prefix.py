"""Prefix-filtered set-similarity self-join (PPJoin-style) — the
principled scale path for exact n-gram Jaccard near-dup.

``dedup_ngram_jaccard`` (queries/dedup.py) bounds its inverted-index
candidate stage with a document-frequency CAP: sound in practice (the
uncapped oracle certifies zero loss on this corpus) but a *recall
contract*, not a theorem. Prefix filtering (Chaudhuri et al. ICDE'06;
Xiao et al. WWW'08 "PPJoin") gives the LOSSLESS bound: order every
document's shingle set by one global total order (ascending document
frequency, ties by hash — rarest first maximizes pruning) and index only
each document's first

    p = n - ceil(tau * n) + 1

shingles. Any pair with Jaccard >= tau shares >= ceil(tau * max(na, nb))
shingles, and the smallest shared shingle in the global order must lie in
BOTH prefixes (if it did not, all >= ceil(tau*n) shared shingles would sit
in the last ceil(tau*n) - 1 positions of one side — a contradiction), so
the prefix-to-prefix equi-join finds every qualifying pair. The length
filter (tau * nb <= na <= nb, checked in exact integer arithmetic) prunes
size-mismatched pairs before the distinct.

With tau = 0.8, each doc indexes ~n/5 + 1 shingles — a 5× smaller
self-join input than the full index, with ZERO recall caveat. Exact
verification then recounts the true intersection on the full sets, so the
output is identical to ``dedup_ngram_jaccard`` (and shares its uncapped
DuckDB oracle verbatim).

Scale shape: one corpus scan builds the staged per-doc shingle-hash sets;
the df join and the per-doc prefix window shuffle only narrow
(doc_id, h, df) rows; the candidate self-join runs on the ~n/5 prefix
index; verification joins the full sets once per surviving pair. At
100 TB the hot-shingle problem disappears by construction: a boilerplate
shingle in 10^6 docs has maximal df, sorts LAST in every doc's order, and
never enters any prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register
from .dedup import _SHINGLE_ARRAY, _SHINGLES_SQL, JACCARD_THRESHOLD
from .text import _TOKS

# tau = 0.8 as the exact rational 4/5: prefix length and length filter are
# integer arithmetic, immune to float boundary drift
_TAU_NUM, _TAU_DEN = 4, 5


@register(
    "dedup_ngram_prefix_filter",
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
def dedup_ngram_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard >= 0.8 near-dup via PPJoin-style prefix
    filtering — same output (and same uncapped oracle) as
    ``dedup_ngram_jaccard``, but the candidate stage is provably lossless
    instead of DF-cap-bounded (see the module docstring for the lemma).

    Stages:
    1. per-doc distinct shingle-hash sets (one scan, one collect_set
       aggregate — the dedup.py machinery);
    2. global order by (df asc, h): the df equi-join and the per-doc
       row_number window move only narrow (doc_id, h, df) rows;
    3. prefix index: rank <= n - ceil(0.8·n) + 1 (integer arithmetic);
    4. prefix-to-prefix self-join with the integer length filter
       4·max(na, nb) <= 5·min(na, nb), then distinct pairs;
    5. exact verification on the full sets — identical to the Jaccard
       query's verify stage, so the prefix filter can only ever REMOVE
       candidate work, never change a result."""
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TOKS).alias("toks")
    )
    return prefix_jaccard_pairs(shingle_docsets(doc))


def shingle_docsets(doc: DataFrame) -> DataFrame:
    """(doc_id, hs, n): staged per-doc distinct shingle-hash sets from a
    (doc_id, toks) frame — the dedup.py machinery, reusable by any
    near-dup consumer (the curation funnel passes a survivor subset)."""
    hashed = doc.select(
        "doc_id", F.explode(F.expr(_SHINGLE_ARRAY)).alias("shingle")
    ).select("doc_id", F.xxhash64("shingle").alias("h"))
    return _staged(
        hashed.groupBy("doc_id")
        .agg(F.collect_set("h").alias("hs"))
        .select("doc_id", "hs", F.size("hs").alias("n"))
    )


def prefix_jaccard_pairs(docsets: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jaccard): all pairs with Jaccard >= tau over a
    (doc_id, hs, n) shingle-set frame, via the lossless prefix filter +
    exact full-set verification (see the module docstring)."""
    # inverted rows re-derived from the aggregated arrays (post-shuffle
    # projection, not a rescan), then df per shingle for the global order —
    # as a COUNT window over one h-partitioned exchange rather than an
    # aggregate joined back (round 15: same df values, one index shuffle
    # and sort instead of two plus a join)
    exploded = docsets.select("doc_id", "n", F.explode("hs").alias("h"))
    ordered = exploded.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    # prefix length p = n - ceil(tau·n) + 1; ceil(4n/5) = (4n + 4) div 5
    w = Window.partitionBy("doc_id").orderBy("df", "h")
    prefix = (
        ordered.withColumn("rnk", F.row_number().over(w))
        .filter(
            F.col("rnk")
            <= F.col("n")
            - ((F.col("n") * _TAU_NUM + (_TAU_DEN - 1)) / _TAU_DEN).cast("long")
            + 1
        )
        .select("doc_id", "n", "h")
    )
    # merge hint: corpus-scaled self-join sides, never broadcastable at
    # production scale (round 14; see dedup._simhash_mih_pairs).
    a, b = prefix.alias("a").hint("merge"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # integer length filter: 4·max <= 5·min
            & (
                _TAU_DEN * F.least(F.col("a.n"), F.col("b.n"))
                >= _TAU_NUM * F.greatest(F.col("a.n"), F.col("b.n"))
            ),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa, sb = docsets.alias("sa"), docsets.alias("sb")
    inter = F.size(F.expr("array_intersect(sa.hs, sb.hs)"))
    jac = inter / (F.col("sa.n") + F.col("sb.n") - inter)
    return (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )
