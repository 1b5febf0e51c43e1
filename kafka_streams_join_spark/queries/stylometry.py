"""Burrows' Delta — stylometric distance between sources (round 9,
wave 5). The classic authorship-attribution statistic: z-score each
source's relative frequency of the corpus' top function words against
the across-source distribution, then the distance between two sources
is the mean absolute z-difference. For a training-data pipeline this is
the provenance triage the chunk/shingle dedup family can't give —
two sources can share zero literal content and still be the same
generator (same stylistic fingerprint), which is exactly what
contaminated or laundered scrapes look like.

Exact-integer contract:

- relative frequencies are exact PPM integers (cnt·10⁶ div N_source);
- each word's across-source moments (Σf, Σf², the S·Σf² − (Σf)²
  variance numerator) are exact BIGINT/DECIMAL — S is the source
  count, a handful;
- the z-score is ONE fixed-shape float expression over those exact
  integers — z = (S·f − Σf)·sqrt((S−1)/(S·varnum)) — rounded to milli
  (engine-identical: IEEE ops on equal operands), with the varnum ≤ 0
  degenerate guarded to 0;
- Delta is then a pure-integer mean of |z_a − z_b| over the word set.

Word set: the corpus-wide top-``_W_TOP`` tokens by total count with a
token tie-break — a deterministic, Zipf-bounded frame (function words
dominate any natural corpus, which is WHY Burrows uses them: style
lives in 'the/of/and' rates, not topic words).

Scale: one (source, token) count collapses the corpus; everything
after runs on frames bounded by ``_W_TOP × n_sources``. The top-word
selection is a TakeOrdered-shaped rank over the token vocabulary —
Zipf-bounded, the same shape every registered text-frequency query
certifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register
from .text import _TOKS, _TOKS_SQL

_W_TOP = 50


@register(
    "text_burrows_delta",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_TOKS_SQL}) AS tok
      FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
    ),
    cnt AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    ),
    topw AS (
      SELECT tok FROM (
        SELECT tok, row_number() OVER (
          ORDER BY sum(c) DESC, tok) AS rn
        FROM cnt GROUP BY tok
      ) WHERE rn <= {_W_TOP}
    ),
    nsrc AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1
    ),
    f AS (
      SELECT n.source, t.tok,
             CAST(CAST(coalesce(c.c, 0) AS HUGEINT) * 1000000 // n.n
                  AS BIGINT) AS fppm
      FROM nsrc n CROSS JOIN topw t
      LEFT JOIN cnt c ON c.source = n.source AND c.tok = t.tok
    ),
    wm AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS s,
             CAST(sum(fppm) AS BIGINT) AS sf,
             CAST(sum(CAST(fppm AS HUGEINT) * fppm) AS HUGEINT) AS sff
      FROM f GROUP BY tok
    ),
    z AS (
      SELECT f.source, f.tok,
             CASE WHEN wm.s * wm.sff - CAST(wm.sf AS HUGEINT) * wm.sf <= 0
                  THEN 0
                  ELSE CAST(round(1000
                    * CAST(wm.s * CAST(f.fppm AS HUGEINT) - wm.sf AS DOUBLE)
                    * sqrt(CAST(wm.s - 1 AS DOUBLE)
                           / (CAST(wm.s AS DOUBLE)
                              * CAST(wm.s * wm.sff
                                     - CAST(wm.sf AS HUGEINT) * wm.sf
                                     AS DOUBLE))))
                    AS BIGINT)
             END AS zm
      FROM f JOIN wm ON wm.tok = f.tok
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(abs(a.zm - b.zm)) // count(*) AS BIGINT) AS delta_milli
    FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between every source pair: the mean absolute
    z-difference of top-{_W_TOP}-word ppm rates in milli units (module
    docstring has the exact-integer z contract). Low Delta between two
    'independent' sources is the same-generator red flag; the
    stylometric sibling of `dedup_source_affinity`'s literal-overlap
    audit.

    Scale: one corpus collapse to (source, token) counts; every later
    frame is bounded by {_W_TOP}·n_sources rows."""
    cnt = _staged(
        load_table(spark, sf_dir, "documents")
        .filter("text is not null and length(trim(text)) > 0")
        .select("source", F.explode(F.expr(_TOKS)).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    # TakeOrderedAndProject shape: a global limit over (count desc, tok)
    # is a distributed top-k merge, not a single-partition rank window
    topw = (
        cnt.groupBy("tok")
        .agg(F.sum("c").alias("tot"))
        .orderBy(F.desc("tot"), F.asc("tok"))
        .limit(_W_TOP)
        .select("tok")
    )
    nsrc = cnt.groupBy("source").agg(
        F.expr("cast(sum(c) as bigint)").alias("n")
    )
    f = (
        nsrc.crossJoin(F.broadcast(topw))
        .join(cnt, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            F.expr(
                "cast(cast(coalesce(c, 0) as decimal(38,0)) * 1000000"
                " div n as bigint)"
            ).alias("fppm"),
        )
    )
    wm = f.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("s"),
        F.expr("cast(sum(fppm) as bigint)").alias("sf"),
        F.expr("sum(cast(fppm as decimal(38,0)) * fppm)").alias("sff"),
    )
    varnum = "s * sff - cast(sf as decimal(38,0)) * sf"
    z = f.join(F.broadcast(wm), "tok").select(
        "source",
        "tok",
        F.expr(
            f"case when {varnum} <= 0 then cast(0 as bigint)"
            " else cast(round(1000"
            " * cast(s * cast(fppm as decimal(38,0)) - sf as double)"
            " * sqrt(cast(s - 1 as double)"
            f" / (cast(s as double) * cast({varnum} as double))))"
            " as bigint) end"
        ).alias("zm"),
    )
    za, zb = z.alias("a"), z.alias("b")
    return (
        za.join(
            zb,
            (F.expr("a.tok = b.tok")) & (F.expr("a.source < b.source")),
        )
        .groupBy(
            F.expr("a.source").alias("source_a"),
            F.expr("b.source").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.expr(
                "cast(sum(abs(a.zm - b.zm)) div count(1) as bigint)"
            ).alias("delta_milli"),
        )
    )
