"""Quality-gate agreement audit (round 12): Cohen's kappa between two
independent row-local document quality gates — chance-corrected
agreement, 100 % integer arithmetic. A curation platform runs several
cheap gates in parallel; raw agreement overstates their redundancy
whenever both gates pass almost everything, which is exactly the regime
corpus gates live in. Kappa is the standard correction (Cohen '60), and
the number that decides whether a second gate adds signal or just cost.

The two gates, both row-local single-scan predicates with no float:

- LENGTH gate: ``n_chars >= 200`` (the minimum-substance screen);
- LEXICAL gate: distinct tokens ≥ half of all tokens
  (``2·|set(toks)| >= |toks|`` — the repetition screen, integer twin of
  the Gopher repetition family).

Exactness: the 2×2 confusion cells (a, b, c, d) are exact counts; kappa
= (n·(a+d) − Σ margins) / (n² − Σ margins) with the margin cross
products (a+b)(a+c) + (c+d)(b+d) in DECIMAL(38,0) (HUGEINT in the
oracle — n² overflows BIGINT past n ≈ 3e9 rows), emitted as a
truncating-div milli integer. Truncation toward zero is identical in
Spark ``div`` and DuckDB ``//`` for negative kappa (the disagreement
case) — the documented engine pairing.

Scale: one scan, one 4-cell combinable aggregate; 1-row output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register
from .dedup import _TOKS, _TOKS_SQL

_LEN_MIN = 200

# row-local gate predicates (1/0), Spark and DuckDB spellings
_GA_SPARK = f"case when n_chars >= {_LEN_MIN} then 1 else 0 end"
_GB_SPARK = (
    f"case when 2 * size(array_distinct({_TOKS})) >= size({_TOKS})"
    " then 1 else 0 end"
)
_GA_SQL = f"CASE WHEN n_chars >= {_LEN_MIN} THEN 1 ELSE 0 END"
_GB_SQL = (
    f"CASE WHEN 2 * len(list_distinct({_TOKS_SQL})) >= len({_TOKS_SQL})"
    " THEN 1 ELSE 0 END"
)


@register(
    "quality_gate_kappa",
    oracle=f"""
    WITH g AS (
      SELECT {_GA_SQL} AS ga, {_GB_SQL} AS gb FROM documents
    ),
    cells AS (
      SELECT CAST(sum(ga * gb) AS BIGINT) AS a,
             CAST(sum(ga * (1 - gb)) AS BIGINT) AS b,
             CAST(sum((1 - ga) * gb) AS BIGINT) AS c,
             CAST(sum((1 - ga) * (1 - gb)) AS BIGINT) AS d
      FROM g
    ),
    k AS (
      SELECT a, b, c, d, a + b + c + d AS n,
             CAST(a + b AS HUGEINT) * (a + c)
               + CAST(c + d AS HUGEINT) * (b + d) AS pe_num
      FROM cells
    )
    SELECT a AS both_pass, b AS len_only, c AS lex_only, d AS both_fail,
           CAST(CASE WHEN n = 0 THEN 0
                ELSE (a + d) * 1000000 // n END AS BIGINT) AS agree_ppm,
           CAST(CASE WHEN CAST(n AS HUGEINT) * n - pe_num = 0 THEN 0
                ELSE (1000 * (CAST(n AS HUGEINT) * (a + d) - pe_num))
                     // (CAST(n AS HUGEINT) * n - pe_num)
                END AS BIGINT) AS kappa_milli
    FROM k
    """,
)
def quality_gate_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the length gate (n_chars ≥ {_LEN_MIN}) and
    the lexical-diversity gate (distinct tokens ≥ half of tokens) over
    the document corpus: the 2×2 confusion cells, raw agreement (exact
    ppm), and chance-corrected kappa (truncating-div milli — exact
    integers end to end, module docstring). Kappa near 0 with high raw
    agreement is the tell that the gates agree only by base rate.

    Scale: one scan, one combinable 4-cell aggregate, 1-row output."""
    g = load_table(spark, sf_dir, "documents").select(
        F.expr(_GA_SPARK).alias("ga"), F.expr(_GB_SPARK).alias("gb")
    )
    cells = g.agg(
        F.expr("cast(sum(ga * gb) as bigint)").alias("a"),
        F.expr("cast(sum(ga * (1 - gb)) as bigint)").alias("b"),
        F.expr("cast(sum((1 - ga) * gb) as bigint)").alias("c"),
        F.expr("cast(sum((1 - ga) * (1 - gb)) as bigint)").alias("d"),
    )
    k = cells.select(
        "a",
        "b",
        "c",
        "d",
        F.expr("a + b + c + d").alias("n"),
        F.expr(
            "cast(a + b as decimal(38,0)) * (a + c)"
            " + cast(c + d as decimal(38,0)) * (b + d)"
        ).alias("pe_num"),
    )
    return k.select(
        F.col("a").alias("both_pass"),
        F.col("b").alias("len_only"),
        F.col("c").alias("lex_only"),
        F.col("d").alias("both_fail"),
        F.expr(
            "cast(case when n = 0 then 0"
            " else (a + d) * 1000000 div n end as bigint)"
        ).alias("agree_ppm"),
        F.expr(
            "cast(case when cast(n as decimal(38,0)) * n - pe_num = 0 then 0"
            " else (1000 * (cast(n as decimal(38,0)) * (a + d) - pe_num))"
            " div (cast(n as decimal(38,0)) * n - pe_num)"
            " end as bigint)"
        ).alias("kappa_milli"),
    )


quality_gate_kappa.__doc__ = quality_gate_kappa.__doc__.replace(
    "{_LEN_MIN}", str(_LEN_MIN)
)
