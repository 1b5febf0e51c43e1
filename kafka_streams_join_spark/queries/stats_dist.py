"""Distribution tests with exact-integer contracts (round 9, wave 2):
two-sample Kolmogorov–Smirnov and the chi-square independence test —
the distribution-level counterpart of the registered location tests
(Welch z compares means, Mann–Whitney compares ranks; KS asks whether
the SHAPES differ anywhere, chi-square whether a categorical is
independent of the split).

Exactness discipline:

- KS: the statistic D = max|F_a(x) − F_b(x)| is computed on the common
  denominator — ``D_num = max|cumA·nb − cumB·na|`` — so the argmax runs
  entirely on exact DECIMAL(38,0) integers (cum ≤ n, × counts ≤ n² ≤
  1e24 at a trillion rows); the ONE float is the final D_num/(na·nb)
  ppm. The location of the maximum gap is extracted with the
  conditional-min idiom (smallest x attaining D), exactly like the
  weighted-quantile query.
- chi-square: each cell's numerator ``obs·n − row·col`` is an exact
  DECIMAL (≤ 1e24); the per-cell term (num²/(n·row·col)) is
  micro-rounded per cell BEFORE the integer sum — the ``retrieval_map_
  eval`` summation-order contract — because squaring the numerator
  would need 48 digits exactly.

Scale: both tests collapse the corpus in ONE map-side-combinable
conditional aggregate (to the cent-lattice level frame / the
type×split contingency cells); every window and join after that runs
on a domain-bounded frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register


# --------------------------------------------------------------------------
# events_ks_test — exact two-sample Kolmogorov–Smirnov on the parity split
# --------------------------------------------------------------------------


@register(
    "events_ks_test",
    oracle="""
    WITH lvl AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(sum(ca) AS BIGINT) AS na,
             CAST(sum(cb) AS BIGINT) AS nb
      FROM lvl GROUP BY 1
    ),
    cum AS (
      SELECT l.event_type, l.x, t.na, t.nb,
             abs(CAST(sum(l.ca) OVER (PARTITION BY l.event_type ORDER BY l.x
                        ROWS UNBOUNDED PRECEDING) AS HUGEINT) * t.nb
                 - CAST(sum(l.cb) OVER (PARTITION BY l.event_type ORDER BY l.x
                          ROWS UNBOUNDED PRECEDING) AS HUGEINT) * t.na)
               AS dnum
      FROM lvl l JOIN tot t USING (event_type)
    ),
    mx AS (
      SELECT event_type, max(dnum) AS dmax FROM cum GROUP BY 1
    )
    SELECT c.event_type, max(c.na) AS n_a, max(c.nb) AS n_b,
           min(CASE WHEN c.dnum = m.dmax THEN c.x END) AS d_at_x,
           CAST(round(1000000 * CAST(m.dmax AS DOUBLE)
                / (CAST(max(c.na) AS DOUBLE) * max(c.nb))) AS BIGINT)
             AS d_ppm
    FROM cum c JOIN mx m USING (event_type)
    GROUP BY c.event_type, m.dmax
    """,
)
def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D between the user-parity split's
    value distributions, per event type, with the value at which the
    maximum CDF gap occurs (module docstring has the exact-integer
    common-denominator contract). The A/A distribution test: reads ~0
    on a homogeneous corpus, and unlike z/U it would catch a variance-
    or shape-only regression between the splits.

    Scale: one conditional aggregate to the level frame, one bounded
    window per type, one bounded argmax join back."""
    lvl = _staged(
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("cast(round(value * 100) as bigint)").alias("x"),
            F.expr("case when user_id % 2 = 0 then 1 else 0 end").alias("ia"),
        )
        .groupBy("event_type", "x")
        .agg(
            F.expr("cast(sum(ia) as bigint)").alias("ca"),
            F.expr("cast(sum(1 - ia) as bigint)").alias("cb"),
        )
    )
    tot = lvl.groupBy("event_type").agg(
        F.expr("cast(sum(ca) as bigint)").alias("na"),
        F.expr("cast(sum(cb) as bigint)").alias("nb"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = lvl.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "x",
        "na",
        "nb",
        F.abs(
            F.sum("ca").over(w_cum).cast("decimal(38,0)") * F.col("nb")
            - F.sum("cb").over(w_cum).cast("decimal(38,0)") * F.col("na")
        ).alias("dnum"),
    )
    mx = cum.groupBy("event_type").agg(F.max("dnum").alias("dmax"))
    return (
        cum.join(F.broadcast(mx), "event_type")
        .groupBy("event_type", "dmax")
        .agg(
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            F.min(F.expr("case when dnum = dmax then x end")).alias("d_at_x"),
        )
        .select(
            "event_type",
            "n_a",
            "n_b",
            "d_at_x",
            F.expr(
                "cast(round(1000000 * cast(dmax as double)"
                " / (cast(n_a as double) * n_b)) as bigint)"
            ).alias("d_ppm"),
        )
    )


# --------------------------------------------------------------------------
# events_chi2_type_split — chi-square independence of type × parity
# --------------------------------------------------------------------------


@register(
    "events_chi2_type_split",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS oa,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ob
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(oa) AS BIGINT) AS ta, CAST(sum(ob) AS BIGINT) AS tb,
             CAST(sum(oa) + sum(ob) AS BIGINT) AS n
      FROM cells
    ),
    terms AS (
      SELECT c.event_type,
             CASE WHEN t.ta <= 0 OR c.oa + c.ob <= 0 THEN 0
             ELSE CAST(round(1000000
               * CAST(CAST(c.oa AS HUGEINT) * t.n
                      - CAST(c.oa + c.ob AS HUGEINT) * t.ta AS DOUBLE)
               * CAST(CAST(c.oa AS HUGEINT) * t.n
                      - CAST(c.oa + c.ob AS HUGEINT) * t.ta AS DOUBLE)
               / CAST(CAST(t.n AS HUGEINT) * (c.oa + c.ob) * t.ta AS DOUBLE))
               AS BIGINT) END
             + CASE WHEN t.tb <= 0 OR c.oa + c.ob <= 0 THEN 0
             ELSE CAST(round(1000000
               * CAST(CAST(c.ob AS HUGEINT) * t.n
                      - CAST(c.oa + c.ob AS HUGEINT) * t.tb AS DOUBLE)
               * CAST(CAST(c.ob AS HUGEINT) * t.n
                      - CAST(c.oa + c.ob AS HUGEINT) * t.tb AS DOUBLE)
               / CAST(CAST(t.n AS HUGEINT) * (c.oa + c.ob) * t.tb AS DOUBLE))
               AS BIGINT) END AS t_micro
      FROM cells c CROSS JOIN tot t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_types,
           CAST(count(*) - 1 AS BIGINT) AS dof,
           CAST(sum(t_micro) AS BIGINT) AS chi2_micro
    FROM terms
    """,
)
def events_chi2_type_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event type vs the user-parity
    split: one global row with the statistic in exact-summable micro
    units and its degrees of freedom (module docstring has the per-cell
    micro-rounding contract). The categorical A/A check: expected ≈ dof
    under homogeneity, and a blown cell pinpoints a type whose traffic
    split drifted.

    Scale: ONE conditional aggregate to n_types rows, a 1-row broadcast
    of the totals (BNLJ of a 1-row frame — the documented-ok pattern),
    constant-time arithmetic after."""
    cells = load_table(spark, sf_dir, "events").groupBy("event_type").agg(
        F.expr(
            "cast(sum(case when user_id % 2 = 0 then 1 else 0 end)"
            " as bigint)"
        ).alias("oa"),
        F.expr(
            "cast(sum(case when user_id % 2 = 1 then 1 else 0 end)"
            " as bigint)"
        ).alias("ob"),
    )
    tot = cells.agg(
        F.expr("cast(sum(oa) as bigint)").alias("ta"),
        F.expr("cast(sum(ob) as bigint)").alias("tb"),
        F.expr("cast(sum(oa) + sum(ob) as bigint)").alias("n"),
    )

    def _term(obs: str, col_tot: str) -> str:
        # guard the degenerate one-sided split (an empty column margin):
        # the expected count is 0 there and the cell contributes nothing —
        # without the guard Spark rounds Infinity to null while DuckDB's
        # BIGINT cast throws, a certain parity break
        num = (
            f"cast(cast({obs} as decimal(38,0)) * n"
            f" - cast(oa + ob as decimal(38,0)) * {col_tot} as double)"
        )
        den = f"cast(cast(n as decimal(38,0)) * (oa + ob) * {col_tot} as double)"
        return (
            f"case when {col_tot} <= 0 or oa + ob <= 0 then cast(0 as bigint)"
            f" else cast(round(1000000 * {num} * {num} / {den}) as bigint) end"
        )

    terms = cells.crossJoin(F.broadcast(tot)).select(
        "event_type",
        F.expr(f"{_term('oa', 'ta')} + {_term('ob', 'tb')}").alias("t_micro"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.expr("cast(count(1) - 1 as bigint)").alias("dof"),
        F.expr("cast(sum(t_micro) as bigint)").alias("chi2_micro"),
    )
