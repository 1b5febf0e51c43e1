"""Rank statistics with exact-integer contracts (round 9): Mann–Whitney
U, Kendall's tau-b, and Spearman's rho — the NONPARAMETRIC inferential
layer completing the experimentation family (the registered Welch z
assumes second moments mean something; these don't, which is why every
real experimentation platform reports a rank test beside the t/z).

The shared machinery is the LEVEL FRAME: the corpus collapses to one
row per distinct (group, value) with its count, so every rank quantity
becomes integer prefix arithmetic on a frame bounded by the VALUE
DOMAIN (cent/percent lattices), not the row count — the same
two-phase-rank decomposition the weighted-quantile query certifies.

Exactness discipline (the ``stats_ext`` contract):

- tied ranks: the average rank of a tied level is carried DOUBLED
  (``2r = 2·prev + cnt + 1``), an exact BIGINT — no ``.5`` ever exists;
- Spearman centers the doubled ranks (``c = 2r − (n+1)``), which makes
  both rank means EXACTLY zero, so rho needs only the three centered
  cross-moments ``Σw·cx·cy / sqrt(Σw·cx² · Σw·cy²)`` — bounded by n³,
  inside DECIMAL(38,0) to a trillion rows, where the raw-moment form
  ``n·Σx² − (Σx)²`` would overflow 38 digits near n ≈ 2.5e9;
- Kendall counts concordant/discordant pairs on the CELL self-join of
  the bounded contingency grid (≤ |q-domain|·|d-domain| cells per
  group): pair products in DECIMAL(38,0), tie corrections from the
  marginal level frames;
- the single float expression per query (z / tau / rho) is a fixed
  shape over casts of identical exact integers — IEEE div/sqrt of
  equal operands is equal, so ``round()`` sees the same double in both
  engines.

Scale: every aggregate is map-side combinable; every window and join
runs on a domain-bounded frame. Nothing data-sized crosses a
single-partition Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register


# --------------------------------------------------------------------------
# events_mann_whitney_utest — rank-sum z on the parity split
# --------------------------------------------------------------------------


@register(
    "events_mann_whitney_utest",
    oracle="""
    WITH lvl AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS na_x,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nb_x
      FROM events GROUP BY 1, 2
    ),
    rk AS (
      SELECT event_type, x, na_x, nb_x, na_x + nb_x AS cnt,
             coalesce(sum(na_x + nb_x) OVER (
               PARTITION BY event_type ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM lvl
    ),
    m AS (
      SELECT event_type,
             CAST(sum(na_x) AS BIGINT) AS na,
             CAST(sum(nb_x) AS BIGINT) AS nb,
             sum(CAST(na_x AS HUGEINT) * (2 * prev + cnt + 1)) AS r2a,
             sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie
      FROM rk GROUP BY event_type
    ),
    s AS (
      SELECT event_type, na, nb,
             r2a,
             r2a - CAST(na AS HUGEINT) * (na + 1)
                 - CAST(na AS HUGEINT) * nb AS a,
             CAST(na AS HUGEINT) + nb AS n,
             (CAST(na AS HUGEINT) + nb) * (CAST(na AS HUGEINT) + nb - 1)
               * (CAST(na AS HUGEINT) + nb + 1) - tie AS varnum
      FROM m
    )
    SELECT event_type, na AS n_a, nb AS n_b,
           CAST(r2a * 500 // greatest(na, 1) AS BIGINT) AS mean_rank_a_milli,
           CASE WHEN na < 1 OR nb < 1 OR varnum <= 0 THEN 0
                ELSE CAST(round(1000 * CAST(a AS DOUBLE)
                     / (2 * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                                 * CAST(varnum AS DOUBLE)
                                 / CAST(12 * CAST(n AS HUGEINT)
                                        * (n - 1) AS DOUBLE))))
                     AS BIGINT)
           END AS z_milli
    FROM s
    """,
)
def events_mann_whitney_utest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (rank-sum) test of event value between the user_id
    parity split, per event type: group A's mean rank in milli units
    (truncating div of the exact doubled rank-sum — bounded by 1000·n,
    BIGINT-safe at any scale where counts are) and the tie-corrected
    normal-approximation z in milli units (module docstring has the
    level-frame rank contract). The nonparametric sibling of the
    registered Welch A/A z-test: same split, no moment assumptions.

    Scale: one conditional aggregate to the cent-lattice level frame,
    one bounded window per type, one aggregate back — rank statistics
    without ever sorting the corpus."""
    lvl = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("cast(round(value * 100) as bigint)").alias("x"),
            F.expr("case when user_id % 2 = 0 then 1 else 0 end").alias("ia"),
        )
        .groupBy("event_type", "x")
        .agg(
            F.expr("cast(sum(ia) as bigint)").alias("na_x"),
            F.expr("cast(sum(1 - ia) as bigint)").alias("nb_x"),
        )
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = lvl.select(
        "event_type",
        "na_x",
        F.expr("na_x + nb_x").alias("cnt"),
        F.coalesce(
            F.sum(F.expr("na_x + nb_x")).over(w_prev), F.lit(0)
        ).alias("prev"),
        "nb_x",
    )
    m = rk.groupBy("event_type").agg(
        F.expr("cast(sum(na_x) as bigint)").alias("na"),
        F.expr("cast(sum(nb_x) as bigint)").alias("nb"),
        F.expr(
            "sum(cast(na_x as decimal(38,0)) * (2 * prev + cnt + 1))"
        ).alias("r2a"),
        F.expr(
            "sum(cast(cnt as decimal(38,0)) * cnt * cnt - cnt)"
        ).alias("tie"),
    )
    s = m.select(
        "event_type",
        "na",
        "nb",
        "r2a",
        F.expr(
            "r2a - cast(na as decimal(38,0)) * (na + 1)"
            " - cast(na as decimal(38,0)) * nb"
        ).alias("a"),
        F.expr("cast(na as decimal(38,0)) + nb").alias("n"),
        F.expr(
            "(cast(na as decimal(38,0)) + nb)"
            " * (cast(na as decimal(38,0)) + nb - 1)"
            " * (cast(na as decimal(38,0)) + nb + 1) - tie"
        ).alias("varnum"),
    )
    return s.select(
        "event_type",
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.expr("cast(r2a * 500 div greatest(na, 1) as bigint)").alias(
            "mean_rank_a_milli"
        ),
        F.expr(
            "case when na < 1 or nb < 1 or varnum <= 0 then cast(0 as bigint)"
            " else cast(round(1000 * cast(a as double)"
            " / (2 * sqrt(cast(na as double) * cast(nb as double)"
            " * cast(varnum as double)"
            " / cast(12 * cast(n as decimal(38,0)) * (n - 1) as double))))"
            " as bigint) end"
        ).alias("z_milli"),
    )


# --------------------------------------------------------------------------
# orders_kendall_tau — exact tau-b from the bounded contingency grid
# --------------------------------------------------------------------------


@register(
    "orders_kendall_tau",
    oracle="""
    WITH cells AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_quantity) AS BIGINT) AS q,
             CAST(round(l_discount * 100) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2, 3
    ),
    pairs AS (
      SELECT a.flag,
             sum(CASE WHEN a.d < b.d
                      THEN CAST(a.cnt AS HUGEINT) * b.cnt ELSE 0 END) AS c,
             sum(CASE WHEN a.d > b.d
                      THEN CAST(a.cnt AS HUGEINT) * b.cnt ELSE 0 END) AS dd
      FROM cells a JOIN cells b
        ON a.flag = b.flag AND a.q < b.q AND a.d <> b.d
      GROUP BY a.flag
    ),
    marg AS (
      SELECT flag, CAST(sum(cnt) AS BIGINT) AS n,
             CAST(count(DISTINCT q) AS BIGINT) AS n_q_levels,
             CAST(count(DISTINCT d) AS BIGINT) AS n_d_levels
      FROM cells GROUP BY flag
    ),
    tx AS (
      SELECT flag, sum(CAST(nq AS HUGEINT) * (nq - 1)) AS tx2
      FROM (SELECT flag, q, sum(cnt) AS nq FROM cells GROUP BY 1, 2)
      GROUP BY flag
    ),
    ty AS (
      SELECT flag, sum(CAST(nd AS HUGEINT) * (nd - 1)) AS ty2
      FROM (SELECT flag, d, sum(cnt) AS nd FROM cells GROUP BY 1, 2)
      GROUP BY flag
    )
    SELECT m.flag AS l_returnflag, m.n AS n_rows,
           m.n_q_levels, m.n_d_levels,
           CASE WHEN CAST(m.n AS HUGEINT) * (m.n - 1) - t1.tx2 <= 0
                  OR CAST(m.n AS HUGEINT) * (m.n - 1) - t2.ty2 <= 0
                THEN 0
                ELSE CAST(round(1000000 * 2
                     * CAST(p.c - p.dd AS DOUBLE)
                     / sqrt(CAST(CAST(m.n AS HUGEINT) * (m.n - 1) - t1.tx2
                                 AS DOUBLE)
                            * CAST(CAST(m.n AS HUGEINT) * (m.n - 1) - t2.ty2
                                   AS DOUBLE)))
                     AS BIGINT)
           END AS tau_ppm
    FROM marg m JOIN pairs p ON p.flag = m.flag
    JOIN tx t1 ON t1.flag = m.flag JOIN ty t2 ON t2.flag = m.flag
    """,
)
def orders_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b (exact ppm) between line quantity and discount
    per return flag: concordant/discordant pairs counted on the
    quantity×discount CONTINGENCY-CELL self-join — bounded by the two
    value domains (≈50×11 cells per flag), never by row count — with
    marginal tie corrections (module docstring has the contract).
    Kendall answers the monotone-association question Pearson can't;
    together with the registered exact-moment Pearson and Spearman rho
    it completes the correlation triple.

    Scale: the corpus collapses to cells in one aggregate; the pair
    join multiplies COUNTS, so its cost is the square of the domain
    size, a constant — this is how a rank statistic survives 100 TB."""
    cells = _staged(
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.expr("cast(round(l_quantity) as bigint)").alias("q"),
            F.expr("cast(round(l_discount * 100) as bigint)").alias("d"),
        )
        .groupBy("flag", "q", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    a, b = cells.alias("a"), cells.alias("b")
    pairs = (
        a.join(
            b,
            (F.expr("a.flag = b.flag"))
            & (F.expr("a.q < b.q"))
            & (F.expr("a.d <> b.d")),
        )
        .groupBy(F.expr("a.flag").alias("flag"))
        .agg(
            F.expr(
                "sum(case when a.d < b.d"
                " then cast(a.cnt as decimal(38,0)) * b.cnt else 0 end)"
            ).alias("c"),
            F.expr(
                "sum(case when a.d > b.d"
                " then cast(a.cnt as decimal(38,0)) * b.cnt else 0 end)"
            ).alias("dd"),
        )
    )
    marg = cells.groupBy("flag").agg(
        F.expr("cast(sum(cnt) as bigint)").alias("n"),
        F.expr("cast(count(distinct q) as bigint)").alias("n_q_levels"),
        F.expr("cast(count(distinct d) as bigint)").alias("n_d_levels"),
    )
    tx = (
        cells.groupBy("flag", "q")
        .agg(F.expr("sum(cnt)").alias("nq"))
        .groupBy("flag")
        .agg(
            F.expr("sum(cast(nq as decimal(38,0)) * (nq - 1))").alias("tx2")
        )
    )
    ty = (
        cells.groupBy("flag", "d")
        .agg(F.expr("sum(cnt)").alias("nd"))
        .groupBy("flag")
        .agg(
            F.expr("sum(cast(nd as decimal(38,0)) * (nd - 1))").alias("ty2")
        )
    )
    n0 = "cast(n as decimal(38,0)) * (n - 1)"
    return (
        marg.join(F.broadcast(pairs), "flag")
        .join(F.broadcast(tx), "flag")
        .join(F.broadcast(ty), "flag")
        .select(
            F.col("flag").alias("l_returnflag"),
            F.col("n").alias("n_rows"),
            "n_q_levels",
            "n_d_levels",
            F.expr(
                f"case when {n0} - tx2 <= 0 or {n0} - ty2 <= 0"
                " then cast(0 as bigint)"
                " else cast(round(1000000 * 2 * cast(c - dd as double)"
                f" / sqrt(cast({n0} - tx2 as double)"
                f" * cast({n0} - ty2 as double))) as bigint)"
                " end"
            ).alias("tau_ppm"),
        )
    )


# --------------------------------------------------------------------------
# orders_spearman_rho — centered-rank Pearson on the level frames
# --------------------------------------------------------------------------


@register(
    "orders_spearman_rho",
    oracle="""
    WITH base AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_quantity) AS BIGINT) AS q,
             CAST(round(l_discount * 100) AS BIGINT) AS d
      FROM lineitem
    ),
    cells AS (
      SELECT flag, q, d, CAST(count(*) AS BIGINT) AS cnt
      FROM base GROUP BY 1, 2, 3
    ),
    tot AS (SELECT flag, CAST(sum(cnt) AS BIGINT) AS n FROM cells GROUP BY 1),
    qr AS (
      SELECT flag, q,
             2 * coalesce(sum(nq) OVER (
               PARTITION BY flag ORDER BY q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + nq + 1 AS r2
      FROM (SELECT flag, q, CAST(sum(cnt) AS BIGINT) AS nq
            FROM cells GROUP BY 1, 2)
    ),
    dr AS (
      SELECT flag, d,
             2 * coalesce(sum(nd) OVER (
               PARTITION BY flag ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + nd + 1 AS r2
      FROM (SELECT flag, d, CAST(sum(cnt) AS BIGINT) AS nd
            FROM cells GROUP BY 1, 2)
    ),
    cen AS (
      SELECT c.flag, c.cnt,
             CAST(qr.r2 - (t.n + 1) AS HUGEINT) AS cx,
             CAST(dr.r2 - (t.n + 1) AS HUGEINT) AS cy
      FROM cells c
      JOIN tot t ON t.flag = c.flag
      JOIN qr ON qr.flag = c.flag AND qr.q = c.q
      JOIN dr ON dr.flag = c.flag AND dr.d = c.d
    ),
    m AS (
      SELECT flag, sum(CAST(cnt AS HUGEINT) * cx * cy) AS sxy,
             sum(CAST(cnt AS HUGEINT) * cx * cx) AS sxx,
             sum(CAST(cnt AS HUGEINT) * cy * cy) AS syy
      FROM cen GROUP BY flag
    )
    SELECT m.flag AS l_returnflag, t.n AS n_rows,
           CASE WHEN m.sxx <= 0 OR m.syy <= 0 THEN 0
                ELSE CAST(round(1000000 * CAST(m.sxy AS DOUBLE)
                     / sqrt(CAST(m.sxx AS DOUBLE) * CAST(m.syy AS DOUBLE)))
                     AS BIGINT)
           END AS rho_ppm
    FROM m JOIN tot t ON t.flag = m.flag
    """,
)
def orders_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman's rho (exact ppm) between line quantity and discount per
    return flag, as Pearson on CENTERED doubled average ranks: centering
    (c = 2r − (n+1)) zeroes both rank means exactly, so only the three
    centered cross-moments survive — bounded by n³, inside DECIMAL(38,0)
    to a trillion rows where the raw-moment form overflows (module
    docstring). Third leg of the correlation triple.

    Scale: ranks come from windows over the two marginal LEVEL frames
    (domain-bounded); the corpus collapses to contingency cells once;
    the rank joins are broadcast of domain-sized frames."""
    cells = _staged(
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.expr("cast(round(l_quantity) as bigint)").alias("q"),
            F.expr("cast(round(l_discount * 100) as bigint)").alias("d"),
        )
        .groupBy("flag", "q", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = cells.groupBy("flag").agg(
        F.expr("cast(sum(cnt) as bigint)").alias("n")
    )

    def _rank_frame(col: str) -> DataFrame:
        w = (
            Window.partitionBy("flag")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            cells.groupBy("flag", col)
            .agg(F.expr("cast(sum(cnt) as bigint)").alias("nl"))
            .select(
                "flag",
                col,
                (
                    2 * F.coalesce(F.sum("nl").over(w), F.lit(0))
                    + F.col("nl")
                    + 1
                ).alias("r2"),
            )
        )

    qr = _rank_frame("q").withColumnRenamed("r2", "r2q")
    dr = _rank_frame("d").withColumnRenamed("r2", "r2d")
    cen = (
        cells.join(F.broadcast(tot), "flag")
        .join(F.broadcast(qr), ["flag", "q"])
        .join(F.broadcast(dr), ["flag", "d"])
        .select(
            "flag",
            "cnt",
            F.expr("cast(r2q - (n + 1) as decimal(38,0))").alias("cx"),
            F.expr("cast(r2d - (n + 1) as decimal(38,0))").alias("cy"),
        )
    )
    m = cen.groupBy("flag").agg(
        F.expr("sum(cast(cnt as decimal(38,0)) * cx * cy)").alias("sxy"),
        F.expr("sum(cast(cnt as decimal(38,0)) * cx * cx)").alias("sxx"),
        F.expr("sum(cast(cnt as decimal(38,0)) * cy * cy)").alias("syy"),
    )
    return m.join(F.broadcast(tot), "flag").select(
        F.col("flag").alias("l_returnflag"),
        F.col("n").alias("n_rows"),
        F.expr(
            "case when sxx <= 0 or syy <= 0 then cast(0 as bigint)"
            " else cast(round(1000000 * cast(sxy as double)"
            " / sqrt(cast(sxx as double) * cast(syy as double)))"
            " as bigint) end"
        ).alias("rho_ppm"),
    )
