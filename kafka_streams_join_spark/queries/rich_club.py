"""Rich-club sweep (round 12): the rich-club coefficient φ of the
co-purchase graph at three club sizes (the top 50 % / 25 % / 10 % of
nodes by degree) next to the whole-graph density — the
hub-interconnection audit (Zhou & Mondragón; Colizza et al.): do the
highest-degree products co-occur with EACH OTHER more densely than the
graph overall? A rising φ toward small clubs is the "core of staples
bought together" signature that degree distribution alone can't show,
and the question a recommender asks before trusting popularity-based
candidates.

Thresholds are QUANTILE-derived, not absolute (degrees scale with
corpus size, so a frozen k would go vacuous across SFs): for each club
fraction q, k_q is the LARGEST degree d whose at-least-d club holds
ceil(q·N) nodes — from the cumulative of the degree-level histogram, a
bounded frame (the unpartitioned cumulative window runs over degree
LEVELS, never nodes). Club membership is degree ≥ k_q.

Exactness: degrees, club sizes, and club edge counts are exact
integers; φ_ppm = E_club·10⁶ div C(N_club, 2) and the global
density_ppm use the same truncating-div form (edge frames here carry
each undirected edge once, u < v). ceil(q·N) = (q·N + 999) div 1000 on
milli fractions. No float anywhere.

Scale: reuses the shared canonical basket fan-out (`graph.py:_edges` —
pair space bounded by basket size); degrees are one combinable
aggregate; the threshold frame is 3 rows and BROADCASTS onto the edge
frame (3× fan-out, one combinable aggregate per club); the degree
join onto edges is node-sized. The only unpartitioned window is over
the degree-level histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from .graph import _degrees, _edges
from ..functions.literals import values_frame
from .registry import register

_CLUB_Q_MILLI = (500, 250, 100)


@register(
    "graph_rich_club",
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    pairs AS (
      SELECT DISTINCT a.pkey AS src, b.pkey AS dst
      FROM basket a JOIN basket b ON a.okey = b.okey AND a.pkey < b.pkey
    ),
    edges AS (
      SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
    ),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
            FROM edges GROUP BY src),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                 CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_edges
          FROM deg),
    lvl AS (
      SELECT degree, CAST(count(*) AS BIGINT) AS ln FROM deg GROUP BY degree
    ),
    cum AS (
      SELECT degree,
             CAST(sum(ln) OVER (ORDER BY degree DESC) AS BIGINT) AS cum_n
      FROM lvl
    ),
    qs AS (SELECT unnest([{", ".join(str(q) for q in _CLUB_Q_MILLI)}]) AS q),
    ks AS (
      SELECT qs.q AS q, max(c.degree) AS k_degree,
             CAST(min(c.cum_n) AS BIGINT) AS n_club
      FROM qs JOIN cum c
        ON c.cum_n >= (qs.q * (SELECT n_nodes FROM n) + 999) // 1000
      GROUP BY qs.q
    ),
    club_edges AS (
      SELECT k.q, CAST(count(pe.d_src) AS BIGINT) AS e_club
      FROM ks k
      LEFT JOIN (
        SELECT da.degree AS d_src, db.degree AS d_dst
        FROM pairs p
        JOIN deg da ON da.node = p.src
        JOIN deg db ON db.node = p.dst
      ) pe ON least(pe.d_src, pe.d_dst) >= k.k_degree
      GROUP BY k.q
    )
    SELECT CAST(k.q AS BIGINT) AS club_q_milli,
           k.k_degree, k.n_club, ce.e_club,
           CAST(CASE WHEN k.n_club < 2 THEN NULL
                ELSE CAST(ce.e_club AS HUGEINT) * 2000000
                     // (k.n_club * (k.n_club - 1)) END AS BIGINT)
             AS phi_ppm,
           n.n_nodes, n.n_edges,
           CAST(CAST(n.n_edges AS HUGEINT) * 2000000
                // (n.n_nodes * (n.n_nodes - 1)) AS BIGINT) AS density_ppm
    FROM ks k JOIN club_edges ce ON ce.q = k.q CROSS JOIN n
    """,
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """φ at the top-50/25/10 %-by-degree clubs of the co-purchase graph,
    with the quantile-derived degree threshold, club size, club edge
    count, and whole-graph density — exact-integer ppm throughout.
    Module docstring has the quantile, exactness, and broadcast
    contracts."""
    edges = _staged(_edges(spark, sf_dir))  # both directions
    # degrees off the cross-query table (round 14); count() is already
    # BIGINT, so the rename preserves the declared schema
    deg = _staged(
        _degrees(spark, sf_dir).withColumnRenamed("d", "degree")
    )
    # undirected edges once (u < v) for counting
    und = _staged(edges.filter(F.col("src") < F.col("dst")))
    n = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    ).crossJoin(
        F.broadcast(
            und.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        )
    )
    lvl = deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("ln")
    )
    w_cum = Window.orderBy(F.desc("degree")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = lvl.select(
        "degree", F.sum("ln").over(w_cum).cast("bigint").alias("cum_n")
    )
    qs = values_frame(spark, [(q,) for q in _CLUB_Q_MILLI], "q long")
    ks = (
        qs.crossJoin(F.broadcast(n.select("n_nodes")))
        .join(
            F.broadcast(cum),
            F.col("cum_n")
            >= F.expr("(q * n_nodes + 999) div 1000"),
        )
        .groupBy("q")
        .agg(
            F.max("degree").alias("k_degree"),
            F.min("cum_n").alias("n_club"),
        )
    )
    # per-edge min endpoint degree, then one 3-way conditional rollup
    pe = (
        und.join(
            deg.select(
                F.col("node").alias("src"), F.col("degree").alias("d_src")
            ),
            "src",
        )
        .join(
            deg.select(
                F.col("node").alias("dst"), F.col("degree").alias("d_dst")
            ),
            "dst",
        )
        .select(F.least("d_src", "d_dst").alias("d_min"))
    )
    club_edges = (
        pe.crossJoin(F.broadcast(ks))
        .groupBy("q", "k_degree", "n_club")
        .agg(
            F.sum(F.when(F.col("d_min") >= F.col("k_degree"), 1).otherwise(0))
            .cast("bigint")
            .alias("e_club")
        )
    )
    return (
        club_edges.crossJoin(F.broadcast(n))
        .select(
            F.col("q").cast("bigint").alias("club_q_milli"),
            "k_degree",
            "n_club",
            "e_club",
            F.expr(
                "cast(case when n_club < 2 then null"
                " else cast(e_club as decimal(38,0)) * 2000000"
                " div (n_club * (n_club - 1))"
                " end as bigint)"
            ).alias("phi_ppm"),
            "n_nodes",
            "n_edges",
            F.expr(
                "cast(cast(n_edges as decimal(38,0)) * 2000000"
                " div (n_nodes * (n_nodes - 1)) as bigint)"
            ).alias("density_ppm"),
        )
    )
