"""Graph analytics over the co-purchase graph: exact-integer PageRank.

The graph: parts are nodes; an undirected edge links two parts that appear
in the same order (the ``orders_copurchase_lift`` basket pairs, emitted in
both directions). PageRank over it ranks parts by co-purchase centrality —
the item-importance signal behind "customers also bought" surfaces, and
the repo's demonstration that ITERATIVE graph algorithms fit the
oracle-checked relational harness (``operators/components.py`` covers the
other classic, connected components).

Determinism contract — the k-means/PQ integer argument applied to an
iterative fixpoint: ranks live in BIGINT nano-units, per-edge
contributions are FLOOR divisions (rank div degree), and the damping
update is integer arithmetic ((15·S div 100) + (85·contrib div 100), with
S the uniform start mass). Every iteration is therefore bit-exact in both
engines — float PageRank would compound summation-order drift across
iterations, which no final rounding can undo. The oracle unrolls the same
{PR_ITERS} iterations as chained CTEs.

Scale shape: degrees are one edge aggregate; each iteration is one
edges ⋈ ranks equi-join (narrow: node, rank, degree) plus a map-side-
combined sum per destination — the textbook distributed PageRank step.
Iterations are a FIXED unrolled count, so the plan is a bounded chain (no
driver loop, no checkpoint needed at this depth); production runs with
more rounds would checkpoint lineage like ``connected_components``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..operators.staging import staged_table
from ..sources.parquet import load_table
from .registry import register

PR_ITERS = 5
PR_START = 1_000_000_000  # nano-units: uniform start mass per node
# (1 - d) * S, precomputed so no engine multiplies two INT literals (Spark's
# ANSI mode overflows 15 * 1e9 in 32-bit before any cast applies)
PR_BASE = 15 * PR_START // 100


def _baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order part sets as (okey, parts array) — the canonical basket
    stage every graph builder fans out from. collect_set dedupes inside
    the partial (map-side) aggregate, so the whole thing is ONE shuffle
    of (orderkey → bounded part set); basket size is bounded by order
    width (≤7 lines in TPC-H, a constant at any SF)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.collect_set("l_partkey").alias("parts"))
    )


def _pair_fanout(baskets: DataFrame, lo: str, hi: str) -> DataFrame:
    """Map-side enumeration of ordered part pairs (lo < hi) within each
    basket: two nested explodes + a row-local filter — k² fan-out per
    basket with k bounded by basket size, NO self-join. Replaces the
    round-4 basket self-join (distinct → join → distinct = 4 shuffles,
    2 lineitem scans) with 1 scan and the single basket shuffle; the
    round-12 rework that carries the whole graph family (same result
    set, ~40% cheaper edge stage at sf0.1)."""
    return (
        baskets.select(F.explode("parts").alias(lo), "parts")
        .select(lo, F.explode("parts").alias(hi))
        .filter(F.col(lo) < F.col(hi))
    )


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-purchase edges as (src, dst), both directions,
    deduped. Pair space is bounded by basket size (see
    ``orders_copurchase_lift``); built via the shared canonical basket
    fan-out (``_baskets`` + ``_pair_fanout``), so the only shuffles are
    the basket aggregate and the pair distinct.

    Materialized ONCE per process via ``staged_table``: ~10 registered
    graph queries consume this frame and the harnesses clear the block
    cache between queries — the edge list is edge-sized (far below the
    orders corpus), so the one-time parquet stage replaces ten basket
    fan-outs."""
    pairs = _pair_fanout(_baskets(spark, sf_dir), "src", "dst").distinct()
    return staged_table(
        pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ),
        f"graph_edges::{sf_dir}",
        src_dir=sf_dir,
    )


def _wpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted oriented co-purchase pairs (u < v, w = shared-order
    count) — the shared builder for the capped-adjacency queries
    (common neighbors, Jaccard). Same basket fan-out as ``_edges``;
    the weight aggregate replaces the pair distinct (one shuffle).
    Cross-query staged like ``_edges`` (two registered consumers)."""
    return staged_table(
        _pair_fanout(_baskets(spark, sf_dir), "u", "v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w")),
        f"graph_wpairs::{sf_dir}",
        src_dir=sf_dir,
    )


def _degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, d): symmetric co-purchase degree per node — one aggregate
    over the edges table. Cross-query staged like ``_edges`` (round 14):
    six registered consumers (PageRank, degree distribution, triangle
    count, local clustering, assortativity, rich club) each re-ran the
    identical aggregate; the staged table is node-count-sized."""
    return staged_table(
        _edges(spark, sf_dir)
        .groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("d")),
        f"graph_deg::{sf_dir}",
        src_dir=sf_dir,
    )


def _oriented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(u, v): each undirected edge oriented from its lower-(degree, id)
    endpoint — the compact-forward edge iterator ``graph_triangle_count``
    and ``graph_local_clustering`` both enumerate triangles over.
    Cross-query staged (round 14): the two consumers re-ran the same
    two degree joins; the table is one row per undirected edge."""
    edges = _staged(_edges(spark, sf_dir))
    deg = _staged(_degrees(spark, sf_dir))
    return staged_table(
        edges.join(
            deg.select(F.col("node").alias("src"), F.col("d").alias("du")),
            "src",
        )
        .join(
            deg.select(F.col("node").alias("dst"), F.col("d").alias("dv")),
            "dst",
        )
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst")))
        )
        .select(F.col("src").alias("u"), F.col("dst").alias("v")),
        f"graph_oriented::{sf_dir}",
        src_dir=sf_dir,
    )


def _oriented_adj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(u, nbrs): out-neighbor arrays of the oriented edge frame —
    out-degrees are bounded O(√m) by the orientation, so arrays stay
    small at hub nodes. Cross-query staged with ``_oriented`` (round 14;
    same two consumers). Array ORDER is collection-order-dependent, but
    both consumers only intersect/size the arrays — order-free."""
    return staged_table(
        _oriented(spark, sf_dir)
        .groupBy("u")
        .agg(F.collect_list("v").alias("nbrs")),
        f"graph_oadj::{sf_dir}",
        src_dir=sf_dir,
    )


def _pagerank_oracle() -> str:
    itr = "\n".join(
        f""",
    r{i + 1} AS (
      SELECT deg.node,
             CAST({PR_BASE} + 85 * coalesce(c.contrib, 0) // 100
                  AS BIGINT) AS rank
      FROM deg LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(r{i}.rank // deg.degree) AS BIGINT)
          AS contrib
        FROM edges e
        JOIN r{i} ON r{i}.node = e.src
        JOIN deg ON deg.node = e.src
        GROUP BY e.dst
      ) c ON c.node = deg.node
    )"""
        for i in range(PR_ITERS)
    )
    return f"""
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
    deg AS (SELECT src AS node, count(*) AS degree FROM edges GROUP BY src),
    r0 AS (SELECT node, CAST({PR_START} AS BIGINT) AS rank FROM deg){itr}
    SELECT node AS part_id, rank AS rank_nano FROM r{PR_ITERS}
    """


@register("graph_pagerank_parts", oracle=_pagerank_oracle())
def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, {PR_ITERS} unrolled iterations) over the
    undirected co-purchase part graph, in exact BIGINT nano-units — see
    the module docstring for the integer-fixpoint determinism contract
    and the per-iteration plan shape."""
    # staged: the 5 unrolled iterations reference edges ~6x and deg ~11x;
    # unstaged, each reference re-ran the basket fan-out / the degree
    # aggregate from the scan (review finding, round 5). Both come off
    # the cross-query tables (round 14).
    edges = _staged(_edges(spark, sf_dir))
    deg = _staged(
        _degrees(spark, sf_dir).withColumnRenamed("d", "degree")
    )
    ranks = deg.select("node", F.lit(PR_START).cast("long").alias("rank"))
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg.withColumnRenamed("node", "dnode"), F.col("src") == F.col("dnode"))
            .select("dst", F.expr("rank div degree").alias("c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").cast("long").alias("contrib"))
        )
        ranks = deg.join(contrib, "node", "left").select(
            "node",
            F.expr(
                f"cast({PR_BASE} + 85 * coalesce(contrib, 0) div 100"
                " as bigint)"
            ).alias("rank"),
        )
    return ranks.select(
        F.col("node").alias("part_id"), F.col("rank").alias("rank_nano")
    )


# A plain docstring can't interpolate (f-strings aren't docstrings), and the
# explain audit copies docstring headlines verbatim — substitute the
# iteration count so '{PR_ITERS}' never leaks into EXPLAINS.md.
graph_pagerank_parts.__doc__ = graph_pagerank_parts.__doc__.replace(
    "{PR_ITERS}", str(PR_ITERS)
)


# --------------------------------------------------------------------------
# graph_degree_distribution — co-purchase degree histogram
# --------------------------------------------------------------------------


@register(
    "graph_degree_distribution",
    oracle="""
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
    deg AS (SELECT src AS node, count(*) AS degree FROM edges GROUP BY src),
    n AS (SELECT count(*) AS n_nodes FROM deg)
    SELECT deg.degree, count(*) AS n_parts,
           CAST(count(*) * 1000000 // n.n_nodes AS BIGINT) AS share_ppm
    FROM deg CROSS JOIN n
    GROUP BY deg.degree, n.n_nodes
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the co-purchase part graph: how many parts have
    each co-purchase degree, with the exact-ppm share of all parts. The
    first chart of any graph workload — it decides whether PageRank /
    components need skew handling (a heavy-tail hub would dominate every
    per-node join) and calibrates the basket-bounded pair-space argument
    the whole graph family rests on.

    Scale: one basket fan-out (the shared bounded-candidate edge stage),
    one degree aggregate, one histogram aggregate over the
    degree-cardinality frame; the node count broadcasts."""
    deg = _staged(_degrees(spark, sf_dir).withColumnRenamed("d", "degree"))
    n = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .join(F.broadcast(n))
        .select(
            "degree",
            "n_parts",
            F.expr("cast(n_parts * 1000000 div n_nodes as bigint)").alias(
                "share_ppm"
            ),
        )
    )


# --------------------------------------------------------------------------
# graph_triangle_count — degree-oriented exact triangle counting
# --------------------------------------------------------------------------


@register(
    "graph_triangle_count",
    oracle="""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    und AS (
      SELECT DISTINCT a.pkey AS u, b.pkey AS v
      FROM basket a JOIN basket b ON a.okey = b.okey AND a.pkey < b.pkey
    ),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und
      ) GROUP BY node
    ),
    o AS (
      SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.u < e.v)
                  THEN e.u ELSE e.v END AS u,
             CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.u < e.v)
                  THEN e.v ELSE e.u END AS v,
             CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.u < e.v)
                  THEN db.d ELSE da.d END AS dv
      FROM und e
      JOIN deg da ON da.node = e.u
      JOIN deg db ON db.node = e.v
    ),
    wedges AS (
      SELECT e1.v AS a, e2.v AS b
      FROM o e1 JOIN o e2
        ON e1.u = e2.u
       AND ((e1.dv < e2.dv) OR (e1.dv = e2.dv AND e1.v < e2.v))
    ),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM wedges w JOIN o e3 ON e3.u = w.a AND e3.v = w.b
    ),
    tots AS (
      SELECT (SELECT count(*) FROM deg) AS n_nodes,
             (SELECT count(*) FROM und) AS n_edges,
             (SELECT count(*) FROM wedges) AS n_closed_wedge_checks,
             (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg)
               AS n_wedges_undirected
    )
    SELECT t.n_nodes, t.n_edges, tri.n_triangles,
           t.n_wedges_undirected,
           CAST(3 * tri.n_triangles * 1000000
                // greatest(1, t.n_wedges_undirected) AS BIGINT)
             AS transitivity_ppm
    FROM tots t CROSS JOIN tri
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global transitivity of the co-purchase
    graph, via the DEGREE-ORIENTED edge iterator (compact-forward with
    adjacency arrays): orient each undirected edge from its
    lower-(degree, id) endpoint, build each node's out-neighbor ARRAY,
    and per oriented edge (u, v) count |N⁺(u) ∩ N⁺(v)| row-locally with
    array_intersect. In the orientation's DAG every triangle a→b→c has
    its three nodes totally ordered, so it is counted EXACTLY once — at
    edge (a, b) with c in both out-sets.

    Scale (round-12 rework; was the wedge-materializing join): the old
    plan shuffled the Σ outdeg² wedge frame (~150M rows at sf0.1) into a
    closing join; this one never materializes wedges — the intersection
    runs inside the projection, so the largest shuffles are the oriented
    edge frame carrying two degree-bounded arrays (outdeg ≤ O(√m) under
    this orientation, so arrays stay small even at hub nodes). Measured
    9.1 s → 2.9 s best-of-3 at sf0.1, identical output. All joins remain
    node-keyed equi-joins; the oracle keeps the equivalent relational
    wedge formulation (same counts by the exactly-once argument).

    Overflow headroom: the 3·n_triangles·10⁶ ppm numerator stays inside
    BIGINT up to ~3×10¹² triangles (sf ≳ 10⁴ on this graph family) —
    three orders of magnitude past the 100-TB target, so unlike the
    per-pair lift numerators (DECIMAL(38,0), see orders_copurchase_lift)
    this 1-row computation deliberately stays BIGINT."""
    # oriented edges, adjacency arrays, and degrees come off the
    # cross-query tables (round 14 — shared with graph_local_clustering;
    # the orientation here spelled when(fwd) over the u<v edges, the
    # LCC spelling filters the symmetric frame: identical row sets)
    deg = _staged(_degrees(spark, sf_dir))
    o = _staged(_oriented(spark, sf_dir))
    adj = _staged(_oriented_adj(spark, sf_dir))
    tri = (
        o.join(adj.select("u", F.col("nbrs").alias("nu")), "u")
        .join(adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nv")), "v")
        .select(F.size(F.array_intersect("nu", "nv")).alias("c"))
        .agg(
            F.coalesce(F.sum("c"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles")
        )
    )
    tots = (
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.expr("d * (d - 1) div 2"))
            .cast("bigint")
            .alias("n_wedges_undirected"),
        )
        # n_edges off the oriented frame: exactly one row per undirected
        # edge, so the count equals the old src<dst filter's
        .crossJoin(F.broadcast(o.agg(F.count(F.lit(1)).alias("n_edges"))))
    )
    return tots.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        "n_wedges_undirected",
        F.expr(
            "cast(3 * n_triangles * 1000000"
            " div greatest(1, n_wedges_undirected) as bigint)"
        ).alias("transitivity_ppm"),
    )


# --------------------------------------------------------------------------
# graph_common_neighbors — link-prediction candidates (round 6)
# --------------------------------------------------------------------------

_CN_TOPN = 20
# Per-node adjacency cap: each node contributes wedges only through its
# top-_CN_CAP strongest neighbors (by co-purchase weight, neighbor id
# tie-break). Bounds the wedge stage at Σ C(min(deg, CAP), 2) — at sf0.1
# the uncapped graph has avg degree ~120 (Σdeg² ≈ 298M wedges); the cap
# holds it to ≤ 20k·C(24,2) ≈ 5.5M, and at 100 TB it is the difference
# between squaring hub degrees and a constant per-node bound. A RECALL
# contract, not an approximation of the exact counts: mirrored verbatim
# in the oracle (the SHINGLE_DF_CAP pattern, queries/dedup.py).
_CN_CAP = 24


def _capped_adj0_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capped-adjacency BUILD plan (un-staged) — split out so the
    plan gates can assert the cap plans as WindowGroupLimit (partial
    per-partition top-d heaps before the shuffle) on the plan that
    actually executes at stage-build time."""
    from pyspark.sql import Window

    wpairs = _staged(_wpairs(spark, sf_dir))
    sym = wpairs.unionByName(
        wpairs.select(
            F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")
        )
    )
    cap_w = Window.partitionBy("u").orderBy(F.col("w").desc(), F.col("v"))
    return (
        sym.withColumn("rn", F.row_number().over(cap_w))
        .filter(F.col("rn") <= _CN_CAP)
        .select("u", "v")
    )


def _capped_adj0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(u, v): the one-directed top-{_CN_CAP}-by-weight adjacency over the
    symmetric weighted pair frame — the shared capped-neighbor stage of
    ``graph_common_neighbors`` (used as-is) and ``graph_jaccard_neighbors``
    (mutual-filtered on top). Cross-query staged like ``_edges``
    (round 14): both consumers re-ran the identical window cap from the
    wpairs table; the staged table is ≤ {_CN_CAP}·|nodes| narrow int
    rows. The cap's WindowGroupLimit shape is gated on the build plan
    (``_capped_adj0_build``)."""
    return staged_table(
        _capped_adj0_build(spark, sf_dir),
        f"graph_adj0::{sf_dir}",
        src_dir=sf_dir,
    )


@register(
    "graph_common_neighbors",
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    wpairs AS (
      SELECT a.pkey AS u, b.pkey AS v, count(*) AS w
      FROM basket a JOIN basket b ON a.okey = b.okey AND a.pkey < b.pkey
      GROUP BY 1, 2
    ),
    sym AS (SELECT u, v, w FROM wpairs UNION ALL SELECT v, u, w FROM wpairs),
    adj AS (
      SELECT u, v FROM (
        SELECT u, v,
               row_number() OVER (PARTITION BY u ORDER BY w DESC, v) AS rn
        FROM sym
      ) WHERE rn <= {_CN_CAP}
    ),
    wedge AS (
      SELECT e1.v AS a, e2.v AS b, count(*) AS n_common
      FROM adj e1 JOIN adj e2 ON e1.u = e2.u AND e1.v < e2.v
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT w.a, w.b, w.n_common
      FROM wedge w LEFT JOIN wpairs e ON e.u = w.a AND e.v = w.b
      WHERE e.u IS NULL
    ),
    top AS (
      SELECT * FROM cand ORDER BY n_common DESC, a, b LIMIT {_CN_TOPN}
    )
    SELECT row_number() OVER (ORDER BY n_common DESC, a, b) AS rnk,
           a AS part_a, b AS part_b, n_common
    FROM top
    """,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by common neighbors: the top-{_CN_TOPN} part pairs
    that share the most co-purchase neighbors WITHOUT ever having been
    co-purchased themselves — "frequently bought with the same things" =
    substitute/complement candidates, the classic graph recommender
    primitive (Liben-Nowell & Kleinberg '03).

    Scale (the round-6 weak, reworked round 7): wedges enumerate at the
    middle vertex, Σ deg² work that squares hub degrees at scale — so the
    per-node neighbor list is capped top-{_CN_CAP} by co-purchase weight
    FIRST (see _CN_CAP), a stated recall contract mirrored in the oracle.
    The capped adjacency comes off the cross-query ``_capped_adj0``
    table (round 14 — shared with ``graph_jaccard_neighbors``) and is
    cache-staged for its two-sided self-join; the cap itself plans as
    WindowGroupLimit (partial per-partition top-d heaps before the
    shuffle). Existing-edge removal is an equi anti-join on (a, b)
    against the wpairs table; the top-N is ORDER BY + LIMIT
    (TakeOrdered heaps), ranked row-locally afterwards."""
    from pyspark.sql import Window

    wpairs = _staged(_wpairs(spark, sf_dir))
    adj = _staged(_capped_adj0(spark, sf_dir))
    e1 = adj.select(F.col("u").alias("m"), F.col("v").alias("a"))
    e2 = adj.select(F.col("u").alias("m"), F.col("v").alias("b"))
    wedge = (
        e1.join(e2, "m")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cand = wedge.join(
        wpairs.select(F.col("u").alias("a"), F.col("v").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    top = cand.orderBy(
        F.col("n_common").desc(), F.col("a"), F.col("b")
    ).limit(_CN_TOPN)

    w = Window.orderBy(F.col("n_common").desc(), F.col("a"), F.col("b"))
    return top.select(
        F.row_number().over(w).alias("rnk"),
        F.col("a").alias("part_a"),
        F.col("b").alias("part_b"),
        "n_common",
    )


# --------------------------------------------------------------------------
# graph_kcore_peel — bounded k-core peeling rounds (round 6)
# --------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 4


def _kcore_oracle() -> str:
    parts = [
        """
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    pairs AS (
      SELECT DISTINCT a.pkey AS src, b.pkey AS dst
      FROM basket a JOIN basket b ON a.okey = b.okey AND a.pkey < b.pkey
    ),
    e0 AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs)"""
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(f""",
    k{r} AS (
      SELECT src AS node FROM e{r - 1} GROUP BY src
      HAVING count(*) >= {_KCORE_K}
    ),
    e{r} AS (
      SELECT e.src, e.dst FROM e{r - 1} e
      JOIN k{r} a ON a.node = e.src
      JOIN k{r} b ON b.node = e.dst
    )""")
    selects = [
        f"SELECT {r} AS round, (SELECT count(*) FROM k{r}) AS n_nodes,"
        f" (SELECT count(*) // 2 FROM e{r}) AS n_edges"
        for r in range(1, _KCORE_ROUNDS + 1)
    ]
    return "".join(parts) + " " + " UNION ALL ".join(selects)


@register("graph_kcore_peel", oracle=_kcore_oracle())
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded {_KCORE_K}-core peeling over the co-purchase graph:
    {_KCORE_ROUNDS} unrolled rounds of "drop every node with degree <
    {_KCORE_K}, induce, repeat", reporting surviving node/edge counts per
    round. A monotone upper approximation of the true {_KCORE_K}-core
    from above (each round only removes; the fixpoint IS the core) — the
    dense-subgraph extractor behind spam-cluster and community mining.
    Fixed unrolled depth keeps the plan a bounded chain and the oracle an
    identical CTE ladder (the PageRank contract); production depth would
    iterate with localCheckpoint + a convergence count like
    ``connected_components``, whose RuntimeError guard is the model.

    Scale (round 14, VERDICT r13 task 6; supersedes the round-7 design):
    per round, ONE staged annotated frame carries everything every
    consumer needs — ``ds`` (degree at src, count over the src window),
    ``rn`` (row_number in the same ordered window) and ``dd`` (degree at
    dst). That removes the round-7 design's separate per-round n_nodes
    groupBy (a third full-edge shuffle): n_nodes is now the SHUFFLE-FREE
    count of rows with ``ds ≥ k AND rn = 1`` (exactly one row per
    surviving node, counted off the staged frame), and the next round's
    edge frame is a plain filter over the same staged frame (no
    materialization of its own). Two hash-partition shuffles of narrow
    int rows per round — the algorithmic minimum for degree-at-both-ends
    — and the per-round node set is never joined. Degree-frame equi-joins
    (groupBy + 2 broadcast joins) were measured SLOWER (6.8-9.3 s) than
    windows here: the staged survivor frame blocks AQE's broadcast
    planning and adds per-round driver round-trips. Measured 5.2-5.5 s →
    4.2 s best-of-4 at sf0.1, identical output."""
    from pyspark.sql import Window

    edges = _staged(_edges(spark, sf_dir))
    out = []
    e = edges
    for r in range(1, _KCORE_ROUNDS + 1):
        ws = Window.partitionBy("src").orderBy("dst")
        wsu = ws.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        wd = Window.partitionBy("dst")
        ann = _staged(
            e.select(
                "src",
                "dst",
                F.count(F.lit(1)).over(wsu).alias("ds"),
                F.row_number().over(ws).alias("rn"),
                F.count(F.lit(1)).over(wd).alias("dd"),
            )
        )
        n_nodes = ann.filter(
            (F.col("ds") >= _KCORE_K) & (F.col("rn") == 1)
        ).agg(F.count(F.lit(1)).alias("n_nodes"))
        e = ann.filter(
            (F.col("ds") >= _KCORE_K) & (F.col("dd") >= _KCORE_K)
        ).select("src", "dst")
        out.append(
            n_nodes.crossJoin(
                e.agg(F.expr("count(1) div 2").alias("n_edges"))
            )
            .select(F.lit(r).alias("round"), "n_nodes", "n_edges")
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


# --------------------------------------------------------------------------
# graph_label_propagation — bounded-round community detection (round 7)
# --------------------------------------------------------------------------

_LP_ROUNDS = 3
_LP_TOPN = 20
# label/count packing space for the deterministic argmax: labels are part
# keys (< 2^40 at any TPC-H scale); enc = cnt * 2^40 + (2^40 - 1 - label)
# is computed in DECIMAL(38,0) (oracle: HUGEINT) since round 8 so a hub
# node with > 2^23 same-label neighbors — plausible at the 100-TB target —
# cannot overflow the packing (ANSI BIGINT would throw). max(enc) IS
# "highest count, smallest label" — the same single-integer argmax contract
# the k-means assignment uses (min-struct there, max-pack here, both exact)
_LP_SPACE = 1 << 40
_LP_LBL_MAX = _LP_SPACE - 1


def _lp_oracle() -> str:
    rounds = "\n".join(
        f""",
    cnt{r} AS (
      SELECT e.dst AS node, l.lbl, count(*) AS c
      FROM edges e JOIN labels{r - 1} l ON l.node = e.src
      GROUP BY 1, 2
    ),
    labels{r} AS (
      SELECT node,
             CAST({_LP_LBL_MAX} - (max(CAST(c AS HUGEINT) * {_LP_SPACE}
                  + ({_LP_LBL_MAX} - lbl)) % {_LP_SPACE}) AS BIGINT) AS lbl
      FROM cnt{r} GROUP BY node
    )"""
        for r in range(1, _LP_ROUNDS + 1)
    )
    return f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    pairs AS (
      SELECT DISTINCT a.pkey AS src, b.pkey AS dst
      FROM basket a JOIN basket b ON a.okey = b.okey AND a.pkey < b.pkey
    ),
    edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
    labels0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges){rounds},
    sizes AS (
      SELECT lbl AS community, count(*) AS n_members
      FROM labels{_LP_ROUNDS} GROUP BY lbl
    ),
    top AS (
      SELECT * FROM sizes ORDER BY n_members DESC, community LIMIT {_LP_TOPN}
    )
    SELECT row_number() OVER (ORDER BY n_members DESC, community) AS rnk,
           community, n_members
    FROM top
    """


def _lp_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, lbl) after {_LP_ROUNDS} synchronous LPA rounds — the shared
    community assignment ``graph_label_propagation`` reports and
    ``graph_modularity`` scores. Cross-query staged like ``_edges``
    (round 14): the two registered consumers each re-ran the identical
    3-round chain from the edge list; the staged table replaces the
    second run with a scan of a node-count-sized parquet table."""
    edges = _staged(_edges(spark, sf_dir))
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(_LP_ROUNDS):
        labels = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("node")
            .agg(
                F.max(
                    F.col("c").cast("decimal(38,0)") * F.lit(_LP_SPACE)
                    + (F.lit(_LP_LBL_MAX) - F.col("lbl"))
                ).alias("enc")
            )
            .select(
                "node",
                (F.lit(_LP_LBL_MAX) - F.col("enc") % F.lit(_LP_SPACE))
                .cast("bigint")
                .alias("lbl"),
            )
        )
    return staged_table(labels, f"graph_lp_labels::{sf_dir}", src_dir=sf_dir)


@register("graph_label_propagation", oracle=_lp_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community detection (Raghavan '07) over the
    co-purchase graph, {_LP_ROUNDS} unrolled synchronous rounds: every
    node adopts the most common label among its neighbors, ties broken
    toward the SMALLEST label — the community twin of
    ``graph_pagerank_parts``, reporting the top-{_LP_TOPN} communities by
    size. Determinism contract: the per-node argmax is a single-integer
    max over ``cnt·2^40 + (2^40−1−label)`` (see ``_LP_SPACE``), computed
    in DECIMAL(38,0)/HUGEINT so hub degrees past 2^23 can't overflow the
    packing; both engines pick bit-identical labels every round —
    float-free, order-free.

    Scale: the rounds live in the shared ``_lp_labels`` stage — each is
    one edges ⋈ labels equi-join (narrow int rows) plus two map-side-
    combinable aggregates, node-count-sized label frames, fixed unrolled
    depth = bounded plan chain (the PageRank contract). This query adds
    one node-count aggregate and a {_LP_TOPN}-row top-k."""
    labels = _lp_labels(spark, sf_dir)
    sizes = labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    top = sizes.orderBy(
        F.col("n_members").desc(), F.col("community")
    ).limit(_LP_TOPN)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_members").desc(), F.col("community"))
    return top.select(
        F.row_number().over(w).alias("rnk"), "community", "n_members"
    )


# --------------------------------------------------------------------------
# graph_jaccard_neighbors — neighbor-set similarity (round 7)
# --------------------------------------------------------------------------

_JACC_TOPN = 20
_JACC_MIN_COMMON = 2


@register(
    "graph_jaccard_neighbors",
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    wpairs AS (
      SELECT a.pkey AS u, b.pkey AS v, count(*) AS w
      FROM basket a JOIN basket b ON a.okey = b.okey AND a.pkey < b.pkey
      GROUP BY 1, 2
    ),
    sym AS (SELECT u, v, w FROM wpairs UNION ALL SELECT v, u, w FROM wpairs),
    adj0 AS (
      SELECT u, v FROM (
        SELECT u, v,
               row_number() OVER (PARTITION BY u ORDER BY w DESC, v) AS rn
        FROM sym
      ) WHERE rn <= {_CN_CAP}
    ),
    adj AS (
      SELECT a.u, a.v FROM adj0 a JOIN adj0 b ON a.u = b.v AND a.v = b.u
    ),
    capdeg AS (SELECT u AS node, count(*) AS d FROM adj GROUP BY u),
    wedge AS (
      SELECT e1.v AS a, e2.v AS b, count(*) AS n_common
      FROM adj e1 JOIN adj e2 ON e1.u = e2.u AND e1.v < e2.v
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT w.a, w.b, w.n_common,
             CAST(w.n_common * 1000000
                  // (da.d + db.d - w.n_common) AS BIGINT) AS jaccard_ppm
      FROM wedge w
      JOIN capdeg da ON da.node = w.a
      JOIN capdeg db ON db.node = w.b
      WHERE w.n_common >= {_JACC_MIN_COMMON}
    ),
    top AS (
      SELECT * FROM scored
      ORDER BY jaccard_ppm DESC, a, b LIMIT {_JACC_TOPN}
    )
    SELECT row_number() OVER (ORDER BY jaccard_ppm DESC, a, b) AS rnk,
           a AS part_a, b AS part_b, n_common, jaccard_ppm
    FROM top
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard similarity: the top-{_JACC_TOPN} part pairs by
    |N(a)∩N(b)| / |N(a)∪N(b)| over the MUTUAL top-{_CN_CAP} adjacency
    (edge kept iff each endpoint is in the other's top list by weight) —
    the normalized cousin of ``graph_common_neighbors`` (raw overlap
    favors hubs; Jaccard surfaces niche substitutes). Symmetrizing is a
    correctness requirement, not a tuning choice: under a one-directed
    cap, "common neighbors of (a, b)" counts center nodes that may be in
    NEITHER a's nor b's own list, so overlap can exceed the union and
    Jaccard > 1 (caught by the round-7 bound test). Integer contract:
    jaccard in ppm by BIGINT floor division, |union| = da + db − common
    on the mutual lists — a true Jaccard in (0, 1e6].

    Scale: inherits the common-neighbors shape — staged weighted pairs,
    WindowGroupLimit cap, a mutual-filter self equi-join on the capped
    frame, Σ C(cap,2) wedge bound, equi-joins against the node-count-
    sized capped-degree frame, TakeOrdered top-N."""
    from pyspark.sql import Window

    # staged: both sides of the mutual-filter self-join consume the
    # cross-query adj0 table (round 14 — previously this query re-ran the
    # identical window cap graph_common_neighbors had already built)
    adj0 = _staged(_capped_adj0(spark, sf_dir))
    # mutual filter: keep (u, v) only if (v, u) also survived the cap —
    # see the docstring for why a one-directed cap breaks the Jaccard bound
    adj = _staged(
        adj0.join(
            adj0.select(F.col("v").alias("u"), F.col("u").alias("v")),
            ["u", "v"],
            "left_semi",
        )
    )
    capdeg = adj.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    e1 = adj.select(F.col("u").alias("m"), F.col("v").alias("a"))
    e2 = adj.select(F.col("u").alias("m"), F.col("v").alias("b"))
    wedge = (
        e1.join(e2, "m")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= _JACC_MIN_COMMON)
    )
    scored = (
        wedge.join(
            capdeg.select(F.col("node").alias("a"), F.col("d").alias("da")), "a"
        )
        .join(capdeg.select(F.col("node").alias("b"), F.col("d").alias("db")), "b")
        .select(
            "a",
            "b",
            "n_common",
            F.expr("cast(n_common * 1000000 div (da + db - n_common) as bigint)")
            .alias("jaccard_ppm"),
        )
    )
    top = scored.orderBy(
        F.col("jaccard_ppm").desc(), F.col("a"), F.col("b")
    ).limit(_JACC_TOPN)
    w = Window.orderBy(F.col("jaccard_ppm").desc(), F.col("a"), F.col("b"))
    return top.select(
        F.row_number().over(w).alias("rnk"),
        F.col("a").alias("part_a"),
        F.col("b").alias("part_b"),
        "n_common",
        "jaccard_ppm",
    )


# --------------------------------------------------------------------------
# graph_local_clustering — per-node clustering coefficient (round 7)
# --------------------------------------------------------------------------

_LCC_TOPN = 20
_LCC_MIN_DEG = 5


@register(
    "graph_local_clustering",
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    und AS (
      SELECT DISTINCT a.pkey AS u, b.pkey AS v
      FROM basket a JOIN basket b ON a.okey = b.okey AND a.pkey < b.pkey
    ),
    sym AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT u AS node, count(*) AS d FROM sym GROUP BY u),
    o AS (
      SELECT s.u, s.v, du.d AS du, dv.d AS dv
      FROM sym s
      JOIN deg du ON du.node = s.u
      JOIN deg dv ON dv.node = s.v
      WHERE du.d < dv.d OR (du.d = dv.d AND s.u < s.v)
    ),
    wedge AS (
      SELECT e1.u AS ctr, e1.v AS a, e2.v AS b
      FROM o e1 JOIN o e2 ON e1.u = e2.u
      WHERE e1.dv < e2.dv
         OR (e1.dv = e2.dv AND e1.v < e2.v)
    ),
    tri AS (
      SELECT w.ctr, w.a, w.b
      FROM wedge w JOIN o e ON e.u = w.a AND e.v = w.b
    ),
    pertri AS (
      SELECT ctr AS node FROM tri
      UNION ALL SELECT a FROM tri
      UNION ALL SELECT b FROM tri
    ),
    tcnt AS (SELECT node, count(*) AS n_tri FROM pertri GROUP BY node),
    scored AS (
      SELECT d.node, d.d AS degree, coalesce(t.n_tri, 0) AS n_tri,
             CAST(coalesce(t.n_tri, 0) * 2000000
                  // (d.d * (d.d - 1)) AS BIGINT) AS cc_ppm
      FROM deg d LEFT JOIN tcnt t ON t.node = d.node
      WHERE d.d >= {_LCC_MIN_DEG}
    ),
    top AS (
      SELECT * FROM scored ORDER BY cc_ppm DESC, node LIMIT {_LCC_TOPN}
    )
    SELECT row_number() OVER (ORDER BY cc_ppm DESC, node) AS rnk,
           node AS part_id, degree, n_tri, cc_ppm
    FROM top
    """,
)
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient (Watts-Strogatz): the
    top-{_LCC_TOPN} parts (degree ≥ {_LCC_MIN_DEG}) by
    2·triangles(v) / (d(v)·(d(v)−1)) in exact integer ppm — the
    tight-community membership signal the global transitivity of
    ``graph_triangle_count`` averages away.

    Scale: exact triangles via the same degree-ordered orientation and
    adjacency-array edge iterator as ``graph_triangle_count`` (round-12
    rework — no wedge frame is ever materialized): per oriented edge
    (u, v) the common out-set S = N⁺(u) ∩ N⁺(v) is computed row-locally,
    then the triangle credits explode map-side from the SAME projection —
    u and v each earn |S|, every w in S earns 1 — into one hash
    aggregate; per-node division is row-local. Out-degrees are bounded
    O(√m) by the orientation, so the arrays stay small at hub nodes.
    Oriented edge, adjacency, and degree frames are staged for their
    multiple consumers. Measured 7.0 s → 5.1 s best-of-3 at sf0.1,
    identical output; the oracle keeps the relational wedge form."""
    from pyspark.sql import Window

    # oriented edges, adjacency arrays, and degrees come off the
    # cross-query tables (round 14 — shared with graph_triangle_count)
    deg = _staged(_degrees(spark, sf_dir))
    o = _staged(_oriented(spark, sf_dir))
    adj = _staged(_oriented_adj(spark, sf_dir))
    common = (
        o.join(adj.select("u", F.col("nbrs").alias("nu")), "u")
        .join(adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nv")), "v")
        .select("u", "v", F.array_intersect("nu", "nv").alias("s"))
        .filter(F.size("s") > 0)
    )
    credits = common.select(
        F.explode(
            F.concat(
                F.array(
                    F.struct(
                        F.col("u").alias("node"), F.size("s").alias("k")
                    ),
                    F.struct(
                        F.col("v").alias("node"), F.size("s").alias("k")
                    ),
                ),
                F.transform(
                    "s",
                    lambda w: F.struct(
                        w.alias("node"), F.lit(1).alias("k")
                    ),
                ),
            )
        ).alias("nk")
    )
    tcnt = (
        credits.select("nk.node", "nk.k")
        .groupBy("node")
        .agg(F.sum("k").alias("n_tri"))
    )
    scored = (
        deg.filter(F.col("d") >= _LCC_MIN_DEG)
        .join(tcnt, "node", "left")
        .select(
            "node",
            F.col("d").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_tri"),
            F.expr(
                "cast(coalesce(n_tri, 0) * 2000000"
                " div (d * (d - 1)) as bigint)"
            ).alias("cc_ppm"),
        )
    )
    top = scored.orderBy(F.col("cc_ppm").desc(), F.col("node")).limit(_LCC_TOPN)
    w = Window.orderBy(F.col("cc_ppm").desc(), F.col("node"))
    return top.select(
        F.row_number().over(w).alias("rnk"),
        F.col("node").alias("part_id"),
        "degree",
        "n_tri",
        "cc_ppm",
    )


# --------------------------------------------------------------------------
# graph_assortativity — degree-degree correlation (round 7)
# --------------------------------------------------------------------------


@register(
    "graph_assortativity",
    oracle="""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    und AS (
      SELECT DISTINCT a.pkey AS u, b.pkey AS v
      FROM basket a JOIN basket b ON a.okey = b.okey AND a.pkey < b.pkey
    ),
    sym AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT u AS node, count(*) AS d FROM sym GROUP BY u),
    xy AS (
      SELECT du.d AS x, dv.d AS y
      FROM sym s JOIN deg du ON du.node = s.u JOIN deg dv ON dv.node = s.v
    ),
    sums AS (
      SELECT count(*) AS m,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM xy
    )
    SELECT CAST(m AS BIGINT) AS n_edges_directed,
           CAST(CASE WHEN (m * sxx - sx * sx) = 0
                       OR (m * syy - sy * sy) = 0 THEN 0
                ELSE round(1000.0 * (m * sxy - sx * sy)
                     / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(m * syy - sy * sy AS DOUBLE))))
                END AS BIGINT) AS assortativity_milli
    FROM sums
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman '02): the Pearson correlation of
    endpoint degrees over all directed edges, in milli-units — positive
    means hubs prefer hubs (social-graph shape), negative means hubs link
    to the periphery (hub-and-spoke, the usual retail shape). THE
    one-number skew diagnostic for every per-node join in this family.

    Determinism: all five sums are exact BIGINTs (degrees are bounded
    ints); the m·Σx² − (Σx)² cross terms are exact DECIMAL(38,0) — BIGINT
    would overflow at sf ≳ 1 where DuckDB's sum() silently widens to
    INT128 — and only the final Pearson ratio touches doubles, each
    variance square-rooted separately, one round at milli scale.

    Scale: one degree aggregate, two node-keyed equi-joins to annotate
    edge endpoints (narrow int rows), one global 6-sum aggregate."""
    edges = _staged(_edges(spark, sf_dir))
    deg = _staged(_degrees(spark, sf_dir))
    xy = (
        edges.join(
            deg.select(F.col("node").alias("src"), F.col("d").alias("x")),
            "src",
        )
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("y")), "dst")
        .select("x", "y")
    )
    sums = xy.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
    )
    # The m·sxx / sx·sx products exceed BIGINT once m ≳ 10^7 with hub
    # degrees ~10^3-10^4 (sf ≳ 1), and ANSI mode throws where DuckDB's
    # sum() has already widened to HUGEINT (INT128) — so the cross terms
    # are computed in DECIMAL(38,0) (exact, bounded by 10^38) and only the
    # final Pearson ratio drops to double, matching the oracle's
    # INT128-exact-then-double path bit for bit.
    dec = "cast({} as decimal(38,0))".format
    varx = f"({dec('m')} * {dec('sxx')} - {dec('sx')} * {dec('sx')})"
    vary = f"({dec('m')} * {dec('syy')} - {dec('sy')} * {dec('sy')})"
    num = f"({dec('m')} * {dec('sxy')} - {dec('sx')} * {dec('sy')})"
    return sums.select(
        F.col("m").cast("bigint").alias("n_edges_directed"),
        F.expr(
            f"cast(CASE WHEN {varx} = 0 OR {vary} = 0 THEN 0"
            f" ELSE round(1000.0D * cast({num} as double)"
            f" / (sqrt(cast({varx} as double))"
            f" * sqrt(cast({vary} as double))))"
            " END as bigint)"
        ).alias("assortativity_milli"),
    )


# --------------------------------------------------------------------------
# graph_bfs_hops — bounded-round BFS reachability (round 7)
# --------------------------------------------------------------------------

_BFS_ROUNDS = 3


def _bfs_oracle() -> str:
    rounds = "\n".join(
        f""",
    d{r} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{r - 1}
        UNION ALL
        SELECT e.dst AS node, d.dist + 1 AS dist
        FROM edges e JOIN d{r - 1} d ON d.node = e.src AND d.dist = {r - 1}
      ) GROUP BY node
    )"""
        for r in range(1, _BFS_ROUNDS + 1)
    )
    selects = " UNION ALL ".join(
        f"SELECT {r} AS hop, (SELECT count(*) FROM d{r} WHERE dist <= {r})"
        f" AS n_reached, (SELECT count(*) FROM d{r} WHERE dist = {r})"
        f" AS n_frontier"
        for r in range(1, _BFS_ROUNDS + 1)
    )
    return f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    pairs AS (
      SELECT DISTINCT a.pkey AS src, b.pkey AS dst
      FROM basket a JOIN basket b ON a.okey = b.okey AND a.pkey < b.pkey
    ),
    edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
    seed AS (SELECT min(src) AS node FROM edges),
    d0 AS (SELECT node, 0 AS dist FROM seed){rounds}
    {selects}
    """


@register("graph_bfs_hops", oracle=_bfs_oracle())
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round BFS from the smallest part key: per hop, the
    cumulative reachable-node count and the new frontier size — the
    reachability primitive (and the empirical small-world check: a
    co-purchase graph saturating by hop 2 is why the component family
    converges in O(1) rounds here). Frontier-only expansion: each round
    joins edges against JUST the previous frontier (dist = r−1), then a
    min-aggregate folds rediscoveries — the textbook distributed BFS
    step, unrolled to a bounded chain with the identical CTE ladder as
    the oracle (the PageRank contract).

    Scale: per round one frontier ⋈ edges equi-join + one min-aggregate
    over narrow int rows; distance frames are node-count bounded; the
    staged edge frame serves all {_BFS_ROUNDS} rounds."""
    edges = _staged(_edges(spark, sf_dir))
    seed = edges.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).alias("dist")
    )
    d = seed
    out = []
    for r in range(1, _BFS_ROUNDS + 1):
        frontier = d.filter(F.col("dist") == r - 1).select(
            F.col("node").alias("src")
        )
        expanded = (
            edges.join(frontier, "src")
            .select(F.col("dst").alias("node"), F.lit(r).alias("dist"))
        )
        d = _staged(
            d.unionByName(expanded)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        out.append(
            d.filter(F.col("dist") <= r)
            .agg(F.count(F.lit(1)).alias("n_reached"))
            .crossJoin(
                F.broadcast(
                    d.filter(F.col("dist") == r).agg(
                        F.count(F.lit(1)).alias("n_frontier")
                    )
                )
            )
            .select(F.lit(r).alias("hop"), "n_reached", "n_frontier")
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


# --------------------------------------------------------------------------
# graph_modularity — quality of the LPA communities (round 7)
# --------------------------------------------------------------------------


def _lp_rounds_sql() -> str:
    """The label-propagation CTE ladder (shared with _lp_oracle): edges +
    labels0..labels{_LP_ROUNDS}, ending ready for a final SELECT."""
    rounds = "\n".join(
        f""",
    cnt{r} AS (
      SELECT e.dst AS node, l.lbl, count(*) AS c
      FROM edges e JOIN labels{r - 1} l ON l.node = e.src
      GROUP BY 1, 2
    ),
    labels{r} AS (
      SELECT node,
             CAST({_LP_LBL_MAX} - (max(CAST(c AS HUGEINT) * {_LP_SPACE}
                  + ({_LP_LBL_MAX} - lbl)) % {_LP_SPACE}) AS BIGINT) AS lbl
      FROM cnt{r} GROUP BY node
    )"""
        for r in range(1, _LP_ROUNDS + 1)
    )
    return f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    pairs AS (
      SELECT DISTINCT a.pkey AS src, b.pkey AS dst
      FROM basket a JOIN basket b ON a.okey = b.okey AND a.pkey < b.pkey
    ),
    edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
    labels0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges){rounds}"""


@register(
    "graph_modularity",
    oracle=f"""{_lp_rounds_sql()},
    lab AS (SELECT node, lbl FROM labels{_LP_ROUNDS}),
    m AS (SELECT count(*) // 2 AS m_und FROM edges),
    annotated AS (
      SELECT la.lbl AS lbl_src, lb.lbl AS lbl_dst
      FROM edges e
      JOIN lab la ON la.node = e.src
      JOIN lab lb ON lb.node = e.dst
    ),
    per_c AS (
      SELECT lbl_src AS community,
             count(*) AS d_c,
             sum(CASE WHEN lbl_src = lbl_dst THEN 1 ELSE 0 END) AS intra2
      FROM annotated GROUP BY lbl_src
    ),
    terms AS (
      SELECT community,
             (intra2 // 2) * 1000000 // m.m_und AS cover_ppm,
             (d_c * 1000000 // (2 * m.m_und)) * d_c
               // (2 * m.m_und) AS expect_ppm
      FROM per_c CROSS JOIN m
    )
    SELECT CAST(count(*) AS BIGINT) AS n_communities,
           (SELECT CAST(m_und AS BIGINT) FROM m) AS m_edges,
           CAST(sum(cover_ppm) - sum(expect_ppm) AS BIGINT) AS q_ppm
    FROM terms
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the {_LP_ROUNDS}-round label-propagation
    communities, in exact integer ppm: Q = Σ_c [m_c/m − (d_c/2m)²] with
    per-community floor divisions mirrored in the oracle — the quality
    score that says whether ``graph_label_propagation``'s communities
    beat random assignment (Q ≈ 0) on this graph. Degree sums and
    intra-community edge counts come from ONE pass over the label-
    annotated symmetric edge list (each undirected intra edge appears
    twice — intra2/2 — and d_c is exactly the per-community endpoint
    count).

    Scale: the LPA rounds live in the shared cross-query ``_lp_labels``
    stage (round 14 — previously this query re-ran the identical 3-round
    chain ``graph_label_propagation`` had already built); the annotation
    is two node-keyed equi-joins against the node-count label frame;
    everything after is community-cardinality arithmetic."""
    edges = _staged(_edges(spark, sf_dir))
    labels = _staged(_lp_labels(spark, sf_dir))
    m = edges.agg(F.expr("count(1) div 2").alias("m_und"))
    annotated = (
        edges.join(
            labels.select(
                F.col("node").alias("src"), F.col("lbl").alias("lbl_src")
            ),
            "src",
        )
        .join(
            labels.select(
                F.col("node").alias("dst"), F.col("lbl").alias("lbl_dst")
            ),
            "dst",
        )
    )
    per_c = annotated.groupBy(F.col("lbl_src").alias("community")).agg(
        F.count(F.lit(1)).alias("d_c"),
        F.sum(
            F.when(F.col("lbl_src") == F.col("lbl_dst"), 1).otherwise(0)
        ).alias("intra2"),
    )
    terms = per_c.crossJoin(F.broadcast(m)).select(
        F.expr("(intra2 div 2) * 1000000 div m_und").alias("cover_ppm"),
        # staged floor division: d_c^2 * 1e6 overflows BIGINT once
        # d_c > ~3e6 (sf1's giant community); (d_c*1e6 div 2m) * d_c div 2m
        # stays bounded by 1e6 * d_c — the identical contract in the oracle
        F.expr(
            "(d_c * 1000000 div (2 * m_und)) * d_c div (2 * m_und)"
        ).alias("expect_ppm"),
    )
    # ONE aggregation pass over terms: a separate count + sum pair would
    # re-execute the edges⋈labels⋈labels annotation chain per aggregate
    return (
        terms.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_communities"),
            F.expr(
                "cast(sum(cover_ppm) - sum(expect_ppm) as bigint)"
            ).alias("q_ppm"),
        )
        .crossJoin(
            F.broadcast(
                m.select(F.col("m_und").cast("bigint").alias("m_edges"))
            )
        )
        .select("n_communities", "m_edges", "q_ppm")
    )
