"""Product-quantization ANN (Jégou/Douze/Schmid, IEEE PAMI 2011).

The memory-compression ANN family the IVF path composes with at scale
(IVFADC): each 64-dim vector is encoded as M=4 one-byte codes — the id of
its nearest centroid in each 16-dim subspace — and query/corpus distances
are approximated by table lookups (ADC: asymmetric distance computation)
instead of full d-dim arithmetic. 16 bytes of float32 per subspace become
one code byte: a 64× compression of the corpus the brute-force scan reads.

Relational mapping (the whole op is joins + group-bys — no Python):
- codebooks: per-subspace Lloyd k-means, the same deterministic recipe as
  ``cluster_kmeans_embeddings`` (hash-partition init, one update round,
  6-dp centroid rounding);
- encode: corpus × broadcast codebook argmin join → (vec_id, m, code);
- ADC: per query, the distance to every (m, code) cell — a Q×(M·K) lookup
  table, **integer-quantized** (round(d2·10⁶) as BIGINT) so the final
  per-pair sum is exact integer arithmetic in both engines, immune to
  float summation-order drift;
- score: codes ⋈ LUT on (m, code) — the LUT side is broadcast-sized, so
  the corpus never shuffles for scoring — then SUM over the M rows per
  (query, vec) and a per-query top-k window.

Scale notes: the scoring join's output is Q·N·M rows into a partial+final
sum aggregate — the honest cost of exhaustive ADC; ``sim_ivfpq_topk``
below is the scale path that prunes it (IVF cells first, ADC only inside
probed cells). Codebook training touches each subvector once per round.
The codebooks are always KB-sized broadcasts; the LUT is Q·M·K rows, so
broadcasting it is valid ONLY for a bounded query batch. This corpus's
stride-defined query set (Q = N/QUERY_STRIDE) does NOT satisfy that — it
grows linearly with the corpus, so at large SF the broadcast must flip to
either (a) a shuffle join on (m, code) with the same plan shape, or
(b) per-query-batch execution: score a bounded slice of queries at a
time, which is how a real ANN service runs anyway. (b) EXISTS AS CODE
(round 5): every ANN query takes ``query_batch=<bounded id collection>``
through ``similarity.query_admission``, and a batched sweep's union is
pytest-proven equal to the full run. The small-SF default remains the
stride slice — the measured-faster choice for the oracle surface, not a
scale claim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .clustering import assign_to_codebook, codebook_of, dist2_expr

from ..sources.parquet import load_table
from ..operators.staging import staged as _staged
from .registry import register
from .similarity import (
    QUERY_STRIDE,
    TOP_K,
    _DIST2_SPARK as _COARSE_DIST2_SPARK,
    _DIST2_SQL as _COARSE_DIST2_SQL,
    label_centroids,
    query_admission,
)

PQ_M = 4  # subspaces
PQ_SUB = 16  # dims per subspace
# codes per subspace: one byte still holds it, the codebook broadcast stays
# KB-sized, and on this corpus K=64 doubles recall@5 vs K=8 (0.24 vs 0.08 —
# unit-norm near-random synthetic vectors are PQ's worst case; structured
# real embeddings quantize far better). Finer decompositions (M=16, 4-dim
# subspaces) reach 0.36 but quadruple the plan depth — not worth it here.
PQ_K = 64
_SCALE = 1_000_000  # d2 quantization: micro-units, exact in BIGINT


def _sub_dist2_sql() -> str:
    """Squared distance on the sliced ``sub`` column (DuckDB, 1-based)."""
    return " + ".join(
        f"(CAST(e.sub[{d + 1}] AS DOUBLE) - c.centroid[{d + 1}])"
        f" * (CAST(e.sub[{d + 1}] AS DOUBLE) - c.centroid[{d + 1}])"
        for d in range(PQ_SUB)
    )


def _pq_ctes(source: str = "embeddings", vec: str = "embedding") -> str:
    """The shared per-subspace CTE chain (init → assign → update → encode
    → LUT) plus the ``codes``/``lut`` unions — the front half of the
    plain-PQ, IVFADC, and residual-IVFADC oracles. ``source``/``vec``
    pick the relation and vector column the subspaces slice (the residual
    variant passes its residual CTE)."""
    blocks = []
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB + 1, (m + 1) * PQ_SUB
        blocks.append(
            f"""sub{m} AS (
      SELECT vec_id, {vec}[{lo}:{hi}] AS sub FROM {source}
    ),
    c{m}_0 AS (
      SELECT cl, list(c ORDER BY d) AS centroid FROM (
        SELECT vec_id % {PQ_K} AS cl, d,
               round(avg(CAST(sub[d] AS DOUBLE)), 6) AS c
        FROM sub{m}, unnest(generate_series(1, {PQ_SUB})) AS t(d)
        GROUP BY 1, d) GROUP BY cl
    ),
    a{m}_1 AS (
      SELECT vec_id, sub, cl FROM (
        SELECT e.vec_id, e.sub, c.cl,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {_sub_dist2_sql()} ASC, c.cl) AS rnk
        FROM sub{m} e CROSS JOIN c{m}_0 c) WHERE rnk = 1
    ),
    c{m}_1 AS (
      SELECT cl, list(c ORDER BY d) AS centroid FROM (
        SELECT cl, d, round(avg(CAST(sub[d] AS DOUBLE)), 6) AS c
        FROM a{m}_1, unnest(generate_series(1, {PQ_SUB})) AS t(d)
        GROUP BY cl, d) GROUP BY cl
    ),
    codes{m} AS (
      SELECT vec_id, {m} AS m, cl AS code FROM (
        SELECT e.vec_id, c.cl,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {_sub_dist2_sql()} ASC, c.cl) AS rnk
        FROM sub{m} e CROSS JOIN c{m}_1 c) WHERE rnk = 1
    ),
    lut{m} AS (
      SELECT e.vec_id AS query_id, {m} AS m, c.cl AS code,
             CAST(round(({_sub_dist2_sql()}) * {_SCALE}) AS BIGINT) AS d2i
      FROM sub{m} e CROSS JOIN c{m}_1 c
      WHERE e.vec_id % {QUERY_STRIDE} = 0
    )"""
        )
    codes_union = " UNION ALL ".join(f"SELECT * FROM codes{m}" for m in range(PQ_M))
    lut_union = " UNION ALL ".join(f"SELECT * FROM lut{m}" for m in range(PQ_M))
    return (
        ",\n    ".join(blocks)
        + f""",
    codes AS ({codes_union}),
    lut AS ({lut_union})"""
    )


def _residual_lut_ctes() -> str:
    """Per-(query, probed-cell) residual LUT: the query's residual against
    EACH probed cell's centroid, sliced per subspace and scored against
    the residual-trained codebooks c{{m}}_1 (which the surrounding oracle
    defines via ``_pq_ctes(source='resid', ...)``)."""
    blocks = []
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB + 1, (m + 1) * PQ_SUB
        blocks.append(
            f"""qlut{m} AS (
      SELECT e.query_id, e.cell, {m} AS m, c.cl AS code,
             CAST(round({_sub_dist2_sql()}) AS BIGINT) AS d2i
      FROM (SELECT query_id, cell, qremb[{lo}:{hi}] AS sub, query_id AS vec_id
            FROM qresid) e
      CROSS JOIN c{m}_1 c
    )"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM qlut{m}" for m in range(PQ_M))
    return ",\n    ".join(blocks) + f""",
    qlut AS ({union})"""


def _oracle_sql() -> str:
    """Exhaustive ADC: the shared PQ CTEs, then score every (query, vec)
    pair and rank — the Spark plan, unrolled in SQL."""
    return (
        "WITH "
        + _pq_ctes()
        + f""",
    scored AS (
      SELECT l.query_id, x.vec_id AS neighbor_id,
             CAST(sum(l.d2i) AS BIGINT) AS ad2
      FROM codes x JOIN lut l ON l.m = x.m AND l.code = x.code
      WHERE x.vec_id != l.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, rnk, ad2 FROM (
      SELECT query_id, neighbor_id, ad2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY ad2 ASC, neighbor_id) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}"""
    )


def _subspace_structs(vec: str) -> str:
    """SQL for the array of (m, sub) subspace slices of ``vec``."""
    return ", ".join(
        f"named_struct('m', {m}, 'sub',"
        f" slice({vec}, {m * PQ_SUB + 1}, {PQ_SUB}))"
        for m in range(PQ_M)
    )


def _subspace_rows(emb: DataFrame, vec: str = "embedding") -> DataFrame:
    """(vec_id, m, sub): the subspace index flattened into a DATA dimension.
    One map-side explode replaces M separate per-subspace pipelines — every
    later stage (train, assign, encode, LUT) keys on ``m`` instead of being
    its own plan branch, collapsing plan depth M-fold."""
    return emb.select(
        "vec_id", F.explode(F.expr(f"array({_subspace_structs(vec)})")).alias("s")
    ).select("vec_id", F.col("s.m").alias("m"), F.col("s.sub").alias("sub"))


def _codebooks_of(subs: DataFrame, cl_col) -> DataFrame:
    """(m, cl, centroid): all M codebooks from one aggregate chain —
    clustering.codebook_of with the subspace id as the extra grouping key
    (one determinism contract, shared with k-means)."""
    return codebook_of(subs, cl_col, "sub", key_cols=["m"])


def _assign_subs(subs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, m, sub, cl): nearest centroid within each subspace — one
    broadcast hash join on ``m`` + one rank window over (vec_id, m), for
    all subspaces at once (clustering.assign_to_codebook keyed on m)."""
    return assign_to_codebook(subs, cents, "sub", PQ_SUB, key_cols=["m"])


def _pq_index(
    spark: SparkSession, sf_dir: str, query_batch=None
) -> tuple[DataFrame, DataFrame]:
    """(codes, lut): the trained PQ index the ADC queries share — corpus
    encoded as (vec_id, m, code) and the per-query integer distance table
    (query_id, m, code, d2i). ``query_batch`` bounds the LUT's query side
    (``similarity.query_admission``) — the API-level enforcement of the
    broadcast-LUT validity condition the module docstring describes."""
    # staged: training, encode, and LUT all consume the flattened frame
    subs = _staged(
        _subspace_rows(
            load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        )
    )
    c0 = _codebooks_of(subs, F.col("vec_id") % PQ_K)
    # staged: the encode pass and the LUT both consume the trained
    # codebook — without this the full training chain runs once per
    # consumer (ReuseExchange does not reliably dedupe these shapes)
    c1 = _staged(_codebooks_of(_assign_subs(subs, c0), F.col("cl")))
    codes = _assign_subs(subs, c1).select("vec_id", "m", F.col("cl").alias("code"))
    lut = (
        query_admission(subs, query_batch)
        .join(F.broadcast(c1), "m")
        .select(
            F.col("vec_id").alias("query_id"),
            "m",
            F.col("cl").alias("code"),
            F.expr(
                f"cast(round(({dist2_expr('sub', PQ_SUB)}) * {_SCALE}) as bigint)"
            ).alias("d2i"),
        )
    )
    return codes, lut


def _rank_topk(scored: DataFrame) -> DataFrame:
    """Per-query ascending-ADC rank window, top-K, deterministic ties."""
    w = Window.partitionBy("query_id").orderBy(F.asc("ad2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", "ad2")
    )


@register("sim_pq_topk", oracle=_oracle_sql())
def sim_pq_topk(
    spark: SparkSession, sf_dir: str, query_batch=None
) -> DataFrame:
    """PQ/ADC approximate top-k: 4×16-dim codebooks (deterministic Lloyd,
    one update round), corpus encoded to 4 code bytes, queries scored via
    integer-quantized distance lookup tables and ranked per query.

    Spark-first shape: the subspace index is a DATA dimension, not a plan
    dimension — (vec_id, m, sub) rows flow through ONE train/assign/encode
    pipeline keyed on m, instead of M cloned plan branches (which cost M×
    the plan depth and M× the scans). The oracle keeps its per-subspace
    CTE form; the values are identical by construction.

    This is EXHAUSTIVE ADC (every query scores every vector) — the recall
    ceiling for ``sim_ivfpq_topk``, which prunes to probed cells first."""
    codes, lut = _pq_index(spark, sf_dir, query_batch)
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d2i").alias("ad2"))
    )
    return _rank_topk(scored)


IVFPQ_NPROBE = 2  # same probe budget as sim_ivf_topk


def _coarse_cells(
    spark: SparkSession, sf_dir: str, query_batch=None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(cents, assigned, probes): the shared IVF coarse stage — per-label
    centroids, each vector's home cell (argmin), and each query's nprobe
    probed cells. The argmin/probe window runs over NARROW rows only (the
    embedding is dropped before it), and the cell map is staged because
    the corpus side and the query side both consume it."""
    emb = load_table(spark, sf_dir, "embeddings")
    # staged: the centroid table is K rows but costs a full-corpus
    # aggregate to train, and the residual variant consumes it TWICE
    # (cell ranking below + the 6-dp residual projection) — unstaged,
    # that training aggregate ran once per consumer (measured round 5,
    # same-session best-of-4 min at sf0.1: residual IVFADC 7.4 → 5.0 s,
    # plain IVFPQ 4.7 → 3.0 s — the cdists build also reads it)
    cents = _staged(label_centroids(emb))
    w_cell = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("cell_id"))
    cdists = _staged(
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "cell_id", F.expr(_COARSE_DIST2_SPARK).alias("dist2"))
        .withColumn("crnk", F.row_number().over(w_cell))
        .filter(F.col("crnk") <= IVFPQ_NPROBE)
        .select("vec_id", "cell_id", "crnk")
    )
    assigned = cdists.filter(F.col("crnk") == 1).select("vec_id", "cell_id")
    probes = query_admission(cdists, query_batch).select(
        F.col("vec_id").alias("query_id"), "cell_id"
    )
    return cents, assigned, probes


def _ivfpq_oracle_sql() -> str:
    """IVFADC: the shared PQ CTEs plus the coarse-quantizer CTEs from the
    IVF oracle; scoring joins codes → cell assignment → probed cells →
    LUT, so only candidates inside probed cells are scored."""
    return (
        "WITH "
        + _pq_ctes()
        + f""",
    ccells AS (
      SELECT label, d, avg(CAST(embedding[d] AS DOUBLE)) AS c
      FROM embeddings, unnest(generate_series(1, 64)) AS t(d)
      GROUP BY label, d
    ),
    coarse AS (
      SELECT label, list(c ORDER BY d) AS centroid FROM ccells GROUP BY label
    ),
    cdists AS (
      SELECT e.vec_id, c.label,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {_COARSE_DIST2_SQL} ASC, c.label) AS crnk
      FROM embeddings e CROSS JOIN coarse c
    ),
    assigned AS (SELECT vec_id, label AS cell FROM cdists WHERE crnk = 1),
    probes AS (
      SELECT vec_id AS query_id, label AS cell
      FROM cdists WHERE crnk <= {IVFPQ_NPROBE} AND vec_id % {QUERY_STRIDE} = 0
    ),
    scored AS (
      SELECT p.query_id, x.vec_id AS neighbor_id,
             CAST(sum(l.d2i) AS BIGINT) AS ad2
      FROM codes x
      JOIN assigned s ON s.vec_id = x.vec_id
      JOIN probes p ON p.cell = s.cell AND p.query_id != x.vec_id
      JOIN lut l ON l.query_id = p.query_id AND l.m = x.m AND l.code = x.code
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, rnk, ad2 FROM (
      SELECT query_id, neighbor_id, ad2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY ad2 ASC, neighbor_id) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}"""
    )


@register("sim_ivfpq_topk", oracle=_ivfpq_oracle_sql())
def sim_ivfpq_topk(
    spark: SparkSession, sf_dir: str, query_batch=None
) -> DataFrame:
    """IVF cell pruning composed with PQ/ADC scoring — the composition
    both halves' docstrings promise, and the scale answer to exhaustive
    ADC's Q·N·M scoring cost. Queries probe their nprobe nearest coarse
    cells; only vectors assigned to a probed cell are ADC-scored via the
    broadcast LUT. This is the NON-RESIDUAL variant (codes trained on raw
    vectors — one codebook, one LUT per query); Jégou et al. §IV's full
    IVFADC encodes residuals and is implemented as
    ``sim_ivfpq_residual_topk`` below.

    Plan shape (the part that must survive 100 TB):
    - the WIDE corpus (64-float embedding arrays) is never shuffled — the
      coarse argmin drops the embedding column BEFORE its rank window, so
      the only shuffled relations are the narrow index frames: (vec_id,
      cell, crnk) and the 4-byte-per-vector (vec_id, m, code) codes;
    - candidate pruning is an equi-join of the cell map against the
      broadcast (query, probed-cell) pairs — candidates shrink to
      ~nprobe/K of the corpus before any ADC work;
    - the LUT joins AFTER pruning, broadcast, keyed (query_id, m, code);
      scoring input is Q·(nprobe/K)·N·M rows instead of Q·N·M.
    At production scale the assignment+encode stages are the one-time
    index BUILD (written as a table bucketed by cell — the inverted
    file); only the probe/score stages run per query batch.
    """
    codes, lut = _pq_index(spark, sf_dir, query_batch)
    cents, assigned, probes = _coarse_cells(spark, sf_dir, query_batch)
    cand = (
        assigned.join(F.broadcast(probes), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    scored = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d2i").alias("ad2"))
    )
    return _rank_topk(scored)


# Residual determinism contract — INTEGER residuals, exact from the
# source: the residual subtracts a 6-dp-ROUNDED centroid (coarse6 /
# cents6 below) and is itself quantized to BIGINT micro-units. Two
# rounding steps, each chosen to kill a drift channel:
# (1) rounding the 640-value centroid table first confines the coarse
#     avg's partition-order drift to 640 boundary exposures instead of
#     N·64 subtraction-level ones (the k-means codebook argument);
# (2) integer residuals make every downstream aggregate exact — the PQ
#     codebook avgs become sums of integers (exact in double to 2^53),
#     so both engines round IDENTICAL bits, and 6-dp-rounded fractional
#     forms were observed flipping ±1 in the integer ADC contract.
# ADC distances for this variant are already micro²-scaled, so d2i drops
# the _SCALE multiply.
_RESID_SPARK = (
    "zip_with(embedding, centroid,"
    " (x, c) -> cast(round((cast(x as double) - c) * 1000000) as bigint))"
)
_RESID_SQL = (
    "list_transform(list_zip({emb}, {cent}),"
    " pz -> CAST(round((CAST(pz[1] AS DOUBLE) - pz[2]) * 1000000) AS BIGINT))"
)


def _ivfpq_residual_oracle_sql() -> str:
    """Residual IVFADC: coarse CTEs, residuals (corpus w.r.t. home cell,
    queries w.r.t. EACH probed cell), the PQ chain trained on residuals,
    the per-(query, cell) residual LUT, and cell-scoped ADC scoring."""
    resid_corpus = _RESID_SQL.format(emb="e.embedding", cent="c.centroid")
    resid_query = _RESID_SQL.format(emb="e.embedding", cent="c.centroid")
    return (
        f"""WITH ccells AS (
      SELECT label, d, avg(CAST(embedding[d] AS DOUBLE)) AS c
      FROM embeddings, unnest(generate_series(1, 64)) AS t(d)
      GROUP BY label, d
    ),
    coarse AS (
      SELECT label, list(c ORDER BY d) AS centroid FROM ccells GROUP BY label
    ),
    cdists AS (
      SELECT e.vec_id, c.label,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {_COARSE_DIST2_SQL} ASC, c.label) AS crnk
      FROM embeddings e CROSS JOIN coarse c
    ),
    cassigned AS (SELECT vec_id, label AS cell FROM cdists WHERE crnk = 1),
    probes AS (
      SELECT vec_id AS query_id, label AS cell
      FROM cdists WHERE crnk <= {IVFPQ_NPROBE} AND vec_id % {QUERY_STRIDE} = 0
    ),
    coarse6 AS (
      SELECT label, list(round(c, 6) ORDER BY d) AS centroid
      FROM ccells GROUP BY label
    ),
    resid AS (
      SELECT e.vec_id, {resid_corpus} AS remb
      FROM embeddings e
      JOIN cassigned a ON a.vec_id = e.vec_id
      JOIN coarse6 c ON c.label = a.cell
    ),
    qresid AS (
      SELECT p.query_id, p.cell, {resid_query} AS qremb
      FROM probes p
      JOIN embeddings e ON e.vec_id = p.query_id
      JOIN coarse6 c ON c.label = p.cell
    ),
    """
        + _pq_ctes(source="resid", vec="remb")
        + ",\n    "
        + _residual_lut_ctes()
        + f""",
    scored AS (
      SELECT p.query_id, x.vec_id AS neighbor_id,
             CAST(sum(l.d2i) AS BIGINT) AS ad2
      FROM codes x
      JOIN cassigned s ON s.vec_id = x.vec_id
      JOIN probes p ON p.cell = s.cell AND p.query_id != x.vec_id
      JOIN qlut l ON l.query_id = p.query_id AND l.cell = s.cell
                 AND l.m = x.m AND l.code = x.code
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, rnk, ad2 FROM (
      SELECT query_id, neighbor_id, ad2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY ad2 ASC, neighbor_id) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}"""
    )


@register("sim_ivfpq_residual_topk", oracle=_ivfpq_residual_oracle_sql())
def sim_ivfpq_residual_topk(
    spark: SparkSession, sf_dir: str, query_batch=None
) -> DataFrame:
    """Full IVFADC (Jégou et al. PAMI'11 §IV), residual encoding: each
    vector is PQ-coded on its RESIDUAL from its home coarse cell, and a
    query builds one LUT per probed cell from its residual against THAT
    cell. Residuals have much lower energy than raw vectors, so the same
    code budget quantizes finer — the refinement that separates IVFADC
    from plain cell-pruned ADC (``sim_ivfpq_topk``).

    Same scale shape as the non-residual variant — wide vectors never
    shuffle (residuals are computed in a broadcast join against the
    K-row centroid table and immediately sliced to narrow subspace rows),
    pruning precedes scoring, the per-(query, cell) LUT broadcasts —
    plus one new map-side stage: the residual projection. The 6-dp
    residual rounding is the cross-engine determinism contract (see
    ``_RESID_SPARK``)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents, assigned, probes = _coarse_cells(spark, sf_dir, query_batch)
    # 6-dp-rounded centroid copy for the residual projection (see the
    # determinism contract above); cell RANKING keeps the shared
    # unrounded table for parity with sim_ivf_topk / sim_ivfpq_topk
    cents_b = F.broadcast(
        cents.withColumn("centroid", F.expr("transform(centroid, c -> round(c, 6))"))
    )
    resid = (
        emb.join(assigned, "vec_id")
        .join(cents_b, "cell_id")
        .select("vec_id", F.expr(_RESID_SPARK).alias("remb"))
    )
    # PQ train/encode on residuals — the same flattened-subspace pipeline
    subs = _staged(_subspace_rows(resid, "remb"))
    c0 = _codebooks_of(subs, F.col("vec_id") % PQ_K)
    c1 = _staged(_codebooks_of(_assign_subs(subs, c0), F.col("cl")))
    codes = _assign_subs(subs, c1).select("vec_id", "m", F.col("cl").alias("code"))
    # per-(query, probed cell) residual LUT — probes is Q·nprobe rows and
    # broadcasts, so the wide embedding side never shuffles here
    qresid = (
        emb.join(F.broadcast(probes), probes.query_id == emb.vec_id)
        .join(cents_b, "cell_id")
        .select("query_id", "cell_id", F.expr(_RESID_SPARK).alias("qremb"))
    )
    qlut = (
        qresid.select(
            "query_id",
            "cell_id",
            F.explode(F.expr(f"array({_subspace_structs('qremb')})")).alias("s"),
        )
        .select("query_id", "cell_id", F.col("s.m").alias("m"), F.col("s.sub").alias("sub"))
        .join(F.broadcast(c1), "m")
        .select(
            "query_id",
            "cell_id",
            "m",
            F.col("cl").alias("code"),
            # micro²-scaled already (integer residuals) — no _SCALE
            F.expr(
                f"cast(round({dist2_expr('sub', PQ_SUB)}) as bigint)"
            ).alias("d2i"),
        )
    )
    cand = (
        assigned.join(F.broadcast(probes), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "cell_id", "vec_id")
    )
    scored = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(qlut), ["query_id", "cell_id", "m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d2i").alias("ad2"))
    )
    return _rank_topk(scored)
