"""Embedding preprocessing operators (round 2) — the per-vector transforms
an ANN index build runs before any of the similarity/dedup queries.

Both are pure narrow projections (no shuffle, no Python): JVM higher-order
functions over the array column, oracle-checked cell-by-cell. At 100 TB
these run in the same scan as the index write — the point is that Spark
expresses them without materializing an intermediate corpus.

Sweep placement is automatic: queries/__init__.py sorts driver-unproven
queries into the sweep window from the checked-in CORRECTNESS_r*.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_NORM_SQL = (
    "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)
_NORM_SPARK = (
    "sqrt(aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)),"
    " cast(0 as double), (acc, v) -> acc + v))"
)


@register(
    "emb_l2_normalize",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding, {_NORM_SQL} AS nrm FROM embeddings
    )
    SELECT vec_id,
           round(nrm, 4) AS norm,
           array_to_string(list_transform(embedding,
             x -> printf('%.4f', CASE WHEN nrm = 0 THEN 0.0
                  ELSE round(CAST(x AS DOUBLE) / nrm, 4) + 0.0 END)),
             ',') AS unit_vec
    FROM n
    """,
)
def emb_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization: unit vectors make cosine a plain dot product, which
    halves the work in every downstream GEMM. Narrow projection — one scan,
    zero exchanges. The norm is computed ONCE in a prior projection and
    captured by the per-cell lambda — embedding the aggregate inside the
    lambda would re-fold the whole array per cell, O(dim²) interpreted work
    per row. A zero vector normalizes to zeros (0/0 would be NaN, which the
    engines serialize differently).

    Serialization contract: the vector is emitted as a C-format
    ('%.4f'-per-cell, comma-joined) STRING, not an array — array-typed
    result columns are an output shape the external hash gate has never
    certified, and engine float-to-string rules differ ('1.0E-4' vs
    '0.0001') where printf does not. The ``+ 0.0`` after the round (both
    engines) collapses IEEE ``-0.0`` to ``+0.0``."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", F.expr(_NORM_SPARK)
    )
    return emb.select(
        "vec_id",
        F.round(F.col("nrm"), 4).alias("norm"),
        F.expr(
            "array_join(transform(embedding,"
            " x -> format_string('%.4f',"
            "   CASE WHEN nrm = cast(0 as double) THEN cast(0 as double)"
            "   ELSE round(cast(x as double) / nrm, 4) + cast(0 as double) END)),"
            " ',')"
        ).alias("unit_vec"),
    )


@register(
    "emb_quantize_int8",
    oracle="""
    WITH m AS (
      SELECT vec_id, embedding,
             CAST(list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))) AS DOUBLE) AS am
      FROM embeddings
    )
    SELECT vec_id,
           round(am / 127, 6) AS scale,
           array_to_string(list_transform(embedding,
             x -> CAST(CAST(CASE WHEN am = 0 THEN 0
                  ELSE round(CAST(x AS DOUBLE) / (am / 127)) END
                  AS INTEGER) AS VARCHAR)),
             ',') AS qvec
    FROM m
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (absmax / 127 scale): 4× less
    index storage and memory traffic — the standard ANN compression trade.
    Integer cells are engine-exact; the scale factor (rounded) rides along
    for dequantization. Pure projection, no shuffle; absmax is hoisted out
    of the per-cell lambda (same O(dim²) trap as the norm) and a zero
    vector quantizes to zeros instead of 0/0 — Spark's non-ANSI NaN→int
    cast yields 0 where DuckDB's raises, so the guard is also what keeps
    the oracle runnable. Emitted comma-joined (see emb_l2_normalize: array
    result columns are an uncertified output shape for the external hash
    gate; integer-to-string is engine-stable)."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "am", F.expr("array_max(transform(embedding, x -> abs(cast(x as double))))")
    )
    return emb.select(
        "vec_id",
        F.round(F.col("am") / 127, 6).alias("scale"),
        F.expr(
            "array_join(transform(embedding,"
            " x -> cast(cast(CASE WHEN am = cast(0 as double) THEN cast(0 as double)"
            "   ELSE round(cast(x as double) / (am / 127)) END as int)"
            " as string)), ',')"
        ).alias("qvec"),
    )


_DIM = 64
PCA_K = 8


@register(
    "emb_covariance",
    oracle=f"""
    SELECT i, j,
           round(covar_pop(CAST(embedding[i] AS DOUBLE),
                           CAST(embedding[j] AS DOUBLE)), 6) + 0.0 AS cov
    FROM embeddings,
         unnest(generate_series(1, {_DIM})) AS ti(i),
         unnest(generate_series(1, {_DIM})) AS tj(j)
    WHERE j >= i
    GROUP BY i, j
    """,
)
def emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle population covariance of the embedding dimensions —
    the distributed Gramian pass every spectral method (PCA, whitening,
    OPQ rotation) starts from, and the oracle-certified core of
    ``emb_pca_project``.

    Scale shape (the MLlib computeCovariance pattern, relationally): each
    row explodes to its dim(dim+1)/2 upper-triangle (i, j, x, y) cells —
    map-side, one scan — and ``covar_pop`` is algebraic (sum/sum-product
    partials), so partial aggregation collapses each partition to at most
    2080 cells before the one shuffle. What moves is O(partitions · d²),
    independent of corpus size. 6-dp rounding is the usual cross-engine
    float-sum-order contract."""
    cells = _cov_cells(load_table(spark, sf_dir, "embeddings"))
    # ``+ 0.0`` collapses IEEE -0.0 to +0.0 in both engines (the
    # emb_l2_normalize serialization contract) — a tiny negative
    # covariance rounding to zero must not hash as "-0.0" vs "0.0"
    return cells.groupBy("i", "j").agg(
        (F.round(F.covar_pop("x", "y"), 6) + F.lit(0.0)).alias("cov")
    )


def _cov_cells(emb: DataFrame) -> DataFrame:
    """(i, j, x, y) upper-triangle cells per row — the map-side explode
    shared by the covariance query and the one-pass PCA fit."""
    return emb.select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, {_DIM}), i ->"
                f" transform(sequence(i, {_DIM}), j -> named_struct("
                "  'i', i, 'j', j,"
                "  'x', cast(embedding[i - 1] as double),"
                "  'y', cast(embedding[j - 1] as double)))))"
            )
        ).alias("c")
    ).select("c.i", "c.j", "c.x", "c.y")


def _pca_model(spark: SparkSession, sf_dir: str) -> tuple[list, list]:
    """(means, components): fit the PCA model — per-dim means and the top
    PCA_K eigenvectors of the covariance matrix. The distributed work is
    the mean/covariance aggregation (the ``emb_covariance`` plan); only
    the MODEL (64 means + 2080 covariance cells → a 64×64 eigh) reaches
    the driver — bounded by d², never by corpus size, exactly like a
    broadcast codebook, and the same split MLlib's PCA uses
    (computeCovariance → local breeze eigh). ONE aggregation job fits
    both statistics: avg("x") rides on the covariance groupBy, and the
    diagonal (i == i) rows carry the per-dim means — no second corpus
    pass. Deterministic: covariance AND means are 6-dp rounded before
    use (drowning partition-order float drift — unrounded means would
    let a score on a rounding boundary flip across partitionings), and
    each eigenvector's sign is fixed so its largest-|coordinate| entry
    is positive (eigh returns an arbitrary sign)."""
    import numpy as np

    rows = (
        _cov_cells(load_table(spark, sf_dir, "embeddings"))
        .groupBy("i", "j")
        .agg(
            (F.round(F.covar_pop("x", "y"), 6) + F.lit(0.0)).alias("cov"),
            (F.round(F.avg("x"), 6) + F.lit(0.0)).alias("mx"),
        )
        .collect()
    )
    means = [0.0] * _DIM
    C = np.zeros((_DIM, _DIM))
    for r in rows:
        C[r["i"] - 1, r["j"] - 1] = r["cov"]
        C[r["j"] - 1, r["i"] - 1] = r["cov"]
        if r["i"] == r["j"]:
            means[r["i"] - 1] = r["mx"]
    vals, vecs = np.linalg.eigh(C)  # ascending eigenvalues
    order = np.argsort(vals)[::-1][:PCA_K]
    comps = []
    for k in order:
        v = vecs[:, k]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        # 6-dp like every other model statistic (round 6): the eigenbasis
        # IS the deployable artifact (pca_frozen.py freezes exactly these
        # values), so the fitted projection and the frozen-literal
        # projection are bit-equal on the training corpus
        comps.append([round(float(x), 6) for x in v])
    return means, comps


# DEREGISTERED round 10 (was the registry's lone rows-only entry since r4):
# its contract is fully oracle-certified by the pair that superseded it —
# emb_covariance (the distributed Gramian core, hash-green) +
# emb_pca_project_fixed (emb_ext.py, the frozen-eigenbasis projection,
# hash-green since r6). The function stays: the fit/project machinery is
# exercised by the invariant + numpy-differential tests
# (tests/test_extensions.py) and the frozen-vs-fitted consistency check
# (tests/test_round6.py), and pca_frozen.py documents its provenance.
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of every embedding onto the top PCA_K=8 principal
    components — the dimensionality-reduction / whitening front end of
    embedding pipelines (and the rotation primitive OPQ-style quantizers
    train). Two phases, cleanly split by size:

    - FIT (one distributed agg → driver): means + covariance in a single
      aggregation job, one 64×64 eigh on the driver — model-sized, see
      ``_pca_model``;
    - TRANSFORM (map-side): each score p_k = Σ_d c_kd·(e_d − μ_d) is a
      flat 64-term codegen'd expression with the model inlined as
      literals (a broadcast of constants) — one scan, zero shuffles, no
      Python on the data path.

    Scores are 6-dp rounded for a partition-invariant output."""
    means, comps = _pca_model(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    proj_cols = [
        F.round(
            F.expr(
                " + ".join(
                    f"({c[d]!r}) * (cast(embedding[{d}] as double) - ({means[d]!r}))"
                    for d in range(_DIM)
                )
            ),
            6,
        ).alias(f"p{k}")
        for k, c in enumerate(comps)
    ]
    return emb.select("vec_id", *proj_cols)


# --------------------------------------------------------------------------
# emb_label_outliers — intra-class distance outliers (mislabel/noise gate)
# --------------------------------------------------------------------------


@register(
    "emb_label_outliers",
    oracle="""
    WITH cent AS (
      SELECT label, d, avg(CAST(embedding[d] AS DOUBLE)) AS c
      FROM embeddings, unnest(generate_series(1, 64)) AS t(d)
      GROUP BY label, d
    ),
    cvec AS (
      SELECT label, list(c ORDER BY d) AS centroid FROM cent GROUP BY label
    ),
    dist AS (
      SELECT e.vec_id, e.label,
             round(sqrt(list_sum(list_transform(
               list_zip(e.embedding, cv.centroid),
               p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])
             ))), 6) AS dist6
      FROM embeddings e JOIN cvec cv USING (label)
    ),
    stats AS (
      SELECT label, avg(dist6) AS mu, stddev_pop(dist6) AS sd
      FROM dist GROUP BY label
    )
    SELECT dist.vec_id, dist.label, dist.dist6,
           round((dist.dist6 - stats.mu) / stats.sd, 4) + 0.0 AS zscore
    FROM dist JOIN stats USING (label)
    WHERE stats.sd > 0 AND (dist.dist6 - stats.mu) / stats.sd >= 2
    """,
)
def emb_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-class embedding outliers: vectors whose L2 distance to their
    OWN label centroid z-scores >= 2 within the label — the mislabel/noise
    detector a curation pipeline runs before using labels for SemDeDup
    cells, classifier training, or hard-negative mining (a vector far from
    its class center is a labeling error or an encoder glitch). Distances
    are rounded to 6 dp before the per-label stats, z to 4 dp at emission
    (+ 0.0 normalizes -0.0), so the flag boundary is engine-stable except
    at exact-ulp ties on the raw z (none on this corpus).

    Scale: centroids are a labels x dims aggregate (map-side combined,
    bounded by the label vocabulary) that broadcasts back; the distance is
    a row-local fold in the scan pipeline; per-label stats are another
    bounded aggregate broadcast back. The corpus never shuffles."""
    emb = load_table(spark, sf_dir, "embeddings")
    cells = emb.select(
        "label", F.posexplode("embedding").alias("d0", "x")
    ).select("label", (F.col("d0") + 1).alias("d"), F.col("x").cast("double").alias("x"))
    cvec = (
        cells.groupBy("label", "d")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(d, c))), s -> s.c)"
            ).alias("centroid")
        )
    )
    dist = emb.join(F.broadcast(cvec), "label").select(
        "vec_id",
        "label",
        F.round(
            F.sqrt(
                F.expr(
                    "aggregate(zip_with(embedding, centroid,"
                    " (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)),"
                    " cast(0 as double), (acc, v) -> acc + v)"
                )
            ),
            6,
        ).alias("dist6"),
    )
    stats = dist.groupBy("label").agg(
        F.avg("dist6").alias("mu"), F.stddev_pop("dist6").alias("sd")
    )
    z = (F.col("dist6") - F.col("mu")) / F.col("sd")
    # sd = 0 (singleton or all-equal label) must drop the label, not
    # divide: Spark's 0/0 is NULL (filtered) but DuckDB's is NaN, which
    # DuckDB orders ABOVE all numbers — the engines would diverge on any
    # zero-variance label (review finding, round 5)
    return (
        dist.join(F.broadcast(stats), "label")
        .filter((F.col("sd") > 0) & (z >= 2))
        .select(
            "vec_id",
            "label",
            "dist6",
            (F.round(z, 4) + F.lit(0.0)).alias("zscore"),
        )
    )


# --------------------------------------------------------------------------
# emb_centroid_drift — per-label centroid shift between corpus halves
# --------------------------------------------------------------------------


@register(
    "emb_centroid_drift",
    oracle="""
    WITH half AS (
      SELECT vec_id, label, embedding,
             CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END AS snap
      FROM embeddings
    ),
    cent AS (
      SELECT snap, label, d, avg(CAST(embedding[d] AS DOUBLE)) AS c
      FROM half, unnest(generate_series(1, 64)) AS t(d)
      GROUP BY snap, label, d
    ),
    wide AS (
      SELECT a.label, a.d, a.c AS ca, b.c AS cb
      FROM cent a JOIN cent b
        ON a.label = b.label AND a.d = b.d AND a.snap = 'a' AND b.snap = 'b'
    )
    SELECT label,
           round(sqrt(sum((ca - cb) * (ca - cb))), 6) AS shift_l2,
           round(sqrt(sum(ca * ca)), 6) AS norm_a,
           round(sqrt(sum(cb * cb)), 6) AS norm_b
    FROM wide GROUP BY label
    """,
)
def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift between two corpus snapshots (here the deterministic
    even/odd vec_id halves — the stand-in for yesterday's batch vs
    today's): per label, the L2 shift between the halves' centroids, next
    to each centroid's own norm for scale. The canary an embedding
    pipeline watches across encoder redeployments or data-mix changes —
    a label whose centroid moves a large fraction of its norm means
    retrieval/dedup thresholds tuned on the old space no longer hold.

    Scale: one (snap, label, dim) aggregate — map-side combined, bounded
    by 2·labels·64 cells — then a cell-level self-join and a label-level
    rollup, all on the bounded centroid frame; the corpus never joins
    anything."""
    half = load_table(spark, sf_dir, "embeddings").select(
        "label",
        F.when(F.col("vec_id") % 2 == 0, F.lit("a")).otherwise(F.lit("b")).alias("snap"),
        F.posexplode("embedding").alias("d0", "x"),
    ).select("snap", "label", (F.col("d0") + 1).alias("d"), F.col("x").cast("double").alias("x"))
    cent = half.groupBy("snap", "label", "d").agg(F.avg("x").alias("c"))
    a = cent.filter(F.col("snap") == "a").select("label", "d", F.col("c").alias("ca"))
    b = cent.filter(F.col("snap") == "b").select("label", "d", F.col("c").alias("cb"))
    return (
        a.join(b, ["label", "d"])
        .groupBy("label")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))), 6
            ).alias("shift_l2"),
            F.round(F.sqrt(F.sum(F.col("ca") * F.col("ca"))), 6).alias("norm_a"),
            F.round(F.sqrt(F.sum(F.col("cb") * F.col("cb"))), 6).alias("norm_b"),
        )
    )
