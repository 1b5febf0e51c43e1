"""IVF nprobe sweep (round 12): recall@k of the IVF tier at
nprobe = 1, 2, 3 against the certified exact baseline, in one pass —
the recall/latency dial every IVF deployment tunes (FAISS's `nprobe`
knob). ``sim_ivf_topk`` freezes nprobe=2 and ``sim_recall_report``
audits one configuration; this emits the CURVE, which is what decides
whether the next latency budget buys +1 probe or a better codebook.

Construction: ONE assignment pass (the sim_ivf_topk broadcast-codebook
plan, staged at crnk ≤ 3) feeds all three levels. Each query-side probe
carries its probe_rank (= which nprobe level first reaches that cell);
a corpus vector lives in exactly one cell, so every (query, candidate)
pair exists at exactly one probe_rank and the candidate set at level p
is the probe_rank ≤ p filter — no per-level rescan, no dedup. The
top-k at level p is cut in two engine-stable stages: per
(query, probe_rank) top-k first (any global top-k member is a member
of its own stratum's top-k), then the ≤ 3k survivors re-rank per
(level, query) after a 3-row level fan-out.

Determinism contract: candidates are ranked on the 4-dp-rounded cosine
with neighbor-id tie-breaks at BOTH stages (the
``sim_knn_label_accuracy`` engine-stable pattern — flat
left-associative 64-term sums ≡ DuckDB list_sum fold order); recall
counts are exact; recall_ppm is a truncating div. Ground truth is the
REGISTERED ``sim_topk_bruteforce`` (oracle composed verbatim).

Scale: the codebook is broadcast (corpus never shuffles to assign);
candidates per query are bounded by (max nprobe)/K of the corpus via
the cell equi-join; the stage-1 window partitions by
(query, probe_rank) — rank ≤ k plans WindowGroupLimit, cutting
map-side to Q·3·k rows before the level fan-out; nothing bigger than
Q·3·k crosses an Exchange after scoring. The brute-force leg is the
expensive half, which is the point of a recall audit — it runs on the
stride-bounded query sample, never the full workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import ORACLES, register
from .similarity import (
    QUERY_STRIDE,
    TOP_K,
    _DIST2_SPARK,
    _DIST2_SQL,
    _HN_CN_SPARK,
    _HN_DOT_SPARK,
    _HN_QN_SPARK,
    label_centroids,
    sim_topk_bruteforce,
)

_NPROBE_MAX = 3

_COS_AB_SQL = (
    "list_sum(list_transform(list_zip(a.embedding, b.embedding),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    " / sqrt(list_sum(list_transform(a.embedding,"
    "          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    "   * list_sum(list_transform(b.embedding,"
    "          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


@register(
    "sim_ivf_nprobe_sweep",
    oracle=f"""
    WITH cells AS (
      SELECT label, d, avg(CAST(embedding[d] AS DOUBLE)) AS c
      FROM embeddings, unnest(generate_series(1, 64)) AS t(d)
      GROUP BY label, d
    ),
    centroids AS (
      SELECT label, list(c ORDER BY d) AS centroid FROM cells GROUP BY label
    ),
    dists AS (
      SELECT e.vec_id, e.embedding, c.label,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {_DIST2_SQL} ASC, c.label) AS crnk
      FROM embeddings e CROSS JOIN centroids c
    ),
    assigned AS (
      SELECT vec_id, embedding, label AS cell FROM dists WHERE crnk = 1
    ),
    qside AS (
      SELECT vec_id, embedding, label AS cell, crnk AS probe_rank
      FROM dists
      WHERE crnk <= {_NPROBE_MAX} AND vec_id % {QUERY_STRIDE} = 0
    ),
    cut AS (
      SELECT query_id, neighbor_id, probe_rank, cos FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               a.probe_rank, round({_COS_AB_SQL}, 4) AS cos,
               row_number() OVER (
                 PARTITION BY a.vec_id, a.probe_rank
                 ORDER BY round({_COS_AB_SQL}, 4) DESC, b.vec_id) AS srnk
        FROM qside a JOIN assigned b
          ON a.cell = b.cell AND b.vec_id != a.vec_id
      ) WHERE srnk <= {TOP_K}
    ),
    levels AS (
      SELECT unnest(generate_series(1, {_NPROBE_MAX})) AS nprobe
    ),
    hits AS (
      SELECT nprobe, query_id, neighbor_id FROM (
        SELECT l.nprobe, c.query_id, c.neighbor_id,
               row_number() OVER (PARTITION BY l.nprobe, c.query_id
                                  ORDER BY c.cos DESC, c.neighbor_id) AS rnk
        FROM cut c JOIN levels l ON c.probe_rank <= l.nprobe
      ) WHERE rnk <= {TOP_K}
    ),
    truth AS ({ORACLES["sim_topk_bruteforce"]})
    SELECT l.nprobe,
           CAST(count(*) AS BIGINT) AS n_truth,
           CAST(count(h.neighbor_id) AS BIGINT) AS n_hit,
           CAST(count(h.neighbor_id) * 1000000 // count(*) AS BIGINT)
             AS recall_ppm
    FROM truth t CROSS JOIN levels l
    LEFT JOIN hits h ON h.nprobe = l.nprobe AND h.query_id = t.query_id
                    AND h.neighbor_id = t.neighbor_id
    GROUP BY l.nprobe
    """,
)
def sim_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of the IVF index at nprobe = 1..{_NPROBE_MAX}
    against exact brute force — one row per probe budget, exact integer
    ppm. Module docstring has the one-pass construction, two-stage
    engine-stable ranking, and bounded-candidate contracts."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = label_centroids(emb)
    w_cell = Window.partitionBy("vec_id").orderBy(
        F.asc("dist2"), F.asc("cell_id")
    )
    dists = _staged(
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(centroids))
        .select(
            "vec_id", "embedding", "cell_id",
            F.expr(_DIST2_SPARK).alias("dist2"),
        )
        .withColumn("crnk", F.row_number().over(w_cell))
        .filter(F.col("crnk") <= _NPROBE_MAX)
    )
    build = dists.filter(F.col("crnk") == 1).select(
        F.col("cell_id").alias("cell"), "vec_id", "embedding"
    )
    qside = (
        dists.filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qemb"),
            F.col("cell_id").alias("cell"),
            F.col("crnk").alias("probe_rank"),
        )
    )
    cos = F.round(
        F.expr(_HN_DOT_SPARK)
        / F.sqrt(F.expr(_HN_QN_SPARK) * F.expr(_HN_CN_SPARK)),
        4,
    )
    scored = (
        qside.join(build, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "probe_rank",
            cos.alias("cos"),
        )
    )
    w_cut = Window.partitionBy("query_id", "probe_rank").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    cut = (
        scored.withColumn("srnk", F.row_number().over(w_cut))
        .filter(F.col("srnk") <= TOP_K)
        .drop("srnk")
    )
    levels = spark.range(1, _NPROBE_MAX + 1).select(
        F.col("id").alias("nprobe")
    )
    w_lvl = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    hits = (
        cut.join(
            F.broadcast(levels), F.col("probe_rank") <= F.col("nprobe")
        )
        .withColumn("rnk", F.row_number().over(w_lvl))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "nprobe",
            F.col("query_id").alias("h_qid"),
            F.col("neighbor_id").alias("h_nid"),
            F.lit(1).alias("hit"),
        )
    )
    truth = (
        sim_topk_bruteforce(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .crossJoin(F.broadcast(levels))
    )
    return (
        truth.join(
            hits,
            (truth.nprobe == hits.nprobe)
            & (truth.query_id == F.col("h_qid"))
            & (truth.neighbor_id == F.col("h_nid")),
            "left",
        )
        .groupBy(truth.nprobe)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_truth"),
            F.count("hit").cast("bigint").alias("n_hit"),
        )
        .select(
            "nprobe",
            "n_truth",
            "n_hit",
            F.expr("cast(n_hit * 1000000 div n_truth as bigint)").alias(
                "recall_ppm"
            ),
        )
    )


sim_ivf_nprobe_sweep.__doc__ = (
    sim_ivf_nprobe_sweep.__doc__.replace("{TOP_K}", str(TOP_K)).replace(
        "{_NPROBE_MAX}", str(_NPROBE_MAX)
    )
)
