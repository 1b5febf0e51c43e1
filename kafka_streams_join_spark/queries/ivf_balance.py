"""IVF index cell-balance audit (round 12): occupancy statistics of the
trained k-means cells the IVF/IVFPQ/IVFADC tiers probe — the index-
health number next to the family's recall audits. Probe latency is
proportional to the occupancy of the probed cells, so a skewed
partition map means tail latency and a hot shard at serving time: this
is the report an ANN platform reads before shipping a new codebook
(FAISS's `imbalance_factor`, reproduced exactly).

Reuses the REGISTERED k-means back end verbatim
(``clustering.kmeans_assignments`` / the shared ``kmeans_ctes`` oracle
ladder), so the audited cells are bit-identical to the ones
``sim_ivf_topk``'s probes visit — auditing a re-derived clustering
would certify the wrong index.

Exactness: occupancies are exact counts; the imbalance factor
(K·max/n, FAISS's definition, 1.0 = perfectly balanced) and the HHI
concentration of cell shares (Σc²·10⁶ div n², the ``orders_hhi``
integer contract — DECIMAL(38,0)/HUGEINT products) are truncating-div
integer outputs; no float leaves the certified k-means stage.

Scale: the assignment chain is the already-certified broadcast-codebook
plan (corpus never shuffles to assign); this audit adds ONE map-side-
combinable count per cell (K rows out) and constant-size arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .clustering import KMEANS_K, kmeans_assignments, kmeans_ctes
from .registry import register


@register(
    "sim_ivf_cell_balance",
    oracle=f"""
    {kmeans_ctes()},
    occ AS (
      SELECT cl, CAST(count(*) AS BIGINT) AS c FROM afinal GROUP BY cl
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_cells,
             CAST(sum(c) AS BIGINT) AS n_vectors,
             CAST(min(c) AS BIGINT) AS min_occ,
             CAST(max(c) AS BIGINT) AS max_occ,
             sum(CAST(c AS HUGEINT) * c) AS sumsq
      FROM occ
    )
    SELECT n_cells, n_vectors, min_occ, max_occ,
           CAST(CASE WHEN n_vectors = 0 THEN 0
                ELSE 1000 * {KMEANS_K} * max_occ // n_vectors
                END AS BIGINT) AS imbalance_milli,
           CAST(CASE WHEN n_vectors = 0 THEN 0
                ELSE 1000000 * sumsq
                     // (CAST(n_vectors AS HUGEINT) * n_vectors)
                END AS BIGINT) AS hhi_ppm
    FROM m
    """,
)
def sim_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupancy audit of the trained IVF cells: populated-cell count,
    total vectors, min/max occupancy, the FAISS imbalance factor
    K·max/n in milli (1000 = perfectly balanced), and the HHI of cell
    shares in exact ppm. Module docstring has the reuse, exactness, and
    one-extra-aggregate scale contracts."""
    occ = (
        kmeans_assignments(spark, sf_dir)
        .groupBy("cl")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    m = occ.agg(
        F.expr("cast(count(1) as bigint)").alias("n_cells"),
        F.expr("cast(sum(c) as bigint)").alias("n_vectors"),
        F.expr("cast(min(c) as bigint)").alias("min_occ"),
        F.expr("cast(max(c) as bigint)").alias("max_occ"),
        F.expr("sum(cast(c as decimal(38,0)) * c)").alias("sumsq"),
    )
    return m.select(
        "n_cells",
        "n_vectors",
        "min_occ",
        "max_occ",
        F.expr(
            f"cast(case when n_vectors = 0 then 0"
            f" else 1000 * {KMEANS_K} * max_occ div n_vectors"
            " end as bigint)"
        ).alias("imbalance_milli"),
        F.expr(
            "cast(case when n_vectors = 0 then 0"
            " else 1000000 * sumsq"
            " div (cast(n_vectors as decimal(38,0)) * n_vectors)"
            " end as bigint)"
        ).alias("hhi_ppm"),
    )
