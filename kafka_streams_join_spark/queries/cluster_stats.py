"""Near-dup cluster-size histogram (round 8 — the VERDICT-r7
"connected-component size histogram, free off components.py" item).

``dedup_cluster_canonical`` labels every document with its transitive
near-dup cluster's canonical id; this module reports the SHAPE of that
clustering — how many clusters of each size exist, how many documents
they hold, and each size's exact-ppm share of the corpus. The size
distribution is the number dedup operators actually watch in
production: a fat tail of giant clusters means boilerplate or template
spam (delete aggressively), an all-singleton histogram means the
near-dup thresholds are too tight to matter.

Oracle note: the inner query is the REGISTERED ``dedup_cluster_canonical``
oracle verbatim (its WITH RECURSIVE ladder nests inside this CTE), so the
histogram certification composes an already-certified closure rather
than re-deriving it.

Scale: the expensive part is the already-gated components pipeline; on
top of it this adds two narrow-row aggregates (doc→cluster size, size→
histogram) plus a 1-row broadcast total — the documented BNLJ-ok
pattern. The share numerator is DECIMAL(38,0)/HUGEINT (n_docs·1e6
passes BIGINT once a size class holds ~9e12 docs — the 100-TB audit
class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import dedup_cluster_canonical
from .registry import ORACLES, register


@register(
    "dedup_component_size_histogram",
    oracle=f"""
    WITH canon AS ({ORACLES["dedup_cluster_canonical"]}),
    sizes AS (
      SELECT canonical_id, count(*) AS cluster_size
      FROM canon GROUP BY canonical_id
    ),
    hist AS (
      SELECT cluster_size, count(*) AS n_clusters,
             CAST(cluster_size * count(*) AS BIGINT) AS n_docs
      FROM sizes GROUP BY cluster_size
    ),
    tot AS (SELECT count(*) AS total_docs FROM canon)
    SELECT h.cluster_size, h.n_clusters, h.n_docs,
           CAST(CAST(h.n_docs AS HUGEINT) * 1000000
                // t.total_docs AS BIGINT) AS doc_share_ppm
    FROM hist h CROSS JOIN tot t
    """,
)
def dedup_component_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Histogram of near-dup cluster sizes over the certified transitive
    closure: for each size, the cluster count, the documents held, and
    the exact-ppm share of the corpus (singletons at size 1 are the
    untouched mass; everything above is the dedup opportunity). The
    module docstring carries the composition and scale contract.

    Scale: two map-side-combinable aggregates over (canonical_id) then
    (cluster_size) narrow rows on top of the components pipeline; the
    corpus total rides in as a broadcast 1-row frame."""
    canon = dedup_cluster_canonical(spark, sf_dir)
    sizes = canon.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )
    tot = canon.agg(F.count(F.lit(1)).alias("total_docs"))
    return (
        hist.select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "cluster_size",
            "n_clusters",
            "n_docs",
            F.expr(
                "cast(cast(n_docs as decimal(38,0)) * 1000000"
                " div total_docs as bigint)"
            ).alias("doc_share_ppm"),
        )
    )
