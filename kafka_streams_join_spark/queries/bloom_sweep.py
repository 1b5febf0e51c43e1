"""Bloom-filter sizing sweep (round 12): build the SAME member set into
three filter sizes (m = 1024 / 4096 / 16384 bits, k = 3 hashes fixed)
and measure observed vs predicted false-positive rate per size — the
report an engineer reads to pick m before shipping a membership filter
(``agg_bloom_membership`` certifies ONE filter's contract; this is the
dial across sizes, from one pass over each side).

Member set: distinct customers-with-orders (the repo's Bloom member
contract, `sketches.py:agg_bloom_membership`). Probe set: NEGATIVE
CONTROLS — this corpus has no customer without orders at any SF, so
known non-members are synthesized by key translation
(10¹² + c_custkey, disjoint from the o_custkey domain by magnitude)
and then anti-joined against the member set so non-membership is
VERIFIED, not assumed; every probe is a true negative and every Bloom
hit a false positive.

Exactness: one 60-bit md5 hash per (j, key) (the repo's Bloom hash,
identical in both engines), position = h mod m per size; bit sets,
probe hits, and counts are exact; fpr_ppm and load_ppm are truncating
divs of exact BIGINTs; predicted_fpr_ppm = 10⁶·bits_set³ div m³ — the
standard (fill fraction)^k estimate of the per-probe hit probability,
computed in DECIMAL(38,0)/HUGEINT so even m=16384³·10⁶ stays exact.
No float anywhere.

Scale: the bit sets are ≤ Σm ≈ 21k rows TOTAL and broadcast; build and
probe are each one scan of their side crossed with the 3-row j dim and
3-row m dim (9× map-side fan-out); probe verdicts are one
(m, key)-grouped combinable aggregate; the output is 3 rows. The
member distinct is the exact-dedup shape — the only key-cardinality
shuffle in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..functions.literals import values_frame
from ..sources.parquet import load_table
from .registry import register

_BS_MS = (1024, 4096, 16384)  # filter sizes (bits)
_BS_K = 3  # hash functions
_BS_PROBE_OFFSET = 1_000_000_000_000  # negative-control key translation


def _h_spark(j: str, key: str) -> str:
    return (
        f"cast(conv(substring(md5(concat(cast({j} as string), '#',"
        f" cast({key} as string))), 1, 15), 16, 10) as bigint)"
    )


def _h_sql(j: str, key: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({j} AS VARCHAR) || '#' ||"
        f" CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT)"
    )


@register(
    "sketch_bloom_size_sweep",
    oracle=f"""
    WITH ms AS (SELECT unnest([{", ".join(str(m) for m in _BS_MS)}]) AS m),
    hs AS (SELECT unnest(generate_series(1, {_BS_K})) AS j),
    members AS (SELECT DISTINCT o_custkey AS k FROM orders),
    bits AS (
      SELECT DISTINCT m, {_h_sql("j", "k")} % m AS pos
      FROM members CROSS JOIN hs CROSS JOIN ms
    ),
    bstat AS (
      SELECT m, CAST(count(*) AS BIGINT) AS bits_set FROM bits GROUP BY m
    ),
    probes AS (
      SELECT DISTINCT {_BS_PROBE_OFFSET} + c_custkey AS k FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM members mm
                        WHERE mm.k = {_BS_PROBE_OFFSET} + c.c_custkey)
    ),
    verdicts AS (
      SELECT p.m, p.k, count(b.pos) = {_BS_K} AS bloom_hit
      FROM (SELECT ms.m, probes.k, {_h_sql("hs.j", "probes.k")} % ms.m AS pos
            FROM probes CROSS JOIN hs CROSS JOIN ms) p
      LEFT JOIN bits b ON b.m = p.m AND b.pos = p.pos
      GROUP BY p.m, p.k
    ),
    vstat AS (
      SELECT m, CAST(count(*) AS BIGINT) AS n_probes,
             CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_false_pos
      FROM verdicts GROUP BY m
    ),
    nm AS (SELECT CAST(count(*) AS BIGINT) AS n_inserted FROM members)
    SELECT CAST(v.m AS BIGINT) AS m_bits,
           CAST({_BS_K} AS BIGINT) AS k_hashes,
           nm.n_inserted, b.bits_set,
           CAST(b.bits_set * 1000000 // v.m AS BIGINT) AS load_ppm,
           v.n_probes, v.n_false_pos,
           CAST(v.n_false_pos * 1000000 // v.n_probes AS BIGINT) AS fpr_ppm,
           CAST(CAST(b.bits_set AS HUGEINT) * b.bits_set * b.bits_set
                * 1000000
                // (CAST(v.m AS HUGEINT) * v.m * v.m) AS BIGINT)
             AS predicted_fpr_ppm
    FROM vstat v JOIN bstat b ON b.m = v.m CROSS JOIN nm
    """,
)
def sketch_bloom_size_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per filter size m ∈ {ms}: set-bit count and load, verified-
    negative probe count, observed false positives, and the
    (bits_set/m)^k predicted FPR — both in exact ppm. Module docstring
    has the negative-control, exactness, and broadcast contracts."""
    ms = values_frame(spark, [(m,) for m in _BS_MS], "m long")
    hs = spark.range(1, _BS_K + 1).select(F.col("id").alias("j"))
    members = _staged(
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    bits = _staged(
        members.crossJoin(F.broadcast(hs))
        .withColumn("h", F.expr(_h_spark("j", "k")))
        .crossJoin(F.broadcast(ms))
        .select("m", (F.col("h") % F.col("m")).alias("pos"))
        .distinct()
    )
    bstat = bits.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("bits_set")
    )
    probes = (
        load_table(spark, sf_dir, "customer")
        .select((F.lit(_BS_PROBE_OFFSET) + F.col("c_custkey")).alias("k"))
        .distinct()
        .join(members, "k", "left_anti")
    )
    verdicts = (
        probes.crossJoin(F.broadcast(hs))
        .withColumn("h", F.expr(_h_spark("j", "k")))
        .crossJoin(F.broadcast(ms))
        .select("m", "k", (F.col("h") % F.col("m")).alias("pos"))
        .join(F.broadcast(bits.withColumn("hit", F.lit(1))), ["m", "pos"], "left")
        .groupBy("m", "k")
        .agg((F.count("hit") == _BS_K).alias("bloom_hit"))
    )
    vstat = verdicts.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_pos"),
    )
    nm = members.agg(F.count(F.lit(1)).cast("bigint").alias("n_inserted"))
    return (
        vstat.join(bstat, "m")
        .crossJoin(F.broadcast(nm))
        .select(
            F.col("m").cast("bigint").alias("m_bits"),
            F.lit(_BS_K).cast("bigint").alias("k_hashes"),
            "n_inserted",
            "bits_set",
            F.expr("cast(bits_set * 1000000 div m as bigint)").alias(
                "load_ppm"
            ),
            "n_probes",
            "n_false_pos",
            F.expr(
                "cast(n_false_pos * 1000000 div n_probes as bigint)"
            ).alias("fpr_ppm"),
            F.expr(
                "cast(cast(bits_set as decimal(38,0)) * bits_set * bits_set"
                " * 1000000"
                " div (cast(m as decimal(38,0)) * m * m) as bigint)"
            ).alias("predicted_fpr_ppm"),
        )
    )


sketch_bloom_size_sweep.__doc__ = sketch_bloom_size_sweep.__doc__.replace(
    "{ms}", "{" + ", ".join(str(m) for m in _BS_MS) + "}"
)
