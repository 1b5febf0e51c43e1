"""Mergeable summary sketches (round 6): quantile histogram rollup,
count-min frequency sketch, Bloom membership filter.

``agg_sketch_rollup`` (relational.py) establishes the repo's sketch
contract with Spark's built-in HLL: per-group sketches UNION into
super-group sketches instead of rescanning raw rows. This module adds the
other three sketch families a 100 TB pipeline keeps next to HLL — each
built from scratch as deterministic DataFrame arithmetic so the DuckDB
oracle can replay it bit-for-bit (no approximate-library black boxes; the
md5-hex→BIGINT hash is the repo's 60-bit ``text_fingerprint`` contract):

- QUANTILE: a fixed-width histogram — the simplest mergeable quantile
  sketch (bins sum across groups exactly like t-digest centroids merge);
  per-type sketches roll up to the global sketch by SUMMING BINS, and the
  oracle certifies both the estimates and their distance from the exact
  interpolated percentiles.
- FREQUENCY: count-min (Cormode & Muthukrishnan '05), a depth×width
  counter grid; per-partition grids merge by cell-wise addition (here:
  one aggregate with map-side combine IS that merge).
- MEMBERSHIP: a Bloom filter as a distinct-bit-position set; the union of
  per-partition bit sets is the merge. The probe side proves the classic
  contract on real data: zero false negatives, measured false-positive
  rate in exact ppm.

Scale design: every sketch is O(sketch-size) state (128 bins / 256 cells
/ 4096 bits) aggregated with map-side combine — the corpus contributes
one scan each, nothing corpus-sized ever shuffles, and rollups touch only
sketch-sized frames (broadcast everywhere they join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..functions.literals import values_frame
from ..sources.parquet import load_table
from .registry import register

# --------------------------------------------------------------------------
# agg_quantile_sketch_rollup — mergeable fixed-bin quantile histogram
# --------------------------------------------------------------------------

_QH_BINS = 128
_QH_QS = (500_000, 900_000, 990_000)  # quantiles in ppm: p50, p90, p99

# deterministic bin id: IEEE double arithmetic written identically in both
# engines (min/max are exact order-insensitive aggregates, so the inputs
# match bit-for-bit and the same expression tree yields the same bin)
_QH_BIN = (
    f"least({_QH_BINS - 1}, CAST(floor((value - vmin) / (vmax - vmin)"
    f" * {_QH_BINS}) AS INTEGER))"
)


def _qh_oracle() -> str:
    qlist = ", ".join(str(q) for q in _QH_QS)
    exacts = []
    for scope_sel, grp in (("event_type", "GROUP BY 1"), ("'ALL'", "")):
        for q in _QH_QS:
            exacts.append(
                f"SELECT {scope_sel} AS scope, {q} AS q_ppm,"
                f" round(quantile_cont(value, {q / 1_000_000!r}), 6) AS exact"
                f" FROM events {grp}"
            )
    exact_sql = " UNION ALL ".join(exacts)
    return f"""
    WITH rng AS (
      SELECT min(value) AS vmin, max(value) AS vmax,
             (max(value) - min(value)) / {_QH_BINS} AS width
      FROM events
    ),
    binned AS (
      SELECT event_type, {_QH_BIN} AS bin FROM events, rng
    ),
    per_type AS (
      SELECT event_type AS scope, bin, count(*) AS cnt
      FROM binned GROUP BY 1, 2
    ),
    merged AS (
      SELECT 'ALL' AS scope, bin, CAST(sum(cnt) AS BIGINT) AS cnt
      FROM per_type GROUP BY bin
    ),
    sk AS (SELECT * FROM per_type UNION ALL SELECT * FROM merged),
    cum AS (
      SELECT scope, bin, cnt,
             sum(cnt) OVER (PARTITION BY scope ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY scope) AS n,
             coalesce(sum(cnt) OVER (PARTITION BY scope ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prev_cum
      FROM sk
    ),
    targets AS (SELECT unnest([{qlist}]) AS q_ppm),
    cov AS (
      SELECT c.scope, t.q_ppm, min(c.bin) AS bin
      FROM cum c CROSS JOIN targets t
      WHERE c.cum >= t.q_ppm / 1000000.0 * c.n
      GROUP BY 1, 2
    ),
    est AS (
      SELECT v.scope, v.q_ppm,
             round(r.vmin + c.bin * r.width
                   + (v.q_ppm / 1000000.0 * c.n - c.prev_cum)
                     / c.cnt * r.width, 6) AS est
      FROM cov v
      JOIN cum c ON c.scope = v.scope AND c.bin = v.bin
      CROSS JOIN rng r
    ),
    exact AS ({exact_sql})
    SELECT e.scope, e.q_ppm, e.est, x.exact,
           CAST(round(abs(e.est - x.exact), 6)
                  <= round((SELECT width FROM rng), 6) AS INTEGER)
             AS within_one_bin
    FROM est e JOIN exact x ON x.scope = e.scope AND x.q_ppm = e.q_ppm
    """


@register("agg_quantile_sketch_rollup", oracle=_qh_oracle())
def agg_quantile_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: build one {_QH_BINS}-bin fixed-width
    histogram per event_type (the sketch table a deployment materializes),
    roll up to the global sketch by SUMMING BINS — never rescanning raw
    rows — and read p50/p90/p99 off each sketch by interpolating inside
    the covering bin. The oracle certifies every estimate AND that each
    lands within one bin width of the exact interpolated percentile (the
    sketch's error bound as a regression canary; the estimates themselves
    are hash-exact, unlike a data-adaptive t-digest whose layout no other
    engine can replay).

    Scale: bins are O({_QH_BINS}·types) state with map-side combine; the
    rollup and every quantile read touch only sketch-sized frames. The two
    corpus scans (range + binning) are the fixed-range histogram's classic
    cost.

    The one-bin error bound assumes the covering bin's neighborhood is
    populated; a SPARSE tail (p99 of a small group, empty bins between
    order stats) can exceed it — that is precisely what the flag reports
    (a 0 on a big dense corpus means the binning drifted; a 0 on a tiny
    group's p99 means "this group needs the exact path"). The flag value
    itself is deterministic and hash-certified either way."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    rng = _staged(
        ev.agg(
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            ((F.max("value") - F.min("value")) / _QH_BINS).alias("width"),
        )
    )
    binned = ev.crossJoin(F.broadcast(rng)).select(
        "event_type", F.expr(_QH_BIN).alias("bin")
    )
    per_type = _staged(
        binned.groupBy(F.col("event_type").alias("scope"), "bin").agg(
            F.count(F.lit(1)).alias("cnt")
        )
    )
    merged = (
        per_type.groupBy("bin")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .select(F.lit("ALL").alias("scope"), "bin", "cnt")
    )
    sk = per_type.unionByName(merged)
    wc = Window.partitionBy("scope").orderBy("bin")
    wp = wc.rowsBetween(Window.unboundedPreceding, -1)
    wn = Window.partitionBy("scope")
    cum = _staged(
        sk.select(
            "scope",
            "bin",
            "cnt",
            F.sum("cnt").over(wc).alias("cum"),
            F.sum("cnt").over(wn).alias("n"),
            F.coalesce(F.sum("cnt").over(wp), F.lit(0)).alias("prev_cum"),
        )
    )
    targets = values_frame(spark, [(q,) for q in _QH_QS], "q_ppm bigint")
    cov = (
        cum.crossJoin(F.broadcast(targets))
        .filter(F.col("cum") >= F.col("q_ppm") / 1e6 * F.col("n"))
        .groupBy("scope", "q_ppm")
        .agg(F.min("bin").alias("bin"))
    )
    est = (
        cov.join(cum, ["scope", "bin"])
        .crossJoin(F.broadcast(rng))
        .select(
            "scope",
            "q_ppm",
            F.round(
                F.col("vmin")
                + F.col("bin") * F.col("width")
                + (F.col("q_ppm") / 1e6 * F.col("n") - F.col("prev_cum"))
                / F.col("cnt")
                * F.col("width"),
                6,
            ).alias("est"),
        )
    )
    exact_parts = []
    for q in _QH_QS:
        pct = F.expr(f"percentile(value, {q / 1_000_000!r})")
        exact_parts.append(
            ev.groupBy(F.col("event_type").alias("scope")).agg(
                F.round(pct, 6).alias("exact")
            ).select("scope", F.lit(q).alias("q_ppm"), "exact")
        )
        exact_parts.append(
            ev.agg(F.round(pct, 6).alias("exact")).select(
                F.lit("ALL").alias("scope"), F.lit(q).alias("q_ppm"), "exact"
            )
        )
    exact = exact_parts[0]
    for p in exact_parts[1:]:
        exact = exact.unionByName(p)
    return (
        est.join(exact, ["scope", "q_ppm"])
        .crossJoin(F.broadcast(rng.select(F.round("width", 6).alias("w6"))))
        .select(
            "scope",
            "q_ppm",
            "est",
            "exact",
            (F.round(F.abs(F.col("est") - F.col("exact")), 6) <= F.col("w6"))
            .cast("int")
            .alias("within_one_bin"),
        )
    )


# --------------------------------------------------------------------------
# agg_count_min_sketch — mergeable frequency sketch with probe audit
# --------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 64
_CMS_PROBE_MOD = 7  # probe users: user_id % 7 == 0 (deterministic subset)


def _cms_h_spark(i: str, key: str) -> str:
    """Row ``i``'s bucket for ``key`` — the 60-bit md5 contract, salted
    by the row index."""
    return (
        f"cast(conv(substring(md5(concat(cast({i} as string), ':',"
        f" cast({key} as string))), 1, 15), 16, 10) as bigint)"
        f" % {_CMS_WIDTH}"
    )


def _cms_h_sql(i: str, key: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({i} AS VARCHAR) || ':' ||"
        f" CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT) % {_CMS_WIDTH}"
    )


@register(
    "agg_count_min_sketch",
    oracle=f"""
    WITH hrows AS (SELECT unnest(generate_series(1, {_CMS_DEPTH})) AS i),
    cells AS (
      SELECT i, {_cms_h_sql("i", "user_id")} AS bucket, count(*) AS cnt
      FROM events CROSS JOIN hrows
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT user_id, count(*) AS exact_n FROM events
      WHERE user_id % {_CMS_PROBE_MOD} = 0 GROUP BY user_id
    ),
    est AS (
      SELECT p.user_id, p.exact_n, CAST(min(c.cnt) AS BIGINT) AS est_n
      FROM probes p CROSS JOIN hrows h
      JOIN cells c
        ON c.i = h.i AND c.bucket = {_cms_h_sql("h.i", "p.user_id")}
      GROUP BY p.user_id, p.exact_n
    )
    SELECT user_id, exact_n, est_n,
           CAST(est_n - exact_n AS BIGINT) AS overcount,
           CAST(est_n >= exact_n AS INTEGER) AS never_undercounts
    FROM est
    """,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of per-user event frequencies: a {_CMS_DEPTH}×
    {_CMS_WIDTH} counter grid (each event increments one counter per hash
    row), probed for a deterministic user subset. est = min over rows of
    the addressed counters; the oracle certifies the exact estimates plus
    CMS's one-sided guarantee (never undercounts) on every probe.

    Scale: the grid is 256 cells aggregated with map-side combine —
    per-partition grids cell-wise-add into the global grid, which IS the
    sketch's mergeability (per-day grids roll up the same way). Probes
    join the broadcast grid; the corpus never reshuffles."""
    hrows = spark.range(1, _CMS_DEPTH + 1).select(F.col("id").alias("i"))
    ev = load_table(spark, sf_dir, "events").select("user_id")
    cells = (
        ev.crossJoin(F.broadcast(hrows))
        .groupBy("i", F.expr(_cms_h_spark("i", "user_id")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = (
        ev.filter(F.col("user_id") % _CMS_PROBE_MOD == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    return (
        probes.crossJoin(F.broadcast(hrows))
        .withColumn("bucket", F.expr(_cms_h_spark("i", "user_id")))
        .join(F.broadcast(cells), ["i", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").cast("bigint").alias("est_n"))
        .select(
            "user_id",
            "exact_n",
            "est_n",
            (F.col("est_n") - F.col("exact_n"))
            .cast("bigint")
            .alias("overcount"),
            (F.col("est_n") >= F.col("exact_n"))
            .cast("int")
            .alias("never_undercounts"),
        )
    )


# --------------------------------------------------------------------------
# agg_bloom_membership — Bloom filter build + probe with measured FPR
# --------------------------------------------------------------------------

_BLOOM_M = 4096  # bits
_BLOOM_K = 3  # hash functions


def _bloom_h_spark(j: str, key: str) -> str:
    return (
        f"cast(conv(substring(md5(concat(cast({j} as string), '#',"
        f" cast({key} as string))), 1, 15), 16, 10) as bigint)"
        f" % {_BLOOM_M}"
    )


def _bloom_h_sql(j: str, key: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({j} AS VARCHAR) || '#' ||"
        f" CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT) % {_BLOOM_M}"
    )


@register(
    "agg_bloom_membership",
    oracle=f"""
    WITH hs AS (SELECT unnest(generate_series(1, {_BLOOM_K})) AS j),
    members AS (SELECT DISTINCT o_custkey AS k FROM orders),
    bits AS (
      SELECT DISTINCT {_bloom_h_sql("j", "k")} AS pos
      FROM members CROSS JOIN hs
    ),
    probe AS (
      SELECT c.c_custkey AS k, m.k IS NOT NULL AS is_member
      FROM customer c LEFT JOIN members m ON m.k = c.c_custkey
    ),
    hits AS (
      SELECT p.k, p.is_member, count(b.pos) = {_BLOOM_K} AS bloom_hit
      FROM probe p CROSS JOIN hs h
      LEFT JOIN bits b ON b.pos = {_bloom_h_sql("h.j", "p.k")}
      GROUP BY p.k, p.is_member
    )
    SELECT count(*) AS n_probed,
           CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_members,
           CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hits,
           CAST(sum(CASE WHEN is_member AND NOT bloom_hit THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_neg,
           CAST(sum(CASE WHEN bloom_hit AND NOT is_member THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN bloom_hit AND NOT is_member THEN 1 ELSE 0 END)
                  * 1000000
                // greatest(1, sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END))
                AS BIGINT) AS fpr_ppm
    FROM hits
    """,
)
def agg_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership filter: hash the distinct customers-with-orders
    into a {_BLOOM_M}-bit / {_BLOOM_K}-hash filter (materialized as the
    distinct set of SET bit positions — the union across partitions IS the
    Bloom merge), then probe EVERY customer and report the classic
    contract measured on real data: zero false negatives (certified
    exactly) and the false-positive rate in exact ppm. The data twin of
    the runtime bloom-filter join pruning Spark injects itself
    (tests/test_runtime_filters.py) — built as rows so the oracle can
    replay it.

    Scale: the bit set is ≤{_BLOOM_M} rows and broadcasts; build and probe
    are each one scan of their side with map-side distinct; the rollup is
    one row."""
    hs = spark.range(1, _BLOOM_K + 1).select(F.col("id").alias("j"))
    members = _staged(
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    bits = (
        members.crossJoin(F.broadcast(hs))
        .select(F.expr(_bloom_h_spark("j", "k")).alias("pos"))
        .distinct()
    )
    probe = _staged(
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("k"))
        .join(members.withColumn("m", F.lit(1)), "k", "left")
        .select("k", F.col("m").isNotNull().alias("is_member"))
    )
    hits = (
        probe.crossJoin(F.broadcast(hs))
        .withColumn("pos", F.expr(_bloom_h_spark("j", "k")))
        .join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("k", "is_member")
        .agg((F.count("hit") == _BLOOM_K).alias("bloom_hit"))
    )
    return (
        hits.agg(
            F.count(F.lit(1)).alias("n_probed"),
            F.sum(F.when(F.col("is_member"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_members"),
            F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_hits"),
            F.sum(
                F.when(F.col("is_member") & ~F.col("bloom_hit"), 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("n_false_neg"),
            F.sum(
                F.when(F.col("bloom_hit") & ~F.col("is_member"), 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("n_false_pos"),
            F.sum(F.when(~F.col("is_member"), 1).otherwise(0)).alias("n_non"),
        )
        .select(
            "n_probed",
            "n_members",
            "n_hits",
            "n_false_neg",
            "n_false_pos",
            F.expr(
                "cast(n_false_pos * 1000000 div greatest(1, n_non) as bigint)"
            ).alias("fpr_ppm"),
        )
    )


# --------------------------------------------------------------------------
# agg_kmv_distinct_rollup — mergeable k-minimum-values distinct sketch
# --------------------------------------------------------------------------

_KMV_K = 64
_KMV_SPACE = 1_099_511_627_776  # 2^40 — the 40-bit md5-prefix hash space
# (K-1)·2^40 precomputed: Spark ANSI throws on an INT-literal product
_KMV_NUM = (_KMV_K - 1) * _KMV_SPACE
# 3σ relative-error bound for KMV: 3/sqrt(K-2), in ppm
_KMV_TOL_PPM = int(3 / (_KMV_K - 2) ** 0.5 * 1_000_000)

_KMV_H_SPARK = (
    "cast(conv(substring(md5(cast(c_custkey as string)), 1, 10), 16, 10)"
    " as bigint)"
)
_KMV_H_SQL = (
    "CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 10))"
    " AS BIGINT)"
)


def _kmv_est(n_col: str, kth_col: str) -> str:
    """Estimate expression shared by both engines (Spark spelling; the
    oracle swaps ``div`` for ``//``): exact below K, (K-1)·2^40/h_K at
    and above."""
    return (
        f"CASE WHEN {n_col} < {_KMV_K} THEN {n_col}"
        f" ELSE {_KMV_NUM} div {kth_col} END"
    )


@register(
    "agg_kmv_distinct_rollup",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT n.n_name AS nation, r.r_name AS region,
             {_KMV_H_SQL} AS hv
      FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
    ),
    nat_rnk AS (
      SELECT nation, region, hv,
             row_number() OVER (PARTITION BY nation ORDER BY hv) AS rnk
      FROM h
    ),
    nat_sk AS (SELECT * FROM nat_rnk WHERE rnk <= {_KMV_K}),
    reg_h AS (SELECT DISTINCT region, hv FROM nat_sk),
    reg_rnk AS (
      SELECT region, hv,
             row_number() OVER (PARTITION BY region ORDER BY hv) AS rnk
      FROM reg_h
    ),
    reg_sk AS (SELECT * FROM reg_rnk WHERE rnk <= {_KMV_K}),
    all_h AS (SELECT DISTINCT hv FROM reg_sk),
    all_rnk AS (
      SELECT hv, row_number() OVER (ORDER BY hv) AS rnk FROM all_h
    ),
    all_sk AS (SELECT * FROM all_rnk WHERE rnk <= {_KMV_K}),
    sk AS (
      SELECT 'nation' AS scope_kind, nation AS scope,
             count(*) AS n_sketch, max(hv) AS kth
      FROM nat_sk GROUP BY nation
      UNION ALL
      SELECT 'region', region, count(*), max(hv) FROM reg_sk GROUP BY region
      UNION ALL
      SELECT 'all', 'ALL', count(*), max(hv) FROM all_sk
    ),
    exact AS (
      SELECT 'nation' AS scope_kind, nation AS scope,
             count(DISTINCT hv) AS n_exact
      FROM h GROUP BY nation
      UNION ALL
      SELECT 'region', region, count(DISTINCT hv) FROM h GROUP BY region
      UNION ALL
      SELECT 'all', 'ALL', count(DISTINCT hv) FROM h
    ),
    est AS (
      SELECT s.scope_kind, s.scope, e.n_exact, s.n_sketch,
             CAST({_kmv_est("s.n_sketch", "s.kth").replace(" div ", " // ")}
                  AS BIGINT) AS n_est
      FROM sk s JOIN exact e
        ON e.scope_kind = s.scope_kind AND e.scope = s.scope
    )
    SELECT scope_kind, scope, n_exact, n_sketch, n_est,
           CAST(abs(n_est - n_exact) * 1000000 // n_exact AS BIGINT)
             AS rel_err_ppm,
           CAST(abs(n_est - n_exact) * 1000000 // n_exact
                <= {_KMV_TOL_PPM} AS INT) AS within_3sigma
    FROM est
    """,
)
def agg_kmv_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef '02 / the theta-sketch
    core) with a two-level MERGE: per-nation sketches (the {_KMV_K}
    smallest distinct 40-bit hashes) roll up to region sketches, and the
    region sketches to the global one, by union→distinct→re-min-K — never
    rescanning rows. The merge is EXACT by the min-K theorem (the K
    smallest of a union of per-group K-smallest sets IS the K smallest of
    the union), so unlike the histogram's binning error the rollup
    introduces none; estimate = (K−1)·2^40 / h_K in pure BIGINT
    arithmetic, with the exact count, exact-ppm relative error, and a
    3σ (= {_KMV_TOL_PPM} ppm) tolerance flag certified in-row — the HLL
    contract pattern with an inspectable sketch.

    Scale: the distinct-hash aggregate is the exact-dedup shape; the
    per-nation min-K is a PARTITIONED rank window (Partial+Final
    WindowGroupLimit — each input partition forwards ≤ K rows per nation
    before the shuffle); every rollup above it touches ≤ scopes·K rows.
    The one intentionally single-partition window is the global min-K
    over the ≤ 5·{_KMV_K} region-sketch rows — sketch-sized by
    construction, the documented exemption the meta-gate grants
    bounded frames."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", F.col("n_name").alias("nation")
    )
    reg = load_table(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    h = _staged(
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("nation", "region", F.expr(_KMV_H_SPARK).alias("hv"))
        .distinct()
    )
    w_nat = Window.partitionBy("nation").orderBy("hv")
    nat_sk = _staged(
        h.withColumn("rnk", F.row_number().over(w_nat)).filter(
            F.col("rnk") <= _KMV_K
        )
    )
    w_reg = Window.partitionBy("region").orderBy("hv")
    reg_sk = _staged(
        nat_sk.select("region", "hv")
        .distinct()
        .withColumn("rnk", F.row_number().over(w_reg))
        .filter(F.col("rnk") <= _KMV_K)
    )
    # global min-K over ≤ 5·K rows — bounded, single partition by design
    w_all = Window.orderBy("hv")
    all_sk = (
        reg_sk.select("hv")
        .distinct()
        .withColumn("rnk", F.row_number().over(w_all))
        .filter(F.col("rnk") <= _KMV_K)
    )
    sk = (
        nat_sk.groupBy(F.col("nation").alias("scope"))
        .agg(F.count(F.lit(1)).alias("n_sketch"), F.max("hv").alias("kth"))
        .select(F.lit("nation").alias("scope_kind"), "scope", "n_sketch", "kth")
        .unionByName(
            reg_sk.groupBy(F.col("region").alias("scope"))
            .agg(F.count(F.lit(1)).alias("n_sketch"), F.max("hv").alias("kth"))
            .select(
                F.lit("region").alias("scope_kind"), "scope", "n_sketch", "kth"
            )
        )
        .unionByName(
            all_sk.agg(
                F.count(F.lit(1)).alias("n_sketch"), F.max("hv").alias("kth")
            ).select(
                F.lit("all").alias("scope_kind"),
                F.lit("ALL").alias("scope"),
                "n_sketch",
                "kth",
            )
        )
    )
    exact = (
        h.groupBy(F.col("nation").alias("scope"))
        .agg(F.count_distinct("hv").alias("n_exact"))
        .select(F.lit("nation").alias("scope_kind"), "scope", "n_exact")
        .unionByName(
            h.groupBy(F.col("region").alias("scope"))
            .agg(F.count_distinct("hv").alias("n_exact"))
            .select(F.lit("region").alias("scope_kind"), "scope", "n_exact")
        )
        .unionByName(
            h.agg(F.count_distinct("hv").alias("n_exact")).select(
                F.lit("all").alias("scope_kind"),
                F.lit("ALL").alias("scope"),
                "n_exact",
            )
        )
    )
    est = sk.join(exact, ["scope_kind", "scope"]).withColumn(
        "n_est", F.expr(_kmv_est("n_sketch", "kth")).cast("bigint")
    )
    return est.select(
        "scope_kind",
        "scope",
        "n_exact",
        "n_sketch",
        "n_est",
        F.expr("cast(abs(n_est - n_exact) * 1000000 div n_exact as bigint)")
        .alias("rel_err_ppm"),
        F.expr(
            f"cast(abs(n_est - n_exact) * 1000000 div n_exact"
            f" <= {_KMV_TOL_PPM} as int)"
        ).alias("within_3sigma"),
    )


# --------------------------------------------------------------------------
# sketch_hash_sample_quantiles — mergeable hash-Bernoulli rank sketch (r7)
# --------------------------------------------------------------------------

_HSQ_RATE = 8  # keep 1/8 of rows: hv < 2^40 / 8
_HSQ_CUT = _KMV_SPACE // _HSQ_RATE
_HSQ_H_SPARK = (
    "cast(conv(substring(md5(concat(cast(l_orderkey as string), '-',"
    " cast(l_linenumber as string))), 1, 10), 16, 10) as bigint)"
)
_HSQ_H_SQL = (
    "CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||"
    " CAST(l_linenumber AS VARCHAR)), 1, 10)) AS BIGINT)"
)


@register(
    "sketch_hash_sample_quantiles",
    oracle=f"""
    WITH t AS (
      SELECT l_returnflag AS returnflag, l_extendedprice AS price,
             ({_HSQ_H_SQL} < {_HSQ_CUT}) AS smp
      FROM lineitem
    )
    SELECT returnflag,
           count(*)                                  AS n_total,
           CAST(sum(CASE WHEN smp THEN 1 ELSE 0 END) AS BIGINT) AS n_sample,
           CAST(sum(CASE WHEN smp THEN 1 ELSE 0 END)
                * {_HSQ_RATE} AS BIGINT)             AS est_total,
           CAST(abs(sum(CASE WHEN smp THEN 1 ELSE 0 END) * {_HSQ_RATE}
                    - count(*)) * 1000000 // count(*) AS BIGINT) AS err_ppm,
           round(quantile_cont(CASE WHEN smp THEN price END, 0.5), 4) + 0.0
             AS q50,
           round(quantile_cont(CASE WHEN smp THEN price END, 0.9), 4) + 0.0
             AS q90,
           round(quantile_cont(CASE WHEN smp THEN price END, 0.99), 4) + 0.0
             AS q99
    FROM t
    GROUP BY returnflag
    """,
)
def sketch_hash_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable rank sketch by deterministic hash sampling: keep exactly
    the rows whose 40-bit md5 row-hash falls below 2^40/{_HSQ_RATE} (a
    fixed-universe Bernoulli sample), then take EXACT quantiles over the
    sample per group. The sketch is mergeable by construction — the hash
    filter commutes with union, so sample(A ∪ B) IS sample(A) ∪ sample(B)
    with no compaction step (pytest pins the merge law) — the property
    KLL buys with randomized compactors, bought here with determinism the
    oracle can replay. est_total audits the sampler (n_sample·{_HSQ_RATE}
    vs exact count, integer ppm).

    Scale: one scan, map-side hash + filter; the quantile state per group
    is the sample (1/{_HSQ_RATE} of rows), bounded further in production
    by raising the rate per level of a rollup. No shuffle beyond the
    group-by; quantile interpolation is the engine-shared
    percentile ≡ quantile_cont contract, rounded 4dp."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_extendedprice").alias("price"),
        (F.expr(_HSQ_H_SPARK) < F.lit(_HSQ_CUT)).alias("smp"),
    )
    spr = "CASE WHEN smp THEN price END"
    return li.groupBy("returnflag").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.expr("cast(sum(CASE WHEN smp THEN 1 ELSE 0 END) as bigint)").alias(
            "n_sample"
        ),
        F.expr(
            f"cast(sum(CASE WHEN smp THEN 1 ELSE 0 END) * {_HSQ_RATE}"
            " as bigint)"
        ).alias("est_total"),
        F.expr(
            f"cast(abs(sum(CASE WHEN smp THEN 1 ELSE 0 END) * {_HSQ_RATE}"
            " - count(1)) * 1000000 div count(1) as bigint)"
        ).alias("err_ppm"),
        F.expr(f"round(percentile({spr}, 0.5), 4) + 0.0").alias("q50"),
        F.expr(f"round(percentile({spr}, 0.9), 4) + 0.0").alias("q90"),
        F.expr(f"round(percentile({spr}, 0.99), 4) + 0.0").alias("q99"),
    )


# --------------------------------------------------------------------------
# sketch_theta_intersection — KMV/theta set-intersection estimates (r7)
# --------------------------------------------------------------------------

_THETA_K = 64
_THETA_H_SPARK = (
    "cast(conv(substring(md5(cast(user_id as string)), 1, 10), 16, 10)"
    " as bigint)"
)
_THETA_H_SQL = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 10)) AS BIGINT)"
)


@register(
    "sketch_theta_intersection",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type AS et, {_THETA_H_SQL} AS hv FROM events
    ),
    rnk AS (
      SELECT et, hv, row_number() OVER (PARTITION BY et ORDER BY hv) AS rn
      FROM h
    ),
    sk AS (SELECT et, hv FROM rnk WHERE rn <= {_THETA_K}),
    kth AS (SELECT et, max(hv) AS kth FROM sk GROUP BY et),
    common AS (
      SELECT a.et AS et_a, b.et AS et_b, count(*) AS n_common
      FROM sk a JOIN sk b ON a.hv = b.hv AND a.et < b.et
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT a.et AS et_a, b.et AS et_b, count(*) AS n_exact
      FROM h a JOIN h b ON a.hv = b.hv AND a.et < b.et
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT ka.et AS et_a, kb.et AS et_b,
             CASE WHEN ka.kth < kb.kth THEN ka.kth ELSE kb.kth END AS theta
      FROM kth ka JOIN kth kb ON ka.et < kb.et
    )
    SELECT p.et_a AS type_a, p.et_b AS type_b,
           CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common_sketch,
           CAST(coalesce(c.n_common, 0) * {_KMV_SPACE} // p.theta AS BIGINT)
             AS est_common,
           CAST(coalesce(e.n_exact, 0) AS BIGINT) AS exact_common,
           CAST(abs(coalesce(c.n_common, 0) * {_KMV_SPACE} // p.theta
                    - coalesce(e.n_exact, 0)) * 1000000
                // greatest(1, coalesce(e.n_exact, 0)) AS BIGINT) AS err_ppm
    FROM pairs p
    LEFT JOIN common c ON c.et_a = p.et_a AND c.et_b = p.et_b
    LEFT JOIN exact e ON e.et_a = p.et_a AND e.et_b = p.et_b
    """,
)
def sketch_theta_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set intersection (the KMV estimator of Beyer '07 /
    the DataSketches theta family): per event type, keep the {_THETA_K}
    smallest distinct 40-bit user hashes; for each type pair, θ =
    min(θ_a, θ_b) and est = |common sketch hashes| · 2^40 / θ in pure
    BIGINT — set algebra on constant-size summaries instead of a
    distinct-join over raw rows. exact_common and err_ppm audit the
    estimate (at 100 TB you keep only the sketch columns).

    Scale: sketches build with one WindowGroupLimit pass (per-type top-K
    heaps before the shuffle); every downstream join touches only
    K·|types| sketch rows and the |types|-row θ frame (broadcast). The
    exact audit leg is the only raw-data join and exists solely for the
    oracle-checked error column."""
    from pyspark.sql import Window

    ev = _staged(
        load_table(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("et"), F.expr(_THETA_H_SPARK).alias("hv")
        )
        .distinct()
    )
    w = Window.partitionBy("et").orderBy("hv")
    sk = _staged(
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _THETA_K)
        .select("et", "hv")
    )
    kth = sk.groupBy("et").agg(F.max("hv").alias("kth"))
    sa = sk.select(F.col("et").alias("et_a"), "hv")
    sb = sk.select(F.col("et").alias("et_b"), "hv")
    common = (
        sa.join(sb, "hv")
        .filter(F.col("et_a") < F.col("et_b"))
        .groupBy("et_a", "et_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ha = ev.select(F.col("et").alias("et_a"), "hv")
    hb = ev.select(F.col("et").alias("et_b"), "hv")
    exact = (
        ha.join(hb, "hv")
        .filter(F.col("et_a") < F.col("et_b"))
        .groupBy("et_a", "et_b")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    ka = kth.select(F.col("et").alias("et_a"), F.col("kth").alias("kth_a"))
    kb = kth.select(F.col("et").alias("et_b"), F.col("kth").alias("kth_b"))
    pairs = (
        ka.join(kb, F.col("et_a") < F.col("et_b"))
        .select(
            "et_a",
            "et_b",
            F.least(F.col("kth_a"), F.col("kth_b")).alias("theta"),
        )
    )
    return (
        pairs.join(common, ["et_a", "et_b"], "left")
        .join(exact, ["et_a", "et_b"], "left")
        .select(
            F.col("et_a").alias("type_a"),
            F.col("et_b").alias("type_b"),
            F.expr("cast(coalesce(n_common, 0) as bigint)").alias(
                "n_common_sketch"
            ),
            F.expr(
                f"cast(coalesce(n_common, 0) * {_KMV_SPACE} div theta"
                " as bigint)"
            ).alias("est_common"),
            F.expr("cast(coalesce(n_exact, 0) as bigint)").alias(
                "exact_common"
            ),
            F.expr(
                f"cast(abs(coalesce(n_common, 0) * {_KMV_SPACE} div theta"
                " - coalesce(n_exact, 0)) * 1000000"
                " div greatest(1, coalesce(n_exact, 0)) as bigint)"
            ).alias("err_ppm"),
        )
    )


# --------------------------------------------------------------------------
# sketch_ams_f2 — AMS second-frequency-moment sketch (round 7)
# --------------------------------------------------------------------------

_AMS_R = 16  # independent ±1 counters
_AMS_H_SPARK = (
    "cast(conv(substring(md5(cast(user_id as string)), 1, 10), 16, 10)"
    " as bigint)"
)
_AMS_H_SQL = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 10)) AS BIGINT)"
)


@register(
    "sketch_ams_f2",
    oracle=f"""
    WITH h AS (SELECT {_AMS_H_SQL} AS hv FROM events),
    counters AS (
      SELECT t.j,
             CAST(sum(2 * ((hv >> t.j) & 1) - 1) AS BIGINT) AS z
      FROM h, unnest(generate_series(0, {_AMS_R - 1})) AS t(j)
      GROUP BY t.j
    ),
    est AS (
      SELECT CAST(sum(z * z) // {_AMS_R} AS BIGINT) AS f2_est FROM counters
    ),
    exact AS (
      SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact FROM (
        SELECT count(*) AS c FROM events GROUP BY user_id
      )
    )
    SELECT (SELECT count(*) FROM h) AS n_rows,
           exact.f2_exact, est.f2_est,
           CAST(abs(est.f2_est - exact.f2_exact) * 1000000
                // exact.f2_exact AS BIGINT) AS err_ppm
    FROM est CROSS JOIN exact
    """,
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon-Matias-Szegedy '96):
    {_AMS_R} ±1 counters over the event stream's user ids — sign j is
    md5-hash bit j, counter_j = Σ signs, F2_est = mean of squared
    counters — the join-size/self-join-size estimator that completes the
    classical sketch family (distinct: HLL/KMV, quantiles: histogram +
    hash-sample, frequency: count-min, membership: Bloom, moments: AMS).
    Mergeable by construction: counters are SUMS, so partition/partial
    merge is ordinary addition (the map-side combine IS the merge);
    everything is exact BIGINT, and the exact-F2 audit leg feeds err_ppm.

    Scale: the sketch is one {_AMS_R}-way explode + map-side-combined
    sum (constant state); only the audit leg aggregates per user."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(_AMS_H_SPARK).alias("hv")
    )
    counters = (
        ev.select(
            "hv",
            F.explode(
                F.array(*[F.lit(j) for j in range(_AMS_R)])
            ).alias("j"),
        )
        .groupBy("j")
        .agg(
            F.expr("cast(sum(2 * ((hv >> j) & 1) - 1) as bigint)").alias("z")
        )
    )
    est = counters.agg(
        F.expr(f"cast(sum(z * z) div {_AMS_R} as bigint)").alias("f2_est")
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.expr("cast(sum(c * c) as bigint)").alias("f2_exact"))
    )
    n = ev.agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        n.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(est))
        .select(
            "n_rows",
            "f2_exact",
            "f2_est",
            F.expr(
                "cast(abs(f2_est - f2_exact) * 1000000 div f2_exact"
                " as bigint)"
            ).alias("err_ppm"),
        )
    )


# --------------------------------------------------------------------------
# sketch_linear_counting — bitmap distinct estimator with an EXACT merge law
# --------------------------------------------------------------------------

_LC_M = 65536  # bitmap width; load factor stays <1 up to ~50k distinct/group

_LC_BUCKET_SPARK = (
    "cast(conv(substring(md5(cast(user_id as string)), 1, 10), 16, 10)"
    f" % {_LC_M} as bigint)"
)
_LC_BUCKET_SQL = (
    "CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 10)"
    f" AS BIGINT) % {_LC_M} AS BIGINT)"
)


@register(
    "sketch_linear_counting",
    oracle=f"""
    SELECT CASE WHEN grouping(event_type) = 1 THEN '__all__'
                ELSE event_type END AS scope,
           CAST(count(DISTINCT {_LC_BUCKET_SQL}) AS BIGINT) AS n_bits_set,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           CAST(round({_LC_M}.0 * ln({_LC_M}.0 /
                ({_LC_M}.0 - least(count(DISTINCT {_LC_BUCKET_SQL}),
                                   {_LC_M - 1}))) * 1000)
                AS BIGINT) AS est_milli
    FROM events
    GROUP BY GROUPING SETS ((event_type), ())
    """,
)
def sketch_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-counting distinct-user sketch per event type plus the
    merged ``__all__`` scope: the sketch is the SET OF SET BITS (40-bit
    md5-prefix hash mod m={_LC_M}), the estimator is m·ln(m/(m−b)), and —
    unlike probabilistic accuracy — the MERGE LAW IS EXACT: the union
    scope's bit set is precisely the union of the per-type bit sets
    (distinct-of-union ≡ union-of-distincts), which is what makes this a
    mergeable sketch a combiner can hold. ``exact_distinct`` rides along
    so the report shows the estimator's error against truth. Single ln()
    call rounded to milli; D-suffix-free because the DataFrame-side
    literal is a Python float, and the oracle writes {_LC_M}.0.

    Scale: one Expand (grouping-sets) pass + a distinct-aggregate shuffle
    keyed on (scope, bucket) — bucket cardinality caps the per-scope
    state at m bits regardless of row count; that cap IS the sketch's
    memory contract. Saturated bitmaps clamp to b = m−1 on BOTH sides
    (round 8): est_milli saturates at m·ln(m)·1000 ≈ 727.6M instead of
    ln(inf) aborting the whole sweep under ANSI — the saturation is
    visible as n_bits_set = m next to the ceilinged estimate, which is
    the cue to move to the wider-m rung."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(_LC_BUCKET_SPARK).alias("bucket"),
        "user_id",
    )
    m = float(_LC_M)
    return (
        ev.cube("event_type")
        .agg(
            F.grouping("event_type").alias("__g"),
            F.countDistinct("bucket").alias("n_bits_set"),
            F.countDistinct("user_id").alias("exact_distinct"),
        )
        .select(
            F.when(F.col("__g") == 1, F.lit("__all__"))
            .otherwise(F.col("event_type"))
            .alias("scope"),
            F.col("n_bits_set").cast("bigint").alias("n_bits_set"),
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
            F.round(
                F.lit(m)
                * F.log(
                    F.lit(m)
                    / (
                        F.lit(m)
                        - F.least(F.col("n_bits_set"), F.lit(_LC_M - 1))
                    )
                )
                * 1000
            )
            .cast("bigint")
            .alias("est_milli"),
        )
    )
