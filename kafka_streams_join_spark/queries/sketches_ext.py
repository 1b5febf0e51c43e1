"""HyperLogLog with EXACT register parity (round 8) — completes the
mergeable-sketch family (quantile histogram, count-min, Bloom, KMV,
theta, AMS F2, linear counting… and now the cardinality workhorse).

Spark ships HLL behind ``approx_count_distinct``, but its binary sketch
is engine-private — useless for cross-engine certification. This query
builds the REAL thing from first principles so every register value is
an integer both engines must agree on bit-for-bit:

- hash: the repo's 60-bit md5 prefix of the salted user id;
- bucket: low 8 bits (m = 256 registers);
- rho: leading-zero count of the remaining 52-bit window + 1, computed
  EXACTLY as ``53 − length(bin(w))`` (no float log2 anywhere — both
  engines render ``bin()`` without leading zeros);
- register: ``max(rho)`` per bucket, and the ``__all__`` scope is
  ``max`` of the per-type registers — the HLL MERGE LAW executed as a
  visible aggregate, which is what makes this a sketch a combiner can
  hold at any fan-in;
- harmonic sum: Σ 2^(−M_j) scaled by 2^53 into pure BIGINT
  (``1L << (53 − M)``; unset registers contribute 2^53 each), so the
  one float operation in the whole query is the final α·m²/S division.

``est_milli`` is the raw HLL estimator (×1000); the small-range
linear-counting rung is registered separately as
``sketch_linear_counting``. ``exact_distinct`` rides along to show the
estimator's error against truth, exactly like that query.

Scale: two map-side-combinable aggregates collapse any corpus to
≤ 256·(n_types+1) register rows; per-scope state is 256 six-bit
registers NO MATTER the row count — that cap is the sketch's memory
contract and the reason this runs at 100 TB where exact distinct
shuffles every user id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_HLL_M = 256
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
# α·m²·2^53·1000 — the whole numerator of est_milli, one double literal
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << 53) * 1000.0

_H60_SPARK = (
    "cast(conv(substring(md5(concat('hll8_', cast(user_id as string))),"
    " 1, 15), 16, 10) as bigint)"
)
_H60_SQL = (
    "CAST(('0x' || substr(md5('hll8_' || CAST(user_id AS VARCHAR)), 1, 15))"
    " AS BIGINT)"
)


@register(
    "sketch_hll_registers",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             {_H60_SQL} % {_HLL_M} AS bucket,
             {_H60_SQL} // {_HLL_M} AS w
      FROM events
    ),
    r AS (
      SELECT event_type, bucket,
             CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END AS rho
      FROM b
    ),
    regs_t AS (
      SELECT event_type AS scope, bucket, max(rho) AS m
      FROM r GROUP BY 1, 2
    ),
    regs_a AS (
      SELECT '__all__' AS scope, bucket, max(m) AS m
      FROM regs_t GROUP BY bucket
    ),
    regs AS (SELECT * FROM regs_t UNION ALL SELECT * FROM regs_a),
    agg AS (
      SELECT scope,
             CAST(count(*) AS BIGINT) AS n_buckets_set,
             CAST(sum(1::BIGINT << (53 - m))
                  + ({_HLL_M} - count(*)) * (1::BIGINT << 53)
                  AS BIGINT) AS s_int
      FROM regs GROUP BY scope
    ),
    ex AS (
      SELECT event_type AS scope,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY 1
      UNION ALL
      SELECT '__all__', CAST(count(DISTINCT user_id) AS BIGINT) FROM events
    )
    SELECT a.scope, a.n_buckets_set, a.s_int,
           CAST(round(({_HLL_NUM!r}) / a.s_int) AS BIGINT) AS est_milli,
           e.exact_distinct
    FROM agg a JOIN ex e ON e.scope = a.scope
    """,
)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register-exact HyperLogLog distinct-user estimate per event type
    plus the merged ``__all__`` scope (max-of-registers — the merge law
    as a visible aggregate). The module docstring carries the full
    integer-register contract; the only float op is the final α·m²/S
    division, on a BIGINT-exact harmonic sum.

    Scale: per-scope state is {_HLL_M} registers regardless of corpus
    size; both aggregates are map-side combinable."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"{_H60_SPARK} % {_HLL_M}").alias("bucket"),
        F.expr(f"{_H60_SPARK} div {_HLL_M}").alias("w"),
        "user_id",
    ).select(
        "event_type",
        "bucket",
        F.expr(
            "case when w = 0 then 53"
            " else cast(53 - length(bin(w)) as int) end"
        ).alias("rho"),
        "user_id",
    )
    regs_t = ev.groupBy(
        F.col("event_type").alias("scope"), "bucket"
    ).agg(F.max("rho").alias("m"))
    regs_a = regs_t.groupBy("bucket").agg(F.max("m").alias("m")).select(
        F.lit("__all__").alias("scope"), "bucket", "m"
    )
    regs = regs_t.unionByName(regs_a)
    agg = regs.groupBy("scope").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets_set"),
        F.expr(
            f"cast(sum(shiftleft(cast(1 as bigint), 53 - m))"
            f" + ({_HLL_M} - count(1)) * shiftleft(cast(1 as bigint), 53)"
            " as bigint)"
        ).alias("s_int"),
    )
    ex_t = load_table(spark, sf_dir, "events").groupBy(
        F.col("event_type").alias("scope")
    ).agg(F.countDistinct("user_id").cast("bigint").alias("exact_distinct"))
    ex_a = (
        load_table(spark, sf_dir, "events")
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_distinct"))
        .select(F.lit("__all__").alias("scope"), "exact_distinct")
    )
    ex = ex_t.unionByName(ex_a)
    return agg.join(ex, "scope").select(
        "scope",
        "n_buckets_set",
        "s_int",
        F.expr(f"cast(round(({_HLL_NUM!r}) / s_int) as bigint)").alias(
            "est_milli"
        ),
        "exact_distinct",
    )


# --------------------------------------------------------------------------
# sketch_hll_bias_corrected — the small-range decision rung (round 9)
# --------------------------------------------------------------------------

# threshold in est_milli units: correct below 2.5·m (Flajolet's small-range
# rule), an exact integer compare on the already-certified rounded estimate
_HLL_SMALL_MILLI = int(2.5 * _HLL_M) * 1000


@register(
    "sketch_hll_bias_corrected",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             {_H60_SQL} % {_HLL_M} AS bucket,
             {_H60_SQL} // {_HLL_M} AS w
      FROM events
    ),
    r AS (
      SELECT event_type, bucket,
             CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END AS rho
      FROM b
    ),
    regs_t AS (
      SELECT event_type AS scope, bucket, max(rho) AS m
      FROM r GROUP BY 1, 2
    ),
    regs_a AS (
      SELECT '__all__' AS scope, bucket, max(m) AS m
      FROM regs_t GROUP BY bucket
    ),
    regs AS (SELECT * FROM regs_t UNION ALL SELECT * FROM regs_a),
    agg AS (
      SELECT scope,
             CAST({_HLL_M} - count(*) AS BIGINT) AS n_empty,
             CAST(sum(1::BIGINT << (53 - m))
                  + ({_HLL_M} - count(*)) * (1::BIGINT << 53)
                  AS BIGINT) AS s_int
      FROM regs GROUP BY scope
    ),
    raw AS (
      SELECT scope, n_empty,
             CAST(round(({_HLL_NUM!r}) / s_int) AS BIGINT) AS est_raw_milli
      FROM agg
    ),
    ex AS (
      SELECT event_type AS scope,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY 1
      UNION ALL
      SELECT '__all__', CAST(count(DISTINCT user_id) AS BIGINT) FROM events
    )
    SELECT r.scope, r.n_empty, r.est_raw_milli,
           CASE WHEN r.est_raw_milli <= {_HLL_SMALL_MILLI} AND r.n_empty > 0
                THEN 'linear_counting' ELSE 'raw' END AS method,
           CASE WHEN r.est_raw_milli <= {_HLL_SMALL_MILLI} AND r.n_empty > 0
                THEN CAST(round(1000 * {_HLL_M} *
                     ln(CAST({_HLL_M} AS DOUBLE) / r.n_empty)) AS BIGINT)
                ELSE r.est_raw_milli END AS est_milli,
           e.exact_distinct
    FROM raw r JOIN ex e ON e.scope = r.scope
    """,
)
def sketch_hll_bias_corrected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog with the SMALL-RANGE CORRECTION rung wired in (round
    9): below Flajolet's 2.5·m threshold the raw αm²/S estimator
    overestimates badly by design, so the estimator switches to linear
    counting on the EMPTY-register count (m·ln(m/V)) — the decision the
    production HLL/HLL++ papers specify, executed here as an integer
    compare on the certified rounded raw estimate so both engines take
    the same branch bit-for-bit. ``method`` exposes which rung answered;
    ``exact_distinct`` rides along as truth. Composes the two certified
    pieces: ``sketch_hll_registers`` (raw registers) and
    ``sketch_linear_counting`` (occupancy estimator).

    Scale: identical register pipeline — per-scope state is {_HLL_M}
    registers regardless of corpus size, both aggregates map-side
    combinable; the correction itself is constant-time per scope."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"{_H60_SPARK} % {_HLL_M}").alias("bucket"),
        F.expr(f"{_H60_SPARK} div {_HLL_M}").alias("w"),
        "user_id",
    ).select(
        "event_type",
        "bucket",
        F.expr(
            "case when w = 0 then 53"
            " else cast(53 - length(bin(w)) as int) end"
        ).alias("rho"),
        "user_id",
    )
    regs_t = ev.groupBy(
        F.col("event_type").alias("scope"), "bucket"
    ).agg(F.max("rho").alias("m"))
    regs_a = regs_t.groupBy("bucket").agg(F.max("m").alias("m")).select(
        F.lit("__all__").alias("scope"), "bucket", "m"
    )
    regs = regs_t.unionByName(regs_a)
    agg = regs.groupBy("scope").agg(
        F.expr(f"cast({_HLL_M} - count(1) as bigint)").alias("n_empty"),
        F.expr(
            f"cast(sum(shiftleft(cast(1 as bigint), 53 - m))"
            f" + ({_HLL_M} - count(1)) * shiftleft(cast(1 as bigint), 53)"
            " as bigint)"
        ).alias("s_int"),
    )
    raw = agg.select(
        "scope",
        "n_empty",
        F.expr(f"cast(round(({_HLL_NUM!r}) / s_int) as bigint)").alias(
            "est_raw_milli"
        ),
    )
    ex_t = load_table(spark, sf_dir, "events").groupBy(
        F.col("event_type").alias("scope")
    ).agg(F.countDistinct("user_id").cast("bigint").alias("exact_distinct"))
    ex_a = (
        load_table(spark, sf_dir, "events")
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_distinct"))
        .select(F.lit("__all__").alias("scope"), "exact_distinct")
    )
    ex = ex_t.unionByName(ex_a)
    small = f"est_raw_milli <= {_HLL_SMALL_MILLI} and n_empty > 0"
    return raw.join(ex, "scope").select(
        "scope",
        "n_empty",
        "est_raw_milli",
        F.expr(
            f"case when {small} then 'linear_counting' else 'raw' end"
        ).alias("method"),
        F.expr(
            f"case when {small}"
            f" then cast(round(1000 * {_HLL_M}"
            f" * ln(cast({_HLL_M} as double) / n_empty)) as bigint)"
            " else est_raw_milli end"
        ).alias("est_milli"),
        "exact_distinct",
    )
