"""HyperLogLog precision sweep (round 12): distinct-user estimate
error at three register counts (m = 16 / 64 / 256) — the memory/
accuracy dial of THE production distinct-count sketch (every HLL
deployment picks a precision p = log₂m; this is the measured curve
next to the 1.04/√m theoretical standard error, with the small-range
correction rung applied per size exactly as the certified
``sketch_hll_bias_corrected`` does).

One pass: each row hashes once (the registered 60-bit ``hll8_`` md5
contract, `sketches_ext.py`), then fans map-side across the 3-row
(m, p, α·m²·2^p·1000, 2.5m threshold, theoretical-SE) dim — bucket =
h mod m, w = h div m, ρ = p − bitlength(w) with p = 61 − log₂m (the
registered 53-for-m=256 generalized) — into one (m, bucket) max-ρ
aggregate and one per-m harmonic sum. Registers are BIGINT-exact;
per m the only float ops are the certified ones: the single α-numerator
division (rounded to milli) and, on the small-range branch, the
m·ln(m/V) linear-counting estimate — branch taken on the INTEGER
rounded estimate so both engines agree bit-for-bit.

err_ppm compares the rounded integer estimate against exact truth in
exact integer arithmetic (DECIMAL(38,0)/HUGEINT products — the round-12
widening discipline); theoretical_se_ppm = ⌊1.04/√m·10⁶⌋ is a frozen
integer literal per size.

Scale: per-m state is m registers regardless of corpus size; both
aggregates are map-side combinable; the 3× row fan-out happens before
the FIRST aggregate, so shuffle bytes are 3·(m+1) register rows, not
corpus rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.literals import values_frame
from ..sources.parquet import load_table
from .registry import register
from .sketches_ext import _H60_SPARK, _H60_SQL

# (m, alpha): Flajolet's constants — tabulated below 128, the
# 0.7213/(1 + 1.079/m) form at 128+
_HLL_SWEEP = [(16, 0.673), (64, 0.709), (256, 0.7213 / (1.0 + 1.079 / 256))]


def _dims() -> list[tuple[int, int, float, int, int]]:
    """(m, p, numerator, small_milli, se_ppm) per sweep size."""
    out = []
    for m, alpha in _HLL_SWEEP:
        p = 61 - int(math.log2(m))  # 53 at m=256, the registered constant
        num = alpha * m * m * float(1 << p) * 1000.0
        out.append((m, p, num, 2500 * m, int(1.04 / math.sqrt(m) * 1e6)))
    return out


@register(
    "sketch_hll_precision_sweep",
    oracle=f"""
    WITH ms(m, p, num, small_milli, se_ppm) AS (
      VALUES {", ".join(f"({m}, {p}, {num!r}, {sm}, {se})"
                        for m, p, num, sm, se in _dims())}
    ),
    h AS (SELECT {_H60_SQL} AS hv FROM events),
    r AS (
      SELECT ms.m, ms.p, ms.num, ms.small_milli, ms.se_ppm,
             hv % ms.m AS bucket,
             CASE WHEN hv // ms.m = 0 THEN ms.p
                  ELSE ms.p - length(bin(hv // ms.m)) END AS rho
      FROM h CROSS JOIN ms
    ),
    regs AS (
      SELECT m, p, num, small_milli, se_ppm, bucket, max(rho) AS mr
      FROM r GROUP BY 1, 2, 3, 4, 5, 6
    ),
    agg AS (
      SELECT m, num, small_milli, se_ppm,
             CAST(m - count(*) AS BIGINT) AS n_empty,
             CAST(sum(1::BIGINT << (p - mr))
                  + (m - count(*)) * (1::BIGINT << p) AS BIGINT) AS s_int
      FROM regs GROUP BY m, p, num, small_milli, se_ppm
    ),
    raw AS (
      SELECT m, small_milli, se_ppm, n_empty,
             CAST(round(num / s_int) AS BIGINT) AS est_raw_milli
      FROM agg
    ),
    est AS (
      SELECT m, se_ppm, n_empty,
             CASE WHEN est_raw_milli <= small_milli * 1000 AND n_empty > 0
                  THEN 'linear_counting' ELSE 'raw' END AS method,
             CASE WHEN est_raw_milli <= small_milli * 1000 AND n_empty > 0
                  THEN CAST(round(1000 * m *
                       ln(CAST(m AS DOUBLE) / n_empty)) AS BIGINT)
                  ELSE est_raw_milli END AS est_milli
      FROM raw
    ),
    ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
           FROM events)
    SELECT CAST(e.m AS BIGINT) AS m_registers, e.method, e.est_milli,
           x.exact_distinct,
           CAST(CAST(abs(e.est_milli - 1000 * x.exact_distinct) AS HUGEINT)
                * 1000 // x.exact_distinct AS BIGINT) AS err_ppm,
           CAST(e.se_ppm AS BIGINT) AS theoretical_se_ppm
    FROM est e CROSS JOIN ex x
    """,
)
def sketch_hll_precision_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per register count {ms}: the bias-corrected HLL distinct-user
    estimate (milli), the rung that answered, exact truth, measured
    error in exact ppm, and the 1.04/√m theoretical standard error.
    Module docstring has the one-pass fan-out, certified-float, and
    widening contracts."""
    ms = values_frame(
        spark,
        _dims(),
        "m long, p long, num double, small_milli long, se_ppm long",
    )
    h = load_table(spark, sf_dir, "events").select(
        F.expr(_H60_SPARK).alias("hv"), "user_id"
    )
    r = h.crossJoin(F.broadcast(ms)).select(
        "m",
        "p",
        "num",
        "small_milli",
        "se_ppm",
        (F.col("hv") % F.col("m")).alias("bucket"),
        F.expr(
            "case when hv div m = 0 then p"
            " else p - length(bin(hv div m)) end"
        ).alias("rho"),
    )
    regs = r.groupBy("m", "p", "num", "small_milli", "se_ppm", "bucket").agg(
        F.max("rho").alias("mr")
    )
    agg = regs.groupBy("m", "p", "num", "small_milli", "se_ppm").agg(
        F.expr("cast(first(m) - count(1) as bigint)").alias("n_empty"),
        F.expr(
            "cast(sum(shiftleft(1L, cast(p - mr as int)))"
            " + (first(m) - count(1)) * shiftleft(1L, cast(first(p) as int))"
            " as bigint)"
        ).alias("s_int"),
    )
    raw = agg.select(
        "m",
        "small_milli",
        "se_ppm",
        "n_empty",
        F.expr("cast(round(num / s_int) as bigint)").alias("est_raw_milli"),
    )
    est = raw.select(
        "m",
        "se_ppm",
        "n_empty",
        F.expr(
            "case when est_raw_milli <= small_milli * 1000 and n_empty > 0"
            " then 'linear_counting' else 'raw' end"
        ).alias("method"),
        F.expr(
            "case when est_raw_milli <= small_milli * 1000 and n_empty > 0"
            " then cast(round(1000 * m * ln(cast(m as double) / n_empty))"
            "      as bigint)"
            " else est_raw_milli end"
        ).alias("est_milli"),
    )
    ex = h.agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return est.crossJoin(F.broadcast(ex)).select(
        F.col("m").cast("bigint").alias("m_registers"),
        "method",
        "est_milli",
        "exact_distinct",
        F.expr(
            "cast(cast(abs(est_milli - 1000 * exact_distinct)"
            " as decimal(38,0)) * 1000 div exact_distinct as bigint)"
        ).alias("err_ppm"),
        F.col("se_ppm").cast("bigint").alias("theoretical_se_ppm"),
    )


sketch_hll_precision_sweep.__doc__ = sketch_hll_precision_sweep.__doc__.replace(
    "{ms}", "/".join(str(m) for m, _a in _HLL_SWEEP)
)
