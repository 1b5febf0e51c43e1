"""Sample-rate accuracy sweep (round 12): the hash-Bernoulli rank
sketch of ``sketch_hash_sample_quantiles`` evaluated at three sampling
rates (1/8, 1/64, 1/512) in one pass — the space/accuracy dial every
sampling-based profiler tunes (a 1/512 sample is 64× cheaper to hold
than 1/8; this report shows what that costs in estimate quality,
measured on real data next to the exact answer).

Rates NEST by construction: the keep sets are hv < 2⁴⁰/R on the same
40-bit md5 row hash, so sample(1/512) ⊆ sample(1/64) ⊆ sample(1/8) —
one hash per row feeds all three rates as conditional aggregates in the
SAME combinable pass (the sweep is free, like every dial in this
round), and the nesting is what a production rollup exploits (raise the
rate per level by tightening the cut, no resample).

Per rate: exact sample size, the Horvitz–Thompson count estimate
n_sample·R with its exact-integer ppm error against the true count, and
the sample median next to the exact median (both through the certified
percentile ≡ quantile_cont 4-dp contract — reported side by side, never
subtracted, so no float difference crosses engines).

Scale: one scan, map-side hash + conditional projections, ONE
combinable aggregate to one row, a 3-row stack. Nothing data-sized
crosses any Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register
from .sketches import _HSQ_H_SPARK, _HSQ_H_SQL, _KMV_SPACE

_RATES = (8, 64, 512)


@register(
    "sketch_sample_rate_sweep",
    oracle=f"""
    WITH t AS (
      SELECT l_extendedprice AS price, {_HSQ_H_SQL} AS hv FROM lineitem
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_total,
             round(quantile_cont(price, 0.5), 4) + 0.0 AS q50_exact,
             {", ".join(
                 f"CAST(sum(CASE WHEN hv < {_KMV_SPACE // r} THEN 1 ELSE 0"
                 f" END) AS BIGINT) AS n{i},"
                 f" round(quantile_cont(CASE WHEN hv < {_KMV_SPACE // r}"
                 f" THEN price END, 0.5), 4) + 0.0 AS q{i}"
                 for i, r in enumerate(_RATES)
             )}
      FROM t
    ),
    rows_ AS (
      {" UNION ALL ".join(
          f"SELECT CAST({r} AS BIGINT) AS rate, n_total, n{i} AS n_sample,"
          f" q{i} AS q50_sample, q50_exact FROM m"
          for i, r in enumerate(_RATES)
      )}
    )
    SELECT rate, n_total, n_sample,
           CAST(n_sample * rate AS BIGINT) AS est_total,
           CAST(CAST(abs(n_sample * rate - n_total) AS HUGEINT) * 1000000
                // n_total AS BIGINT) AS count_err_ppm,
           q50_sample, q50_exact
    FROM rows_
    """,
)
def sketch_sample_rate_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per sampling rate 1/{rates}: sample size, Horvitz–Thompson count
    estimate with exact ppm error, and the sample median beside the
    exact median — one scan, one aggregate, nested samples. Module
    docstring has the nesting, side-by-side, and single-pass
    contracts."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("price"),
        F.expr(_HSQ_H_SPARK).alias("hv"),
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.expr("round(percentile(price, 0.5), 4) + 0.0").alias("q50_exact"),
    ]
    for i, r in enumerate(_RATES):
        cut = _KMV_SPACE // r
        aggs.append(
            F.expr(
                f"cast(sum(CASE WHEN hv < {cut} THEN 1 ELSE 0 END)"
                " as bigint)"
            ).alias(f"n{i}")
        )
        aggs.append(
            F.expr(
                f"round(percentile(CASE WHEN hv < {cut} THEN price END,"
                " 0.5), 4) + 0.0"
            ).alias(f"q{i}")
        )
    m = li.agg(*aggs)
    stack_args = ", ".join(
        f"{r}L, n{i}, q{i}" for i, r in enumerate(_RATES)
    )
    return m.select(
        F.expr(
            f"stack({len(_RATES)}, {stack_args})"
            " as (rate, n_sample, q50_sample)"
        ),
        "n_total",
        "q50_exact",
    ).select(
        "rate",
        "n_total",
        "n_sample",
        F.expr("cast(n_sample * rate as bigint)").alias("est_total"),
        F.expr(
            "cast(cast(abs(n_sample * rate - n_total) as decimal(38,0))"
            " * 1000000 div n_total as bigint)"
        ).alias("count_err_ppm"),
        "q50_sample",
        "q50_exact",
    )


sketch_sample_rate_sweep.__doc__ = sketch_sample_rate_sweep.__doc__.replace(
    "{rates}", "/1".join(str(r) for r in _RATES)
)
