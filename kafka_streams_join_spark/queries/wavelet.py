"""Haar wavelet energy decomposition of the daily volume series
(round 9, wave 4) — the multi-scale view the time-domain family
(EWMA, Holt, autocorrelation, DOW profile) doesn't give: WHERE does a
series' variability live? Day-to-day jitter (level 1, 2-day detail),
weekly rhythm (level 3, 8-day detail), or slow drift (level 5)?

The transform is the UNNORMALIZED Haar pyramid: at each level,
adjacent pairs of the previous level's smooth coefficients produce a
sum (next smooth) and a difference (detail); the level's ENERGY is the
sum of squared differences. Unnormalized means every coefficient is an
exact BIGINT — sums and differences of counts — and every energy an
exact DECIMAL(38,0) sum of squares, so both engines walk bit-identical
pyramids and the ONE float per row is the final energy-share division.
(The 1/√2 normalization only rescales each level by a known constant;
shares of total detail energy are what the question needs, and those
are scale-free per level comparison aside — the docstring of each
level's meaning accounts for the 2^level factor.)

The series is padded/truncated to a fixed 32-day dyadic window
(``list_resize`` / pad-and-slice): the standard dyadic-boundary
convention, and the reason `n_days` rides along — a 30-day corpus has
2 zero-padded days whose boundary artifact lands in the coarsest
levels, identically in both engines.

Scale: the event-sized work is ONE map-side-combined (type, day)
aggregate; the pyramid is row-local arithmetic on a 32-element array
per type. Nothing else exists in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_N = 32  # dyadic window (days)
_LEVELS = 5


def _spark_level_exprs() -> tuple[list[str], list[str]]:
    """(smooth_expr per level, energy_expr per level), level 1.._LEVELS —
    each in terms of the previous smooth array ``l{k-1}``."""
    smooth, energy = [], []
    for k in range(1, _LEVELS + 1):
        m = _N >> k
        prev = f"l{k - 1}"
        smooth.append(
            f"transform(sequence(1, {m}), i ->"
            f" element_at({prev}, 2 * i - 1) + element_at({prev}, 2 * i))"
        )
        energy.append(
            f"aggregate(sequence(1, {m}), cast(0 as decimal(38,0)),"
            f" (acc, i) -> acc"
            f" + cast(element_at({prev}, 2 * i - 1)"
            f"        - element_at({prev}, 2 * i) as decimal(38,0))"
            f" * (element_at({prev}, 2 * i - 1) - element_at({prev}, 2 * i)))"
        )
    return smooth, energy


def _sql_level_ctes() -> str:
    """Relational Haar levels: each level folds the previous level's
    (event_type, idx, c) ROWS with a plain ``GROUP BY (idx + 1) // 2`` —
    the pair's sum is the next smooth coefficient, the signed sum its
    detail difference. NO list lambdas: the original oracle chained five
    ``list_transform(generate_series(...), i -> prev[2i-1] ± prev[2i])``
    CTEs and DuckDB 1.0.0 evaluated that pyramid NONDETERMINISTICALLY
    (measured 13 wrong results + 3 spurious INT128-overflow crashes per
    100 runs on one connection — operands ~1e38 that cannot arise from
    daily counts, i.e. garbage reads). Plain unnested aggregates are
    stable (r10 stress: 100/100 clean). ``(idx + 1) // 2`` is safe here:
    DuckDB integer ``//`` truncates toward zero, which equals floor for
    the positive idx domain."""
    parts = []
    for k in range(1, _LEVELS + 1):
        parts.append(
            f"lv{k} AS (\n"
            f"  SELECT event_type, n_days, (idx + 1) // 2 AS idx,\n"
            f"    CAST(sum(c) AS BIGINT) AS c,\n"
            f"    CAST(sum(CASE WHEN idx % 2 = 1 THEN c ELSE -c END)\n"
            f"         AS HUGEINT) AS diff\n"
            f"  FROM lv{k - 1} GROUP BY 1, 2, 3\n)"
        )
    return ",\n".join(parts)


@register(
    "events_wavelet_energy",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    nd AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
      FROM daily GROUP BY event_type
    ),
    ranked AS (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS idx,
             n
      FROM daily
    ),
    lv0 AS (
      -- zero-padded/truncated {_N}-slot dyadic grid as ROWS: the grid
      -- cross join pads short series with COALESCE-0, and drops ranked
      -- rows past slot {_N} (the list_resize truncation convention)
      SELECT nd.event_type, nd.n_days, g.idx,
             COALESCE(r.n, CAST(0 AS BIGINT)) AS c
      FROM nd
      CROSS JOIN generate_series(1, {_N}) AS g(idx)
      LEFT JOIN ranked r
        ON r.event_type = nd.event_type AND r.idx = g.idx
    ),
    {_sql_level_ctes()},
    energies AS (
      {" UNION ALL ".join(
          f'''SELECT event_type, n_days, {k} AS level,
              sum(diff * diff) AS e FROM lv{k} GROUP BY 1, 2'''
          for k in range(1, _LEVELS + 1)
      )}
    ),
    tot AS (
      SELECT event_type, n_days, sum(e) AS te
      FROM energies GROUP BY 1, 2
    )
    SELECT en.event_type, en.n_days, en.level,
           CAST(en.e * 1000000
                // greatest(t.te, 1) AS BIGINT) AS energy_share_ppm
    FROM energies en
    JOIN tot t USING (event_type, n_days)
    """,
)
def events_wavelet_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar detail-energy spectrum of the per-type daily volume series:
    one row per (type, level 1..{_LEVELS}) with the exact integer
    energy and its ppm share of total detail energy — level 1 is 2-day
    jitter, level 3 the ~weekly band, level {_LEVELS} the slowest drift
    the 32-day window resolves (module docstring has the unnormalized-
    integer pyramid contract and the dyadic padding caveat).

    Scale: one (type, day) aggregate; the pyramid is row-local
    arithmetic on a 32-element array per type."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    lv = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr(
            f"""
            slice(concat(
              transform(array_sort(collect_list(struct(d, n))), x -> x.n),
              array_repeat(cast(0 as bigint), {_N})), 1, {_N})
            """
        ).alias("l0"),
    )
    smooth, energy = _spark_level_exprs()
    for k in range(1, _LEVELS + 1):
        lv = lv.withColumn(f"e{k}", F.expr(energy[k - 1])).withColumn(
            f"l{k}", F.expr(smooth[k - 1])
        )
    te = " + ".join(f"e{k}" for k in range(1, _LEVELS + 1))
    rows = lv.select(
        "event_type",
        "n_days",
        F.expr(f"({te})").alias("te"),
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"named_struct('level', {k}, 'e', e{k})"
                    for k in range(1, _LEVELS + 1)
                )
                + ")"
            )
        ).alias("s"),
    )
    # shares only — a raw level energy is Σ(diff²) ≈ (daily count)², which
    # outgrows a BIGINT output column near 1e10 events/day; the ppm share
    # is the scale-free answer to "where does the variability live"
    return rows.select(
        "event_type",
        "n_days",
        F.expr("cast(s.level as int)").alias("level"),
        F.expr(
            "cast(cast(s.e as decimal(38,0)) * 1000000"
            " div greatest(te, 1) as bigint)"
        ).alias("energy_share_ppm"),
    )
