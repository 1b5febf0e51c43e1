"""Data-quality validation: the dbt-test / Deequ-style audit every lake
runs before anything downstream trusts a table.

Two operators:
- ``dq_constraint_checks``: declarative constraint audit over the TPC-H
  schema — key uniqueness, referential integrity (child keys ⊆ parent
  keys), and null-rate checks — one output row per check with violation
  counts, so the pass condition is ``violations = 0`` and a failure is
  quantified, not boolean.
- ``events_value_outliers``: per-group statistical outlier flags
  (|x − mean| > 3σ within event_type) — the numeric-column anomaly scan.

Scale shape: every check is an aggregate or an anti-join keyed on the
child's key — Spark plans the anti-joins as broadcast when the parent
side is small and SMJ otherwise, and each null/uniqueness check is one
map-side-combined aggregate. The checks UNION into one result relation,
so a 100 TB audit is one job, not N.

Determinism: counts are integers; the outlier boundary compares against
6-dp-rounded moments (both engines share the rounded threshold, the
k-means contract), so a value on the boundary decides identically.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register


@register(
    "dq_constraint_checks",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS violations
    UNION ALL
    SELECT 'customer_pk_unique',
           (SELECT count(*) - count(DISTINCT c_custkey) FROM customer)
    UNION ALL
    SELECT 'orders_custkey_fk',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders_priority_not_null',
           (SELECT count(*) FROM orders WHERE o_orderpriority IS NULL)
    UNION ALL
    SELECT 'lineitem_qty_positive',
           (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
    ORDER BY check_name
    """,
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit: (check_name, violations) per declared constraint
    — primary-key uniqueness, foreign-key containment (left-anti counts),
    not-null, and a value-domain check. All checks run in one UNION'd
    job; a violation count quantifies the break instead of a boolean.

    The FK checks are left-anti joins on the child key — broadcastable
    when the parent key set is bounded, shuffle-partitioned otherwise;
    uniqueness is count − count(distinct) in one aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    def one(name: str, cnt: DataFrame) -> DataFrame:
        return cnt.select(
            F.lit(name).alias("check_name"), F.col("violations").cast("long")
        )

    checks = [
        one(
            "orders_pk_unique",
            orders.agg(
                (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
                    "violations"
                )
            ),
        ),
        one(
            "customer_pk_unique",
            customer.agg(
                (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias(
                    "violations"
                )
            ),
        ),
        one(
            "orders_custkey_fk",
            orders.join(
                customer, orders.o_custkey == customer.c_custkey, "left_anti"
            ).agg(F.count(F.lit(1)).alias("violations")),
        ),
        one(
            "lineitem_orderkey_fk",
            lineitem.join(
                orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"
            ).agg(F.count(F.lit(1)).alias("violations")),
        ),
        one(
            "orders_priority_not_null",
            orders.filter(F.col("o_orderpriority").isNull()).agg(
                F.count(F.lit(1)).alias("violations")
            ),
        ),
        one(
            "lineitem_qty_positive",
            lineitem.filter(F.col("l_quantity") <= 0).agg(
                F.count(F.lit(1)).alias("violations")
            ),
        ),
    ]
    return reduce(lambda a, b: a.unionAll(b), checks).orderBy("check_name")


@register(
    "events_value_outliers",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             round(avg(value), 6) AS mu,
             round(stddev_pop(value), 6) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, count(*) AS n,
           CAST(sum(CASE WHEN abs(e.value - s.mu) > 3 * s.sigma
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN stats s ON s.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group 3-sigma outlier counts on the numeric value column — the
    anomaly scan a pipeline runs on every metric-bearing table. Group
    moments are rounded to 6 dp before the boundary compare, so both
    engines flag boundary values identically (the k-means moment
    contract). Two passes over narrow (event_type, value) rows: the
    group-moment aggregate (map-side combined, groups-bounded result
    broadcasts back) and the flag count."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_pop("value"), 6).alias("sigma"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("mu")) > 3 * F.col("sigma"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# dq_table_profile — ANALYZE-style per-column statistics in one pass
# --------------------------------------------------------------------------

_PROFILE_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


@register(
    "dq_table_profile",
    oracle="\n    UNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           count(*) AS n_rows,
           count({c}) AS n_nonnull,
           count(DISTINCT {c}) AS n_distinct
    FROM events"""
        for c in _PROFILE_COLS
    ),
)
def dq_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table profile of ``events`` — row count, non-null count,
    and EXACT distinct cardinality for every column, one output row per
    column: the ANALYZE TABLE / dbt-docs statistics surface a catalog (and
    a cost-based optimizer) feeds on. Zero null counts here are a verified
    result, not dead code — the same argument as the PII regex counts.

    Plan: ONE job — a single aggregate computes all 6 count-distincts via
    Spark's Expand-based multi-distinct rewrite (each input row fans into
    one narrow row per distinct-column before the shuffle), then a
    ``stack`` projection unpivots the 1-row wide result into the long
    (column, stats) form. Per-column UNION'd subqueries — the oracle's
    spelling, and what 6 separate ANALYZE calls would do — would scan the
    table 6 times; the Expand plan scans it once. At 100 TB swap
    ``count_distinct`` for ``approx_count_distinct`` (HLL): same single
    scan, Expand drops out, and the catalog stores estimates as every
    production stats collector does (the exact form here is what makes the
    oracle hash-checkable)."""
    e = load_table(spark, sf_dir, "events")
    agg = e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.count(c).alias(f"nn_{c}") for c in _PROFILE_COLS],
        *[F.count_distinct(F.col(c)).alias(f"nd_{c}") for c in _PROFILE_COLS],
    )
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return agg.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args})"
            " AS (column_name, n_nonnull, n_distinct)"
        ),
    ).select("column_name", "n_rows", "n_nonnull", "n_distinct")


# --------------------------------------------------------------------------
# dq_psi_drift — population-stability-index drift monitor (round 6)
# --------------------------------------------------------------------------

_PSI_CUTOFF = "2024-01-16 00:00:00"  # early = first half of Jan, late = rest
_PSI_ALERT = 0.1  # the industry PSI alert line (0.1 watch / 0.25 act)

# (feature name, bucket expression, bucket-space size for +1 smoothing);
# the value buckets use the quantile-sketch IEEE binning contract against
# GLOBAL min/max so both periods share one bucket layout
_PSI_FEATURES = (
    ("event_type", "event_type", 5),
    ("hour_of_day", "CAST(hour(ts) AS VARCHAR)", 24),
    (
        "value_decile",
        "CAST(least(9, CAST(floor((value - vmin) / (vmax - vmin) * 10)"
        " AS INTEGER)) AS VARCHAR)",
        10,
    ),
)


def _psi_oracle() -> str:
    parts = []
    for name, expr, b in _PSI_FEATURES:
        parts.append(f"""
    SELECT '{name}' AS feature, ne.n AS n_early, nl.n AS n_late,
           round(sum(
             ((coalesce(l.cnt, 0) + 1.0) / (nl.n + {b})
              - (coalesce(e.cnt, 0) + 1.0) / (ne.n + {b}))
             * ln(((coalesce(l.cnt, 0) + 1.0) / (nl.n + {b}))
                  / ((coalesce(e.cnt, 0) + 1.0) / (ne.n + {b})))
           ), 6) AS psi,
           CAST(round(sum(
             ((coalesce(l.cnt, 0) + 1.0) / (nl.n + {b})
              - (coalesce(e.cnt, 0) + 1.0) / (ne.n + {b}))
             * ln(((coalesce(l.cnt, 0) + 1.0) / (nl.n + {b}))
                  / ((coalesce(e.cnt, 0) + 1.0) / (ne.n + {b})))
           ), 6) >= {_PSI_ALERT} AS INTEGER) AS drifted
    FROM (
      SELECT bucket, cnt FROM (
        SELECT {expr} AS bucket, count(*) AS cnt
        FROM events, rng WHERE ts < TIMESTAMP '{_PSI_CUTOFF}' GROUP BY 1)
    ) e
    FULL OUTER JOIN (
      SELECT bucket, cnt FROM (
        SELECT {expr} AS bucket, count(*) AS cnt
        FROM events, rng WHERE ts >= TIMESTAMP '{_PSI_CUTOFF}' GROUP BY 1)
    ) l USING (bucket)
    CROSS JOIN (SELECT count(*) AS n FROM events
                WHERE ts < TIMESTAMP '{_PSI_CUTOFF}') ne
    CROSS JOIN (SELECT count(*) AS n FROM events
                WHERE ts >= TIMESTAMP '{_PSI_CUTOFF}') nl
    GROUP BY ne.n, nl.n""")
    return (
        "WITH rng AS (SELECT min(value) AS vmin, max(value) AS vmax"
        " FROM events) " + " UNION ALL ".join(parts)
    )


@register("dq_psi_drift", oracle=_psi_oracle())
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of the
    event stream, per monitored feature (event-type mix, hour-of-day
    seasonality, value deciles): PSI = Σ_b (p_late − p_early)·ln(p_late /
    p_early) with +1 count smoothing over each feature's full bucket
    space, plus the standard ≥0.1 alert flag — the drift monitor every
    deployed pipeline/classifier runs between training-time and serving-
    time distributions. The flag compares the 6-dp-ROUNDED PSI so both
    engines decide the boundary identically.

    Scale: per feature, two bucket-cardinality histograms (map-side
    combined over one events scan each) full-outer-joined on the bucket
    key — everything after the scans is bucket-sized; the global value
    range broadcasts (the quantile-sketch binning contract)."""
    from ..operators.staging import staged as _staged

    ev = _staged(
        load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    )
    rng = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    cut = F.lit(_PSI_CUTOFF).cast("timestamp")
    outs = []
    for name, expr, b in _PSI_FEATURES:
        base = ev.crossJoin(F.broadcast(rng)).select(
            F.expr(expr.replace(" AS VARCHAR", " AS STRING")).alias("bucket"),
            (F.col("ts") < cut).alias("early"),
        )
        base = _staged(base)
        e = base.filter("early").groupBy("bucket").agg(
            F.count(F.lit(1)).alias("ecnt")
        )
        l = base.filter(~F.col("early")).groupBy("bucket").agg(
            F.count(F.lit(1)).alias("lcnt")
        )
        ns = base.agg(
            F.sum(F.when(F.col("early"), 1).otherwise(0)).alias("n_early"),
            F.sum(F.when(~F.col("early"), 1).otherwise(0)).alias("n_late"),
        )
        pe = (F.coalesce(F.col("ecnt"), F.lit(0)) + 1.0) / (
            F.col("n_early") + F.lit(b)
        )
        pl = (F.coalesce(F.col("lcnt"), F.lit(0)) + 1.0) / (
            F.col("n_late") + F.lit(b)
        )
        psi = F.round(F.sum((pl - pe) * F.log(pl / pe)), 6)
        outs.append(
            e.join(l, "bucket", "full")
            .crossJoin(F.broadcast(ns))
            .groupBy("n_early", "n_late")
            .agg(psi.alias("psi"))
            .select(
                F.lit(name).alias("feature"),
                "n_early",
                "n_late",
                "psi",
                (F.col("psi") >= _PSI_ALERT).cast("int").alias("drifted"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


# --------------------------------------------------------------------------
# dq_schema_profile — one-pass per-column table profile (round 6 wave 3)
# --------------------------------------------------------------------------

# (column, deterministic min/max rendering). DOUBLE renders as exact
# integer cents and TIMESTAMP as a fixed format — a raw engine-native
# cast-to-string of either type diverges between engines ('1.0E7',
# fractional-second tails), so every rendering is pinned here.
_SCHEMA_PROFILE_COLS = (
    ("o_orderkey", "cast({c} as string)", "CAST({c} AS VARCHAR)"),
    ("o_custkey", "cast({c} as string)", "CAST({c} AS VARCHAR)"),
    ("o_orderstatus", "{c}", "{c}"),
    (
        "o_totalprice",
        "cast(cast(round({c} * 100, 0) as bigint) as string)",
        "CAST(CAST(round({c} * 100, 0) AS BIGINT) AS VARCHAR)",
    ),
    (
        "o_orderdate",
        "date_format({c}, 'yyyy-MM-dd HH:mm:ss')",
        "strftime({c}, '%Y-%m-%d %H:%M:%S')",
    ),
    ("o_orderpriority", "{c}", "{c}"),
)


def _profile_oracle() -> str:
    aggs = ["count(*) AS n_rows"]
    rows = []
    for c, _, rend in _SCHEMA_PROFILE_COLS:
        aggs.append(f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS null_{c}")
        aggs.append(f"count(DISTINCT {c}) AS nd_{c}")
        aggs.append(f"min({rend.format(c=c)}) AS min_{c}")
        aggs.append(f"max({rend.format(c=c)}) AS max_{c}")
        rows.append(
            f"SELECT '{c}' AS col_name, n_rows,"
            f" CAST(null_{c} AS BIGINT) AS n_null,"
            f" CAST(nd_{c} AS BIGINT) AS n_distinct,"
            f" min_{c} AS min_repr, max_{c} AS max_repr FROM s"
        )
    return (
        "WITH s AS (SELECT " + ", ".join(aggs) + " FROM orders) "
        + " UNION ALL ".join(rows)
    )


@register("dq_schema_profile", oracle=_profile_oracle())
def dq_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table profile — row count, null count, exact distinct
    count, and min/max in pinned renderings — one row per column of
    ``orders``: the Deequ/Glue-crawler profiling pass that feeds schema
    drift alerts and join-key sanity checks (a PK column profiles as
    n_distinct = n_rows, n_null = 0; this is ``dq_constraint_checks``'s
    uniqueness check generalized to every column at once, and
    ``dq_table_profile``'s null/distinct pass extended with the min/max
    renderings that make range drift visible).

    Scale: ONE scan — all 6 columns' stats aggregate in a single pass
    (Spark plans the multi-distinct via Expand: a bounded 6× row
    multiplication instead of 6 scans) and the per-column rows unpivot
    from the 1-row stats frame driver-free. Min/max renderings are
    pinned per type (integer cents for DOUBLE, fixed timestamp format)
    because engine-native float/timestamp casts are NOT stable contracts.
    """
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, rend, _ in _SCHEMA_PROFILE_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
        aggs.append(F.expr(f"min({rend.format(c=c)})").alias(f"min_{c}"))
        aggs.append(F.expr(f"max({rend.format(c=c)})").alias(f"max_{c}"))
    s = orders.agg(*aggs)
    structs = ", ".join(
        f"struct('{c}' as col_name, n_rows,"
        f" cast(null_{c} as bigint) as n_null,"
        f" cast(nd_{c} as bigint) as n_distinct,"
        f" min_{c} as min_repr, max_{c} as max_repr)"
        for c, _, _ in _SCHEMA_PROFILE_COLS
    )
    return s.select(
        F.explode(F.expr(f"array({structs})")).alias("p")
    ).select("p.*")


# --------------------------------------------------------------------------
# dq_iqr_outliers — Tukey-fence outlier audit per numeric column (round 7)
# --------------------------------------------------------------------------


@register(
    "dq_iqr_outliers",
    oracle="""
    WITH stacked AS (
      SELECT 'l_quantity' AS col_name, l_quantity AS v FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'l_discount', l_discount FROM lineitem
    ),
    q AS (
      SELECT col_name,
             quantile_cont(v, 0.25) AS q1,
             quantile_cont(v, 0.75) AS q3
      FROM stacked GROUP BY col_name
    )
    SELECT s.col_name,
           round(q.q1, 6) + 0.0 AS q1,
           round(q.q3, 6) + 0.0 AS q3,
           round(q.q3 - q.q1, 6) + 0.0 AS iqr,
           round(q.q1 - 1.5 * (q.q3 - q.q1), 6) + 0.0 AS lo_fence,
           round(q.q3 + 1.5 * (q.q3 - q.q1), 6) + 0.0 AS hi_fence,
           CAST(sum(CASE WHEN s.v < q.q1 - 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
           CAST(sum(CASE WHEN s.v > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_above
    FROM stacked s JOIN q USING (col_name)
    GROUP BY s.col_name, q.q1, q.q3
    """,
)
def dq_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (1.5·IQR) outlier audit over lineitem's numeric
    columns: exact q1/q3 (``percentile`` ≡ DuckDB ``quantile_cont``, both
    linear interpolation), the fences, and how many rows fall outside
    each — the robust complement to ``events_value_outliers``' z-score
    screen (fences don't move when the outliers themselves inflate the
    variance). Fence comparisons use the UNROUNDED double fences — the
    arithmetic q1 − 1.5·iqr is the same IEEE expression on both engines —
    and only the report columns are rounded.

    Scale (round-14 rework, guide §2.3 "aggregate before you shuffle"):
    the unpivot is a projection (no extra scan — one pass stacks 3
    columns), then ONE partial+final hash aggregate collapses the stacked
    rows to per-(column, value) counts — the money/quantity/discount
    columns live on small value lattices, so the row count crossing the
    shuffle drops from 3·|lineitem| to the distinct-value count. Exact
    q1/q3 come from ``percentile(v, p, cnt)`` (the frequency form — the
    SAME value→count accumulation the raw spelling builds internally, so
    results are bit-identical), and the fence counts are cnt-weighted
    conditional sums over the same tiny value-count frame (3-row quantile
    table broadcast back). Swap in ``approx_percentile`` past
    memory-bound distinct-value counts."""
    li = load_table(spark, sf_dir, "lineitem")
    stacked = li.select(
        F.expr(
            "stack(3, 'l_quantity', l_quantity,"
            " 'l_extendedprice', l_extendedprice,"
            " 'l_discount', l_discount) as (col_name, v)"
        )
    )
    vc = _staged(
        stacked.groupBy("col_name", "v").agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = vc.groupBy("col_name").agg(
        F.expr("percentile(v, 0.25, cnt)").alias("q1"),
        F.expr("percentile(v, 0.75, cnt)").alias("q3"),
    )
    joined = vc.join(F.broadcast(q), "col_name")
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return joined.groupBy("col_name", "q1", "q3").agg(
        F.sum(F.when(F.col("v") < lo, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("n_below"),
        F.sum(F.when(F.col("v") > hi, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("n_above"),
    ).select(
        "col_name",
        # 6 dp, NOT 4: the 2-dp money columns put q1/q3 on an exact
        # quarter-cent lattice (linear interpolation at p=.25/.75) and the
        # 1.5x fences on an eighth-cent lattice — 5-dp decimals whose 4-dp
        # round is an exact .5 half-way case where the engines disagree
        # (Spark BigDecimal HALF_UP vs DuckDB's scaled-double rounding;
        # observed at sf0.1: lo_fence -51094.37125 -> .3713 vs .3712).
        # At 6 dp the lattice never sits on a boundary. + 0.0 AFTER the
        # round (the repo's -0.0 contract): round() itself can produce
        # -0.0 from a tiny negative fence.
        (F.round(F.col("q1"), 6) + 0.0).alias("q1"),
        (F.round(F.col("q3"), 6) + 0.0).alias("q3"),
        (F.round(F.col("q3") - F.col("q1"), 6) + 0.0).alias("iqr"),
        (F.round(lo, 6) + 0.0).alias("lo_fence"),
        (F.round(hi, 6) + 0.0).alias("hi_fence"),
        "n_below",
        "n_above",
    )
