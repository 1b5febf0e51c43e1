"""Round-7 analytics extensions: promotion uplift, basket shapes, snapshot
churn, Benford auditing, behavioral entropy, and prefix dedup — operators
that fill real gaps left by the existing families (checked name-by-name
against the registry before writing; everything here is new surface).

Engine-parity contracts are the repo's standard set: exact BIGINT
arithmetic wherever possible, per-term micro-nat rounding of ln() before
summation, 4-dp rounding of unavoidable doubles, deterministic tie-breaks.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.literals import values_frame
from ..sources.parquet import load_table
from .registry import register

# --------------------------------------------------------------------------
# orders_discount_uplift — quantity response to discount depth
# --------------------------------------------------------------------------


@register(
    "orders_discount_uplift",
    oracle="""
    WITH b AS (
      SELECT CAST(round(l_discount * 100) AS INT) AS disc_pct,
             count(*) AS n_items,
             CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY 1
    ),
    base AS (SELECT 1000 * sum_qty // n_items AS base_milli FROM b
             WHERE disc_pct = 0)
    SELECT disc_pct, n_items,
           CAST(1000 * sum_qty // n_items AS BIGINT) AS qty_milli,
           CAST((1000 * sum_qty // n_items) * 1000000 // base.base_milli
                - 1000000 AS BIGINT) AS uplift_ppm
    FROM b CROSS JOIN base
    """,
)
def orders_discount_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion response curve: average line quantity per discount depth
    (integer percent buckets), with the signed uplift vs the no-discount
    baseline in exact ppm — the first-order elasticity read every pricing
    team does before fitting a model. Quantities are integral-valued
    doubles, so round(sum()) is exact and the whole curve is BIGINT.

    Scale: one map-side-combined aggregate over lineitem (bounded by the
    11 discount buckets); the 1-row baseline broadcasts."""
    b = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.expr("cast(round(l_discount * 100) as int)").alias("disc_pct")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr("cast(round(sum(l_quantity)) as bigint)").alias("sum_qty"),
        )
    )
    base = b.filter(F.col("disc_pct") == 0).select(
        F.expr("1000 * sum_qty div n_items").alias("base_milli")
    )
    return b.crossJoin(F.broadcast(base)).select(
        "disc_pct",
        "n_items",
        F.expr("cast(1000 * sum_qty div n_items as bigint)").alias("qty_milli"),
        F.expr(
            "cast((1000 * sum_qty div n_items) * 1000000 div base_milli"
            " - 1000000 as bigint)"
        ).alias("uplift_ppm"),
    )


# --------------------------------------------------------------------------
# orders_basket_size_histogram — order-size distribution (0 included)
# --------------------------------------------------------------------------


@register(
    "orders_basket_size_histogram",
    oracle="""
    WITH sz AS (
      SELECT o.o_orderkey, count(l.l_orderkey) AS basket_size
      FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey
    ),
    n AS (SELECT count(*) AS n_orders FROM orders)
    SELECT basket_size, count(*) AS n_orders,
           CAST(count(*) * 1000000 // n.n_orders AS BIGINT) AS share_ppm
    FROM sz CROSS JOIN n
    GROUP BY basket_size, n.n_orders
    """,
)
def orders_basket_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size histogram with exact-ppm shares, zero-item orders
    included (LEFT join from orders — count(l.key) counts matches, not
    rows). The distribution that sizes every basket-pair stage the graph
    and market-basket families build on (pair work is Σ C(size, 2)).

    Scale: one fact-table aggregate + a bounded histogram aggregate; the
    1-row total broadcasts."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    sz = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.count(F.col("l_orderkey")).alias("basket_size"))
    )
    n = orders.agg(F.count(F.lit(1)).alias("n_orders_total"))
    return (
        sz.groupBy("basket_size")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .crossJoin(F.broadcast(n))
        .select(
            "basket_size",
            "n_orders",
            F.expr(
                "cast(n_orders * 1000000 div n_orders_total as bigint)"
            ).alias("share_ppm"),
        )
    )


# --------------------------------------------------------------------------
# pipeline_snapshot_diff — dataset-version churn audit
# --------------------------------------------------------------------------

_DIFF_CUTOFF = "2024-01-16 00:00:00"


@register(
    "pipeline_snapshot_diff",
    oracle=f"""
    WITH keyed AS (
      SELECT user_id, event_type,
             sum(CASE WHEN ts < TIMESTAMP '{_DIFF_CUTOFF}'
                      THEN 1 ELSE 0 END) AS c_early,
             sum(CASE WHEN ts >= TIMESTAMP '{_DIFF_CUTOFF}'
                      THEN 1 ELSE 0 END) AS c_late
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(sum(CASE WHEN c_early = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_added,
           CAST(sum(CASE WHEN c_late = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(sum(CASE WHEN c_early > 0 AND c_late > 0
                         AND c_early != c_late THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(sum(CASE WHEN c_early = c_late THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unchanged,
           CAST(sum(CASE WHEN c_early = c_late THEN 0 ELSE 1 END) * 1000000
                // count(*) AS BIGINT) AS churn_ppm
    FROM keyed GROUP BY event_type
    """,
)
def pipeline_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff: treating the first/second half of the event
    log as two snapshot builds, classify every (user, event_type) key as
    added / removed / changed / unchanged by its per-snapshot count and
    report per-type churn in exact ppm — the audit a training-data
    pipeline runs between corpus versions before deciding to retrain
    (the SCD2 family tracks row history; this tracks BUILD deltas).

    Scale: ONE pass — both snapshot counts are conditional sums in the
    same map-side-combined aggregate, so no self-join, no second scan;
    the report is a bounded per-type aggregate."""
    keyed = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.sum(
                F.when(F.col("ts") < F.lit(_DIFF_CUTOFF).cast("timestamp"), 1)
                .otherwise(0)
            ).alias("c_early"),
            F.sum(
                F.when(
                    F.col("ts") >= F.lit(_DIFF_CUTOFF).cast("timestamp"), 1
                ).otherwise(0)
            ).alias("c_late"),
        )
    )
    return keyed.groupBy("event_type").agg(
        F.expr("cast(sum(CASE WHEN c_early = 0 THEN 1 ELSE 0 END) as bigint)")
        .alias("n_added"),
        F.expr("cast(sum(CASE WHEN c_late = 0 THEN 1 ELSE 0 END) as bigint)")
        .alias("n_removed"),
        F.expr(
            "cast(sum(CASE WHEN c_early > 0 AND c_late > 0"
            " AND c_early != c_late THEN 1 ELSE 0 END) as bigint)"
        ).alias("n_changed"),
        F.expr(
            "cast(sum(CASE WHEN c_early = c_late THEN 1 ELSE 0 END) as bigint)"
        ).alias("n_unchanged"),
        F.expr(
            "cast(sum(CASE WHEN c_early = c_late THEN 0 ELSE 1 END) * 1000000"
            " div count(1) as bigint)"
        ).alias("churn_ppm"),
    )


# --------------------------------------------------------------------------
# dq_benford_audit — first-digit law deviation for generated amounts
# --------------------------------------------------------------------------

# expected first-digit shares, log10(1 + 1/d) in ppm — precomputed so both
# engines compare against identical integers
_BENFORD_PPM = {d: round(math.log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)}
_BENFORD_SQL_VALUES = ", ".join(f"({d}, {p})" for d, p in _BENFORD_PPM.items())


@register(
    "dq_benford_audit",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                  1, 1) AS INT) AS digit
      FROM orders
    ),
    hist AS (SELECT digit, count(*) AS n_orders FROM digits GROUP BY digit),
    n AS (SELECT count(*) AS total FROM digits),
    bf(digit, benford_ppm) AS (VALUES {_BENFORD_SQL_VALUES})
    SELECT bf.digit,
           CAST(coalesce(h.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(h.n_orders, 0) * 1000000 // n.total AS BIGINT)
             AS share_ppm,
           CAST(bf.benford_ppm AS BIGINT) AS benford_ppm,
           CAST(abs(coalesce(h.n_orders, 0) * 1000000 // n.total
                    - bf.benford_ppm) AS BIGINT) AS dev_ppm
    FROM bf LEFT JOIN hist h ON h.digit = bf.digit CROSS JOIN n
    """,
)
def dq_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed first-digit shares vs
    the log10(1 + 1/d) expectation, deviation in exact ppm per digit —
    the classic generated-or-tampered-amounts detector (TPC-H's uniform
    price generator fails it loudly, which is exactly what the audit
    should say about synthetic data). Expected shares are precomputed
    integer constants, so no engine evaluates log10 at query time.

    Scale: one scan, digit extracted map-side from the integer part's
    decimal string; everything downstream is 9-row arithmetic."""
    digits = load_table(spark, sf_dir, "orders").select(
        F.expr(
            "cast(substring(cast(cast(floor(o_totalprice) as bigint) as string),"
            " 1, 1) as int)"
        ).alias("digit")
    )
    hist = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_orders"))
    n = digits.agg(F.count(F.lit(1)).alias("total"))
    bf = values_frame(
        spark,
        [(d, p) for d, p in _BENFORD_PPM.items()],
        "digit int, benford_ppm bigint",
    )
    return (
        bf.join(hist, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.expr("cast(coalesce(n_orders, 0) as bigint)").alias("n_orders"),
            F.expr(
                "cast(coalesce(n_orders, 0) * 1000000 div total as bigint)"
            ).alias("share_ppm"),
            F.col("benford_ppm").cast("bigint").alias("benford_ppm"),
            F.expr(
                "cast(abs(coalesce(n_orders, 0) * 1000000 div total"
                " - benford_ppm) as bigint)"
            ).alias("dev_ppm"),
        )
    )


# --------------------------------------------------------------------------
# events_user_entropy — behavioral diversity histogram
# --------------------------------------------------------------------------

_ENT_BUCKET_MICRO = 200_000  # 0.2-nat histogram buckets


@register(
    "events_user_entropy",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT user_id, sum(c) AS n FROM c GROUP BY user_id),
    per_user AS (
      SELECT c.user_id,
             CAST(sum(round(1000000.0 * c.c
                  * ln(CAST(t.n AS DOUBLE) / c.c) / t.n)) AS BIGINT) AS e
      FROM c JOIN tot t ON t.user_id = c.user_id
      GROUP BY c.user_id
    )
    SELECT e // {_ENT_BUCKET_MICRO} AS bucket, count(*) AS n_users
    FROM per_user GROUP BY 1
    """,
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity histogram: Shannon entropy of each user's
    event-type distribution (integer micro-nats, per-term rounding before
    summation — the repo's log-space contract), bucketed at
    {_ENT_BUCKET_MICRO} µnats — bots concentrate (entropy ≈ 0), engaged
    humans spread toward ln(5) ≈ 1.609e6 µnats. The single-column cousin
    of ``events_bot_score``'s multi-signal rule.

    Scale: one (user, type) aggregate, a user-keyed equi-join against the
    user-total frame (both user-cardinality, narrow), a per-user integer
    sum, and one bounded histogram aggregate — no data-sized windows."""
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = c.groupBy("user_id").agg(F.sum("c").alias("n"))
    per_user = (
        c.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.expr(
                "cast(sum(round(1000000.0D * c"
                " * ln(cast(n as double) / c) / n)) as bigint)"
            ).alias("e")
        )
    )
    return per_user.groupBy(
        F.expr(f"e div {_ENT_BUCKET_MICRO}").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_users"))


# --------------------------------------------------------------------------
# dedup_common_prefix — shared-prefix duplicate groups
# --------------------------------------------------------------------------

_PFX_LEN = 64
_PFX_TOPN = 10


@register(
    "dedup_common_prefix",
    oracle=f"""
    WITH g AS (
      SELECT substr(text, 1, {_PFX_LEN}) AS prefix,
             count(*) AS n_docs, min(doc_id) AS representative
      FROM documents
      GROUP BY 1 HAVING count(*) > 1
    ),
    top AS (
      SELECT * FROM g ORDER BY n_docs DESC, prefix LIMIT {_PFX_TOPN}
    )
    SELECT row_number() OVER (ORDER BY n_docs DESC, prefix) AS rnk,
           prefix, n_docs, representative
    FROM top
    """,
)
def dedup_common_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-prefix duplicate groups: documents whose first {_PFX_LEN}
    characters are byte-identical — the wire-copy/boilerplate-header rung
    of the dedup ladder (catches syndicated articles and templated pages
    that full-document hashing misses once the tail diverges), reported
    as the top-{_PFX_TOPN} largest groups with their earliest doc as
    representative.

    Scale: the prefix is the grouping key — map-side substring, one hash
    aggregate, no pair enumeration (the exact-dedup shape); top-N via
    TakeOrdered heaps."""
    from pyspark.sql import Window

    g = (
        load_table(spark, sf_dir, "documents")
        .select(F.substring(F.col("text"), 1, _PFX_LEN).alias("prefix"), "doc_id")
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("representative"),
        )
        .filter(F.col("n_docs") > 1)
    )
    top = g.orderBy(F.col("n_docs").desc(), F.col("prefix")).limit(_PFX_TOPN)
    w = Window.orderBy(F.col("n_docs").desc(), F.col("prefix"))
    return top.select(
        F.row_number().over(w).alias("rnk"),
        "prefix",
        "n_docs",
        "representative",
    )


# --------------------------------------------------------------------------
# orders_ship_latency — order-to-ship latency per priority (round 7)
# --------------------------------------------------------------------------


@register(
    "orders_ship_latency",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority AS priority,
             CAST((epoch(l.l_shipdate) - epoch(o.o_orderdate)) // 86400
                  AS BIGINT) AS days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT priority, count(*) AS n_lines,
           CAST(min(days) AS BIGINT) AS min_days,
           round(quantile_cont(days, 0.5), 4) + 0.0 AS p50_days,
           round(quantile_cont(days, 0.9), 4) + 0.0 AS p90_days,
           CAST(max(days) AS BIGINT) AS max_days
    FROM lat GROUP BY priority
    """,
)
def orders_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per order priority (integer
    days from exact epoch arithmetic — both dates are midnights, so the
    floor division is lossless): the operational SLA read, and the
    sanity check that priority classes actually ship differently.

    Scale: one fact-fact equi-join on the order key (the lineitem side
    carries only two columns), one bounded per-priority aggregate;
    quantiles via the engine-shared percentile ≡ quantile_cont
    contract."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    , "o_orderdate")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.expr(
            "cast((unix_timestamp(l_shipdate) - unix_timestamp(o_orderdate))"
            " div 86400 as bigint)"
        ).alias("days"),
    )
    return lat.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("days").cast("bigint").alias("min_days"),
        F.expr("round(percentile(days, 0.5), 4) + 0.0").alias("p50_days"),
        F.expr("round(percentile(days, 0.9), 4) + 0.0").alias("p90_days"),
        F.max("days").cast("bigint").alias("max_days"),
    )


# --------------------------------------------------------------------------
# dq_freshness_lag — per-stream timeliness audit (round 7)
# --------------------------------------------------------------------------


@register(
    "dq_freshness_lag",
    oracle="""
    WITH per AS (
      SELECT event_type, count(*) AS n_events, max(ts) AS latest
      FROM events GROUP BY event_type
    ),
    g AS (SELECT max(latest) AS global_latest FROM per)
    SELECT event_type, n_events,
           CAST(floor(epoch(global_latest)) - floor(epoch(latest))
                AS BIGINT) AS lag_seconds
    FROM per CROSS JOIN g
    """,
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness (timeliness) audit: how far each event stream's newest
    record lags the newest record overall, in integer seconds — the DQ
    dimension the profile/constraint/drift family didn't yet cover; a
    stream lagging hours behind its siblings means its producer or its
    ingestion partition stalled.

    Scale: one map-side-combined aggregate + a broadcast 1-row global
    max; epoch seconds via the floor() contract (Spark truncates,
    DuckDB's bare cast rounds)."""
    per = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("latest"))
    )
    g = per.agg(F.max("latest").alias("global_latest"))
    return per.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n_events",
        F.expr(
            "cast(unix_timestamp(global_latest) - unix_timestamp(latest)"
            " as bigint)"
        ).alias("lag_seconds"),
    )


# --------------------------------------------------------------------------
# events_funnel_latency — time-to-convert between funnel stages (round 7)
# --------------------------------------------------------------------------


@register(
    "events_funnel_latency",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    ),
    deltas AS (
      SELECT 'view->click' AS transition,
             CAST(floor(epoch(t_click)) - floor(epoch(t_view)) AS BIGINT)
               AS delta_s
      FROM firsts WHERE t_view IS NOT NULL AND t_click IS NOT NULL
        AND t_click >= t_view
      UNION ALL
      SELECT 'click->purchase',
             CAST(floor(epoch(t_purchase)) - floor(epoch(t_click)) AS BIGINT)
      FROM firsts WHERE t_click IS NOT NULL AND t_purchase IS NOT NULL
        AND t_purchase >= t_click
    )
    SELECT transition, count(*) AS n_users,
           round(quantile_cont(delta_s, 0.5), 4) + 0.0 AS p50_s,
           round(quantile_cont(delta_s, 0.9), 4) + 0.0 AS p90_s
    FROM deltas GROUP BY transition
    """,
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert between funnel stages: per user, the first view /
    click / purchase timestamps (ONE conditional min-aggregate — the
    funnel-conversion shape), then latency quantiles for each ordered
    transition — the metric that distinguishes a slow funnel from a leaky
    one (``events_funnel_conversion`` reports WHO converts; this reports
    HOW LONG it takes).

    Scale: one map-side-combined per-user aggregate, a row-local delta
    projection, and a 2-group quantile aggregate; epoch seconds via the
    floor() contract."""
    firsts = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
                "t_view"
            ),
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
                "t_click"
            ),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("t_purchase"),
        )
    )
    vc = firsts.filter(
        F.col("t_view").isNotNull()
        & F.col("t_click").isNotNull()
        & (F.col("t_click") >= F.col("t_view"))
    ).select(
        F.lit("view->click").alias("transition"),
        F.expr(
            "cast(unix_timestamp(t_click) - unix_timestamp(t_view) as bigint)"
        ).alias("delta_s"),
    )
    cp = firsts.filter(
        F.col("t_click").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_click"))
    ).select(
        F.lit("click->purchase").alias("transition"),
        F.expr(
            "cast(unix_timestamp(t_purchase) - unix_timestamp(t_click)"
            " as bigint)"
        ).alias("delta_s"),
    )
    return vc.unionByName(cp).groupBy("transition").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.expr("round(percentile(delta_s, 0.5), 4) + 0.0").alias("p50_s"),
        F.expr("round(percentile(delta_s, 0.9), 4) + 0.0").alias("p90_s"),
    )


# --------------------------------------------------------------------------
# dq_total_reconciliation — cross-table amount reconciliation (round 7)
# --------------------------------------------------------------------------


@register(
    "dq_total_reconciliation",
    oracle="""
    WITH computed AS (
      SELECT l_orderkey AS okey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * (1 + l_tax) * 100) AS BIGINT))
                  AS BIGINT) AS calc_cents
      FROM lineitem GROUP BY l_orderkey
    ),
    joined AS (
      SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
             coalesce(c.calc_cents, 0) AS calc_cents
      FROM orders o LEFT JOIN computed c ON c.okey = o.o_orderkey
    ),
    classed AS (
      SELECT CASE
               WHEN abs(total_cents - calc_cents) <= 1 THEN 'exact'
               WHEN abs(total_cents - calc_cents) * 100 <= total_cents
                 THEN 'within_1pct'
               WHEN abs(total_cents - calc_cents) * 10 <= total_cents
                 THEN 'within_10pct'
               ELSE 'mismatch'
             END AS bucket
      FROM joined
    ),
    n AS (SELECT count(*) AS total FROM classed)
    SELECT bucket, count(*) AS n_orders,
           CAST(count(*) * 1000000 // n.total AS BIGINT) AS share_ppm
    FROM classed CROSS JOIN n
    GROUP BY bucket, n.total
    """,
)
def dq_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation: does the order header's total match the
    sum of its line amounts (extendedprice·(1−disc)·(1+tax))? Buckets:
    exact (≤1 cent), within 1%, within 10%, mismatch — the books-balance
    audit every warehouse runs between a fact table and its rollup
    header (on this synthetic corpus the generator draws totals
    independently, and the audit SAYS so loudly — that is the finding).
    Cents via PER-LINE round(·100) → BIGINT, THEN an integer sum (the
    repo's per-term-rounding contract, as in ``orders_mom_growth``):
    rounding after a double sum would make a half-cent-boundary order's
    cent value depend on float summation order — Spark's partial-agg
    order vs DuckDB's sequential order, or even Spark run-to-run.
    Thresholds compare integers cross-multiplied, so classification is
    exact BIGINT.

    Scale: one per-order aggregate + one key equi-join + a 4-bucket
    aggregate; the 1-row total broadcasts."""
    computed = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(
            F.expr(
                "cast(sum(cast(round(l_extendedprice * (1 - l_discount)"
                " * (1 + l_tax) * 100) as bigint)) as bigint)"
            ).alias("calc_cents")
        )
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias(
            "total_cents"
        ),
    )
    joined = o.join(
        computed, o.o_orderkey == computed.okey, "left"
    ).select(
        "total_cents", F.coalesce(F.col("calc_cents"), F.lit(0)).alias("calc_cents")
    )
    classed = joined.select(
        F.expr(
            "CASE WHEN abs(total_cents - calc_cents) <= 1 THEN 'exact'"
            " WHEN abs(total_cents - calc_cents) * 100 <= total_cents"
            " THEN 'within_1pct'"
            " WHEN abs(total_cents - calc_cents) * 10 <= total_cents"
            " THEN 'within_10pct'"
            " ELSE 'mismatch' END"
        ).alias("bucket")
    )
    n = classed.agg(F.count(F.lit(1)).alias("total"))
    return (
        classed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .crossJoin(F.broadcast(n))
        .select(
            "bucket",
            "n_orders",
            F.expr("cast(n_orders * 1000000 div total as bigint)").alias(
                "share_ppm"
            ),
        )
    )


# --------------------------------------------------------------------------
# pipeline_kfold_split — deterministic k-fold assignment + balance (round 7)
# --------------------------------------------------------------------------

_KFOLD_K = 5


@register(
    "pipeline_kfold_split",
    oracle=f"""
    WITH t AS (
      SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10))
                  AS BIGINT) % {_KFOLD_K} AS fold,
             n_chars
      FROM documents
    ),
    n AS (SELECT count(*) AS total, sum(n_chars) AS total_chars FROM t)
    SELECT fold, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(count(*) * 1000000 // n.total AS BIGINT) AS doc_share_ppm,
           CAST(abs(count(*) * 1000000 // n.total
                    - {1_000_000 // _KFOLD_K}) AS BIGINT) AS imbalance_ppm
    FROM t CROSS JOIN n
    GROUP BY fold, n.total
    """,
)
def pipeline_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {_KFOLD_K}-fold cross-validation assignment (fold =
    40-bit md5(doc_id) mod {_KFOLD_K} — stable across runs, engines, and
    cluster sizes, the property random splits lose on re-execution) with
    the per-fold balance audit: doc and char masses, share, and deviation
    from the ideal 1/{_KFOLD_K} in exact ppm. Completes the split family
    (train/test, group holdout, stratified sample) with the resampling
    protocol evaluators actually use.

    Scale: map-side hash + one bounded aggregate; the 1-row totals
    broadcast."""
    t = load_table(spark, sf_dir, "documents").select(
        F.expr(
            "cast(conv(substring(md5(cast(doc_id as string)), 1, 10), 16, 10)"
            f" as bigint) % {_KFOLD_K}"
        ).alias("fold"),
        "n_chars",
    )
    n = t.agg(F.count(F.lit(1)).alias("total"))
    return (
        t.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "fold",
            "n_docs",
            "n_chars",
            F.expr("cast(n_docs * 1000000 div total as bigint)").alias(
                "doc_share_ppm"
            ),
            F.expr(
                f"cast(abs(n_docs * 1000000 div total"
                f" - {1_000_000 // _KFOLD_K}) as bigint)"
            ).alias("imbalance_ppm"),
        )
    )


# --------------------------------------------------------------------------
# orders_pareto_share — revenue concentration: Lorenz deciles + Gini
# --------------------------------------------------------------------------


@register(
    "orders_pareto_share",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               // 100 AS dollars
      FROM orders GROUP BY o_custkey
    ),
    rk AS (
      SELECT o_custkey, dollars,
             row_number() OVER (ORDER BY dollars DESC, o_custkey) AS rnk
      FROM rev
    ),
    stats AS (
      SELECT count(*) AS n_cust, CAST(sum(dollars) AS BIGINT) AS total
      FROM rev
    ),
    gini AS (
      SELECT CAST((2 * sum(CAST(s.n_cust - r.rnk + 1 AS HUGEINT) * r.dollars)
                     // s.n_cust)
                  * 1000000 // greatest(s.total, 1)
                  - ((s.n_cust + 1) * 1000000) // s.n_cust AS BIGINT) AS gini_ppm
      FROM rk r CROSS JOIN stats s
      GROUP BY s.n_cust, s.total
    ),
    dec AS (
      SELECT (r.rnk - 1) * 10 // s.n_cust + 1 AS decile,
             count(*) AS n_customers,
             CAST(sum(r.dollars) AS BIGINT) AS decile_dollars
      FROM rk r CROSS JOIN stats s
      GROUP BY (r.rnk - 1) * 10 // s.n_cust + 1
    )
    SELECT d.decile, d.n_customers, d.decile_dollars,
           CAST(CAST(sum(d.decile_dollars)
                  OVER (ORDER BY d.decile ROWS UNBOUNDED PRECEDING) AS HUGEINT)
                * 1000000 // greatest(s.total, 1) AS BIGINT) AS cum_share_ppm,
           g.gini_ppm
    FROM dec d CROSS JOIN stats s CROSS JOIN gini g
    """,
)
def orders_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: rank customers by lifetime revenue (whole
    dollars — exact-cents sums floored to dollars so the rank level is
    bounded-cardinality), cut into exact rank-deciles, and report each
    decile's customer count, revenue, and cumulative Lorenz share in
    exact ppm, plus the Gini coefficient from the rank formula
    G = 2·Σi·x_i/(n·Σx) − (n+1)/n. The Σi·x term and both ppm scale-ups
    run in DECIMAL(38,0) (oracle: HUGEINT) since round 8 — n·Σx/2 passes
    2^63 around sf 25, far below the 100-TB target, and ANSI Spark would
    throw where DuckDB silently widens. The one BIGINT intermediate left
    is the pre-ppm quotient 2·Σi·x/n ≤ 2·Σx, safe while total revenue
    < 4.6e18 whole dollars (~200× the 100-TB corpus). The
    who-pays-for-everything curve behind every account-tiering decision.

    Scale: one orders aggregate (shuffle on custkey); the global rank is
    ``two_phase_rank`` — per-level offsets over the BOUNDED distinct-dollar
    frame + in-level row_number, never a single-partition sort of the
    customer frame; deciles then aggregate to 10 rows and the cumulative
    window runs on those 10."""
    from ..operators.ranking import two_phase_rank
    from ..operators.staging import staged as _staged

    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)"
                " div 100"
            ).alias("dollars")
        )
    )
    rk = _staged(
        two_phase_rank(
            rev, "dollars", "o_custkey", rank_col="rnk", ascending=False
        )
    )
    stats = rk.agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("dollars").cast("bigint").alias("total"),
    )
    gini = (
        rk.crossJoin(F.broadcast(stats))
        .groupBy("n_cust", "total")
        .agg(
            F.sum(
                F.expr("cast(n_cust - rnk + 1 as decimal(38,0)) * dollars")
            ).alias("__six")
        )
        .select(
            F.expr(
                "cast(cast(2 * __six div n_cust as decimal(38,0)) * 1000000"
                " div greatest(total, 1)"
                " - ((n_cust + 1) * 1000000) div n_cust as bigint)"
            ).alias("gini_ppm")
        )
    )
    dec = (
        rk.crossJoin(F.broadcast(stats))
        .groupBy(
            F.expr("(rnk - 1) * 10 div n_cust + 1").alias("decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("dollars").cast("bigint").alias("decile_dollars"),
        )
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        dec.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(gini))
        .select(
            "decile",
            "n_customers",
            "decile_dollars",
            F.sum("decile_dollars").over(wcum).alias("__cum"),
            "total",
            "gini_ppm",
        )
        .select(
            "decile",
            "n_customers",
            "decile_dollars",
            F.expr(
                "cast(cast(__cum as decimal(38,0)) * 1000000"
                " div greatest(total, 1) as bigint)"
            ).alias("cum_share_ppm"),
            "gini_ppm",
        )
    )


# --------------------------------------------------------------------------
# orders_churn_risk — overdue customers vs their own cadence
# --------------------------------------------------------------------------


@register(
    "orders_churn_risk",
    oracle="""
    WITH days AS (
      SELECT o_custkey,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day
      FROM orders
    ),
    per AS (
      SELECT o_custkey, count(*) AS n_orders,
             min(day) AS first_day, max(day) AS last_day
      FROM days GROUP BY o_custkey
    ),
    mx AS (SELECT max(last_day) AS corpus_max FROM per)
    SELECT o_custkey, n_orders,
           CAST(last_day - first_day AS BIGINT) AS span_days,
           CAST(m.corpus_max - last_day AS BIGINT) AS days_since_last,
           CAST((m.corpus_max - last_day) * (n_orders - 1) * 1000000
                // greatest(last_day - first_day, 1) AS BIGINT) AS overdue_ppm,
           CAST(CASE WHEN (m.corpus_max - last_day) * (n_orders - 1)
                          > 2 * (last_day - first_day)
                     THEN 1 ELSE 0 END AS BIGINT) AS at_risk
    FROM per CROSS JOIN mx m
    WHERE n_orders >= 2
    """,
)
def orders_churn_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-risk screen: for every repeat customer, how overdue is their
    next order relative to their OWN historical cadence? The gap sum
    telescopes (Σ gaps = last − first), so mean inter-order gap needs no
    window — just min/max/count per customer; ``overdue_ppm`` is
    days-since-last over mean-gap in exact ppm (integer cross-multiplied:
    days_since·(n−1)·1e6 // span), and ``at_risk`` flags customers more
    than 2 mean gaps silent. All epoch-day BIGINT arithmetic; nonnegative
    operands so truncating division agrees across engines.

    Scale: one staged orders aggregate (shuffle on custkey, consumed by
    both the corpus max and the output) + a broadcast 1-row corpus max;
    no windows, no self-joins."""
    from ..operators.staging import staged as _staged

    # corpus_max is the max last-order day over ALL customers (the oracle's
    # mx CTE is computed before its WHERE n_orders >= 2) — filtering repeat
    # customers first would anchor "days since last" to a stale day whenever
    # the corpus's latest order belongs only to one-time customers.
    per_all = _staged(
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.expr(
                "cast(unix_timestamp(o_orderdate) div 86400 as bigint)"
            ).alias("day"),
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
        )
    )
    mx = per_all.agg(F.max("last_day").alias("corpus_max"))
    per = per_all.filter(F.col("n_orders") >= 2)
    return per.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        "n_orders",
        F.expr("cast(last_day - first_day as bigint)").alias("span_days"),
        F.expr("cast(corpus_max - last_day as bigint)").alias(
            "days_since_last"
        ),
        F.expr(
            "cast((corpus_max - last_day) * (n_orders - 1) * 1000000"
            " div greatest(last_day - first_day, 1) as bigint)"
        ).alias("overdue_ppm"),
        F.expr(
            "cast(CASE WHEN (corpus_max - last_day) * (n_orders - 1)"
            " > 2 * (last_day - first_day) THEN 1 ELSE 0 END as bigint)"
        ).alias("at_risk"),
    )


# --------------------------------------------------------------------------
# orders_mom_growth — month-over-month / year-over-year revenue growth
# --------------------------------------------------------------------------


@register(
    "orders_mom_growth",
    oracle="""
    WITH monthly AS (
      SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
               AS ym,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY 1
    )
    SELECT ym, rev_cents,
           round((rev_cents - lag(rev_cents, 1) OVER (ORDER BY ym)) * 1.0
                 / lag(rev_cents, 1) OVER (ORDER BY ym), 6) + 0.0 AS mom_growth,
           round((rev_cents - lag(rev_cents, 12) OVER (ORDER BY ym)) * 1.0
                 / lag(rev_cents, 12) OVER (ORDER BY ym), 6) + 0.0 AS yoy_growth
    FROM monthly
    """,
)
def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth over the
    observed-month sequence (the corpus has every calendar month, so the
    12-row lag IS the calendar year). Revenue is exact cents (per-term
    rounding before the sum); growth ratios are the only doubles, rounded
    6 dp with ``+ 0.0`` normalizing -0.0; first months are NULL by lag
    semantics — the trend table behind every revenue review.

    Scale: the fact table collapses to ~84 month rows in one map-side-
    combined aggregate; the unpartitioned lag window runs on that bounded
    calendar frame, never on data-sized rows."""
    monthly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.expr(
                "cast(year(o_orderdate) * 100 + month(o_orderdate) as bigint)"
            ).alias("ym")
        )
        .agg(
            F.sum(F.expr("cast(round(o_totalprice * 100) as bigint)"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    w = Window.orderBy("ym")
    mom = F.col("rev_cents") - F.lag("rev_cents", 1).over(w)
    yoy = F.col("rev_cents") - F.lag("rev_cents", 12).over(w)
    return monthly.select(
        "ym",
        "rev_cents",
        (
            F.round(mom * 1.0 / F.lag("rev_cents", 1).over(w), 6) + 0.0
        ).alias("mom_growth"),
        (
            F.round(yoy * 1.0 / F.lag("rev_cents", 12).over(w), 6) + 0.0
        ).alias("yoy_growth"),
    )
