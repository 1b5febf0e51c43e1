"""Relational operator surface (SURVEY §2.6).

The reference implements none of these (its 366 LoC have no groupBy, window,
sort, or set op) — they're the "deliberately-absent engine surface" the
rebuild fills with stock Catalyst operators. Each query outputs deterministic,
rounded values so the DuckDB hash-compare is stable.

Scale notes: every aggregate here is a partial+final hash aggregate (map-side
combine free from Catalyst); top-k per group uses a rank window, which at
100 TB shuffles once on the partition key — the same plan a hand-tuned
engine would pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table, register_views
from .registry import register

# --------------------------------------------------------------------------
# Aggregations — hash agg, distinct, rollup/cube/grouping sets, approx
# --------------------------------------------------------------------------


@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the canonical hash-aggregate probe."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_distinct_group",
    oracle="""
    SELECT o_orderpriority,
           count(*)                    AS n_orders,
           count(DISTINCT o_custkey)   AS n_customers,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped distinct aggregation (expand + two-phase agg under the hood)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gid,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*)                  AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (grouping-sets family)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") + 2 * F.grouping("l_linestatus")).cast("int").alias("gid"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gid,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping combinations via CUBE."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") + 2 * F.grouping("l_linestatus")).cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n")
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL path — same Expand plan as rollup/cube)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           1 AS sketch_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB substitute for
    exact COUNT(DISTINCT). Sketch estimates aren't cross-engine comparable
    (DuckDB's HLL differs), so the oracle-checkable claim is the sketch's
    CONTRACT: the query emits the exact count plus a flag that the HLL
    estimate landed within 5% of it. The sketch runs at rsd=0.01 so the
    5% gate sits ~5 standard deviations out — certifying the sketch
    without being a coin-flip on estimator noise across corpus
    regenerations. A sketch regression flips the flag and fails the
    driver's hash."""
    out = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
    )
    ok = (
        F.abs(F.col("approx_parts") - F.col("exact_parts"))
        / F.col("exact_parts")
        <= 0.05
    )
    return out.select(
        "l_returnflag", "exact_parts", ok.cast("int").alias("sketch_within_5pct")
    )


# --------------------------------------------------------------------------
# Window functions — ranking, running frames, lag/lead
# --------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — THE top-k idiom (rank window + filter).
    At scale: single shuffle on the partition key, no global sort."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer (running frame)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "window_rank_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           lag(o_orderkey)  OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + analytic (lag/lead) functions over one window spec."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


@register(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, event_id,
           CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_seq
    FROM flagged
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min gap) — lag + cumulative sum over gap flags.
    Batch twin of streaming session_window; one shuffle on user_id.

    The gap compare is microsecond-exact on both sides (unix_micros vs
    INTERVAL 30 MINUTE): a ts.cast("long") diff truncates sub-second parts,
    so a gap straddling 1800 s could flip a session boundary. The oracle
    CASTs its windowed sum to BIGINT (DuckDB sum(int) → HUGEINT → float in
    pandas, which the driver's hash distinguishes from Spark's BIGINT)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (us - F.lag(us).over(w) > 1_800_000_000) | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return flagged.select(
        "user_id", "event_id", F.sum("new_session").over(wsum).alias("session_seq")
    )


@register(
    "window_tumbling_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch twin of streaming window(ts, '1 hour'))."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


# --------------------------------------------------------------------------
# Sorts / limits / set ops
# --------------------------------------------------------------------------


@register(
    "sort_topk_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def sort_topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — Spark plans TakeOrderedAndProject (per-partition heap +
    driver merge), never a full sort, which is exactly what 100 TB needs."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("l_extendedprice"))
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set semantics — subtract, not exceptAll)."""
    ordered = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    building = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    return ordered.subtract(building)


# --------------------------------------------------------------------------
# Scalar function library — string / date / math / json / conditional
# --------------------------------------------------------------------------


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                    AS name_upper,
           substr(p_name, 1, 5)             AS name_prefix,
           length(p_name)                   AS name_len,
           replace(p_brand, 'Brand#', 'B-') AS brand_short,
           trim(concat(p_type, ' '))        AS type_trim
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B-")).alias("brand_short"),
        F.trim(F.concat(F.col("p_type"), F.lit(" "))).alias("type_trim"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                  AS order_year,
           month(o_orderdate)                 AS order_month,
           day(o_orderdate)                   AS order_day,
           date_trunc('month', o_orderdate)   AS order_month_start
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 4)             AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT)             AS qty_ceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           round(sqrt(l_quantity), 6)                   AS qty_sqrt,
           CAST(l_quantity AS BIGINT) % 7               AS qty_mod
    FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface. The oracle CASTs ceil/floor to BIGINT: DuckDB's
    ceil/floor return DOUBLE while Spark's return BIGINT, and the driver's
    hash is dtype-sensitive ("26.0" vs "26"). disc_dev is rounded to 4 dp on
    both sides per the registry rule."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
    )


@register(
    "scalar_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (the idiomatic from_json path for the reference's
    opaque-JSON values, SURVEY §1.2)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


@register(
    "scalar_case_when",
    oracle="""
    SELECT CASE WHEN value < 25 THEN 'low'
                WHEN value < 75 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def scalar_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.when(F.col("value") < 25, "low")
            .when(F.col("value") < 75, "mid")
            .otherwise("high")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50_price,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
           round(median(l_quantity), 4)                   AS med_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles/median per group. Spark's ``percentile`` and
    DuckDB's ``quantile_cont`` both linearly interpolate, so values agree.
    Exact percentile is a sort-based agg (one shuffle on the group key); the
    scale path swaps in ``approx_percentile`` (t-digest, mergeable sketch)
    when a bounded-error answer suffices — see ``agg_approx_distinct`` for
    the rows-only sketch pattern."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 4).alias("p50_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95_price"),
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
    )


@register(
    "window_sliding_agg",
    oracle="""
    WITH slid AS (
      SELECT value,
             make_timestamp((CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800
                             - k * 1800) * 1000000) AS win_start,
             ts
      FROM events, unnest([0, 1]) AS t(k)
    )
    SELECT win_start,
           win_start + INTERVAL 1 HOUR AS win_end,
           count(*)                    AS n_events,
           round(sum(value), 2)        AS sum_value
    FROM slid
    WHERE ts >= win_start AND ts < win_start + INTERVAL 1 HOUR
    GROUP BY win_start
    """,
)
def window_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 h window, 30 min slide) — each event
    lands in exactly 2 overlapping windows. Spark's ``window()`` expands the
    row (a projection, no join) then hash-aggregates; epoch-aligned starts
    are mirrored manually in the oracle. This is the batch twin of the
    streaming sliding-window aggregation (same ``window()`` call under
    ``readStream``)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "pivot_status_revenue",
    oracle="""
    SELECT o_orderpriority,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS rev_f,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS rev_o,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS rev_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (rows → columns): revenue per priority × status. Explicit pivot
    values keep the plan a single pass (no extra distinct-values job) — at
    100 TB an unlisted pivot would scan the fact table twice."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
        .withColumnRenamed("F", "rev_f")
        .withColumnRenamed("O", "rev_o")
        .withColumnRenamed("P", "rev_p")
    )


@register(
    "scalar_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding)                                        AS dim,
           round(CAST(list_max(embedding) AS DOUBLE), 4) + 0.0   AS vmax,
           round(CAST(list_min(embedding) AS DOUBLE), 4) + 0.0   AS vmin,
           round(CAST(embedding[1] AS DOUBLE), 4) + 0.0          AS first_v,
           round(CAST(embedding[-1] AS DOUBLE), 4) + 0.0         AS last_v,
           round(CAST(list_sort(embedding)[5] AS DOUBLE), 4) + 0.0 AS sorted_5th,
           round(list_sum(list_transform(embedding[1:8],
                 x -> CAST(x AS DOUBLE))), 4) + 0.0              AS head8_sum
    FROM embeddings
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function surface over the embedding column: size, min/max,
    element_at (positive + negative index), array_sort, slice + fold. All
    JVM-side lambda expressions — no Python in the loop.

    The oracle adds ``+ 0.0`` after every round: DuckDB's round keeps IEEE
    -0.0 where Spark's BigDecimal-based round never produces it, and the
    hash serializes "-0.0" ≠ "0.0" (bit at sf0.1, where a cell rounds to
    negative zero; the sf0.01 corpus happened not to contain one)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("vmax"),
        F.round(F.array_min("embedding").cast("double"), 4).alias("vmin"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_v"),
        F.round(F.element_at("embedding", -1).cast("double"), 4).alias("last_v"),
        F.round(F.element_at(F.array_sort("embedding"), 5).cast("double"), 4).alias(
            "sorted_5th"
        ),
        F.round(
            F.expr(
                "aggregate(slice(embedding, 1, 8), cast(0 as double),"
                " (acc, x) -> acc + cast(x as double))"
            ),
            4,
        ).alias("head8_sum"),
    )


@register(
    "scalar_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           len(json_keys(props))                             AS n_keys,
           array_to_string(json_keys(props), ',')            AS keys_csv
    FROM events
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function surface: parse the props JSON into a real
    ``map<string,bigint>`` then element_at / map_keys / array_join — the
    typed-map path the reference's opaque-JSON values map onto (SURVEY
    §1.2). The oracle checks the same facts via DuckDB's JSON functions."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


# --------------------------------------------------------------------------
# Join taxonomy beyond the reference (SURVEY §2.3 notes the reference has no
# right/full outer, cross, or lookup joins — the engine surface fills them)
# --------------------------------------------------------------------------


@register(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer equi-join — customers kept even with no orders. The dim
    side is broadcast-sized; Catalyst picks BroadcastHashJoin and the fact
    side never shuffles."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right_outer").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "join_full_outer",
    oracle="""
    WITH buyers AS (
      SELECT o_custkey, count(*) AS n_orders FROM orders
      WHERE o_totalprice > 400000 GROUP BY o_custkey
    ),
    big AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000
    )
    SELECT coalesce(b.o_custkey, g.c_custkey) AS custkey,
           b.n_orders, g.c_acctbal
    FROM buyers b FULL JOIN big g ON b.o_custkey = g.c_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two derived sets with partial overlap — both
    unmatched sides survive with nulls. Full outer can't broadcast (both
    sides must see all unmatched keys), so this is the one join here that
    must shuffle both inputs — exactly what a planner should pick."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    buyers = (
        o.filter(F.col("o_totalprice") > 400000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    big = c.filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_acctbal")
    j = buyers.join(big, buyers.o_custkey == big.c_custkey, "full_outer")
    return j.select(
        F.coalesce("o_custkey", "c_custkey").alias("custkey"),
        "n_orders",
        "c_acctbal",
    )


@register(
    "join_cross",
    oracle="""
    SELECT n.n_name, r.r_name
    FROM nation n CROSS JOIN region r
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product of two tiny dims (25 x 5). Legitimate only
    when one side is broadcast-tiny; anything larger must be an error, which
    is why plans.assert_no_cartesian exists for the data path."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.crossJoin(r).select("n_name", "r_name")


@register(
    "join_star_revenue",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           round(sum(o.o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY 1, 2
    """,
)
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema rollup (TPC-H Q5 shape): fact ⋈ three dimension tables →
    two-level group-by. The scale plan: nation/region broadcast (hinted —
    fixed 25/5 rows at any scale); customer is SF-proportional, so its join
    strategy is Catalyst/AQE's call (auto-broadcast at test scale, shuffle
    at 100 TB); the date filter pushes to the parquet scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1995-01-01"
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50_exact,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_exact,
           1 AS sketch_within_2pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch twin of ``agg_percentiles``: approx_percentile is a mergeable
    sketch — partial sketches combine map-side, so the exact path's
    per-group sort never happens. At 100 TB this is the default and the
    exact percentile is the special case. Sketch internals aren't
    cross-engine comparable, so (like ``agg_approx_distinct``) the
    oracle-certified claim is the contract: exact percentiles plus a flag
    that both sketch estimates landed within 2% relative error. At
    accuracy=50000 the guaranteed rank error is 1/50000 (~4 ranks per
    group here) — orders of magnitude inside the 2% value gate on this
    price distribution, so the flag is not estimator-noise-sensitive."""
    li = load_table(spark, sf_dir, "lineitem")
    out = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 50000)").alias("a50"),
        F.expr("approx_percentile(l_extendedprice, 0.95, 50000)").alias("a95"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("e50"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("e95"),
    )
    ok = (F.abs(F.col("a50") - F.col("e50")) / F.col("e50") <= 0.02) & (
        F.abs(F.col("a95") - F.col("e95")) / F.col("e95") <= 0.02
    )
    return out.select(
        "l_returnflag",
        F.round("e50", 4).alias("p50_exact"),
        F.round("e95", 4).alias("p95_exact"),
        ok.cast("int").alias("sketch_within_2pct"),
    )


@register(
    "udaf_geomean_price",
    oracle="""
    SELECT l_returnflag,
           round(exp(avg(ln(l_extendedprice))), 4) AS geomean_price,
           count(*) AS n
    FROM lineitem
    GROUP BY 1
    """,
)
def udaf_geomean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF surface (SURVEY §2.6): a grouped-agg pandas_udf — the Spark
    analogue of the reference's Processor-API extension point
    (TopicShifter.scala:22-37), but vectorized over Arrow batches.

    Scale: grouped-agg pandas UDFs get the partial/final split from Spark's
    AggregateInPandas only per full group, so the shuffle carries raw rows —
    fine for a true custom aggregate, which is the one case that earns
    Python on the data path. (Anything expressible as built-ins — including
    this geomean, used here precisely because an exp(avg(ln)) oracle can
    verify the UDAF machinery — should stay JVM-side.)
    """
    import numpy as np

    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType instead of type hints: `from __future__ import annotations`
    # stringifies hints, which pandas_udf's signature inference can't resolve.
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def geomean(v):
        return float(np.exp(np.log(v.to_numpy()).mean()))

    # Spark disallows mixing pandas and built-in aggregates in one agg(), so
    # the row count is a second pandas UDAF rather than F.count.
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def n_rows(v):
        return len(v)

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(geomean("l_extendedprice"), 4).alias("geomean_price"),
        n_rows("l_extendedprice").alias("n"),
    )


@register(
    "udtf_sentence_split",
    oracle="""
    WITH parts AS (
      SELECT doc_id, string_split(text, '. ') AS p FROM documents
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS sentence_id,
           p[i] AS sentence
    FROM parts, unnest(generate_series(1, len(p))) AS t(i)
    """,
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF surface (SURVEY §2.6): a Python user-defined TABLE function —
    one input row expands to N output rows — applied laterally per document.
    Completes the extension trifecta next to ``udaf_geomean_price`` (UDAF)
    and the mapInPandas kernels (vectorized map).

    Like the UDAF, this exists to prove the machinery with an
    oracle-checkable deterministic function (naive '. ' sentence split);
    anything expressible as built-ins (this one ≡ posexplode(split(...)))
    should stay JVM-side — the docstring IS the scale warning: Python UDTFs
    evaluate row-at-a-time."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="sentence_id int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            for i, part in enumerate(text.split(". ")):
                yield i + 1, part

    spark.udtf.register("split_sentences", SplitSentences)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence_id, s.sentence
        FROM documents d, LATERAL split_sentences(d.text) s
        """
    )


@register(
    "latest_state_per_user",
    oracle="""
    SELECT user_id, event_id AS last_event_id, ts AS last_ts,
           event_type AS last_type
    FROM (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def latest_state_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction (a KTable, in the reference's vocabulary): the
    newest record per key, ties broken by event_id so the winner is unique.

    Scale: one shuffle on the key with a rank window — the same plan as
    window_topk_per_group with k=1. At 100 TB this is how a CDC stream
    becomes a queryable snapshot; the streaming twin is dropDuplicates over
    a watermark (streaming/topology.py)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
        )
    )


@register(
    "window_trailing_1h",
    oracle="""
    SELECT event_id, user_id, ts,
           count(*) OVER w AS n_events_1h,
           max(value) OVER w AS max_value_1h
    FROM events
    WINDOW w AS (
      PARTITION BY user_id
      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)  -- floor: Spark's
        -- unix_timestamp truncates sub-second parts; a bare BIGINT cast in
        -- DuckDB ROUNDS the epoch double, shifting frame boundaries by 1 s
      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    )
    """,
)
def window_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row trailing-hour features via a RANGE frame over epoch seconds —
    the sliding-feature shape ML pipelines compute per event (the ROW-frame
    windows elsewhere count rows, not time). Count and max only: both are
    order-insensitive, so the hash is engine-stable without rounding.

    Scale: one shuffle on user_id + a per-partition sort; the frame is
    time-bounded, so window state is O(events-per-hour-per-user), not
    O(history)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
        F.max("value").over(w).alias("max_value_1h"),
    )


@register(
    "agg_sketch_rollup",
    oracle="""
    SELECT r.r_name,
           count(DISTINCT c.c_custkey) AS exact_customers,
           1 AS sketch_within_5pct
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
)
def agg_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — THE 100 TB distinct-count pattern: build
    one HLL sketch per nation (a pre-aggregated sketch table a real
    deployment materializes once), then roll up to region by UNIONING the
    sketches (``hll_union_agg``) instead of touching raw rows again.
    Distinct counts don't compose across groups (|A∪B| ≠ |A|+|B|) but
    sketches do — re-aggregating a 25-row sketch table replaces a second
    full scan of the fact table. The oracle certifies the contract: exact
    per-region distinct count plus a flag that the estimate from the
    union-of-sketches landed within 5% (lgConfigK=14 → ~0.8% rsd, so the
    gate sits far outside estimator noise)."""
    from ..operators.staging import staged

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # staged: the sketch branch and the exact-verification branch both
    # consume the customer⋈nation frame — one fact scan, not two
    joined = staged(
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "n_nationkey", "n_regionkey")
    )
    per_nation = joined.groupBy("n_nationkey", "n_regionkey").agg(
        F.hll_sketch_agg("c_custkey", F.lit(14)).alias("sk")
    )
    per_region = (
        per_nation.join(
            F.broadcast(region), per_nation.n_regionkey == region.r_regionkey
        )
        .groupBy("r_name")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_customers")
        )
    )
    exact = (
        joined.join(F.broadcast(region), joined.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.countDistinct("c_custkey").alias("exact_customers"))
    )
    ok = (
        F.abs(F.col("approx_customers") - F.col("exact_customers"))
        / F.col("exact_customers")
        <= 0.05
    )
    return (
        per_region.join(exact, "r_name")
        .select(
            "r_name",
            "exact_customers",
            ok.cast("int").alias("sketch_within_5pct"),
        )
    )


# --------------------------------------------------------------------------
# agg_incremental_merge — incremental view maintenance, proven in-row
# --------------------------------------------------------------------------

_IVM_CUTOFF = "1997-01-01"  # old batch strictly before; delta at/after


@register(
    "agg_incremental_merge",
    oracle=f"""
    WITH base AS (
      SELECT l_returnflag, l_linestatus, l_shipdate,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
      FROM lineitem
    ),
    old AS (
      SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(cents) AS cents
      FROM base WHERE l_shipdate < DATE '{_IVM_CUTOFF}' GROUP BY 1, 2
    ),
    delta AS (
      SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(cents) AS cents
      FROM base WHERE l_shipdate >= DATE '{_IVM_CUTOFF}' GROUP BY 1, 2
    ),
    merged AS (
      SELECT COALESCE(o.l_returnflag, d.l_returnflag) AS l_returnflag,
             COALESCE(o.l_linestatus, d.l_linestatus) AS l_linestatus,
             COALESCE(o.cnt, 0) + COALESCE(d.cnt, 0) AS cnt,
             CAST(COALESCE(o.cents, 0) + COALESCE(d.cents, 0) AS BIGINT) AS cents
      FROM old o FULL OUTER JOIN delta d
        ON o.l_returnflag = d.l_returnflag AND o.l_linestatus = d.l_linestatus
    ),
    full_agg AS (
      SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM base GROUP BY 1, 2
    )
    SELECT m.l_returnflag, m.l_linestatus, m.cnt, m.cents,
           CAST(m.cnt = f.cnt AND m.cents = f.cents AS INT) AS merge_consistent
    FROM merged m JOIN full_agg f
      ON f.l_returnflag = m.l_returnflag AND f.l_linestatus = m.l_linestatus
    """,
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for an algebraic aggregate: the fact
    table splits into an OLD batch (shipped before {_IVM_CUTOFF}) and a
    DELTA (at/after), each aggregates independently, and the per-group
    merge ``(cnt_old + cnt_delta, sum_old + sum_delta)`` is certified
    IN-ROW against the from-scratch aggregate (``merge_consistent`` — a
    live flag, its liveness pinned by pytest per the sketch-flag advice).
    This is the contract that lets a 100 TB daily pipeline aggregate ONLY
    the new partition and fold it into yesterday's materialized rollup —
    the batch analogue of the streaming partial-state merge, and the same
    mergeability the HLL sketch rollup certifies for approximate state.
    Sums are exact integer cents, so merged and from-scratch totals are
    bit-identical, never merely close.

    Plan: the split is a pushed date predicate over one staged scan; each
    aggregate is partial+final map-side combined; the merge is a
    group-key-sized full outer join (handles groups present in only one
    batch — COALESCE on both sides); the certification join is
    group-key-sized too. At scale the full_agg leg exists only in this
    proof query — production keeps the materialized rollup and runs just
    the delta+merge legs."""
    from ..operators.staging import staged as _staged

    base = _staged(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
            F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        )
    )
    keys = ["l_returnflag", "l_linestatus"]

    def _agg(df):
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("cents").alias("cents")
        )

    old = _agg(base.filter(F.col("l_shipdate") < F.lit(_IVM_CUTOFF).cast("date")))
    delta = _agg(base.filter(F.col("l_shipdate") >= F.lit(_IVM_CUTOFF).cast("date")))
    o = old.alias("o")
    d = delta.alias("d")
    merged = o.join(
        d,
        (F.col("o.l_returnflag") == F.col("d.l_returnflag"))
        & (F.col("o.l_linestatus") == F.col("d.l_linestatus")),
        "full",
    ).select(
        F.coalesce(F.col("o.l_returnflag"), F.col("d.l_returnflag")).alias(
            "l_returnflag"
        ),
        F.coalesce(F.col("o.l_linestatus"), F.col("d.l_linestatus")).alias(
            "l_linestatus"
        ),
        (
            F.coalesce(F.col("o.cnt"), F.lit(0)) + F.coalesce(F.col("d.cnt"), F.lit(0))
        ).alias("cnt"),
        (
            F.coalesce(F.col("o.cents"), F.lit(0))
            + F.coalesce(F.col("d.cents"), F.lit(0))
        ).alias("cents"),
    )
    full_agg = _agg(base).select(
        F.col("l_returnflag").alias("f_rf"),
        F.col("l_linestatus").alias("f_ls"),
        F.col("cnt").alias("f_cnt"),
        F.col("cents").alias("f_cents"),
    )
    return merged.join(
        full_agg,
        (F.col("l_returnflag") == F.col("f_rf"))
        & (F.col("l_linestatus") == F.col("f_ls")),
    ).select(
        *keys,
        "cnt",
        "cents",
        (
            (F.col("cnt") == F.col("f_cnt")) & (F.col("cents") == F.col("f_cents"))
        )
        .cast("int")
        .alias("merge_consistent"),
    )


@register(
    "window_dist_functions",
    oracle="""
    SELECT event_id, event_type,
           round(value, 2) AS value2,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY round(value, 2), event_id)
    """,
)
def window_dist_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution-window trio — percent_rank, cume_dist, ntile —
    per event type over the value column, completing the window-function
    surface next to rank/lag/running sums. The oracle states them as the
    standard window functions over the (2-dp value, event_id) total
    order; the Spark plan computes the SAME numbers as a TWO-PHASE
    decomposition (the ``operators/ranking.py`` idea, per partition key):
    a window partitioned only by event_type would sort each type's whole
    share of the table in one task — parallelism capped at the type
    count, the shape the single-partition gates exist to kill.

    Decomposition: (1) per-(type, 2-dp-value) LEVEL counts — bounded by
    types × distinct rounded values, not rows; (2) exclusive cumulative
    offsets + per-type totals as windows over that bounded level frame;
    (3) the per-row rank = level offset + row_number within the FINE
    (type, value) partition. Then all three functions are position
    arithmetic: percent_rank = (rank−1)/(n−1), cume_dist =
    (offset + level size)/n, and ntile(4) by the standard
    first-(n mod 4)-tiles-are-bigger rule — exact rationals in both
    engines, doubles rounded at 6 dp."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round("value", 2).alias("value2")
    )
    lvl_w = Window.partitionBy("event_type").orderBy("value2").rowsBetween(
        Window.unboundedPreceding, -1
    )
    type_w = Window.partitionBy("event_type")
    levels = (
        ev.groupBy("event_type", "value2")
        .agg(F.count(F.lit(1)).alias("lvl_n"))
        .select(
            "event_type",
            "value2",
            "lvl_n",
            F.coalesce(F.sum("lvl_n").over(lvl_w), F.lit(0)).alias("off"),
            F.sum("lvl_n").over(type_w).alias("n"),
        )
    )
    in_lvl = Window.partitionBy("event_type", "value2").orderBy("event_id")
    ranked = (
        ev.join(levels, ["event_type", "value2"])
        .withColumn("rnk", F.col("off") + F.row_number().over(in_lvl))
    )
    # ntile(4), standard rule: the first (n mod 4) tiles hold ceil(n/4)
    ntile4 = F.expr(
        """
        CASE WHEN rnk <= (n % 4) * (n div 4 + 1)
             THEN cast((rnk - 1) div (n div 4 + 1) + 1 as int)
             ELSE cast((n % 4)
                  + (rnk - 1 - (n % 4) * (n div 4 + 1)) div (n div 4)
                  + 1 as int)
        END
        """
    )
    return ranked.select(
        "event_id",
        "event_type",
        "value2",
        F.round(
            F.when(F.col("n") == 1, F.lit(0.0)).otherwise(
                (F.col("rnk") - 1) / (F.col("n") - 1)
            ),
            6,
        ).alias("pct_rank"),
        F.round(F.col("rnk") / F.col("n"), 6).alias("cume"),
        ntile4.alias("quartile"),
    )


@register(
    "agg_mode_per_key",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS modal_type, n AS modal_n FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY n DESC, event_type) AS r
      FROM c
    ) WHERE r = 1
    """,
)
def agg_mode_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key mode — each user's most frequent event type — WITHOUT the
    engines' built-in ``mode()`` (whose tie rules differ and are
    unspecified): the tie-break is explicit, (count desc, type asc), and
    the argmax is a map-side-combining ``min(struct(-n, type))`` aggregate
    (the ``assign_to_codebook`` trick), never a rank window over the
    per-user frame. The oracle states the same contract as a window so the
    aggregate's equivalence is hash-certified.

    Scale: two map-side-combined aggregates — (user, type) then user —
    both key-bounded; nothing else moves."""
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        c.groupBy("user_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("n")).alias("neg_n"), F.col("event_type").alias("t")
                )
            ).alias("mn")
        )
        .select(
            "user_id",
            F.col("mn.t").alias("modal_type"),
            (-F.col("mn.neg_n")).cast("long").alias("modal_n"),
        )
    )


# --------------------------------------------------------------------------
# round-7 wave 5: bitwise scalar surface, FILTER-clause aggregates,
# multiset (ALL) set operations
# --------------------------------------------------------------------------


@register(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT l_orderkey * 16 + l_linenumber AS key_id,
           (l_orderkey * 16 + l_linenumber) & 255 AS band,
           (l_orderkey * 16 + l_linenumber) | 4096 AS bor,
           xor(l_orderkey * 16 + l_linenumber, 1365) AS bxor,
           ((l_orderkey * 16 + l_linenumber) & 1023) << 3 AS shl,
           (l_orderkey * 16 + l_linenumber) >> 2 AS shr,
           CAST(bit_count(CAST(l_orderkey * 16 + l_linenumber AS BIGINT))
                AS BIGINT) AS bcount
    FROM lineitem
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar library: AND/OR/XOR, shifts, popcount — the ops
    every hash/bucket/bloom implementation in this repo leans on, here
    surfaced as first-class scalars (Spark ``& | ^ shiftleft shiftright
    bit_count`` ≡ DuckDB ``& | xor() << >> bit_count``). Pure per-row
    codegen over a 2-column projection; no shuffle at any scale."""
    k = "l_orderkey * 16 + l_linenumber"
    return load_table(spark, sf_dir, "lineitem").select(
        F.expr(f"{k}").alias("key_id"),
        F.expr(f"({k}) & 255").alias("band"),
        F.expr(f"({k}) | 4096").alias("bor"),
        F.expr(f"({k}) ^ 1365").alias("bxor"),
        F.expr(f"shiftleft(({k}) & 1023, 3)").cast("long").alias("shl"),
        F.expr(f"shiftright({k}, 2)").alias("shr"),
        F.expr(f"cast(bit_count({k}) as bigint)").alias("bcount"),
    )


@register(
    "agg_filtered_aggregates",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           count(*) FILTER (WHERE l_discount >= 0.05) AS n_highdisc,
           CAST(coalesce(round(sum(l_quantity)
                  FILTER (WHERE l_shipdate < TIMESTAMP '1995-01-01')), 0)
                AS BIGINT) AS qty_early,
           CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  FILTER (WHERE l_discount >= 0.05), 0)
                AS BIGINT) AS rev_cents_highdisc,
           CAST(count(DISTINCT l_partkey)
                  FILTER (WHERE l_quantity >= 40) AS BIGINT) AS n_parts_bulk
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates: per-aggregate predicates inside ONE
    grouped pass (count / sum / distinct-count each with its own WHERE) —
    the SQL:2003 surface that otherwise forces N scans or N conditional
    CASE pyramids. Sums use the repo's exact contracts (integral-valued
    quantities rounded after the sum; prices per-term-rounded to cents
    before it); empty filter groups coalesce to 0 on both engines.

    Scale: a single map-side-combined hash aggregate over a 6-column
    projection — the per-aggregate filters evaluate row-side before the
    combine, so the shuffle carries only the 4-group partials."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("count(1) FILTER (WHERE l_discount >= 0.05D)").alias(
            "n_highdisc"
        ),
        F.expr(
            "cast(coalesce(round(sum(l_quantity)"
            " FILTER (WHERE l_shipdate < TIMESTAMP '1995-01-01')), 0)"
            " as bigint)"
        ).alias("qty_early"),
        F.expr(
            "cast(coalesce(sum(cast(round(l_extendedprice * 100) as bigint))"
            " FILTER (WHERE l_discount >= 0.05D), 0) as bigint)"
        ).alias("rev_cents_highdisc"),
        F.expr(
            "cast(count(DISTINCT l_partkey) FILTER (WHERE l_quantity >= 40D)"
            " as bigint)"
        ).alias("n_parts_bulk"),
    )


@register(
    "set_ops_all",
    oracle="""
    WITH a AS (
      SELECT l_partkey, l_suppkey FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1995-06-01'
    ),
    b AS (
      SELECT l_partkey, l_suppkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-06-01'
    )
    SELECT 'intersect_all' AS op, l_partkey, l_suppkey
    FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'except_all', l_partkey, l_suppkey
    FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    """,
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations — INTERSECT ALL / EXCEPT ALL preserve
    multiplicity (a (part, supp) pair shipped 3× early and 2× late
    intersects twice and excepts once), the bag semantics the DISTINCT
    variants (``set_intersect`` / ``set_except``) deliberately erase.
    Split point is a fixed calendar date so both legs are partition-
    prunable scans.

    Scale: Spark plans both as a single hash aggregate per side (count
    per key, then min/diff of multiplicities) — one shuffle each on the
    pair key, no sort; the two legs union without a barrier."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate"
    )
    cut = F.to_timestamp(F.lit("1995-06-01"))
    a = li.filter(F.col("l_shipdate") < cut).drop("l_shipdate")
    b = li.filter(F.col("l_shipdate") >= cut).drop("l_shipdate")
    inter = a.intersectAll(b).select(
        F.lit("intersect_all").alias("op"), "l_partkey", "l_suppkey"
    )
    exc = a.exceptAll(b).select(
        F.lit("except_all").alias("op"), "l_partkey", "l_suppkey"
    )
    return inter.unionAll(exc)
