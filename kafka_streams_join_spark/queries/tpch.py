"""TPC-H-shaped multi-join analytics over the driver corpus.

The reference has no relational engine at all (SURVEY §2.6), so these queries
exist to prove the rebuild's planner-facing surface on the classic shapes:
selective fact/dim joins (Q3), an EXISTS decorrelated to a semi join (Q4),
a five-way join with a co-location predicate (Q5), a group-by over a
three-way join (Q10), conditional aggregation (Q14), a correlated scalar
subquery (Q17), and disjunctive cross-table predicates (Q19). Predicates are
adapted to the corpus's 1995-2001 date range.

Scale notes: each query is written so Catalyst gets to make the right calls —
filters sit directly on scans (pushdown), only fixed-cardinality dimensions
(nation/region) carry broadcast hints while SF-proportional tables
(orders/customer/supplier/part) are left to Catalyst/AQE size estimation
(auto-broadcast at test scale, shuffle at 100 TB — a forced hint would OOM
there), and the correlated subquery is expressed
as a pre-aggregated self-join (one extra shuffle on l_partkey) rather than a
per-row re-scan. Top-k outputs carry a deterministic tiebreak column so the
LIMIT picks the same rows in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

def _rev4():
    # Revenue per row in 10^-4 dollars as EXACT integer arithmetic.
    # Double rounding is not cross-engine stable at half boundaries
    # (price*(1-disc) = ...684999999998 rounds .68 under Spark's HALF_UP on
    # the exact binary but .69 under DuckDB's decimal-string rounding), and
    # double summation is order-dependent besides. Prices and discounts are
    # exact 2-decimal values, so cents*(100-disc_pct) is an exact long and
    # the sum is bit-identical in any engine and any partition order.
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_pct = F.round(F.col("l_discount") * 100, 0).cast("long")
    return cents * (100 - disc_pct)


# Dollar total from the summed 10^-4 units: integer half-up, then an exact
# 2-decimal double. Spark `div` ≡ DuckDB `//` for non-negative longs. The
# outer CAST matters: Spark parses the `100.0` literal as DECIMAL, and a
# decimal revenue column canonicalizes with trailing zeros ('7162675.000000')
# where DuckDB's double prints '7162675' — type parity, not just value parity.
_REV_TOTAL = "CAST(((rev4 + 50) div 100) / 100.0 AS DOUBLE)"
_REV4_SQL = (
    "CAST(round(l.l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l.l_discount * 100) AS BIGINT))"
)
_REV_TOTAL_SQL = f"((sum({_REV4_SQL}) + 50) // 100) / 100.0"


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS l_orderkey,
           ((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100) / 100.0 AS revenue,
           o.o_orderdate AS o_orderdate,
           o.o_orderpriority AS o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 — top unshipped orders by revenue for one market segment.

    Plan shape at scale: both date filters push to the parquet scans;
    customer (filtered to one segment) broadcasts into orders, that result
    broadcasts-or-shuffles into lineitem by AQE's size call; one final
    aggregation shuffle on l_orderkey; TakeOrdered for the limit.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev4()).alias("rev4"))
        .withColumn("revenue", F.expr(_REV_TOTAL))
        .drop("rev4")
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier",
    oracle="""
    SELECT n.n_name AS n_name,
           ((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100) / 100.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 — revenue from orders where customer and supplier share a nation
    in one region. The c_nationkey = s_nationkey co-location predicate makes
    this the canonical join-ordering test: it only becomes an equi-key once
    both fact sides are assembled. Nation/region broadcast (hinted);
    supplier/customer/orders are Catalyst/AQE's call by size; lineitem, the
    one 100 TB table, is never shuffled before its selective joins."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_rev4()).alias("rev4"))
        .withColumn("revenue", F.expr(_REV_TOTAL))
        .drop("rev4")
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           ((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100) / 100.0 AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal, n.n_name AS n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 — customers ranked by revenue lost to returns in one quarter."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"), "n_name"
        )
        .agg(F.sum(_rev4()).alias("rev4"))
        .withColumn("revenue", F.expr(_REV_TOTAL))
        .drop("rev4")
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "tpch_q17_small_quantity",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_limit
      FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < t.qty_limit
    """,
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 — small-quantity-order revenue: the correlated scalar subquery
    (`l_quantity < 0.2 * avg(quantity) per part`) decorrelated into a
    pre-aggregated self-join, which is the plan every optimizer rewrites it
    to: one partial+final agg on l_partkey instead of a per-row re-scan.
    The brand-filtered part side joins by AQE's size call (auto-broadcast at test scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    limits = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_limit")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(limits, li.l_partkey == limits.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "tpch_q4_priority_returns",
    oracle="""
    SELECT o.o_orderpriority AS o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY 1
    """,
)
def tpch_q4_priority_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape — orders (one quarter) having at least one returned line,
    counted by priority. The EXISTS subquery IS a left-semi join — written
    as one directly, which is the decorrelation every optimizer performs.
    At scale the semi join only ships lineitem's join key (filtered to 'R'
    rows at the scan), never its payload, and duplicates die before the
    aggregate instead of inflating it."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q14_promo_share",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO' THEN
               CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
               ELSE 0 END)
             / sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))),
             4
           ) AS promo_share_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 — promo revenue share: conditional aggregation (CASE inside SUM)
    over a part join left to AQE's size call. Both sums are exact integer cents, so the
    quotient is built from bit-identical numerators in any engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", _rev4()).otherwise(F.lit(0)))
    total = F.sum(_rev4())
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(F.round(F.lit(100.0) * promo / total, 4).alias("promo_share_pct"))
    )


@register(
    "tpch_q19_disjunctive",
    oracle="""
    SELECT ((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100)
           / 100.0 AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 — the disjunctive-predicate join: three OR'd brand/size/quantity
    conjunctions spanning both tables. Catalyst extracts the common
    single-table conjuncts from the OR (brand ∈ {...}, size <= 15,
    quantity <= 30) and pushes them below the join, so the (auto-broadcast at test scale) build
    side carries only candidate parts; the residual OR evaluates post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        j.filter(clause)
        .agg(F.sum(_rev4()).alias("rev4"), F.count(F.lit(1)).alias("n_lines"))
        .withColumn("revenue", F.expr(_REV_TOTAL))
        .drop("rev4")
        .select("revenue", "n_lines")
    )
