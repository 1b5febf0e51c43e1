"""TPC-H extension set (round 2) — seven more classic shapes over the corpus.

Complements queries/tpch.py with: a pure scan-aggregate with a banded
predicate (Q6), international volume shipping with a symmetric nation-pair
condition (Q7), a left-join histogram that keeps the zero bucket (Q13), a
reused derived relation consumed twice (Q15), a distinct-count rollup with
an anti-join exclusion (Q16-adapted: the corpus has no partsupp, so supplier
participation comes from lineitem), a HAVING-subquery decorrelated to a semi
join (Q18), and scalar-subquery + anti-join composition (Q22). Predicates
adapt to the corpus ranges (dates 1995-2001, quantity 1-50, discount
0-0.1); revenue uses the exact integer-cents arithmetic from
queries/tpch.py so sums are bit-identical across engines.

Sweep placement is automatic: queries/__init__.py sorts driver-unproven
queries into the sweep window from the checked-in CORRECTNESS_r*.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register


@register(
    "tpch_q6_revenue_forecast",
    oracle="""
    SELECT ((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_discount * 100) AS BIGINT)) + 50) // 100) / 100.0
             AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def tpch_q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 — revenue increase from eliminating small-quantity discounts.

    The canonical scan-aggregate: every predicate (date band, discount band,
    quantity cap) pushes to the parquet scan, the aggregate is one
    partial+final pass with no shuffle of raw rows — at 100 TB this query
    is I/O-bound and reads only 4 columns of row groups whose min/max
    statistics overlap the bands."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_pct = F.round(F.col("l_discount") * 100, 0).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(cents * disc_pct).alias("rev4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            F.expr("CAST(((rev4 + 50) div 100) / 100.0 AS DOUBLE)").alias("revenue"),
            "n_lines",
        )
    )


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ((sum(rev4) + 50) // 100) / 100.0 AS revenue
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev4
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
      WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
          OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 — shipping volume between two nations, by direction and year.

    The symmetric pair predicate is a disjunction ACROSS two dimension
    joins. Only the fixed-cardinality nation copies carry broadcast hints;
    supplier/orders/customer are SF-proportional, so their join strategy is
    left to Catalyst/AQE size estimation (they auto-broadcast at test scale,
    shuffle at 100 TB — a forced hint would OOM there)."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ns = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_pct = F.round(F.col("l_discount") * 100, 0).cast("long")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        # only fixed-size nation copies are hinted; supplier/orders/customer
        # are SF-proportional — Catalyst/AQE picks their strategy by
        # measured size (a forced hint would OOM at scale)
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(cents * (100 - disc_pct)).alias("rev4"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.expr("CAST(((rev4 + 50) div 100) / 100.0 AS DOUBLE)").alias("revenue"),
        )
    )


@register(
    "tpch_q16_supplier_part_count",
    oracle="""
    SELECT p.p_brand AS p_brand, p.p_type AS p_type, p.p_size AS p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 (adapted: supplier participation via lineitem — the corpus has no
    partsupp) — how many suppliers can furnish each qualifying part group,
    excluding complaint-flagged suppliers (negative account balance).

    Plan shape: LEFT ANTI against the (selective, but SF-proportional)
    exclusion list and a part join whose strategy Catalyst/AQE picks by
    measured size — both auto-broadcast at test scale without a forced
    hint; the distinct count is Catalyst's two-phase expand aggregate,
    shuffled once on the group key."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q18_large_volume",
    oracle="""
    SELECT c.c_name AS c_name, c.c_custkey AS c_custkey,
           o.o_orderkey AS o_orderkey, o.o_orderdate AS o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    GROUP BY 1, 2, 3, 4, o.o_totalprice
    """,
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 — customers who placed large-volume orders (sum of quantities
    over an order above threshold).

    The HAVING subquery decorrelates to: aggregate lineitem once on
    l_orderkey, keep qualifying keys, LEFT SEMI join back — the qualifying
    set is tiny, so it broadcasts and the fact table is scanned exactly
    twice (once to build the filter, once for the final rollup), each a
    single shuffle on the order key."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        # only the qualifying-key set broadcasts (it's HAVING-filtered and
        # tiny); orders/customer are fact-sized, so their join strategy is
        # left to Catalyst/AQE rather than a forced hint
        li.join(big.withColumnRenamed("l_orderkey", "big_key"),
                li.l_orderkey == F.col("big_key"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty",
        )
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 — distribution of customers by order count, INCLUDING customers
    with zero orders (the left join is the point: an inner join would drop
    the zero bucket). Predicate adapted to the corpus (no o_comment column —
    non-urgent orders play the 'special requests' exclusion).

    Plan: customer left-joins the filtered fact on the customer key (one
    shuffle), then two cheap aggregations — count per customer, histogram
    over counts. At 100 TB the second agg's key space is tiny (max orders
    per customer), so the final shuffle is negligible."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
           ((r.rev4 + 50) // 100) / 100.0 AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.rev4 = (SELECT max(rev4) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 — the supplier(s) with maximum revenue in a quarter: a reused
    derived relation (the reference SQL creates a VIEW) consumed twice —
    once aggregated to its max, once filtered against it.

    Plan: revenue is one partial+final agg over the date-sliced fact scan;
    the max is a 1-row broadcast (hinted — genuinely bounded); supplier is
    SF-proportional so its join strategy is left to Catalyst/AQE. Exact
    integer-cents revenue makes the max comparison exact — a double-rounding
    tie at the max would be engine-dependent."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_pct = F.round(F.col("l_discount") * 100, 0).cast("long")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(cents * (100 - disc_pct)).alias("rev4")
    )
    max_rev = revenue.agg(F.max("rev4").alias("max_rev4"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("rev4") == F.col("max_rev4"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.expr("CAST(((rev4 + 50) div 100) / 100.0 AS DOUBLE)").alias(
                "total_revenue"
            ),
        )
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH pos AS (
      SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS tot,
             count(*) AS n
      FROM customer WHERE c_acctbal > 0.0
    ),
    eligible AS (
      SELECT c_custkey, c_acctbal,
             CAST(c_nationkey % 7 AS INTEGER) AS cntrycode
      FROM customer, pos
      WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n > tot
    )
    SELECT cntrycode, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM eligible e
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = e.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    GROUP BY cntrycode
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 — well-funded customers with no RECENT orders, bucketed by country
    code (adapted: nationkey % 7 plays the phone-prefix country code, and
    the anti join checks orders since 2000 — the corpus's densely-ordering
    customers make the literal never-ordered set empty, which would reduce
    the check to an empty-result hash). Composes a scalar subquery
    (corpus-wide average balance), an anti join (NOT EXISTS), and a rollup.

    Plan: the average is a 1-row broadcast; the anti join's right side is
    just order custkeys (projected before the join); one final shuffle on
    the 7-value country code.

    The above-average predicate is the exact integer cross-multiply
    ``cents × n > total_cents``, NOT ``c_acctbal > avg(c_acctbal)``: a
    float64 average is summation-order-dependent, so Spark's partial/final
    aggregation and DuckDB's scan-order sum can disagree by an ulp and flip
    boundary customers between engines."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    stats = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(cents).alias("tot"), F.count(F.lit(1)).alias("n")
    )
    eligible = (
        c.join(F.broadcast(stats))
        .filter(cents * F.col("n") > F.col("tot"))
        .select(
            "c_custkey",
            "c_acctbal",
            (F.col("c_nationkey") % 7).cast("int").alias("cntrycode"),
        )
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        eligible.join(o, eligible.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "tpch_q12_shipmode_priority",
    oracle="""
    SELECT CASE l_suppkey % 3 WHEN 0 THEN 'AIR' WHEN 1 THEN 'RAIL'
           ELSE 'SHIP' END AS shipmode,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 — order-priority mix per ship mode over a one-year ship-date band
    (adapted: the corpus has no l_shipmode, so a deterministic supplier hash
    plays the mode; the shape under test — fact-fact equi-join feeding
    conditional CASE-sum aggregation — is Q12's).

    Plan: the date band prunes the lineitem scan (pushed filter), the join
    shuffles both sides on the order key once, and the CASE-sums collapse
    map-side into 3 groups — the final shuffle is 3 rows. At 100 TB the only
    real cost is the fact-fact shuffle, which AQE can convert to a
    broadcast if the date band is narrow enough."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.expr(
                "CASE l_suppkey % 3 WHEN 0 THEN 'AIR' WHEN 1 THEN 'RAIL'"
                " ELSE 'SHIP' END"
            ).alias("shipmode")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q21_suppliers_kept_waiting",
    oracle="""
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT l_suppkey, count(*) AS numwait
    FROM l l1
    WHERE late
      AND EXISTS (SELECT 1 FROM l l2 WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l l3 WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    GROUP BY l_suppkey
    """,
)
def tpch_q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 — suppliers who were the SOLE late shipper on multi-supplier
    finalized orders (adapted: late = shipped >60 days after the order date,
    standing in for the missing receipt/commit dates; the shape — EXISTS plus
    NOT EXISTS correlated on the same fact relation — is Q21's).

    Plan: instead of two correlated self-joins (the literal SQL shape, three
    shuffles of the fact), aggregate the per-order truth ONCE — counts of
    distinct suppliers and distinct late suppliers per order — and join that
    compact per-order relation back to the late lines: both EXISTS conditions
    become cheap column predicates (other_supplier_exists ⇔ n_supp > 1,
    no_other_late ⇔ n_late_supp = 1). One extra shuffle on l_orderkey total,
    and the decorrelated side is orders-sized, not lineitem-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    l = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")).alias(
            "late"
        ),
    )
    per_order = l.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    return (
        l.filter("late")
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT year(o_orderdate) AS o_year,
           round(
             sum(CASE WHEN ns.n_name = 'NATION_3' THEN
                   CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))
                 ELSE 0 END)
             * 1.0 /
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))),
             6) AS mkt_share
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN part      ON l_partkey  = p_partkey AND p_type = 'PROMO'
    JOIN customer  ON o_custkey  = c_custkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    JOIN region    ON nc.n_regionkey = r_regionkey AND r_name = 'ASIA'
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    GROUP BY 1
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 — national market share: NATION_3 suppliers' slice of PROMO-part
    revenue sold to ASIA customers, per order year. The widest join tree in
    the suite: fact × orders (fact-fact) × five dimension joins.

    Plan: nation/region carry broadcast hints (fixed 25/5 rows at ANY
    scale); part/customer/supplier are SF-proportional, so Catalyst/AQE
    picks their strategy by measured size — at test scale all five sides
    auto-broadcast and the ONLY shuffle is lineitem×orders on the order key,
    then a 7-group aggregate. Both share terms are exact integer-cents sums
    — the quotient divides bit-identical BIGINTs in any engine, making the
    rounded share hash-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nc = n.alias("nc")
    ns = n.alias("ns")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_pct = F.round(F.col("l_discount") * 100, 0).cast("long")
    rev4 = cents * (100 - disc_pct)
    nat4 = F.sum(
        F.when(F.col("ns.n_name") == "NATION_3", rev4).otherwise(F.lit(0))
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc.n_nationkey"))
        .join(F.broadcast(r), F.col("nc.n_regionkey") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns.n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(nat4 * 1.0 / F.sum(rev4), 6).alias("mkt_share"))
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT ns.n_name AS nation, year(o_orderdate) AS o_year,
           round(sum(
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))
             - CAST(round(p_retailprice * 100) AS BIGINT) * 10
               * CAST(l_quantity AS BIGINT)
           ) / 10000.0, 2) AS profit
    FROM lineitem
    JOIN part      ON l_partkey  = p_partkey AND p_name LIKE '%bolt%'
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN supplier  ON l_suppkey  = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 — product-line profit by supplier nation and order year (adapted:
    the corpus has no partsupp, so supply cost is a deterministic 10% of the
    part's retail price; the shape — LIKE-filtered part slice through a
    fact-fact join into a two-level rollup — is Q9's).

    Profit is accumulated as an exact ×10⁻⁴-dollar BIGINT (revenue term in
    cents×percent, cost term scaled to match) and divided once at the end —
    profits go NEGATIVE on discounted low-price lines, and float or
    floor-div accumulation of signed values is exactly where engines
    diverge (Spark div truncates toward zero, DuckDB // floors)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").alias("ns")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_pct = F.round(F.col("l_discount") * 100, 0).cast("long")
    retail_cents = F.round(F.col("p_retailprice") * 100, 0).cast("long")
    profit4 = cents * (100 - disc_pct) - retail_cents * 10 * F.col(
        "l_quantity"
    ).cast("long")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("ns.n_nationkey"))
        .groupBy(
            F.col("ns.n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit4) / 10000.0, 2).alias("profit"))
    )


# --------------------------------------------------------------------------
# orders_copurchase_lift — market-basket association over order baskets
# --------------------------------------------------------------------------

_LIFT_TOPN = 50


@register(
    "orders_copurchase_lift",
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    pairs AS (
      SELECT a.pkey AS part_a, b.pkey AS part_b, count(*) AS co
      FROM basket a JOIN basket b
        ON a.okey = b.okey AND a.pkey < b.pkey
      GROUP BY 1, 2
    ),
    freq AS (SELECT pkey, count(*) AS c FROM basket GROUP BY pkey),
    tot AS (SELECT count(DISTINCT okey) AS n_orders FROM basket)
    SELECT p.part_a, p.part_b, p.co,
           CAST(CAST(p.co AS HUGEINT) * tot.n_orders * 1000000
                // (CAST(fa.c AS HUGEINT) * fb.c) AS BIGINT)
             AS lift_ppm
    FROM pairs p
    JOIN freq fa ON fa.pkey = p.part_a
    JOIN freq fb ON fb.pkey = p.part_b
    CROSS JOIN tot
    ORDER BY p.co DESC, p.part_a, p.part_b
    LIMIT {_LIFT_TOPN}
    """,
)
def orders_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: the top-{_LIFT_TOPN} co-purchased
    part pairs by co-occurrence count, with exact-ppm lift
    (co·N / (c_a·c_b) — >1e6 ppm means the pair co-occurs more than
    independence predicts). The recommender/affinity primitive, as plain
    relational algebra.

    Scale shape: the pair stage is a self-join ON THE ORDER KEY, so the
    pair space is Σ(basket size choose 2) — bounded by the max basket
    (TPC-H: ≤7 lineitems/order), NEVER corpus-quadratic (the same
    blocking argument as SemDeDup's cells: quadratic only within a
    provably small group). Part frequencies join back on the part key —
    narrow key-bounded shuffles, no broadcast of the part-cardinality
    frame — the 1-row order total broadcasts, and the top-N is a
    TakeOrdered with full (co, part_a, part_b) tie-breaks."""
    basket = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey"))
        .distinct()
    )
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.pkey") < F.col("b.pkey")),
        )
        .groupBy(
            F.col("a.pkey").alias("part_a"), F.col("b.pkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("co"))
    )
    freq = basket.groupBy("pkey").agg(F.count(F.lit(1)).alias("c"))
    tot = basket.agg(F.countDistinct("okey").alias("n_orders"))
    return (
        pairs.join(freq.select(F.col("pkey").alias("part_a"), F.col("c").alias("ca")), "part_a")
        .join(freq.select(F.col("pkey").alias("part_b"), F.col("c").alias("cb")), "part_b")
        .join(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "co",
            # DECIMAL(38,0) numerator: co·N·1e6 exceeds BIGINT once
            # co ~ 1e5 with N ~ 1.5e8 (sf ≳ 100) and ANSI mode throws —
            # the graph_assortativity INT128 contract; the oracle widens
            # to HUGEINT. Nonneg operands: div ≡ // exactly.
            F.expr(
                "cast(cast(co as decimal(38,0)) * n_orders * 1000000"
                " div (cast(ca as decimal(38,0)) * cb) as bigint)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.col("co").desc(), "part_a", "part_b")
        .limit(_LIFT_TOPN)
    )


# --------------------------------------------------------------------------
# orders_association_rules — directed confidence rules (round 6 wave 3)
# --------------------------------------------------------------------------

_RULE_MIN_CO = 3  # min co-occurrence support (absolute orders)
_RULE_TOPN = 25


@register(
    "orders_association_rules",
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    und AS (
      SELECT a.pkey AS part_a, b.pkey AS part_b, count(*) AS co
      FROM basket a JOIN basket b
        ON a.okey = b.okey AND a.pkey < b.pkey
      GROUP BY 1, 2
    ),
    rules AS (
      SELECT part_a AS antecedent, part_b AS consequent, co FROM und
      UNION ALL
      SELECT part_b, part_a, co FROM und
    ),
    freq AS (SELECT pkey, count(*) AS c FROM basket GROUP BY pkey),
    tot AS (SELECT count(DISTINCT okey) AS n_orders FROM basket),
    scored AS (
      SELECT r.antecedent, r.consequent, r.co,
             CAST(r.co * 1000000 // fa.c AS BIGINT) AS confidence_ppm,
             CAST(r.co * 1000000 // tot.n_orders AS BIGINT) AS support_ppm,
             CAST(CAST(r.co AS HUGEINT) * tot.n_orders * 1000000
                  // (CAST(fa.c AS HUGEINT) * fc.c) AS BIGINT)
               AS lift_ppm
      FROM rules r
      JOIN freq fa ON fa.pkey = r.antecedent
      JOIN freq fc ON fc.pkey = r.consequent
      CROSS JOIN tot
      WHERE r.co >= {_RULE_MIN_CO}
    )
    SELECT * FROM scored
    ORDER BY confidence_ppm DESC, antecedent, consequent
    LIMIT {_RULE_TOPN}
    """,
)
def orders_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTED association rules a→b over order baskets: confidence
    (P(b|a), exact ppm), support, and lift for every pair co-purchased in
    ≥ {_RULE_MIN_CO} orders, top-{_RULE_TOPN} by confidence — the
    actionable half of ``orders_copurchase_lift`` (lift is symmetric;
    "customers who bought a also bought b" needs the direction, and
    confidence(a→b) ≠ confidence(b→a) whenever the parts' frequencies
    differ).

    Scale shape: identical to the lift query — the pair space is bounded
    per basket by the order-key equi-join, the direction doubling is a
    constant 2×, frequencies join on the part key, the 1-row total
    broadcasts, and the top-N is a TakeOrdered with full tie-breaks."""
    basket = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
        )
        .distinct()
    )
    a = basket.alias("a")
    b = basket.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.pkey") < F.col("b.pkey")),
        )
        .groupBy(
            F.col("a.pkey").alias("part_a"), F.col("b.pkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= _RULE_MIN_CO)
    )
    rules = und.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "co",
    ).unionByName(
        und.select(
            F.col("part_b").alias("antecedent"),
            F.col("part_a").alias("consequent"),
            "co",
        )
    )
    freq = basket.groupBy("pkey").agg(F.count(F.lit(1)).alias("c"))
    tot = basket.agg(F.countDistinct("okey").alias("n_orders"))
    return (
        rules.join(
            freq.select(F.col("pkey").alias("antecedent"), F.col("c").alias("fa")),
            "antecedent",
        )
        .join(
            freq.select(F.col("pkey").alias("consequent"), F.col("c").alias("fc")),
            "consequent",
        )
        .join(F.broadcast(tot))
        .select(
            "antecedent",
            "consequent",
            "co",
            F.expr("co * 1000000 div fa").alias("confidence_ppm"),
            F.expr("co * 1000000 div n_orders").alias("support_ppm"),
            # DECIMAL(38,0) numerator — see orders_copurchase_lift's note
            F.expr(
                "cast(cast(co as decimal(38,0)) * n_orders * 1000000"
                " div (cast(fa as decimal(38,0)) * fc) as bigint)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.col("confidence_ppm").desc(), "antecedent", "consequent")
        .limit(_RULE_TOPN)
    )
