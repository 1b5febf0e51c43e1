"""SQL front end (SURVEY §2.6 row 1): the full corpus is queryable through
``spark.sql`` via ``register_views`` — the same declarative surface the
DataFrame queries compile to, so results must agree exactly."""

from __future__ import annotations

from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.sources.parquet import register_views
from tests.conftest import SF_SMOKE


def test_sql_matches_dataframe_api(spark):
    register_views(spark, SF_SMOKE)
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    df = QUERIES["agg_pricing_summary"](spark, SF_SMOKE).select(
        "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    )
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, df.collect()))


def test_sql_interval_join_on_views(spark):
    """The flagship interval join expressed directly in SQL over the views."""
    register_views(spark, SF_SMOKE)
    n = spark.sql(
        """
        SELECT count(*) AS n
        FROM events c JOIN events d
          ON c.user_id = d.user_id
         AND c.event_type = 'click' AND d.event_type = 'view'
         AND d.ts BETWEEN c.ts - INTERVAL 1 HOUR AND c.ts
        """
    ).collect()[0]["n"]
    assert n == QUERIES["j1_interval_join_inner"](spark, SF_SMOKE).count()


def test_sql_multi_join_analytics_matches_dataframe(spark):
    """TPC-H Q5 through spark.sql — five joins, a co-location predicate, and
    the integer-cents revenue arithmetic — must agree with the DataFrame
    build exactly (same Catalyst plan space, same results)."""
    register_views(spark, SF_SMOKE)
    sql = spark.sql(
        """
        SELECT n.n_name AS n_name,
               CAST(((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50)
                     div 100) / 100.0 AS DOUBLE) AS revenue
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
        GROUP BY n.n_name
        """
    )
    df = QUERIES["tpch_q5_local_supplier"](spark, SF_SMOKE)
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, df.collect()))


def test_sql_asof_twin_matches_operator(spark):
    """The as-of operator agrees with its decorrelated SQL form (rank over a
    banded left join) written directly against the views."""
    register_views(spark, SF_SMOKE)
    sql = spark.sql(
        """
        WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
                   FROM events WHERE event_type = 'click'),
             v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
                   FROM events WHERE event_type = 'view'),
             j AS (
               SELECT c.user_id, c.click_id, c.click_ts, v.view_id, v.view_ts,
                      ROW_NUMBER() OVER (
                        PARTITION BY c.click_id
                        ORDER BY v.view_ts DESC NULLS LAST, v.view_id DESC NULLS LAST
                      ) AS rn
               FROM c LEFT JOIN v
                 ON c.user_id = v.user_id AND v.view_ts <= c.click_ts
             )
        SELECT user_id, click_id, click_ts, view_id, view_ts FROM j WHERE rn = 1
        """
    )
    df = QUERIES["asof_latest_view"](spark, SF_SMOKE)
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, df.collect()))
