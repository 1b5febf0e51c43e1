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
