"""Runtime bloom-filter join pruning (Spark 3.3+): the selective side of
a shuffle join injects a bloom filter into the large side's SCAN, so at
100 TB the lineitem read drops non-matching rows before the Exchange —
the runtime complement of static predicate pushdown.

This is session-config-dependent (and disables broadcast to make the
shuffle-join case real), so it is certified here as a plan + result
test rather than a registered sweep query: the sweep's session must not
inherit a -1 broadcast threshold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_conf(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_prunes_fact_scan_and_preserves_result(spark, bloom_conf):
    li = load_table(spark, SF_SMOKE, "lineitem")
    od = load_table(spark, SF_SMOKE, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").cast("long").alias("qty"),
        )
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" in plan, plan[:2000]
    got = {(r["o_orderpriority"], r["n"], r["qty"]) for r in j.collect()}

    # ground truth: same join without the runtime-filter machinery
    for k in _CONFS:
        spark.conf.unset(k)
    want = {
        (r["o_orderpriority"], r["n"], r["qty"])
        for r in (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").cast("long").alias("qty"),
            )
        ).collect()
    }
    assert got == want and got
