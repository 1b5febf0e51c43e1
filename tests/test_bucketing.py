"""The point of bucketing, asserted on the plan: a join of two tables
bucketed on the join key runs with zero Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_join_spark.plans import explain_str
from kafka_streams_join_spark.sources.bucketing import read_bucketed, write_bucketed
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture()
def bucketed_events(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "event_id", "ts")
    write_bucketed(clicks, "b_clicks", ["user_id"], buckets=8)
    write_bucketed(views, "b_views", ["user_id"], buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_clicks")
    spark.sql("DROP TABLE IF EXISTS b_views")


def test_bucketed_join_has_no_exchange(spark, bucketed_events):
    """Broadcast is disabled so the planner must pick a shuffle join — and
    with both sides bucketed on the key, it plans SMJ over the bucket layout
    with zero Exchange (at fact-fact scale neither side broadcasts anyway;
    smoke-scale tables would otherwise short-circuit to BHJ)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        c = read_bucketed(spark, "b_clicks").alias("c")
        v = read_bucketed(spark, "b_views").alias("v")
        j = c.join(v, F.col("c.user_id") == F.col("v.user_id")).select(
            "c.event_id", "v.event_id"
        )
        plan = explain_str(j)
        assert "Exchange" not in plan, plan[:2000]
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_ivf_cell_partitioned_index_prunes_probed_cells(spark, tmp_path):
    """Substantiates the IVF scale claim (sim_ivf_topk/sim_ivfpq_topk
    docstrings): written partitionBy(cell), the inverted file IS the
    directory layout — a probe for nprobe cells must hit only those
    partitions. Asserted on the plan (PartitionFilters) and on the actual
    number of files read."""
    import os

    from kafka_streams_join_spark.queries.similarity import label_centroids
    from kafka_streams_join_spark.queries.clustering import assign_to_codebook

    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    cents = label_centroids(
        load_table(spark, SF_SMOKE, "embeddings")
    ).withColumnRenamed("cell_id", "cl")
    assigned = assign_to_codebook(emb, cents, "embedding", 64).select(
        "vec_id", "embedding", F.col("cl").alias("cell")
    )
    path = str(tmp_path / "ivf_index")
    assigned.write.partitionBy("cell").parquet(path)
    # every cell directory exists (the full inverted file)...
    cells = {d for d in os.listdir(path) if d.startswith("cell=")}
    assert len(cells) == 10
    # ...but a 2-cell probe reads exactly 2 partitions
    probe = spark.read.parquet(path).filter(F.col("cell").isin(3, 7))
    plan = explain_str(probe.select("vec_id"))
    assert "PartitionFilters" in plan and "cell" in plan
    n_total = spark.read.parquet(path).count()
    n_probed = probe.count()
    assert 0 < n_probed < n_total
    # file-level proof: the scan's input files all live under the two
    # probed cell directories
    files = probe.select(F.input_file_name().alias("f")).distinct().collect()
    assert files
    for r in files:
        assert "/cell=3/" in r["f"] or "/cell=7/" in r["f"], r["f"]


def test_unbucketed_join_does_exchange(spark):
    """Control: the same join from raw parquet shuffles both sides."""
    ev = load_table(spark, SF_SMOKE, "events")
    c = ev.filter(F.col("event_type") == "click").select("user_id", "event_id").alias("c")
    v = ev.filter(F.col("event_type") == "view").select("user_id", "event_id").alias("v")
    j = c.join(v, F.col("c.user_id") == F.col("v.user_id"))
    assert "Exchange" in explain_str(j)
