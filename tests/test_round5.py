"""Round-5 properties: the bounded query-batch ANN path, the two-phase
global ranks that replaced the round-4 single-partition windows, and the
RRF leg cap.

The batch-union law is the contract that makes ``query_batch`` a real
production path instead of an API ornament: per-query ANN results are
independent, so running the query set in bounded batches and unioning must
reproduce the full run byte-for-byte.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_join_spark.queries import QUERIES
from kafka_streams_join_spark.queries.similarity import (
    QUERY_STRIDE,
    query_admission,
)
from kafka_streams_join_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _query_ids(spark):
    return [
        r.vec_id
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .select("vec_id")
        .orderBy("vec_id")
        .collect()
    ]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# sim_topk_bruteforce is the cheapest leg and sim_ivfpq_residual_topk the
# most composite — if the law holds at both ends it holds for the family
# (every member admits queries through the same query_admission helper).
@pytest.mark.parametrize(
    "name",
    ["sim_topk_bruteforce", "sim_sq_topk", "sim_ivfpq_residual_topk"],
)
def test_ann_batched_union_equals_full_run(spark, name):
    """Splitting the query set into two bounded batches and unioning the
    per-batch results must equal the full (default stride) run."""
    ids = _query_ids(spark)
    assert len(ids) >= 2, "smoke corpus must yield at least 2 query ids"
    mid = len(ids) // 2
    fn = QUERIES[name]
    full = _rows(fn(spark, SF_SMOKE))
    spark.catalog.clearCache()
    part1 = _rows(fn(spark, SF_SMOKE, query_batch=ids[:mid]))
    spark.catalog.clearCache()
    part2 = _rows(fn(spark, SF_SMOKE, query_batch=ids[mid:]))
    assert sorted(part1 + part2) == full


def test_query_admission_modes(spark):
    """The helper's two modes: default = the stride slice; explicit batch =
    stride ∩ batch; empty batch is rejected (a silent empty broadcast would
    score nothing and look like a recall bug)."""
    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id")
    ids = _query_ids(spark)
    assert [r.vec_id for r in query_admission(emb).orderBy("vec_id").collect()] == ids
    got = query_admission(emb, query_batch=ids[:1] + [ids[0] + 1]).collect()
    # the off-stride id (ids[0]+1) must NOT slip in through the batch
    assert [r.vec_id for r in got] == ids[:1]
    with pytest.raises(ValueError):
        query_admission(emb, query_batch=[])


def test_importance_resample_two_phase_rank_matches_window(spark):
    """The round-5 two-phase sel_rank (level offsets + within-level rank)
    must equal a direct global row_number over (iw desc, doc_id) — the
    formulation the DuckDB oracle still uses."""
    from pyspark.sql import Window

    out = QUERIES["pipeline_importance_resample"](spark, SF_SMOKE).select(
        "doc_id", "iw", "sel_rank"
    )
    w = Window.orderBy(F.col("iw").desc(), F.col("doc_id"))
    direct = out.select(
        "doc_id", F.row_number().over(w).alias("expect_rank")
    )
    diff = (
        out.join(direct, "doc_id")
        .filter(F.col("sel_rank") != F.col("expect_rank"))
        .count()
    )
    assert diff == 0


def test_vocab_growth_prefix_sums_are_monotone_and_total(spark):
    """The sharded prefix sums must end at the global totals and be
    strictly monotone in doc_id order (cum_tokens strictly — every doc has
    ≥1 token; vocab_size weakly)."""
    out = (
        QUERIES["text_vocab_growth"](spark, SF_SMOKE)
        .orderBy("doc_id")
        .collect()
    )
    toks = [r.cum_tokens for r in out]
    vocab = [r.vocab_size for r in out]
    assert all(b > a for a, b in zip(toks, toks[1:]))
    assert all(b >= a for a, b in zip(vocab, vocab[1:]))
    # the last cumulative row IS the corpus total
    # align with the query's tokenizer (queries/text.py::_TOKS): totals must
    # match the corpus-wide token count and distinct-lowercase-token count
    from kafka_streams_join_spark.queries.text import _TOKS

    tok = load_table(spark, SF_SMOKE, "documents").select(
        F.explode(F.expr(_TOKS)).alias("t")
    )
    total_toks = tok.count()
    total_vocab = tok.select(F.lower("t").alias("t")).distinct().count()
    assert toks[-1] == total_toks
    assert vocab[-1] == total_vocab
