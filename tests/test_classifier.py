"""Logistic-regression domain classifier: plan gates + learning floors.
Oracle parity is covered by test_oracle_parity.py; these pin the scale
shape (broadcast model, no corpus shuffle) and that training actually
learns the target-source signal."""

from __future__ import annotations

from kafka_streams_join_spark.plans.inspect import (
    assert_no_wide_shuffle,
    explain_str,
)
from tests.conftest import SF_SMOKE


def test_model_broadcasts_and_text_never_shuffles(spark):
    """Every weight-frame join must be a broadcast; document text must
    never enter an Exchange (features are built row-locally in the scan)."""
    from kafka_streams_join_spark.queries.classifier import (
        quality_classifier_logreg,
    )

    df = quality_classifier_logreg(spark, SF_SMOKE)
    assert_no_wide_shuffle(df, col="text", max_exchanges=0)
    plan = explain_str(df)
    # the corpus side never hash-partitions: the only Exchanges are the
    # 4-cell gradient aggregates (SinglePartition) and broadcasts
    import re

    for m in re.finditer(r"Exchange (\w+)", plan):
        assert m.group(1) in ("SinglePartition",), plan[:2000]


def test_training_separates_target_sources(spark):
    """After T rounds the mean score of target-source documents must
    exceed the mean score of the rest — the model learned the label
    signal, not just the base rate."""
    from kafka_streams_join_spark.queries.classifier import (
        quality_classifier_logreg,
    )

    rows = quality_classifier_logreg(spark, SF_SMOKE).collect()
    pos = [r["score"] for r in rows if r["label"] == 1]
    neg = [r["score"] for r in rows if r["label"] == 0]
    assert pos and neg
    assert sum(pos) / len(pos) > sum(neg) / len(neg)


def test_classifier_agrees_with_dsir_direction(spark):
    """The classifier and DSIR share the target definition; their scores
    must correlate in DIRECTION: the DSIR-kept quarter of the corpus must
    have a higher mean classifier score than the dropped rest. Two
    independent selection mechanisms agreeing is the diagnostic a real
    pipeline runs before trusting either."""
    from kafka_streams_join_spark.queries.classifier import (
        quality_classifier_logreg,
    )
    from kafka_streams_join_spark.queries.retrieval import (
        pipeline_importance_resample,
    )

    clf = {r["doc_id"]: r["score"] for r in
           quality_classifier_logreg(spark, SF_SMOKE).collect()}
    dsir = pipeline_importance_resample(spark, SF_SMOKE).collect()
    kept = [clf[r["doc_id"]] for r in dsir if r["kept"] == 1]
    drop = [clf[r["doc_id"]] for r in dsir if r["kept"] == 0]
    assert kept and drop
    assert sum(kept) / len(kept) > sum(drop) / len(drop)
