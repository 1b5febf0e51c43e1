"""Trained quality/domain classifier: distributed logistic regression
(SURVEY §2.7 extension, round 4b).

Every production curation pipeline (CCNet, RefinedWeb, DCLM) pairs its
heuristic gates with a TRAINED classifier — "does this document look like
the target domain?" — usually a fasttext-style linear model. This is that
operator, Spark-first: full-batch gradient descent on a logistic model over
deterministic text features, with the same distributed shape as Lloyd
k-means (queries/clustering.py):

- the MODEL (4 weights) broadcasts; the corpus is never shuffled —
  per-round work is one map-side scoring pass + one partial+final avg
  aggregate of d=4 gradient cells, so O(partitions · d) values move per
  round and the driver never sees a row;
- iteration is unrolled in the DataFrame plan (fixed T rounds), fully
  declarative;
- determinism contract with the DuckDB oracle: features rounded to 6 dp at
  build time, gradients rounded to 6 dp BEFORE each weight update (the
  k-means centroid contract — drowns cross-engine float-sum-order drift),
  final scores rounded to 4 dp, and the prediction threshold applied to
  the ROUNDED score so both engines decide boundaries identically.

The label is "document comes from a target source" — making this the
classifier-based selection twin of ``pipeline_importance_resample``
(DSIR): same target definition, two standard selection mechanisms, so
their agreement is itself a data-quality diagnostic (pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register
from .retrieval import _DSIR_TARGET_SOURCES
from .text import _STOP, _STOP_SQL, _TOKS, _TOKS_SQL

_LR_ROUNDS = 3
_LR_ETA = "1.0"  # exact decimal literal, spelled identically in both engines
_TGT_SQL = "(" + ", ".join(f"'{s}'" for s in _DSIR_TARGET_SOURCES) + ")"

# feature builders — exact integer counts ratioed then rounded to 6 dp, so
# both engines hold bit-identical feature frames
_FEAT_SPARK = {
    "x1": f"round(ln(1 + size({_TOKS})), 6)",
    "x2": (
        f"round(aggregate(transform({_TOKS}, t -> CASE WHEN lower(t) IN "
        + _STOP.replace("array(", "(").rstrip(")")
        + ") THEN 1 ELSE 0 END), 0, (a, v) -> a + v)"
        f" * cast(1.0 as double) / size({_TOKS}), 6)"
    ),
    "x3": (
        f"round(aggregate(transform({_TOKS}, t -> length(t)), 0, (a, v) -> a + v)"
        f" * cast(1.0 as double) / size({_TOKS}), 6)"
    ),
}
_FEAT_SQL = {
    "x1": f"round(ln(1 + len({_TOKS_SQL})), 6)",
    "x2": (
        f"round(list_sum(list_transform({_TOKS_SQL}, t -> CASE WHEN lower(t) IN "
        f"{_STOP_SQL.replace('[', '(').replace(']', ')')} THEN 1 ELSE 0 END))"
        f" * 1.0 / len({_TOKS_SQL}), 6)"
    ),
    "x3": (
        f"round(list_sum(list_transform({_TOKS_SQL}, t -> length(t)))"
        f" * 1.0 / len({_TOKS_SQL}), 6)"
    ),
}

# standardized margin: z-scored features keep it O(1), so full-batch GD
# with a unit learning rate cannot saturate the sigmoid (the failure mode
# of raw ln-length/ratio features, whose scales differ by 10×)
_MARGIN = "(a * 1.0 + b * z1 + c * z2 + d * z3)"
_SIGMOID = f"(1.0 / (1.0 + exp(-{_MARGIN})))"


def _oracle_sql() -> str:
    feat = (
        "SELECT doc_id,"
        f" CASE WHEN source IN {_TGT_SQL} THEN 1.0 ELSE 0.0 END AS y,"
        + ",".join(f" {expr} AS {name}" for name, expr in _FEAT_SQL.items())
        + " FROM documents"
    )
    stats = (
        "SELECT "
        + ",".join(
            f"round(avg(x{j}), 6) m{j}, round(stddev_pop(x{j}), 6) s{j}"
            for j in (1, 2, 3)
        )
        + " FROM feat"
    )
    zfeat = (
        "SELECT doc_id, y,"
        + ",".join(f" round((x{j} - m{j}) / s{j}, 6) AS z{j}" for j in (1, 2, 3))
        + " FROM feat, stats"
    )
    parts = [
        f"WITH feat AS ({feat})",
        f", stats AS ({stats})",
        f", zfeat AS ({zfeat})",
        ", w0 AS (SELECT 0.0 a, 0.0 b, 0.0 c, 0.0 d)",
    ]
    grad_terms = {"g0": "1.0", "g1": "z1", "g2": "z2", "g3": "z3"}
    for t in range(_LR_ROUNDS):
        parts.append(
            f", g{t + 1} AS (SELECT"
            + ",".join(
                f" round(avg(({_SIGMOID} - y) * {x}), 6) AS {g}"
                for g, x in grad_terms.items()
            )
            + f" FROM zfeat, w{t})"
        )
        parts.append(
            f", w{t + 1} AS (SELECT"
            f" round(a - {_LR_ETA} * g0, 6) a, round(b - {_LR_ETA} * g1, 6) b,"
            f" round(c - {_LR_ETA} * g2, 6) c, round(d - {_LR_ETA} * g3, 6) d"
            f" FROM w{t}, g{t + 1})"
        )
    parts.append(
        " SELECT doc_id, CAST(y AS BIGINT) AS label,"
        f" round({_SIGMOID}, 4) AS score,"
        f" CASE WHEN round({_SIGMOID}, 4) >= 0.5 THEN 1 ELSE 0 END AS pred"
        f" FROM zfeat, w{_LR_ROUNDS}"
    )
    return "".join(parts)


def _raw_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, x1..x3): label + raw row-local features, one scan."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("source").isin(*_DSIR_TARGET_SOURCES), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
        *[F.expr(expr).alias(name) for name, expr in _FEAT_SPARK.items()],
    )


def _moments(raw: DataFrame) -> DataFrame:
    """1-row scaler moments (m1, s1, …): mean + population std per raw
    feature, rounded to 6 dp — part of the MODEL, exactly as a production
    classifier ships its scaler."""
    return raw.agg(
        *[
            agg
            for j in (1, 2, 3)
            for agg in (
                F.round(F.avg(f"x{j}"), 6).alias(f"m{j}"),
                F.round(F.stddev_pop(f"x{j}"), 6).alias(f"s{j}"),
            )
        ]
    )


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized (doc_id, y, z1, z2, z3) feature frame: raw row-local
    features, then z-scored against the broadcast corpus moments."""
    raw = _raw_features(spark, sf_dir)
    stats = _moments(raw)
    return raw.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "y",
        *[
            F.round((F.col(f"x{j}") - F.col(f"m{j}")) / F.col(f"s{j}"), 6).alias(
                f"z{j}"
            )
            for j in (1, 2, 3)
        ],
    )


def _train(spark: SparkSession, feat: DataFrame) -> DataFrame:
    """The unrolled full-batch GD loop over a standardized feature frame:
    returns the trained 1-row (a, b, c, d) weight frame. Shared by the
    oracle-checked query and the deployment path (``fit_model``)."""
    w = spark.range(1).select(
        F.lit(0.0).alias("a"),
        F.lit(0.0).alias("b"),
        F.lit(0.0).alias("c"),
        F.lit(0.0).alias("d"),
    )
    eta = _LR_ETA
    grad_terms = ["1.0", "z1", "z2", "z3"]
    for _ in range(_LR_ROUNDS):
        grads = (
            feat.crossJoin(F.broadcast(w))
            .select(
                *[
                    ((F.expr(_SIGMOID) - F.col("y")) * F.expr(x)).alias(f"t{j}")
                    for j, x in enumerate(grad_terms)
                ]
            )
            .agg(
                *[
                    F.round(F.avg(f"t{j}"), 6).alias(f"g{j}")
                    for j in range(4)
                ]
            )
        )
        w = w.crossJoin(F.broadcast(grads)).select(
            F.round(F.col("a") - F.expr(eta) * F.col("g0"), 6).alias("a"),
            F.round(F.col("b") - F.expr(eta) * F.col("g1"), 6).alias("b"),
            F.round(F.col("c") - F.expr(eta) * F.col("g2"), 6).alias("c"),
            F.round(F.col("d") - F.expr(eta) * F.col("g3"), 6).alias("d"),
        )
    return w


def fit_model(spark: SparkSession, sf_dir: str) -> dict:
    """Train on the batch corpus and return the DEPLOYABLE model: the 4
    weights plus the 6 scaler moments, as plain floats. This is the one
    place the model crosses to the driver — 10 numbers, the offline-train
    / online-score boundary every production classifier has. Feed the
    result to :func:`scoring_expr` to score any frame (batch or stream)
    with an inlined zero-shuffle projection.

    Cost shape: the scaler moments are one aggregate over the raw frame,
    and the TRAINING feature frame is staged — one materialization feeds
    all {_LR_ROUNDS} gradient rounds (the same 'T+1 consumers' staging
    the oracle query uses), so a fit is two corpus passes, not five."""
    stats_row = _moments(_raw_features(spark, sf_dir)).collect()[0]
    feat = _staged(_features(spark, sf_dir))
    w_row = _train(spark, feat).collect()[0]
    return {**stats_row.asDict(), **w_row.asDict()}


def scoring_expr(model: dict) -> str:
    """The trained model as ONE inlined Spark SQL expression over a frame
    with a ``text`` column — a zero-shuffle, stateless projection, which
    is why the identical definition scores a batch frame and a streaming
    frame (certified by tests/test_streaming_classifier.py). Repr'd
    float literals round-trip exactly, so scores bit-match the training
    query's."""
    zs = {
        f"z{j}": f"round(({_FEAT_SPARK[f'x{j}']} - {model[f'm{j}']!r})"
        f" / {model[f's{j}']!r}, 6)"
        for j in (1, 2, 3)
    }
    margin = (
        f"({model['a']!r} + {model['b']!r} * {zs['z1']}"
        f" + {model['c']!r} * {zs['z2']} + {model['d']!r} * {zs['z3']})"
    )
    return f"round(1.0 / (1.0 + exp(-{margin})), 4)"


@register("quality_classifier_logreg", oracle=_oracle_sql())
def quality_classifier_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a logistic-regression domain classifier over row-local text
    features (log length, stopword ratio, mean token length + bias) with
    T={_LR_ROUNDS} unrolled full-batch GD rounds, then score every
    document with the trained model. Output: (doc_id, label, score,
    pred).

    Scale shape: the feature frame is built row-locally in the scan (one
    corpus pass, staged for the T+1 consumers). Each GD round joins the
    broadcast 1-row weight frame and aggregates 4 gradient averages —
    map-side combined, so O(partitions·4) doubles shuffle per round and
    the model never leaves the executors except as the 4-value broadcast.
    This is the k-means iteration shape (queries/clustering.py) applied
    to supervised training; the same plan trains any linear model at
    100 TB."""
    feat = _staged(_features(spark, sf_dir))
    w = _train(spark, feat)
    scored = feat.crossJoin(F.broadcast(w)).select(
        "doc_id",
        F.col("y").cast("bigint").alias("label"),
        F.round(F.expr(_SIGMOID), 4).alias("score"),
        F.when(F.round(F.expr(_SIGMOID), 4) >= 0.5, F.lit(1))
        .otherwise(F.lit(0))
        .alias("pred"),
    )
    return scored
