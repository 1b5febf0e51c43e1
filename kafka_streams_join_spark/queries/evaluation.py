"""Model/retrieval evaluation harnesses (round 6).

A training-data pipeline is steered by its measurements: the quality
classifier is only trustworthy if its scores are CALIBRATED and its
operating threshold chosen from a sweep, and a retrieval stack is only
trustworthy under a ranking metric (nDCG) and improvable by feedback
loops (pseudo-relevance expansion). These four operators are that
measurement layer, each composing an already-certified contract:

- ``classifier_calibration_report`` / ``classifier_threshold_sweep``
  consume ``quality_classifier_logreg``'s registered oracle verbatim, so
  the evaluation can never drift from what the driver certifies about
  the model (the ``dedup_band_recall_audit`` composition pattern);
- ``retrieval_ndcg_eval`` scores ``sim_topk_bruteforce``'s registered
  ranking against the embedding labels;
- ``retrieval_prf_expansion`` is the two-stage Rocchio-style loop over
  the ``text_bm25_search`` scoring contract (same k1/b/idf spelling).

Scale notes per operator in the docstrings; all four do their real work
on model-sized frames (bins, thresholds, top-k lists, term sets) — the
corpus contributes the same scans their composed contracts already make.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..functions.literals import values_frame
from ..sources.parquet import load_table
from .registry import ORACLES, register
from .classifier import quality_classifier_logreg
from .retrieval import _BM25_B, _BM25_K1, _BM25_TERMS
from .similarity import TOP_K, sim_topk_bruteforce
from .text import _TOKS, _TOKS_SQL

# --------------------------------------------------------------------------
# classifier_calibration_report — reliability-diagram data
# --------------------------------------------------------------------------


@register(
    "classifier_calibration_report",
    oracle=f"""
    WITH scored AS ({ORACLES["quality_classifier_logreg"]})
    SELECT least(9, CAST(floor(score * 10) AS INTEGER)) AS bin,
           count(*) AS n,
           CAST(sum(label) AS BIGINT) AS n_pos,
           round(avg(score), 6) AS mean_score,
           CAST(sum(label) * 1000000 // count(*) AS BIGINT) AS pos_rate_ppm
    FROM scored
    GROUP BY 1
    """,
)
def classifier_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram data for the trained quality classifier: decile
    score bins × (count, positives, mean predicted score, observed positive
    rate in exact ppm). A calibrated model has mean_score ≈ pos_rate per
    bin; systematic gaps mean the scores can't be thresholded as
    probabilities — the first chart anyone deploying a data-selection
    classifier reads. Composes the REGISTERED classifier oracle, so the
    report is always about the exact model the driver certifies.

    Scale: the scored frame is the classifier's own one-scan plan; this
    adds one 10-bin aggregate (map-side combined)."""
    return (
        quality_classifier_logreg(spark, sf_dir)
        .groupBy(
            F.least(F.lit(9), F.floor(F.col("score") * 10).cast("int")).alias(
                "bin"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("label").cast("bigint").alias("n_pos"),
            F.round(F.avg("score"), 6).alias("mean_score"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            "mean_score",
            F.expr("cast(n_pos * 1000000 div n as bigint)").alias(
                "pos_rate_ppm"
            ),
        )
    )


# --------------------------------------------------------------------------
# classifier_threshold_sweep — operating-point selection
# --------------------------------------------------------------------------

_SWEEP_THRESH_PPM = (300_000, 400_000, 500_000, 600_000, 700_000)


@register(
    "classifier_threshold_sweep",
    oracle=f"""
    WITH scored AS ({ORACLES["quality_classifier_logreg"]}),
    t AS (SELECT unnest([{", ".join(str(t) for t in _SWEEP_THRESH_PPM)}])
            AS thresh_ppm),
    m AS (
      SELECT t.thresh_ppm,
             CAST(sum(CASE WHEN score >= t.thresh_ppm / 1000000.0
                            AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN score >= t.thresh_ppm / 1000000.0
                            AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN score < t.thresh_ppm / 1000000.0
                            AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM scored CROSS JOIN t GROUP BY 1
    ),
    pr AS (
      SELECT thresh_ppm, tp, fp, fn,
             CAST(tp * 1000000 // greatest(1, tp + fp) AS BIGINT)
               AS precision_ppm,
             CAST(tp * 1000000 // greatest(1, tp + fn) AS BIGINT)
               AS recall_ppm
      FROM m
    )
    SELECT thresh_ppm, tp, fp, fn, precision_ppm, recall_ppm,
           CAST(2 * precision_ppm * recall_ppm
                // greatest(1, precision_ppm + recall_ppm) AS BIGINT)
             AS f1_ppm
    FROM pr
    """,
)
def classifier_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 of the trained classifier at five candidate
    thresholds — the operating-point sweep that decides where the
    data-selection gate actually cuts (all exact integer ppm arithmetic
    on the 4-dp-rounded scores, so both engines decide every boundary
    document identically).

    Scale: one pass over the scored frame crossed with the 5-row
    threshold table — a 5-group map-side-combining aggregate."""
    scored = quality_classifier_logreg(spark, sf_dir)
    t = values_frame(
        spark, [(x,) for x in _SWEEP_THRESH_PPM], "thresh_ppm bigint"
    )
    hit = F.col("score") >= F.col("thresh_ppm") / 1e6
    m = (
        scored.crossJoin(F.broadcast(t))
        .groupBy("thresh_ppm")
        .agg(
            F.sum(F.when(hit & (F.col("label") == 1), 1).otherwise(0))
            .cast("bigint")
            .alias("tp"),
            F.sum(F.when(hit & (F.col("label") == 0), 1).otherwise(0))
            .cast("bigint")
            .alias("fp"),
            F.sum(F.when(~hit & (F.col("label") == 1), 1).otherwise(0))
            .cast("bigint")
            .alias("fn"),
        )
    )
    pr = m.select(
        "thresh_ppm",
        "tp",
        "fp",
        "fn",
        F.expr("cast(tp * 1000000 div greatest(1, tp + fp) as bigint)").alias(
            "precision_ppm"
        ),
        F.expr("cast(tp * 1000000 div greatest(1, tp + fn) as bigint)").alias(
            "recall_ppm"
        ),
    )
    return pr.select(
        "thresh_ppm",
        "tp",
        "fp",
        "fn",
        "precision_ppm",
        "recall_ppm",
        F.expr(
            "cast(2 * precision_ppm * recall_ppm"
            " div greatest(1, precision_ppm + recall_ppm) as bigint)"
        ).alias("f1_ppm"),
    )


# --------------------------------------------------------------------------
# retrieval_ndcg_eval — nDCG of the exact top-k against embedding labels
# --------------------------------------------------------------------------


@register(
    "retrieval_ndcg_eval",
    oracle=f"""
    WITH ranking AS ({ORACLES["sim_topk_bruteforce"]}),
    lab AS (SELECT vec_id, label FROM embeddings),
    rel AS (
      SELECT r.query_id, r.rnk,
             CASE WHEN ln.label = lq.label THEN 1 ELSE 0 END AS rel
      FROM ranking r
      JOIN lab lq ON lq.vec_id = r.query_id
      JOIN lab ln ON ln.vec_id = r.neighbor_id
    ),
    dcg AS (
      SELECT query_id,
             CAST(sum(rel) AS BIGINT) AS n_rel_top,
             round(sum(rel / log2(rnk + 1.0)), 6) AS dcg
      FROM rel GROUP BY query_id
    ),
    nrel AS (
      SELECT lq.vec_id AS query_id, lq.label,
             CAST(count(*) AS BIGINT) AS n_rel_corpus
      FROM lab lq JOIN lab lo
        ON lo.label = lq.label AND lo.vec_id != lq.vec_id
      WHERE lq.vec_id % 100 = 0
      GROUP BY 1, 2
    ),
    idcg AS (
      SELECT n.query_id, n.label, n.n_rel_corpus, d.n_rel_top, d.dcg,
             round((SELECT sum(1.0 / log2(i + 1.0))
                    FROM unnest(generate_series(1, {TOP_K})) AS t(i)
                    WHERE i <= least({TOP_K}, n.n_rel_corpus)), 6) AS idcg
      FROM nrel n JOIN dcg d ON d.query_id = n.query_id
    )
    SELECT query_id, label, n_rel_corpus, n_rel_top, dcg, idcg,
           round(dcg / idcg, 6) AS ndcg
    FROM idcg
    """,
)
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{TOP_K} of the exact cosine top-k ranking, with binary
    relevance = "neighbor shares the query's label": per query, DCG over
    the ranked hits, the ideal DCG from the query's true relevant-corpus
    size, and their ratio — the eval-harness number that decides whether
    an embedding space is good enough to mine hard negatives or labels
    from. Composes ``sim_topk_bruteforce``'s REGISTERED ranking oracle,
    so the metric always scores the ranking the driver certifies.

    Scale: the ranking is the already-measured blocked-GEMM plan; labels
    join on narrow keys; per-label corpus counts are a label-cardinality
    aggregate joined back to the Q-sized query list; DCG/IDCG arithmetic
    is top-k-list-sized."""
    ranking = sim_topk_bruteforce(spark, sf_dir)
    lab = _staged(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    )
    lq = lab.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    ln_ = lab.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    rel = (
        ranking.join(lq, "query_id")
        .join(ln_, "neighbor_id")
        .select(
            "query_id",
            "rnk",
            F.when(F.col("n_label") == F.col("q_label"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    dcg = rel.groupBy("query_id").agg(
        F.sum("rel").cast("bigint").alias("n_rel_top"),
        F.round(F.sum(F.col("rel") / F.log2(F.col("rnk") + 1.0)), 6).alias(
            "dcg"
        ),
    )
    # per-label corpus sizes (label-cardinality aggregate), joined to the
    # stride query list; minus self when the query holds its own label
    sizes = lab.groupBy("label").agg(F.count(F.lit(1)).alias("n_label_rows"))
    nrel = (
        lab.filter(F.col("vec_id") % 100 == 0)
        .join(F.broadcast(sizes), "label")
        .select(
            F.col("vec_id").alias("query_id"),
            "label",
            (F.col("n_label_rows") - 1).cast("bigint").alias("n_rel_corpus"),
        )
    )
    pos = spark.range(1, TOP_K + 1).select(F.col("id").alias("i"))
    idcg = (
        nrel.crossJoin(F.broadcast(pos))
        .filter(F.col("i") <= F.least(F.lit(TOP_K), F.col("n_rel_corpus")))
        .groupBy("query_id", "label", "n_rel_corpus")
        .agg(F.round(F.sum(1.0 / F.log2(F.col("i") + 1.0)), 6).alias("idcg"))
    )
    return (
        idcg.join(dcg, "query_id")
        .select(
            "query_id",
            "label",
            "n_rel_corpus",
            "n_rel_top",
            "dcg",
            "idcg",
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        )
    )


# --------------------------------------------------------------------------
# retrieval_prf_expansion — pseudo-relevance-feedback query expansion
# --------------------------------------------------------------------------

_PRF_FEEDBACK_DOCS = 3
_PRF_NEW_TERMS = 2
_PRF_TOPN = 10
_PRF_SEEDS_SQL = "(" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + ")"


def _bm25_contrib_sql(tf: str, df: str, doclen: str, n_docs: str, avgdl: str) -> str:
    """The text_bm25_search scoring kernel with pluggable column refs —
    identical k1/b/idf spelling in both engines."""
    return (
        f"ln(1 + ({n_docs} - {df} + 0.5) / ({df} + 0.5))"
        f" * ({tf} * ({_BM25_K1} + 1))"
        f" / ({tf} + {_BM25_K1} * (1 - {_BM25_B}"
        f" + {_BM25_B} * {doclen} / {avgdl}))"
    )


def _prf_oracle() -> str:
    contrib = _bm25_contrib_sql(
        "tf.tf", "df.df", "dl.doclen",
        "(SELECT n_docs FROM stats)", "(SELECT avgdl FROM stats)",
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, lower(unnest({_TOKS_SQL})) AS token FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS doclen FROM tok GROUP BY doc_id),
    stats AS (
      SELECT count(*) AS n_docs, avg(CAST(doclen AS DOUBLE)) AS avgdl FROM dl
    ),
    -- stage 1: seed BM25, top-{_PRF_FEEDBACK_DOCS} feedback docs
    tf1 AS (
      SELECT doc_id, token, count(*) AS tf FROM tok
      WHERE token IN {_PRF_SEEDS_SQL} GROUP BY 1, 2
    ),
    df1 AS (SELECT token, count(*) AS df FROM tf1 GROUP BY token),
    s1 AS (
      SELECT tf.doc_id, round(sum({contrib.replace("df.df", "df1.df")
        .replace("tf.tf", "tf.tf")}), 4) AS bm25
      FROM tf1 tf JOIN df1 ON df1.token = tf.token
      JOIN dl ON dl.doc_id = tf.doc_id
      GROUP BY tf.doc_id
    ),
    fb AS (
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
        FROM s1) WHERE rnk <= {_PRF_FEEDBACK_DOCS}
    ),
    -- stage 2: tf-idf expansion terms mined from the feedback docs
    cand AS (
      SELECT token, count(*) AS tf_fb
      FROM tok
      WHERE doc_id IN (SELECT doc_id FROM fb)
        AND token NOT IN {_PRF_SEEDS_SQL}
      GROUP BY token
    ),
    dfc AS (
      SELECT tok.token, count(DISTINCT tok.doc_id) AS df
      FROM tok JOIN cand ON cand.token = tok.token
      GROUP BY tok.token
    ),
    exp_terms AS (
      SELECT token FROM (
        SELECT c.token,
               row_number() OVER (
                 ORDER BY round(c.tf_fb * ln(
                   CAST((SELECT n_docs FROM stats) AS DOUBLE) / dfc.df), 4)
                   DESC, c.token) AS rnk
        FROM cand c JOIN dfc ON dfc.token = c.token
      ) WHERE rnk <= {_PRF_NEW_TERMS}
    ),
    terms AS (
      SELECT token FROM exp_terms
      UNION SELECT unnest([{", ".join(f"'{t}'" for t in _BM25_TERMS)}])
    ),
    -- stage 3: expanded BM25, final top-{_PRF_TOPN}
    tf2 AS (
      SELECT tok.doc_id, tok.token, count(*) AS tf
      FROM tok JOIN terms ON terms.token = tok.token
      GROUP BY 1, 2
    ),
    df2 AS (SELECT token, count(*) AS df FROM tf2 GROUP BY token),
    s2 AS (
      SELECT tf.doc_id, count(*) AS n_terms_hit,
             round(sum({contrib.replace("df.df", "df2.df")}), 4) AS bm25
      FROM tf2 tf JOIN df2 ON df2.token = tf.token
      JOIN dl ON dl.doc_id = tf.doc_id
      GROUP BY tf.doc_id
    )
    SELECT rnk, doc_id, n_terms_hit, bm25 FROM (
      SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
      FROM s2) WHERE rnk <= {_PRF_TOPN}
    """


@register("retrieval_prf_expansion", oracle=_prf_oracle())
def retrieval_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (Rocchio-style, two rounds of
    the ``text_bm25_search`` kernel): run the seed query, mine the
    top-{_PRF_FEEDBACK_DOCS} documents for their {_PRF_NEW_TERMS} best
    tf-idf terms (seeds excluded, 4-dp-rounded scores with token
    tie-breaks), re-run BM25 with the expanded term set, and emit the
    final top-{_PRF_TOPN}. The feedback loop every sparse-retrieval
    stack layers over its index — expressed as one declarative plan.

    Scale: the token/doclen frames are staged once and reused by both
    rounds; every derived frame is term-set- or top-k-bounded (feedback
    ids and term tables broadcast); the global rank windows run over
    matched docs only — the documented ``text_bm25_search`` allowance."""
    tok = _staged(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias(
                "token"
            ),
        )
    )
    dl = _staged(tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doclen")))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("doclen").cast("double")).alias("avgdl"),
    )

    def bm25_scores(term_df: DataFrame, with_hits: bool) -> DataFrame:
        tf = tok.join(F.broadcast(term_df), "token").groupBy(
            "doc_id", "token"
        ).agg(F.count(F.lit(1)).alias("tf"))
        df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        contrib = (
            tf.join(F.broadcast(df), "token")
            .join(dl, "doc_id")
            .join(F.broadcast(stats))
            .select(
                "doc_id",
                F.expr(
                    _bm25_contrib_sql("tf", "df", "doclen", "n_docs", "avgdl")
                ).alias("c"),
            )
        )
        aggs = [F.round(F.sum("c"), 4).alias("bm25")]
        if with_hits:
            aggs.insert(0, F.count(F.lit(1)).alias("n_terms_hit"))
        return contrib.groupBy("doc_id").agg(*aggs)

    seeds = values_frame(spark, [(t,) for t in _BM25_TERMS], "token string")
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    fb = (
        bm25_scores(seeds, with_hits=False)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _PRF_FEEDBACK_DOCS)
        .select("doc_id")
    )
    fb_toks = tok.join(F.broadcast(fb), "doc_id")
    cand = (
        fb_toks.filter(~F.col("token").isin(*_BM25_TERMS))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf_fb"))
    )
    dfc = (
        tok.join(F.broadcast(cand.select("token")), "token")
        .groupBy("token")
        .agg(F.count_distinct("doc_id").alias("df"))
    )
    wt = Window.orderBy(
        F.round(
            F.col("tf_fb")
            * F.log(F.col("n_docs").cast("double") / F.col("df")),
            4,
        ).desc(),
        F.col("token"),
    )
    exp_terms = (
        cand.join(dfc, "token")
        .crossJoin(F.broadcast(stats))
        .withColumn("rnk", F.row_number().over(wt))
        .filter(F.col("rnk") <= _PRF_NEW_TERMS)
        .select("token")
    )
    terms = exp_terms.unionByName(seeds).distinct()
    return (
        bm25_scores(terms, with_hits=True)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _PRF_TOPN)
        .select("rnk", "doc_id", "n_terms_hit", "bm25")
    )


# --------------------------------------------------------------------------
# retrieval_mrr_eval — mean reciprocal rank of the exact top-k (round 6)
# --------------------------------------------------------------------------


@register(
    "retrieval_mrr_eval",
    oracle=f"""
    WITH ranking AS ({ORACLES["sim_topk_bruteforce"]}),
    lab AS (SELECT vec_id, label FROM embeddings),
    firsthit AS (
      SELECT r.query_id,
             min(CASE WHEN ln.label = lq.label THEN r.rnk END) AS first_rel
      FROM ranking r
      JOIN lab lq ON lq.vec_id = r.query_id
      JOIN lab ln ON ln.vec_id = r.neighbor_id
      GROUP BY r.query_id
    )
    SELECT count(*) AS n_queries,
           CAST(sum(CASE WHEN first_rel IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_hit,
           round(avg(CASE WHEN first_rel IS NULL THEN 0.0
                          ELSE 1.0 / first_rel END), 6) AS mrr,
           round(avg(CASE WHEN first_rel = 1 THEN 1.0 ELSE 0.0 END), 6)
             AS precision_at_1
    FROM firsthit
    """,
)
def retrieval_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank + precision@1 of the exact cosine top-k under
    label relevance — the single-number retrieval summary next to
    ``retrieval_ndcg_eval``'s per-query detail (MRR weights ONLY the first
    relevant hit, the metric for known-item search; nDCG grades the whole
    list). Composes the same registered ranking oracle.

    Scale: the ranking plan plus two narrow label joins and a Q-sized
    min/avg rollup."""
    ranking = sim_topk_bruteforce(spark, sf_dir)
    lab = _staged(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    )
    lq = lab.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    ln_ = lab.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    firsthit = (
        ranking.join(lq, "query_id")
        .join(ln_, "neighbor_id")
        .groupBy("query_id")
        .agg(
            F.min(
                F.when(F.col("n_label") == F.col("q_label"), F.col("rnk"))
            ).alias("first_rel")
        )
    )
    return firsthit.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(F.when(F.col("first_rel").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_hit"),
        F.round(
            F.avg(
                F.when(F.col("first_rel").isNull(), 0.0).otherwise(
                    1.0 / F.col("first_rel")
                )
            ),
            6,
        ).alias("mrr"),
        F.round(
            F.avg(F.when(F.col("first_rel") == 1, 1.0).otherwise(0.0)), 6
        ).alias("precision_at_1"),
    )


# --------------------------------------------------------------------------
# retrieval_map_eval — mean-average-precision of the exact top-k (round 7)
# --------------------------------------------------------------------------


@register(
    "retrieval_map_eval",
    oracle=f"""
    WITH ranking AS ({ORACLES["sim_topk_bruteforce"]}),
    lab AS (SELECT vec_id, label FROM embeddings),
    rel AS (
      SELECT r.query_id, r.rnk,
             CASE WHEN ln.label = lq.label THEN 1 ELSE 0 END AS rel
      FROM ranking r
      JOIN lab lq ON lq.vec_id = r.query_id
      JOIN lab ln ON ln.vec_id = r.neighbor_id
    ),
    cum AS (
      SELECT query_id, rnk, rel,
             sum(rel) OVER (PARTITION BY query_id ORDER BY rnk) AS cum_rel
      FROM rel
    ),
    ap AS (
      SELECT query_id,
             CAST(sum(rel) AS BIGINT) AS n_rel_top,
             CAST(sum(CASE WHEN rel = 1
                           THEN CAST(round(1e6 * cum_rel / rnk) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS ap_num
      FROM cum GROUP BY query_id
    ),
    nrel AS (
      SELECT lq.vec_id AS query_id, lq.label,
             CAST(count(*) AS BIGINT) AS n_rel_corpus
      FROM lab lq JOIN lab lo
        ON lo.label = lq.label AND lo.vec_id != lq.vec_id
      WHERE lq.vec_id % 100 = 0
      GROUP BY 1, 2
    )
    SELECT n.query_id, n.label, n.n_rel_corpus, a.n_rel_top,
           CAST(a.ap_num // least({TOP_K}, n.n_rel_corpus) AS DOUBLE) / 1e6
             AS ap
    FROM nrel n JOIN ap a ON a.query_id = n.query_id
    """,
)
def retrieval_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision @{TOP_K} per query over the exact cosine top-k
    (binary relevance = shared embedding label): AP = Σ_i rel_i · P@i
    normalized by min(k, R) — the rank-sensitive companion to
    ``retrieval_ndcg_eval`` and ``retrieval_mrr_eval`` that completes the
    standard eval triple (MAP is the macro mean of this column; reported
    per query so the oracle certifies every ranking position, not one
    scalar). Composes ``sim_topk_bruteforce``'s REGISTERED oracle.
    Determinism contract (round 8): each P@i term is rounded to integer
    MICRO-units BEFORE the BIGINT sum (the ``text_bigram_lm_score``
    recipe — a double sum rounded after the fact is summation-order
    nondeterministic), and the min(k,R) normalizer is a truncating
    integer div of nonneg micro-units, so ``ap`` is bit-stable in any
    engine at any scale.

    Scale: the ranking is the already-gated blocked-GEMM plan; P@i needs
    only a cumulative sum over each query's k-row ranked list (window
    partitioned by query — bounded frames); corpus relevant-counts are a
    label-cardinality aggregate joined to the stride query list."""
    ranking = sim_topk_bruteforce(spark, sf_dir)
    lab = _staged(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    )
    lq = lab.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    ln_ = lab.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    rel = (
        ranking.join(lq, "query_id")
        .join(ln_, "neighbor_id")
        .select(
            "query_id",
            "rnk",
            F.when(F.col("n_label") == F.col("q_label"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("rnk")
    ap = (
        rel.withColumn("cum_rel", F.sum("rel").over(w))
        .groupBy("query_id")
        .agg(
            F.sum("rel").cast("bigint").alias("n_rel_top"),
            F.sum(
                F.when(
                    F.col("rel") == 1,
                    F.expr("cast(round(1e6 * cum_rel / rnk) as bigint)"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("ap_num"),
        )
    )
    sizes = lab.groupBy("label").agg(F.count(F.lit(1)).alias("n_label_rows"))
    # Queries whose label is unique in the corpus (n_rel_corpus = 0) are not
    # evaluable: the oracle's inner self-join (lo.label = lq.label AND
    # lo.vec_id != lq.vec_id) drops them, and keeping them here would both
    # mismatch row counts and divide ap_num by least(k, 0) = 0 → NaN.
    nrel = (
        lab.filter(F.col("vec_id") % 100 == 0)
        .join(F.broadcast(sizes), "label")
        .filter(F.col("n_label_rows") >= 2)
        .select(
            F.col("vec_id").alias("query_id"),
            "label",
            (F.col("n_label_rows") - 1).cast("bigint").alias("n_rel_corpus"),
        )
    )
    return nrel.join(ap, "query_id").select(
        "query_id",
        "label",
        "n_rel_corpus",
        "n_rel_top",
        (
            F.expr(f"ap_num div least({TOP_K}, n_rel_corpus)").cast("double")
            / F.lit(1000000.0)
        ).alias("ap"),
    )


# --------------------------------------------------------------------------
# retrieval_pr_at_k — precision / recall / F1 of the exact top-k (round 7)
# --------------------------------------------------------------------------


@register(
    "retrieval_pr_at_k",
    oracle=f"""
    WITH ranking AS ({ORACLES["sim_topk_bruteforce"]}),
    lab AS (SELECT vec_id, label FROM embeddings),
    hits AS (
      SELECT r.query_id,
             CAST(sum(CASE WHEN ln.label = lq.label THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_rel_top
      FROM ranking r
      JOIN lab lq ON lq.vec_id = r.query_id
      JOIN lab ln ON ln.vec_id = r.neighbor_id
      GROUP BY r.query_id
    ),
    nrel AS (
      SELECT lq.vec_id AS query_id, lq.label,
             CAST(count(*) AS BIGINT) AS n_rel_corpus
      FROM lab lq JOIN lab lo
        ON lo.label = lq.label AND lo.vec_id != lq.vec_id
      WHERE lq.vec_id % 100 = 0
      GROUP BY 1, 2
    )
    SELECT n.query_id, n.label, n.n_rel_corpus, h.n_rel_top,
           CAST(h.n_rel_top * 1000000 // {TOP_K} AS BIGINT) AS precision_ppm,
           CAST(h.n_rel_top * 1000000 // greatest(n.n_rel_corpus, 1)
                AS BIGINT) AS recall_ppm,
           CAST(CASE WHEN h.n_rel_top * 1000000 // {TOP_K}
                          + h.n_rel_top * 1000000 // greatest(n.n_rel_corpus, 1)
                          > 0
                     THEN 2 * (h.n_rel_top * 1000000 // {TOP_K})
                            * (h.n_rel_top * 1000000 // greatest(n.n_rel_corpus, 1))
                            // ((h.n_rel_top * 1000000 // {TOP_K})
                                + (h.n_rel_top * 1000000 // greatest(n.n_rel_corpus, 1)))
                     ELSE 0 END AS BIGINT) AS f1_ppm
    FROM nrel n JOIN hits h ON h.query_id = n.query_id
    """,
)
def retrieval_pr_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision@{TOP_K} / Recall@{TOP_K} / F1@{TOP_K} per query over the
    exact cosine top-k (binary relevance = shared embedding label) — the
    set-based floor of the eval family (MAP/nDCG/MRR weight rank; P/R/F1
    ignore it), and the pair every recall-vs-precision tradeoff plot
    starts from. ENTIRELY integer: counts → exact-ppm ratios → harmonic
    mean via 2pr//(p+r); no float enters, so the oracle hash certifies
    every position with zero rounding contract.

    Scale: the ranking is the already-gated blocked-GEMM plan; relevance
    is two broadcast label joins; corpus relevant-counts are a
    label-cardinality aggregate joined to the stride query list — no new
    shuffle shape beyond ``retrieval_map_eval``'s."""
    ranking = sim_topk_bruteforce(spark, sf_dir)
    lab = _staged(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    )
    lq = lab.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    ln_ = lab.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    hits = (
        ranking.join(lq, "query_id")
        .join(ln_, "neighbor_id")
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_rel_top")
        )
    )
    sizes = lab.groupBy("label").agg(F.count(F.lit(1)).alias("n_label_rows"))
    # Unique-label queries (n_rel_corpus = 0) are dropped to match the
    # oracle's inner self-join — see retrieval_map_eval's nrel note.
    nrel = (
        lab.filter(F.col("vec_id") % 100 == 0)
        .join(F.broadcast(sizes), "label")
        .filter(F.col("n_label_rows") >= 2)
        .select(
            F.col("vec_id").alias("query_id"),
            "label",
            (F.col("n_label_rows") - 1).cast("bigint").alias("n_rel_corpus"),
        )
    )
    p_sql = f"(n_rel_top * 1000000 div {TOP_K})"
    r_sql = "(n_rel_top * 1000000 div greatest(n_rel_corpus, 1))"
    return nrel.join(hits, "query_id").select(
        "query_id",
        "label",
        "n_rel_corpus",
        "n_rel_top",
        F.expr(f"cast({p_sql} as bigint)").alias("precision_ppm"),
        F.expr(f"cast({r_sql} as bigint)").alias("recall_ppm"),
        F.expr(
            f"cast(CASE WHEN {p_sql} + {r_sql} > 0"
            f" THEN (2 * {p_sql} * {r_sql}) div ({p_sql} + {r_sql})"
            " ELSE 0 END as bigint)"
        ).alias("f1_ppm"),
    )
