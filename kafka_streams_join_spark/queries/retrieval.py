"""Retrieval & data-selection operators (round 4b): scalar-quantized ANN,
tf-idf keyword extraction, BM25 ranked retrieval, and DSIR-style importance
resampling.

These fill the retrieval/selection corner of the training-data pipeline
surface: after dedup (queries/dedup*.py) and quality gating
(queries/quality.py), real curation pipelines (a) *select* data that looks
like a target domain (DSIR, Xie et al. NeurIPS'23) and (b) *retrieve* over
the corpus for decontamination audits and eval-set construction (BM25,
tf-idf). The SQ-ANN query completes the compression ladder next to PQ
(queries/pq.py): int8 scalar quantization is the standard first rung — 4×
memory reduction with near-exact recall — before PQ's 32×.

Engine-exactness contracts (shared with the rest of the repo):
- integer dot products rank the SQ-ANN results (drift-proof, like PQ's ADC);
- every float score is rounded BEFORE ranking, and every ranking breaks ties
  on an id column, so both engines order identically;
- the DSIR feature hash is md5-hex→BIGINT (the ``text_fingerprint``
  contract) — the one hash both engines compute bit-identically.

Scale shape: each query is one corpus scan; the only frames that shuffle are
narrow (id, score) rows or Zipf-bounded vocab aggregates. Wide columns
(embedding arrays, document text) never enter an Exchange — plan-gated in
``tests/test_retrieval.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ranking import two_phase_rank
from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register
from .similarity import QUERY_STRIDE, query_admission
from .text import _TOKS, _TOKS_SQL

# --------------------------------------------------------------------------
# sim_sq_topk — int8 scalar-quantized ANN (asymmetric-ready, symmetric here)
# --------------------------------------------------------------------------

_SQ_TOPK = 10
# unit-normalize then quantize with the FIXED scale 127 (cells of a unit
# vector are in [-1, 1]); a fixed scale makes the integer dot product a
# direct cosine surrogate: dot(qc, cc) ≈ cos(q, c) · 127²
_SQ_DENOM = 127 * 127

_NRM_SPARK = (
    "sqrt(aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)),"
    " cast(0 as double), (acc, v) -> acc + v))"
)
_NRM_SQL = (
    "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)
_SQ_CODES_SPARK = (
    "transform(embedding, x -> cast(round("
    " CASE WHEN nrm = cast(0 as double) THEN cast(0 as double)"
    " ELSE cast(x as double) / nrm * 127 END) as int))"
)
_SQ_CODES_SQL = (
    "list_transform(embedding, x -> CAST(round("
    " CASE WHEN nrm = 0 THEN 0.0"
    " ELSE CAST(x AS DOUBLE) / nrm * 127 END) AS INTEGER))"
)


@register(
    "sim_sq_topk",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding, {_NRM_SQL} AS nrm FROM embeddings
    ),
    c AS (
      SELECT vec_id, {_SQ_CODES_SQL} AS cc FROM n
    ),
    q AS (
      SELECT vec_id AS q_id, cc AS qc FROM c WHERE vec_id % {QUERY_STRIDE} = 0
    ),
    s AS (
      SELECT q.q_id, c.vec_id,
             CAST(list_dot_product(q.qc, c.cc) AS BIGINT) AS idot
      FROM c, q
      WHERE c.vec_id <> q.q_id
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY idot DESC, vec_id)
             AS rnk
      FROM s
    )
    SELECT q_id, rnk, vec_id, idot,
           round(idot / {_SQ_DENOM}.0, 4) AS approx_cos
    FROM r WHERE rnk <= {_SQ_TOPK}
    """,
)
def sim_sq_topk(
    spark: SparkSession, sf_dir: str, query_batch=None
) -> DataFrame:
    """Top-k ANN over int8 scalar-quantized embeddings — the first rung of
    the ANN compression ladder (4× smaller index than float32; PQ in
    queries/pq.py is the 32× rung). Each vector is unit-normalized and
    quantized cell-wise with the fixed scale 127, so the integer dot
    product of two code arrays is a direct cosine surrogate (≈ cos·127²)
    and — being exact integer arithmetic — ranks identically in every
    engine (the same drift-proofing argument as PQ's integer ADC,
    queries/pq.py).

    Scale shape: the query batch (one per QUERY_STRIDE ids) broadcasts and
    the corpus is scored in its scan pipeline — per corpus row, a loop over
    the broadcast queries, which is exactly blocked brute-force scoring
    with an integer kernel. The BroadcastNestedLoopJoin here is the
    *intended* physical plan for bounded-Q × corpus scoring (same bounded-Q
    contract as the PQ LUT broadcast, and the same caveat: stride-defined Q
    grows with the corpus, so a production system caps the query batch and
    loops). Wide columns never shuffle: only narrow (q_id, vec_id, idot)
    rows reach the per-query top-k Exchange — at 100 TB that is
    Q·N/corpus-partition rows of 24 bytes, and the window is replaceable by
    a per-query TakeOrdered for truly unbounded N."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", F.expr(_NRM_SPARK)
    )
    codes = emb.select("vec_id", F.expr(_SQ_CODES_SPARK).alias("cc"))
    qcodes = query_admission(codes, query_batch).select(
        F.col("vec_id").alias("q_id"), F.col("cc").alias("qc")
    )
    scored = (
        codes.crossJoin(F.broadcast(qcodes))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.expr(
                "aggregate(zip_with(qc, cc, (a, b) -> cast(a as bigint) * b),"
                " cast(0 as bigint), (acc, v) -> acc + v)"
            ).alias("idot"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("idot").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _SQ_TOPK)
        .select(
            "q_id",
            "rnk",
            "vec_id",
            "idot",
            F.round(F.col("idot") / _SQ_DENOM, 4).alias("approx_cos"),
        )
    )


# --------------------------------------------------------------------------
# text_tfidf_topterms — per-document keyword extraction
# --------------------------------------------------------------------------

_TFIDF_TOPN = 3


@register(
    "text_tfidf_topterms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lower(unnest({_TOKS_SQL})) AS token FROM documents
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, count(*) AS df_docs FROM tf GROUP BY token
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df_docs,
             round(tf.tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / df.df_docs), 4)
               AS tfidf
      FROM tf JOIN df USING (token)
    ),
    r AS (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, token) AS term_rank
      FROM scored
    )
    SELECT doc_id, term_rank, token, tf, df_docs, tfidf
    FROM r WHERE term_rank <= {_TFIDF_TOPN}
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TFIDF_TOPN} tf-idf terms per document — the classic keyword
    extractor (and the feature stage of every sparse-retrieval index
    build). tf-idf = tf · ln(N/df), rounded to 4 dp BEFORE ranking and
    tie-broken on the token string, so both engines produce the same
    ranking even at float-ulp drift.

    Scale shape: one corpus scan feeds the (doc_id, token) tf aggregate —
    one shuffle of narrow token rows with map-side combine. df is an
    aggregate OF the tf frame (already token-keyed after the first
    shuffle's repartition is reusable) and is Zipf-bounded ≪ corpus, so it
    broadcasts back into the scoring join; the per-doc top-k window
    re-shuffles only (doc_id, token, score) rows. Document text never
    enters an Exchange."""
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias("token"),
    )
    tf = _staged(tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf")))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    n_docs = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df_docs",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df_docs")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= _TFIDF_TOPN)
        .select("doc_id", "term_rank", "token", "tf", "df_docs", "tfidf")
    )


# --------------------------------------------------------------------------
# text_bm25_search — ranked retrieval for a fixed query-term set
# --------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "window")
_BM25_K1 = "1.2"  # exact decimal literals, spelled identically in both engines
_BM25_B = "0.75"
_BM25_TOPN = 20
_BM25_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + ")"


@register(
    "text_bm25_search",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lower(unnest({_TOKS_SQL})) AS token FROM documents
    ),
    dl AS (
      SELECT doc_id, count(*) AS doclen FROM tok GROUP BY doc_id
    ),
    stats AS (
      SELECT count(*) AS n_docs, avg(CAST(doclen AS DOUBLE)) AS avgdl FROM dl
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM tok
      WHERE token IN {_BM25_TERMS_SQL}
      GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, count(*) AS df FROM tf GROUP BY token
    ),
    contrib AS (
      SELECT tf.doc_id,
             ln(1 + ((SELECT n_docs FROM stats) - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * ({_BM25_K1} + 1))
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                   + {_BM25_B} * dl.doclen / (SELECT avgdl FROM stats)))
               AS c
      FROM tf
      JOIN df USING (token)
      JOIN dl ON tf.doc_id = dl.doc_id
    ),
    scored AS (
      SELECT doc_id, count(*) AS n_terms_hit, round(sum(c), 4) AS bm25
      FROM contrib GROUP BY doc_id
    ),
    r AS (
      SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
      FROM scored
    )
    SELECT rnk, doc_id, n_terms_hit, bm25 FROM r WHERE rnk <= {_BM25_TOPN}
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Robertson/Okapi) ranked retrieval for a fixed query-term set —
    the sparse-retrieval primitive a decontamination audit or eval-set
    builder runs over the corpus. Standard parameters k1=1.2, b=0.75; idf
    is the +1-smoothed Robertson form, always positive. Scores are rounded
    to 4 dp BEFORE the global ranking and tie-broken on doc_id, so the
    ranking is engine-stable.

    Scale shape: one corpus scan; the term filter (3 literals) is applied
    map-side inside the scan pipeline, so only matching (doc_id, token)
    rows — a tiny fraction of the corpus — reach the tf aggregate. Doc
    lengths need their own full-token aggregate (shuffle of narrow rows,
    map-side combined); df (3 rows) and the corpus stats (1 row) broadcast.
    The global top-{_BM25_TOPN} window is the oracle-parity surface; an
    unbounded corpus swaps it for TakeOrdered (rank-free top-k), same as
    ``sim_topk_bruteforce``."""
    tok = _staged(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias("token"),
        )
    )
    dl = _staged(tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doclen")))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("doclen").cast("double")).alias("avgdl"),
    )
    tf = tok.filter(F.col("token").isin(*_BM25_TERMS)).groupBy(
        "doc_id", "token"
    ).agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    k1, b = _BM25_K1, _BM25_B
    contrib = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    1
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.expr(f"{k1} + 1"))
                / (
                    F.col("tf")
                    + F.expr(k1)
                    * (
                        F.expr(f"1 - {b}")
                        + F.expr(b) * F.col("doclen") / F.col("avgdl")
                    )
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.round(F.sum("c"), 4).alias("bm25"),
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _BM25_TOPN)
        .select("rnk", "doc_id", "n_terms_hit", "bm25")
    )


# --------------------------------------------------------------------------
# pipeline_importance_resample — DSIR-style hashed-n-gram data selection
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 64
_DSIR_TARGET_SOURCES = ("src0", "src1")  # the "looks like my domain" target set
_DSIR_KEEP_PPM = 250_000  # keep the top 25% by importance weight
_DSIR_TGT_SQL = "(" + ", ".join(f"'{s}'" for s in _DSIR_TARGET_SOURCES) + ")"
# the md5-hex→BIGINT hash contract proven engine-stable by text_fingerprint
_DSIR_BUCKET_SPARK = (
    f"cast(conv(substring(md5(token), 1, 8), 16, 10) as bigint) % {_DSIR_BUCKETS}"
)
_DSIR_BUCKET_SQL = (
    f"CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % {_DSIR_BUCKETS}"
)


@register(
    "pipeline_importance_resample",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, lower(unnest({_TOKS_SQL})) AS token FROM documents
    ),
    feat AS (
      SELECT doc_id, source, {_DSIR_BUCKET_SQL} AS bucket FROM tok
    ),
    tgt AS (
      SELECT bucket, count(*) AS ct FROM feat
      WHERE source IN {_DSIR_TGT_SQL} GROUP BY bucket
    ),
    src AS (
      SELECT bucket, count(*) AS cs FROM feat GROUP BY bucket
    ),
    tot AS (
      SELECT (SELECT sum(ct) FROM tgt) AS tt, (SELECT sum(cs) FROM src) AS ts
    ),
    lam AS (
      SELECT src.bucket,
             ln(((COALESCE(tgt.ct, 0) + 1.0) / (tot.tt + {_DSIR_BUCKETS}))
                / ((src.cs + 1.0) / (tot.ts + {_DSIR_BUCKETS}))) AS lam
      FROM src LEFT JOIN tgt USING (bucket) CROSS JOIN tot
    ),
    w AS (
      SELECT feat.doc_id,
             count(*) AS n_toks,
             round(avg(lam.lam), 4) + 0.0 AS iw
      FROM feat JOIN lam USING (bucket)
      GROUP BY feat.doc_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY iw DESC, doc_id) AS sel_rank,
             (SELECT count(*) FROM w) AS n_docs
      FROM w
    )
    SELECT doc_id, n_toks, iw, sel_rank,
           CASE WHEN sel_rank * 1000000 <= n_docs * {_DSIR_KEEP_PPM}
                THEN 1 ELSE 0 END AS kept
    FROM ranked
    """,
)
def pipeline_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. NeurIPS'23): select the
    slice of the corpus that looks most like a target domain, scored under
    hashed-unigram bag-of-words language models. Features are md5-hash
    buckets (B={_DSIR_BUCKETS}; the ``text_fingerprint`` hash contract, so
    both engines bucket identically); the importance weight of a document
    is the mean over its tokens of ln(p_target(b)/p_source(b)) with +1
    smoothing — mean, not sum, so weight is length-normalized. Weights are
    rounded to 4 dp BEFORE the global ranking and tie-broken on doc_id;
    the keep decision is exact integer ppm arithmetic
    (rank·10⁶ ≤ n_docs·{_DSIR_KEEP_PPM}), the ``pipeline_domain_mix``
    contract — no float threshold.

    Scale shape: one corpus scan → map-side bucket projection; both LM
    count tables are B={_DSIR_BUCKETS}-row aggregates (map-side combined —
    what moves is O(partitions·B)) that broadcast back into per-doc
    scoring; the corpus shuffles once, on doc_id, for the weight average.
    The global rank is then computed as a TWO-PHASE rank, never a
    single-partition sort of the corpus: (1) a per-weight-LEVEL count
    aggregate — bounded by the 4-dp rounding to the distinct values of a
    mean-log-likelihood-ratio, a model-sized frame independent of corpus
    size — gives each level its exclusive cumulative offset (the one
    unpartitioned window in the plan runs over THIS bounded frame); (2) a
    window partitioned BY the weight level ranks doc_ids within each
    level; sel_rank = level offset + within-level rank, exactly the
    global row_number. The per-document frame therefore only ever crosses
    hash exchanges (gated: no Exchange SinglePartition carries doc_id)."""
    feat = _staged(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias("token"),
        ).select(
            "doc_id", "source", F.expr(_DSIR_BUCKET_SPARK).alias("bucket")
        )
    )
    tgt = feat.filter(F.col("source").isin(*_DSIR_TARGET_SOURCES)).groupBy(
        "bucket"
    ).agg(F.count(F.lit(1)).alias("ct"))
    src = feat.groupBy("bucket").agg(F.count(F.lit(1)).alias("cs"))
    tot = tgt.agg(F.sum("ct").alias("tt")).crossJoin(
        src.agg(F.sum("cs").alias("ts"))
    )
    lam = (
        src.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.log(
                ((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                 / (F.col("tt") + F.lit(_DSIR_BUCKETS)))
                / ((F.col("cs") + F.lit(1.0))
                   / (F.col("ts") + F.lit(_DSIR_BUCKETS)))
            ).alias("lam"),
        )
    )
    weights = (
        feat.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            # + 0.0 after the round (the -0.0 contract): a doc whose mean
            # log-likelihood-ratio is a tiny negative rounds to -0.0 in
            # DuckDB's double rounding but +0.0 through Spark's BigDecimal
            # path (observed at sf0.1); -0.0 == 0.0 in both engines' sorts,
            # so normalizing is rank-preserving.
            (F.round(F.avg("lam"), 4) + 0.0).alias("iw"),
        )
    )
    weights = _staged(weights)
    # Two-phase global rank over the bounded 4-dp weight levels — the
    # distributed row_number (operators/ranking.py); the per-doc frame
    # never crosses an Exchange SinglePartition.
    n_docs = weights.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        two_phase_rank(
            weights, level_col="iw", id_col="doc_id",
            rank_col="sel_rank", ascending=False,
        )
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "n_toks",
            "iw",
            "sel_rank",
            F.when(
                F.col("sel_rank") * 1_000_000
                <= F.col("n_docs") * _DSIR_KEEP_PPM,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("kept"),
        )
    )


# --------------------------------------------------------------------------
# pipeline_weighted_sample — Efraimidis–Spirakis weighted sampling
# --------------------------------------------------------------------------

_WS_K = 50
# u in (0, 1]: md5-derived 32-bit uniform, +1 so ln(u) is always defined.
# The md5-hex→BIGINT contract is the text_fingerprint one — engine-stable.
_WS_U_SPARK = (
    "(cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as double)"
    " + 1.0) / 4294967296.0"
)
_WS_U_SQL = (
    "(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " + 1.0) / 4294967296.0"
)


@register(
    "pipeline_weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars AS w,
             round(ln({_WS_U_SQL}) / n_chars, 6) AS es_key
      FROM documents
    ),
    r AS (
      SELECT *, row_number() OVER (ORDER BY es_key DESC, doc_id) AS rnk
      FROM keyed
    )
    SELECT rnk, doc_id, w, es_key FROM r WHERE rnk <= {_WS_K}
    """,
)
def pipeline_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement in one distributed pass —
    Efraimidis–Spirakis (IPL 2006), the algorithm behind every
    quality-weighted corpus subsample: each item draws key = u^(1/w)
    (here its log form ln(u)/w, monotone-equivalent) and the global
    top-K keys ARE a weighted sample without replacement. The uniform u
    is md5-hash-derived from doc_id — fully deterministic and
    engine-identical (the ``text_fingerprint`` hash contract), which is
    exactly how a reproducible production sample pins its seed. Weight =
    n_chars (longer documents proportionally likelier).

    Scale shape: key computation is map-side inside the scan; the global
    top-K is the oracle-parity window here and a TakeOrdered (rank-free,
    no single-partition sort) at production scale — the same note as
    ``text_bm25_search``. Keys are rounded to 6 dp BEFORE ranking with
    doc_id tie-breaks, the repo's engine-stable ordering contract."""
    keyed = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").alias("w"),
        F.round(F.log(F.expr(_WS_U_SPARK)) / F.col("n_chars"), 6).alias("es_key"),
    )
    w = Window.orderBy(F.col("es_key").desc(), F.col("doc_id"))
    return (
        keyed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _WS_K)
        .select("rnk", "doc_id", "w", "es_key")
    )


# --------------------------------------------------------------------------
# retrieval_hybrid_rrf — reciprocal-rank fusion of two sparse rankers
# --------------------------------------------------------------------------

_RRF_K = 60  # the standard Cormack/Clarke/Buettcher constant
_RRF_TOPN = 10
# Each ranker leg feeds fusion its TOP-N only — the standard RRF contract
# (production stacks fuse leg top-k lists, not full rankings). The cap is
# applied as ORDER BY + LIMIT so the leg plans TakeOrderedAndProject (a
# per-partition heap + driver merge — no global sort, no full rank); the
# rank window then runs over the N-bounded survivors only. (WindowGroupLimit
# cannot prune an UNpartitioned rank window in this Spark build — TakeOrdered
# is the correct physical shape for a global top-N.)
_RRF_LEG_N = 1000


@register(
    "retrieval_hybrid_rrf",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lower(unnest({_TOKS_SQL})) AS token FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS doclen FROM tok GROUP BY doc_id),
    stats AS (
      SELECT count(*) AS n_docs, avg(CAST(doclen AS DOUBLE)) AS avgdl FROM dl
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM tok
      WHERE token IN {_BM25_TERMS_SQL}
      GROUP BY doc_id, token
    ),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    bm25 AS (
      SELECT tf.doc_id, round(sum(
               ln(1 + ((SELECT n_docs FROM stats) - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * ({_BM25_K1} + 1))
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                   + {_BM25_B} * dl.doclen / (SELECT avgdl FROM stats)))), 4) AS s
      FROM tf JOIN df USING (token) JOIN dl ON tf.doc_id = dl.doc_id
      GROUP BY tf.doc_id
    ),
    tfidf AS (
      SELECT tf.doc_id, round(sum(
               tf.tf * ln(((SELECT n_docs FROM stats) + 1.0) / (df.df + 1.0))
               / dl.doclen), 6) AS s
      FROM tf JOIN df USING (token) JOIN dl ON tf.doc_id = dl.doc_id
      GROUP BY tf.doc_id
    ),
    r1 AS (
      SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rnk
      FROM bm25 QUALIFY rnk <= {_RRF_LEG_N}
    ),
    r2 AS (
      SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rnk
      FROM tfidf QUALIFY rnk <= {_RRF_LEG_N}
    ),
    fused AS (
      SELECT COALESCE(r1.doc_id, r2.doc_id) AS doc_id,
             r1.rnk AS rnk_bm25, r2.rnk AS rnk_tfidf,
             round(COALESCE(1.0 / ({_RRF_K} + r1.rnk), 0)
                   + COALESCE(1.0 / ({_RRF_K} + r2.rnk), 0), 6) AS rrf
      FROM r1 FULL OUTER JOIN r2 ON r1.doc_id = r2.doc_id
    )
    SELECT doc_id, rnk_bm25, rnk_tfidf, rrf,
           CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rnk
    FROM fused
    QUALIFY rnk <= {_RRF_TOPN}
    """,
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (Cormack et al. SIGIR'09):
    two independent sparse rankers — Okapi BM25 and length-normalized
    tf-idf, both over the same fixed query-term set — are fused by
    ``sum(1 / (k + rank_r))`` with the standard k={_RRF_K}, the same
    score-free fusion production search stacks use to combine sparse and
    dense legs (rank-only fusion needs no score calibration between
    rankers). Emits the fused top-{_RRF_TOPN} with each leg's rank for
    audit; a doc ranked by only one leg contributes only that leg's
    reciprocal (COALESCE, not a dropped row — hence the FULL OUTER join of
    the rank lists).

    Scale: both rankers share ONE staged token scan and the same tiny
    tf/df/dl aggregates (the term filter runs map-side in the scan, so only
    matching rows reach any aggregate); each leg feeds fusion its
    top-{_RRF_LEG_N} ONLY (the standard RRF contract — mirrored in the
    oracle's QUALIFY), applied as ORDER BY + LIMIT so each leg plans
    TakeOrderedAndProject (per-partition heap + driver merge); the rank
    window and the full-outer fusion join then see N-bounded frames
    regardless of how many documents match a term. Every score is rounded
    before ranking with doc_id tie-breaks — the repo's engine-stable
    ordering contract, applied at all three ranking steps."""
    tok = _staged(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias("token"),
        )
    )
    dl = _staged(tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doclen")))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("doclen").cast("double")).alias("avgdl"),
    )
    tf = _staged(
        tok.filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    k1, b = _BM25_K1, _BM25_B
    base = _staged(
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
    )
    bm25 = base.groupBy("doc_id").agg(
        F.round(
            F.sum(
                F.log(
                    1
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.expr(f"{k1} + 1"))
                / (
                    F.col("tf")
                    + F.expr(k1)
                    * (F.expr(f"1 - {b}") + F.expr(b) * F.col("doclen") / F.col("avgdl"))
                )
            ),
            4,
        ).alias("s")
    )
    tfidf = base.groupBy("doc_id").agg(
        F.round(
            F.sum(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                / F.col("doclen")
            ),
            6,
        ).alias("s")
    )
    w = Window.orderBy(F.col("s").desc(), F.col("doc_id"))
    r1 = (
        bm25.orderBy(F.col("s").desc(), F.col("doc_id"))
        .limit(_RRF_LEG_N)
        .select("doc_id", F.row_number().over(w).alias("rnk_bm25"))
    )
    r2 = (
        tfidf.orderBy(F.col("s").desc(), F.col("doc_id"))
        .limit(_RRF_LEG_N)
        .select("doc_id", F.row_number().over(w).alias("rnk_tfidf"))
    )
    fused = (
        r1.join(r2, "doc_id", "full")
        .select(
            "doc_id",
            "rnk_bm25",
            "rnk_tfidf",
            F.round(
                F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("rnk_bm25")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("rnk_tfidf")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    wf = Window.orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= _RRF_TOPN)
    )


# --------------------------------------------------------------------------
# retrieval_query_likelihood — Dirichlet-smoothed LM retrieval (round 6)
# --------------------------------------------------------------------------

_QL_MU = "50.0"  # Dirichlet prior, spelled identically in both engines
# (classic default is 2000 for web docs; this corpus averages ~54
# tokens/doc, so mu=50 keeps the prior comparable to a document length)
_QL_TOPN = 20
_QL_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + ")"


@register(
    "retrieval_query_likelihood",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lower(unnest({_TOKS_SQL})) AS token FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS doclen FROM tok GROUP BY doc_id),
    coll AS (SELECT CAST(sum(doclen) AS BIGINT) AS total FROM dl),
    cf AS (
      SELECT token, count(*) AS cf FROM tok
      WHERE token IN {_QL_TERMS_SQL} GROUP BY token
    ),
    prior AS (
      SELECT sum(ln({_QL_MU} * (cf * 1.0 / (SELECT total FROM coll))))
               AS base_num
      FROM cf
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM tok
      WHERE token IN {_QL_TERMS_SQL} GROUP BY 1, 2
    ),
    adj AS (
      SELECT tf.doc_id,
             sum(ln(tf.tf + {_QL_MU} * (cf.cf * 1.0 / (SELECT total FROM coll)))
                 - ln({_QL_MU} * (cf.cf * 1.0 / (SELECT total FROM coll))))
               AS bonus,
             count(*) AS n_terms_hit
      FROM tf JOIN cf USING (token)
      GROUP BY tf.doc_id
    ),
    scored AS (
      SELECT dl.doc_id,
             coalesce(adj.n_terms_hit, 0) AS n_terms_hit,
             round((SELECT base_num FROM prior) + coalesce(adj.bonus, 0.0)
                   - 3 * ln(dl.doclen + {_QL_MU}), 4) AS ql
      FROM dl LEFT JOIN adj ON adj.doc_id = dl.doc_id
    )
    SELECT rnk, doc_id, n_terms_hit, ql FROM (
      SELECT *, row_number() OVER (ORDER BY ql DESC, doc_id) AS rnk
      FROM scored) WHERE rnk <= {_QL_TOPN}
    """,
)
def retrieval_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai & Lafferty
    2001): score(d) = Σ_t ln((tf + μ·P(t|C)) / (|d| + μ)) for the fixed
    query terms — the language-modeling alternative to BM25, decomposed so
    non-matching documents cost O(1): score = prior(C) + Σ_hit bonus −
    |Q|·ln(|d| + μ), where the prior and the per-term collection
    probabilities are model-sized broadcasts and only HIT (doc, term) rows
    carry a join. 4-dp rounding before the global rank, doc_id ties — the
    BM25 engine-stable ordering contract.

    Scale (round-15 one-aggregate form, guide §2.4): the fixed |Q|=3 term
    set means per-document term frequencies fit as THREE conditional-count
    COLUMNS of the doclen aggregate — one corpus token scan, ONE shuffle
    of narrow per-doc count rows, and no (doc, term)-keyed join at all.
    The collection stats (cf per term, total) are a 1-row aggregate OF the
    per-doc frame (cf_t = Σ_docs tf_t, exactly the oracle's token count),
    broadcast back for the row-local score; the rank runs over the
    doc-count-sized scored frame like ``text_bm25_search`` (TakeOrdered at
    true scale). The previous form staged the corpus-sized token frame
    plus three derived frames and paid a SortMergeJoin of dl ⟕ adj; this
    plan has one corpus-scan pipeline and only bounded broadcasts."""
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias(
            "token"
        ),
    )
    tf_cols = [
        F.count(F.when(F.col("token") == t, F.lit(1))).alias(f"tf_{i}")
        for i, t in enumerate(_BM25_TERMS)
    ]
    per_doc = _staged(
        tok.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("doclen"), *tf_cols
        )
    )
    # collection stats: total token count and per-term collection
    # frequencies (sum of per-doc tfs == the oracle's corpus token count)
    stats = per_doc.agg(
        F.sum("doclen").cast("bigint").alias("total"),
        *[
            F.sum(f"tf_{i}").cast("bigint").alias(f"cf_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    # per-term smoothed collection probability p_t = cf_t * 1.0 / total —
    # the oracle's spelling; terms absent from the corpus (cf = 0)
    # contribute nothing (the oracle's cf CTE has no row for them)
    mu = _QL_MU
    p = [f"(cf_{i} * 1.0 / total)" for i in range(len(_BM25_TERMS))]
    base_num = " + ".join(
        f"CASE WHEN cf_{i} > 0 THEN ln({mu} * {p[i]}) ELSE 0.0 END"
        for i in range(len(_BM25_TERMS))
    )
    prior = stats.select(
        F.expr(base_num).alias("base_num"),
        *[F.expr(p[i]).alias(f"p_{i}") for i in range(len(_BM25_TERMS))],
    )
    bonus = " + ".join(
        f"CASE WHEN tf_{i} > 0"
        f" THEN ln(tf_{i} + {mu} * p_{i}) - ln({mu} * p_{i})"
        " ELSE 0.0 END"
        for i in range(len(_BM25_TERMS))
    )
    hits = " + ".join(
        f"CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END"
        for i in range(len(_BM25_TERMS))
    )
    scored = per_doc.crossJoin(F.broadcast(prior)).select(
        "doc_id",
        F.expr(f"cast({hits} as bigint)").alias("n_terms_hit"),
        F.round(
            F.col("base_num")
            + F.expr(bonus)
            - 3 * F.log(F.col("doclen") + F.expr(_QL_MU)),
            4,
        ).alias("ql"),
    )
    w = Window.orderBy(F.col("ql").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _QL_TOPN)
        .select("rnk", "doc_id", "n_terms_hit", "ql")
    )
