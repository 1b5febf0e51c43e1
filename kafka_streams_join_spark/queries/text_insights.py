"""Corpus-insight text analytics (round 7): novelty curves, distributional
source divergence, and term burstiness — the reports a training-data curator
reads AFTER dedup/quality filtering, to decide what to sample next.

All three follow the repo's engine-parity contracts: token splitting reuses
the shared ``_TOKS`` expression, counts stay in exact BIGINT, and every
``ln()`` term is rounded to integer micro-nats BEFORE summation (the
``text_bigram_lm_score`` contract) so log-space scores are bit-stable across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register
from .text import _TOKS, _TOKS_SQL

# --------------------------------------------------------------------------
# text_ngram_novelty — first-occurrence novelty curve in corpus order
# --------------------------------------------------------------------------

_NOV_N = 3  # shingle width (words)
_NOV_BUCKET = 100  # docs per curve bucket


@register(
    "text_ngram_novelty",
    oracle=f"""
    WITH tok AS (SELECT doc_id, list_transform({_TOKS_SQL}, t -> lower(t)) AS toks
                 FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS shingle
      FROM tok, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS t(i)
    ),
    first AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle),
    per_doc AS (
      SELECT s.doc_id,
             count(*) AS n_shingles,
             sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS n_novel
      FROM sh s JOIN first f ON f.shingle = s.shingle
      GROUP BY s.doc_id
    )
    SELECT doc_id // {_NOV_BUCKET} AS bucket,
           count(*) AS n_docs,
           CAST(sum(n_shingles) AS BIGINT) AS n_shingles,
           CAST(sum(n_novel) AS BIGINT) AS n_novel,
           CAST(sum(n_novel) * 1000000 // sum(n_shingles) AS BIGINT)
             AS novelty_ppm
    FROM per_doc
    GROUP BY 1
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty curve: processing documents in corpus (doc_id) order, what
    fraction of each bucket's distinct word {_NOV_N}-grams is seen for the
    FIRST time? The diminishing-returns diagnostic behind "more data vs
    more epochs" decisions (novelty_ppm falling toward 0 means new data
    repeats the old) — and the doc-granular twin of the passage-level
    ``dedup_duplicate_passages`` machinery.

    Scale: shingles never pair with each other — first-occurrence is one
    min-aggregate per shingle (map-side combinable), joined back to the
    per-doc distinct-shingle frame on the shingle key. The curve is a
    bounded-cardinality bucket aggregate."""
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(f"transform({_TOKS}, t -> lower(t))").alias("toks")
    )
    sh = _staged(
        tok.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(toks) - 2, 0)),"
                    " i -> concat_ws(' ', toks[i - 1], toks[i], toks[i + 1]))"
                )
            ).alias("shingle"),
        ).distinct()
    )
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return per_doc.groupBy(
        F.expr(f"doc_id div {_NOV_BUCKET}").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_shingles").cast("bigint").alias("n_shingles"),
        F.sum("n_novel").cast("bigint").alias("n_novel"),
        F.expr(
            "cast(sum(n_novel) * 1000000 div sum(n_shingles) as bigint)"
        ).alias("novelty_ppm"),
    )


# --------------------------------------------------------------------------
# text_js_divergence_sources — distributional drift between sources
# --------------------------------------------------------------------------

_JSD_TOPN = 10


@register(
    "text_js_divergence_sources",
    oracle=f"""
    WITH tok AS (
      SELECT source, lower(unnest({_TOKS_SQL})) AS token FROM documents
    ),
    cnt AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
    tot AS (SELECT source, sum(c) AS n FROM cnt GROUP BY source),
    pair AS (
      SELECT a.source AS src_a, b.source AS src_b,
             a.c AS ca, b.c AS cb, ta.n AS na, tb.n AS nb
      FROM cnt a
      JOIN cnt b ON a.token = b.token AND a.source < b.source
      JOIN tot ta ON ta.source = a.source
      JOIN tot tb ON tb.source = b.source
    ),
    common AS (
      SELECT src_a, src_b, count(*) AS n_common,
             max(na) AS na, max(nb) AS nb,
             sum(ca) AS sa, sum(cb) AS sb,
             CAST(sum(round(1000000.0 * ca
                  * ln(2.0 * ca * nb / (ca * nb + cb * na)) / na))
               AS BIGINT) AS p_common,
             CAST(sum(round(1000000.0 * cb
                  * ln(2.0 * cb * na / (ca * nb + cb * na)) / nb))
               AS BIGINT) AS q_common
      FROM pair GROUP BY src_a, src_b
    ),
    scored AS (
      SELECT src_a, src_b, n_common,
             CAST((p_common
                   + CAST(round(1000000.0 * (na - sa) * ln(2.0) / na)
                          AS BIGINT)
                   + q_common
                   + CAST(round(1000000.0 * (nb - sb) * ln(2.0) / nb)
                          AS BIGINT)) // 2 AS BIGINT) AS jsd_micro
      FROM common
    ),
    top AS (
      SELECT * FROM scored ORDER BY jsd_micro DESC, src_a, src_b
      LIMIT {_JSD_TOPN}
    )
    SELECT row_number() OVER (ORDER BY jsd_micro DESC, src_a, src_b) AS rnk,
           src_a, src_b, n_common, jsd_micro
    FROM top
    """,
)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between per-source unigram distributions:
    the top-{_JSD_TOPN} most-divergent source pairs — the domain-mixing
    diagnostic (a pair at ~ln2 micro-nats shares no vocabulary; near 0,
    the sources are interchangeable for sampling purposes).

    Determinism: every ln() term is rounded to integer micro-nats before
    the BIGINT summation (the bigram-LM contract); tokens in only one
    source never join — their exact total mass contributes in closed form
    as (n − Σ common counts)·ln2/n, ONE rounded term per side, so the
    inner token join is sufficient (no outer join over vocabularies).

    Scale: per-source counts are map-side-combined aggregates; the pair
    stage joins on the token key (bounded by sources-per-token²), and the
    report is a |sources|²-row aggregate — TakeOrdered top-N."""
    from pyspark.sql import Window

    tok = load_table(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias("token"),
    )
    cnt = _staged(
        tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    a = cnt.select(
        F.col("source").alias("src_a"), "token", F.col("c").alias("ca")
    )
    b = cnt.select(
        F.col("source").alias("src_b"), "token", F.col("c").alias("cb")
    )
    ta = tot.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    tb = tot.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    pair = (
        a.join(b, "token")
        .filter(F.col("src_a") < F.col("src_b"))
        .join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
    )
    common = pair.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.sum("ca").alias("sa"),
        F.sum("cb").alias("sb"),
        F.expr(
            "cast(sum(round(1000000.0D * ca"
            " * ln(2.0D * ca * nb / (ca * nb + cb * na)) / na)) as bigint)"
        ).alias("p_common"),
        F.expr(
            "cast(sum(round(1000000.0D * cb"
            " * ln(2.0D * cb * na / (ca * nb + cb * na)) / nb)) as bigint)"
        ).alias("q_common"),
    )
    scored = common.select(
        "src_a",
        "src_b",
        "n_common",
        F.expr(
            "cast((p_common"
            " + cast(round(1000000.0D * (na - sa) * ln(2.0D) / na) as bigint)"
            " + q_common"
            " + cast(round(1000000.0D * (nb - sb) * ln(2.0D) / nb) as bigint)"
            ") div 2 as bigint)"
        ).alias("jsd_micro"),
    )
    top = scored.orderBy(
        F.col("jsd_micro").desc(), F.col("src_a"), F.col("src_b")
    ).limit(_JSD_TOPN)
    w = Window.orderBy(F.col("jsd_micro").desc(), F.col("src_a"), F.col("src_b"))
    return top.select(
        F.row_number().over(w).alias("rnk"),
        "src_a",
        "src_b",
        "n_common",
        "jsd_micro",
    )


# --------------------------------------------------------------------------
# text_term_burstiness — Fano factor of per-document term counts
# --------------------------------------------------------------------------

_BURST_TOPN = 20
_BURST_MIN_CF = 20


@register(
    "text_term_burstiness",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lower(unnest({_TOKS_SQL})) AS token FROM documents
    ),
    per_doc AS (SELECT token, doc_id, count(*) AS x FROM tok GROUP BY 1, 2),
    n AS (SELECT count(*) AS n_docs FROM documents),
    stats AS (
      SELECT token,
             count(*) AS df,
             sum(x) AS cf,
             sum(x * x) AS sx2
      FROM per_doc GROUP BY token
    )
    SELECT token, CAST(df AS BIGINT) AS df, CAST(cf AS BIGINT) AS cf,
           CAST((1000 * (n.n_docs * sx2 - cf * cf))
                // (n.n_docs * cf) AS BIGINT) AS fano_milli
    FROM stats CROSS JOIN n
    WHERE cf >= {_BURST_MIN_CF}
    ORDER BY fano_milli DESC, token
    LIMIT {_BURST_TOPN}
    """,
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness: the Fano factor (variance-to-mean ratio, in exact
    integer milli-units) of per-document term counts, zeros included —
    content words burst (all occurrences in few docs, Fano ≫ 1), function
    words spread evenly (Fano ≈ 1, the Poisson line). The classic Church &
    Gale '95 signal for keyword-ness and boilerplate detection, reported
    as the top-{_BURST_TOPN} bursty terms with corpus frequency ≥
    {_BURST_MIN_CF}.

    Exact-integer contract: with N docs, mean = cf/N and E[X²] = Σx²/N
    over ALL docs (absent docs contribute x = 0 to both), so
    fano_milli = 1000·(N·Σx² − cf²) / (N·cf) in pure BIGINT floor
    division — no floats anywhere.

    Scale: two map-side-combinable aggregates (per-(token, doc) then
    per-token); the 1-row doc count broadcasts; top-N is TakeOrdered."""
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias("token"),
    )
    per_doc = tok.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("x"))
    n = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    stats = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("x").alias("cf"),
        F.sum(F.expr("x * x")).alias("sx2"),
    )
    return (
        stats.crossJoin(F.broadcast(n))
        .filter(F.col("cf") >= _BURST_MIN_CF)
        .select(
            "token",
            F.col("df").cast("bigint").alias("df"),
            F.col("cf").cast("bigint").alias("cf"),
            # DECIMAL(38,0): cf² exceeds BIGINT once a term's collection
            # frequency reaches ~3e9 (any function word at 100-TB scale)
            # and ANSI throws; DuckDB's sum() is already HUGEINT. The
            # numerator is N·Σx² − cf² = N²·Var ≥ 0, so div ≡ floor.
            F.expr(
                "cast((1000 * (cast(n_docs as decimal(38,0)) * sx2"
                " - cast(cf as decimal(38,0)) * cf))"
                " div (cast(n_docs as decimal(38,0)) * cf) as bigint)"
            ).alias("fano_milli"),
        )
        .orderBy(F.col("fano_milli").desc(), F.col("token"))
        .limit(_BURST_TOPN)
    )
