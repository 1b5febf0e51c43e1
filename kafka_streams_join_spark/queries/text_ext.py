"""Text-analysis extensions (round 2): corpus-statistical quality scoring.

``text_quality_score`` (queries/text.py) scores documents with per-document
heuristics (length, punctuation, stopword ratios). This adds the corpus-level
signal real curation pipelines combine with it: **unigram surprisal** — a
document whose tokens are improbable under the corpus's own unigram language
model is boilerplate, noise, or the wrong language. Two aggregation passes,
both shuffle-light: vocab build is one hash-agg on token, scoring is one
broadcast join + one hash-agg on doc_id.

Registered after the proven tail — outside the driver's current sweep
window (local-oracle-proven; rotated in a later round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from ..operators.staging import staged as _staged
from .registry import register
from .text import _TOKS, _TOKS_SQL, text_lang_id


@register(
    "text_unigram_surprisal",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lower(unnest({_TOKS_SQL})) AS token FROM documents
    ),
    vocab AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    total AS (SELECT sum(c) AS t FROM vocab)
    SELECT doc_id,
           count(*) AS n_tokens,
           round(avg(-ln(v.c / (SELECT t FROM total))), 4) AS avg_surprisal
    FROM tok JOIN vocab v USING (token)
    GROUP BY doc_id
    """,
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average unigram surprisal per document, under the corpus's own
    unigram model: -ln(count(token)/total_tokens), averaged over the
    document. High surprisal = improbable text (noise, wrong language);
    low = boilerplate. No smoothing needed — every scored token is in the
    vocabulary by construction.

    Scale shape: the vocabulary is Zipf-bounded (≪ corpus size), so it
    broadcasts into the scoring join and the corpus shuffles only once, on
    doc_id, for the final average. The total-token count is a 1-row
    broadcast scalar."""
    # staged: the exploded token frame feeds the vocab build, the scalar
    # total, AND the scoring join — one corpus scan, three consumers
    tok = _staged(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias("token"),
        )
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    return (
        tok.join(F.broadcast(vocab), "token")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c") / F.col("t"))), 4).alias("avg_surprisal"),
        )
    )


@register(
    "text_bigram_surprisal",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, list_transform({_TOKS_SQL}, t -> lower(t)) AS toks
      FROM documents
    ),
    bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM tok, unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS t(i)
    ),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1)
    SELECT bg.doc_id,
           count(*) AS n_bigrams,
           round(avg(-ln(c2.c2 * 1.0 / c1.c1)), 4) AS avg_bigram_surprisal
    FROM bg
    JOIN c2 USING (w1, w2)
    JOIN c1 USING (w1)
    GROUP BY bg.doc_id
    """,
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average bigram-conditional surprisal per document under the corpus's
    own bigram model: ``-ln(c(w1 w2) / c(w1 ·))``, averaged over the doc's
    bigrams (docs with < 2 tokens have none and are absent — deterministic
    in both engines). The conditional denominator is the count of bigram
    OCCURRENCES starting at w1 (= sum over w2 of c(w1, w2)), so every
    probability is a true conditional and no smoothing is needed: every
    scored bigram is in the model by construction. Together with
    ``text_unigram_surprisal`` this is the 2-gram LM quality signal curation
    stacks actually threshold on (low = boilerplate, high = noise).

    Scale: ONE exploded (doc_id, w1, w2) frame is staged and fans into the
    bigram-count build, the context-count rollup (a second tiny agg over
    the VOCABULARY, not the corpus), and the scoring join. The bigram vocab
    is Zipf-bounded but wider than the unigram vocab, so the scoring join
    deliberately SHUFFLES on (w1, w2) instead of broadcasting — key-bounded
    state, map-side combined on both inputs; the context counts then attach
    with a vocabulary-sized (w1) join; the corpus reshuffles once more on
    doc_id for the final average. 3 key-bounded shuffles total, no
    broadcast whose size grows with the corpus."""
    tok = _staged(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.expr(f"transform({_TOKS}, t -> lower(t))").alias("toks")
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) < 2 THEN array()"
                    " ELSE transform(sequence(1, size(toks) - 1),"
                    "   i -> struct(toks[i - 1] AS w1, toks[i] AS w2)) END"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    c2 = tok.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    return (
        tok.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log(F.col("c2") / F.col("c1"))), 4).alias(
                "avg_bigram_surprisal"
            ),
        )
    )


_PMI_MIN_COUNT = 5  # frequency floor: PMI is unstable on rare pairs
_PMI_TOPN = 20


@register(
    "text_pmi_collocations",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, list_transform({_TOKS_SQL}, t -> lower(t)) AS toks
      FROM documents
    ),
    uni AS (
      SELECT t.tk AS w, count(*) AS c1
      FROM tok, unnest(toks) AS t(tk) GROUP BY t.tk
    ),
    tot AS (SELECT sum(c1) AS t_uni FROM uni),
    bg AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2, count(*) AS c2
      FROM tok, unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS g(i)
      GROUP BY 1, 2
    ),
    btot AS (SELECT sum(c2) AS t_bg FROM bg),
    pmi AS (
      SELECT bg.w1, bg.w2, bg.c2,
             round(ln((bg.c2 * 1.0 / (SELECT t_bg FROM btot))
                   / ((ua.c1 * 1.0 / (SELECT t_uni FROM tot))
                      * (ub.c1 * 1.0 / (SELECT t_uni FROM tot)))), 4) AS pmi
      FROM bg
      JOIN uni ua ON ua.w = bg.w1
      JOIN uni ub ON ub.w = bg.w2
      WHERE bg.c2 >= {_PMI_MIN_COUNT}
    )
    SELECT w1, w2, c2, pmi,
           CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INT) AS rnk
    FROM pmi
    QUALIFY rnk <= {_PMI_TOPN}
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: the top-{_PMI_TOPN}
    adjacent token pairs by ``ln(p(w1,w2) / (p(w1) p(w2)))`` with a
    frequency floor of {_PMI_MIN_COUNT} (PMI over-rewards hapax pairs —
    Church & Hanks CL'90's caveat, applied as a hard floor so the contract
    is exact). Complements ``text_bigram_top`` (raw frequency finds "of
    the"; PMI finds genuinely ASSOCIATED pairs — multiword expressions,
    named entities) and feeds tokenizer/phrase-vocabulary induction.

    Scale: the unigram and bigram count tables are Zipf-bounded aggregates
    of one pass over the tokens; the two scalar totals broadcast as 1-row
    frames; the PMI join keys on the (vocabulary-sized) unigram table
    twice — broadcast below the threshold, shuffle-on-key above, either
    way never corpus-sized. Scores round to 4 dp BEFORE the global top-k
    ranking with (w1, w2) tie-breaks — the engine-stable ordering
    contract; the rank window runs over floor-filtered pairs only."""
    tok = _staged(
        load_table(spark, sf_dir, "documents").select(
            F.expr(f"transform({_TOKS}, t -> lower(t))").alias("toks")
        )
    )
    # the two vocabulary-sized count tables are ALSO staged: uni feeds
    # three consumers (tot, ua, ub) and bg two (btot, the PMI join) —
    # unstaged, each consumer would re-run the corpus-sized explode+agg
    # over the cached token frame
    uni = _staged(
        tok.select(F.explode("toks").alias("w")).groupBy("w").agg(
            F.count(F.lit(1)).alias("c1")
        )
    )
    tot = uni.agg(F.sum("c1").alias("t_uni"))
    bg = _staged(
        tok.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) < 2 THEN array()"
                    " ELSE transform(sequence(1, size(toks) - 1),"
                    "   i -> struct(toks[i - 1] AS w1, toks[i] AS w2)) END"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    btot = bg.agg(F.sum("c2").alias("t_bg"))
    ua = uni.select(F.col("w").alias("w1"), F.col("c1").alias("c1a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1b"))
    pmi = (
        bg.filter(F.col("c2") >= _PMI_MIN_COUNT)
        .join(ua, "w1")
        .join(ub, "w2")
        .join(F.broadcast(tot))
        .join(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            "c2",
            F.round(
                F.log(
                    (F.col("c2") / F.col("t_bg"))
                    / ((F.col("c1a") / F.col("t_uni")) * (F.col("c1b") / F.col("t_uni")))
                ),
                4,
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.col("pmi").desc(), F.col("w1"), F.col("w2"))
    return pmi.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= _PMI_TOPN
    )


# --------------------------------------------------------------------------
# text_oov_rate — vocabulary coverage / out-of-vocabulary rate per source
# --------------------------------------------------------------------------

_OOV_VOCAB_SIZE = 1000


@register(
    "text_oov_rate",
    oracle=f"""
    WITH tok AS (
      SELECT source, lower(unnest({_TOKS_SQL})) AS token FROM documents
    ),
    freq AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    vocab AS (
      SELECT token FROM freq
      ORDER BY c DESC, token LIMIT {_OOV_VOCAB_SIZE}
    )
    SELECT tok.source,
           count(*) AS n_tokens,
           count(*) FILTER (WHERE v.token IS NULL) AS n_oov,
           CAST(count(*) FILTER (WHERE v.token IS NULL) * 1000000
                // count(*) AS BIGINT) AS oov_ppm
    FROM tok LEFT JOIN vocab v USING (token)
    GROUP BY tok.source
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage audit: the out-of-vocabulary token rate per
    source against the corpus's own top-{_OOV_VOCAB_SIZE} vocabulary — the
    number a tokenizer/embedding-table owner checks before fixing a vocab
    (a source with a high OOV rate will fragment into subwords or <unk>).
    Vocabulary membership ties break lexicographically at the frequency
    cutoff (ORDER BY c DESC, token — deterministic in both engines).

    Scale shape: one token scan feeds (a) the Zipf-bounded frequency
    aggregate, whose top-V is a TakeOrdered (per-partition heaps, no
    global sort), and (b) the per-source coverage aggregate, probing the
    broadcast V-row vocabulary — integer-ppm output, no float drift."""
    tok = _staged(
        load_table(spark, sf_dir, "documents").select(
            "source",
            F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias("token"),
        )
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("token"))
        .limit(_OOV_VOCAB_SIZE)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.expr("n_oov * 1000000 div n_tokens").alias("oov_ppm"),
        )
    )


# --------------------------------------------------------------------------
# text_readability — syllable-heuristic Flesch reading ease per source
# --------------------------------------------------------------------------

# syllables(word) ≈ vowel RUNS: collapse [aeiouy]+ to a marker, strip the
# rest, count markers. Nested regexp_replace + length exists identically in
# both engines (DuckDB needs the 'g' flag; Spark replaces all by default).
_SYL_SPARK = (
    "length(regexp_replace(regexp_replace(lower(token), '[aeiouy]+', 'V'),"
    " '[^V]', ''))"
)
_SYL_SQL = (
    "length(regexp_replace(regexp_replace(lower(token), '[aeiouy]+', 'V', 'g'),"
    " '[^V]', '', 'g'))"
)


@register(
    "text_readability",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, unnest({_TOKS_SQL}) AS token FROM documents
    ),
    per_doc AS (
      SELECT doc_id, source,
             count(*) AS n_words,
             sum({_SYL_SQL}) AS n_syll
      FROM tok GROUP BY doc_id, source
    ),
    sents AS (
      SELECT doc_id,
             greatest(1, length(regexp_replace(text, '[^.!?]', '', 'g')))
               AS n_sents
      FROM documents
    )
    SELECT p.source,
           count(*) AS n_docs,
           CAST(sum(p.n_words) AS BIGINT) AS sum_words,
           CAST(sum(s.n_sents) AS BIGINT) AS sum_sents,
           CAST(sum(p.n_syll) AS BIGINT) AS sum_syll,
           round(sum(p.n_words) * 1.0 / sum(s.n_sents), 4) AS words_per_sent,
           round(sum(p.n_syll) * 1.0 / sum(p.n_words), 4) AS syll_per_word,
           round(206.835 - 1.015 * (sum(p.n_words) * 1.0 / sum(s.n_sents))
                 - 84.6 * (sum(p.n_syll) * 1.0 / sum(p.n_words)), 2)
             AS flesch
    FROM per_doc p JOIN sents s USING (doc_id)
    GROUP BY p.source
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source, with a vowel-run syllable heuristic
    (the standard no-dictionary approximation): flesch = 206.835 −
    1.015·(words/sentence) − 84.6·(syllables/word). Readability is a core
    curation feature — the classifier-free proxy for "textbook-like" vs
    scraped-noise registers (e.g. phi-style data selection).

    Scale shape: everything row-local until two integer aggregates — the
    token explode feeds one (doc, source) rollup (syllable counting is a
    codegen'd regexp chain, no UDF), sentence counts are a projection on
    the documents scan, and the per-source rollup is group-key-bounded.
    All sums are exact integers; the three ratios are derived from those
    integers identically in both engines, rounded at emission."""
    doc = load_table(spark, sf_dir, "documents")
    tok = doc.select(
        "doc_id", "source", F.explode(F.expr(_TOKS)).alias("token")
    )
    per_doc = tok.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.expr(_SYL_SPARK)).alias("n_syll"),
    )
    sents = doc.select(
        "doc_id",
        F.greatest(
            F.lit(1), F.length(F.regexp_replace("text", "[^.!?]", ""))
        ).alias("n_sents"),
    )
    return (
        per_doc.join(sents, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("sum_words"),
            F.sum("n_sents").alias("sum_sents"),
            F.sum("n_syll").cast("long").alias("sum_syll"),
            F.round(
                F.sum("n_words") * 1.0 / F.sum("n_sents"), 4
            ).alias("words_per_sent"),
            F.round(
                F.sum("n_syll") * 1.0 / F.sum("n_words"), 4
            ).alias("syll_per_word"),
            F.round(
                206.835
                - 1.015 * (F.sum("n_words") * 1.0 / F.sum("n_sents"))
                - 84.6 * (F.sum("n_syll") * 1.0 / F.sum("n_words")),
                2,
            ).alias("flesch"),
        )
    )


# --------------------------------------------------------------------------
# text_zipf_slope — rank-frequency power-law fit over the top vocabulary
# --------------------------------------------------------------------------

_ZIPF_TOPN = 500


@register(
    "text_zipf_slope",
    oracle=f"""
    WITH tok AS (
      SELECT lower(unnest({_TOKS_SQL})) AS token FROM documents
    ),
    freq AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    top AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rnk
      FROM freq ORDER BY c DESC, token LIMIT {_ZIPF_TOPN}
    ),
    pts AS (
      SELECT CAST(round(ln(rnk) * 1000000) AS BIGINT) AS x6,
             CAST(round(ln(c) * 1000000) AS BIGINT) AS y6
      FROM top
    ),
    s AS (
      SELECT count(*) AS n,
             CAST(sum(x6) AS BIGINT) AS sx, CAST(sum(y6) AS BIGINT) AS sy,
             CAST(sum(x6 * y6) AS HUGEINT) AS sxy,
             CAST(sum(x6 * x6) AS HUGEINT) AS sxx
      FROM pts
    )
    SELECT n,
           round(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE), 4)
             AS zipf_slope,
           round((sy * 1.0 / n
                  - (CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                     / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                    * (sx * 1.0 / n)) / 1000000, 4) AS intercept_ln
    FROM s
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit: OLS slope of ln(frequency) vs ln(rank) over the
    top-{_ZIPF_TOPN} vocabulary — the companion diagnostic to Heaps-law
    ``text_vocab_growth`` (natural corpora fit slope ≈ −1; a corpus of
    templated/generated text flattens or cliffs, which is exactly what a
    contamination/synthetic-data review looks for). The (ln rank, ln freq)
    points are quantized to integer micro-units BEFORE the regression
    sums, so Σx, Σy, Σxy, Σx² are exact integers in both engines and the
    slope/intercept divisions see bit-identical operands (the PQ integer
    ADC argument applied to least squares).

    Scale: one token aggregate (Zipf-bounded), a TakeOrdered top-N, and a
    {_ZIPF_TOPN}-row regression — everything after the scan is
    vocabulary-sized. The rank window runs over the already-LIMITed frame."""
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias("token")
    )
    top = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("token"))
        .limit(_ZIPF_TOPN)
    )
    w = Window.orderBy(F.col("c").desc(), F.col("token"))
    pts = top.withColumn("rnk", F.row_number().over(w)).select(
        F.expr("cast(round(ln(rnk) * 1000000) as bigint)").alias("x6"),
        F.expr("cast(round(ln(c) * 1000000) as bigint)").alias("y6"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x6").alias("sx"),
        F.sum("y6").alias("sy"),
        # per-term products fit a long (~4e13) but their SUMS and the
        # n·Σxy − Σx·Σy cross terms cross 2^63 on real vocabularies —
        # accumulate in decimal(38,0), the Spark twin of the oracle's
        # HUGEINT casts (review finding, round 5)
        F.sum(F.expr("cast(x6 as decimal(38, 0)) * y6")).alias("sxy"),
        F.sum(F.expr("cast(x6 as decimal(38, 0)) * x6")).alias("sxx"),
    )
    dec = "decimal(38, 0)"
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy")
    ).cast("double") / (
        F.col("n") * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx")
    ).cast("double")
    return s.select(
        "n",
        F.round(slope, 4).alias("zipf_slope"),
        F.round(
            (F.col("sy") * 1.0 / F.col("n") - slope * (F.col("sx") * 1.0 / F.col("n")))
            / 1_000_000,
            4,
        ).alias("intercept_ln"),
    )


# --------------------------------------------------------------------------
# text_lang_confusion — language-ID evaluation against the labeled column
# --------------------------------------------------------------------------

from .registry import ORACLES as _TEXT_ORACLES  # noqa: E402  (lang_id above)


@register(
    "text_lang_confusion",
    oracle=f"""
    WITH pred AS ({_TEXT_ORACLES["text_lang_id"]}),
         tot AS (SELECT count(*) AS n_docs FROM pred)
    SELECT pred.lang AS true_lang, pred.pred_lang, count(*) AS n,
           CAST(count(*) FILTER (WHERE pred.lang = pred.pred_lang) * 1000000
                // count(*) AS BIGINT) AS diag_ppm,
           CAST(count(*) * 1000000 // tot.n_docs AS BIGINT) AS cell_ppm
    FROM pred CROSS JOIN tot
    GROUP BY pred.lang, pred.pred_lang, tot.n_docs
    """,
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: (true lang, predicted lang) cell
    counts evaluated against the corpus's labeled ``lang`` column — the
    quality report for ``text_lang_id`` before its predictions gate any
    filtering (a lang-id that mislabels 20% of 'de' as 'en' silently
    drops a language from the training mix). ``diag_ppm`` is 1e6 on
    diagonal cells and 0 off-diagonal (an exact indicator, not a rate);
    ``cell_ppm`` is the cell's share of the corpus. Composes the
    REGISTERED lang-id oracle verbatim — the ``sim_recall_report``
    pattern, so the evaluation can never drift from the operator it
    evaluates.

    Scale: the lang-id projection is row-local in the scan; the matrix is
    one map-side-combined aggregate over a langs²-bounded key space, plus
    the 1-row corpus total broadcast."""
    pred = text_lang_id(spark, sf_dir)
    tot = pred.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        pred.join(F.broadcast(tot))
        .groupBy(F.col("lang").alias("true_lang"), "pred_lang", "n_docs")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("lang") == F.col("pred_lang"), 1)).alias("n_diag"),
        )
        .select(
            "true_lang",
            "pred_lang",
            "n",
            F.expr("cast(n_diag * 1000000 div n as bigint)").alias("diag_ppm"),
            F.expr("cast(n * 1000000 div n_docs as bigint)").alias("cell_ppm"),
        )
    )


# --------------------------------------------------------------------------
# text_keyword_in_context — KWIC concordance for the fixed query terms
# --------------------------------------------------------------------------

_KWIC_TERMS = ("data", "model", "training")
_KWIC_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in _KWIC_TERMS) + ")"
_KWIC_WIN = 3  # context tokens each side
_KWIC_PER_TERM = 10


@register(
    "text_keyword_in_context",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, list_transform({_TOKS_SQL}, t -> lower(t)) AS toks
      FROM documents
    ),
    hits AS (
      SELECT doc_id, i AS pos, toks[i] AS term,
             coalesce(array_to_string(
               toks[greatest(1, i - {_KWIC_WIN}):i - 1], ' '), '')
               AS left_ctx,
             coalesce(array_to_string(
               toks[i + 1:least(len(toks), i + {_KWIC_WIN})], ' '), '')
               AS right_ctx
      FROM tok, unnest(generate_series(1, len(toks))) AS t(i)
      WHERE toks[i] IN {_KWIC_TERMS_SQL}
    )
    SELECT term, doc_id, CAST(pos AS BIGINT) AS pos, left_ctx, right_ctx
    FROM (
      SELECT *, row_number() OVER (PARTITION BY term ORDER BY doc_id, pos)
               AS rnk
      FROM hits
    ) WHERE rnk <= {_KWIC_PER_TERM}
    """,
)
def text_keyword_in_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KWIC concordance: the first {_KWIC_PER_TERM} occurrences of each
    fixed query term with ±{_KWIC_WIN} tokens of context — the corpus
    debugging primitive behind every "show me how this term is actually
    used" review (tokenizer audits, decontamination spot checks, quality
    rule tuning all start from a concordance). Occurrences order by
    (doc_id, position) — fully deterministic.

    Scale: the term filter runs in the scan pipeline on the exploded
    positions (map-side — only matching rows survive), context slicing is
    row-local array arithmetic, and the per-term window sees only the
    filtered hits, capped per term. Terms are a fixed bounded set, so the
    per-term rank state is bounded."""
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(f"transform({_TOKS}, t -> lower(t))").alias("toks")
    )
    hits = (
        tok.select(
            "doc_id",
            "toks",
            F.posexplode("toks").alias("i0", "term"),
        )
        .filter(F.col("term").isin(*_KWIC_TERMS))
        .select(
            "doc_id",
            (F.col("i0") + 1).alias("pos"),
            "term",
            # Spark slice(start, length), 1-based like DuckDB's array slice
            F.array_join(
                F.expr(
                    f"slice(toks, greatest(1, i0 + 1 - {_KWIC_WIN}),"
                    f" i0 + 1 - greatest(1, i0 + 1 - {_KWIC_WIN}))"
                ),
                " ",
            ).alias("left_ctx"),
            F.array_join(
                F.expr(
                    f"slice(toks, i0 + 2,"
                    f" least(size(toks), i0 + 1 + {_KWIC_WIN}) - (i0 + 1))"
                ),
                " ",
            ).alias("right_ctx"),
        )
    )
    w = Window.partitionBy("term").orderBy("doc_id", "pos")
    return (
        hits.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _KWIC_PER_TERM)
        .select("term", "doc_id", F.col("pos").cast("long").alias("pos"),
                "left_ctx", "right_ctx")
    )


# --------------------------------------------------------------------------
# text_hapax_ratio — vocabulary-richness profile per language (round 6)
# --------------------------------------------------------------------------


@register(
    "text_hapax_ratio",
    oracle=f"""
    WITH tok AS (
      SELECT lang, lower(unnest({_TOKS_SQL})) AS token FROM documents
    ),
    freq AS (
      SELECT lang, token, count(*) AS c FROM tok GROUP BY lang, token
    )
    SELECT lang,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS vocab_size,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS hapax_vocab_ppm
    FROM freq GROUP BY lang
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena profile per language: vocabulary size, the count of
    words that occur exactly once, and the hapax share of the vocabulary
    (exact ppm). Hapax rate is the classic vocabulary-richness /
    OCR-noise signal — a corpus slice whose hapax share spikes is full of
    typos, boilerplate IDs, or mis-identified language, and it calibrates
    the Zipf-slope and vocab-growth numbers this repo already certifies
    (``text_zipf_slope``, ``text_vocab_growth``).

    Scale: one token shuffle into the (lang, token) frequency aggregate
    (map-side combined, Zipf-bounded result), then a lang-cardinality
    rollup — document text never enters an Exchange."""
    tok = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias("token"),
    )
    freq = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    return freq.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
    ).select(
        "lang",
        "n_tokens",
        "vocab_size",
        "n_hapax",
        F.expr("cast(n_hapax * 1000000 div vocab_size as bigint)").alias(
            "hapax_vocab_ppm"
        ),
    )


# --------------------------------------------------------------------------
# text_boilerplate_spans — most-repeated verbatim spans report (round 6)
# --------------------------------------------------------------------------

_BP_W = 10  # the dedup_duplicate_passages window-width contract
_BP_TOPN = 10


@register(
    "text_boilerplate_spans",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, list_transform({_TOKS_SQL}, t -> lower(t)) AS toks
      FROM documents
    ),
    win AS (
      SELECT doc_id, array_to_string(toks[i:i + {_BP_W - 1}], ' ') AS gram
      FROM tok,
           unnest(generate_series(1, greatest(len(toks) - {_BP_W} + 1, 0)))
             AS t(i)
    ),
    dup AS (
      SELECT gram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
      FROM win GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2
    ),
    top AS (
      SELECT * FROM dup ORDER BY n_docs DESC, n_occ DESC, gram
      LIMIT {_BP_TOPN}
    )
    SELECT row_number() OVER (ORDER BY n_docs DESC, n_occ DESC, gram) AS rnk,
           n_docs, n_occ, gram
    FROM top
    """,
)
def text_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boilerplate REPORT: the top-{_BP_TOPN} verbatim {_BP_W}-token
    spans that recur across the most distinct documents, with doc and
    occurrence counts — license headers, cookie banners, templated
    intros, surfaced as readable text for a curation owner to review.
    Complements ``dedup_duplicate_passages`` (which finds and MERGES
    duplicated spans per document for removal, hashes only): this ranks
    the offending content corpus-wide. Overlapping windows of one long
    passage each count — span merging is the passages operator's job.

    Scale: one narrow (doc_id, gram) explode into a map-side-combined
    aggregate; only grams in >= 2 documents survive; the top-N is an
    ORDER BY + LIMIT (TakeOrderedAndProject — per-partition heaps, no
    single-partition sort of the duplicate list), ranked row-locally
    afterwards. At web scale the gram string would be xxhash64'd with a
    verbatim-text join-back for the final {_BP_TOPN} rows only."""
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(f"transform({_TOKS}, t -> lower(t))").alias("toks")
    )
    win = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) < {_BP_W} THEN array()"
                f" ELSE transform(sequence(1, size(toks) - {_BP_W} + 1),"
                f"   i -> array_join(slice(toks, i, {_BP_W}), ' ')) END"
            )
        ).alias("gram"),
    )
    dup = (
        win.groupBy("gram")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    top = dup.orderBy(
        F.col("n_docs").desc(), F.col("n_occ").desc(), F.col("gram")
    ).limit(_BP_TOPN)
    w = Window.orderBy(
        F.col("n_docs").desc(), F.col("n_occ").desc(), F.col("gram")
    )
    return top.select(
        F.row_number().over(w).alias("rnk"), "n_docs", "n_occ", "gram"
    )


# --------------------------------------------------------------------------
# text_vocab_overlap_langs — pairwise language vocabulary affinity (round 6)
# --------------------------------------------------------------------------

_VOCAB_TOP = 200


@register(
    "text_vocab_overlap_langs",
    oracle=f"""
    WITH tok AS (
      SELECT lang, lower(unnest({_TOKS_SQL})) AS token FROM documents
    ),
    freq AS (
      SELECT lang, token, count(*) AS c FROM tok GROUP BY lang, token
    ),
    topv AS (
      SELECT lang, token FROM (
        SELECT lang, token,
               row_number() OVER (PARTITION BY lang ORDER BY c DESC, token)
                 AS rnk
        FROM freq) WHERE rnk <= {_VOCAB_TOP}
    ),
    sizes AS (SELECT lang, count(*) AS sz FROM topv GROUP BY lang),
    inter AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS n_common
      FROM topv a JOIN topv b ON a.token = b.token AND a.lang < b.lang
      GROUP BY 1, 2
    )
    SELECT i.lang_a, i.lang_b, i.n_common,
           CAST(i.n_common * 1000000
                // (sa.sz + sb.sz - i.n_common) AS BIGINT) AS jaccard_ppm
    FROM inter i
    JOIN sizes sa ON sa.lang = i.lang_a
    JOIN sizes sb ON sb.lang = i.lang_b
    """,
)
def text_vocab_overlap_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise language affinity: Jaccard overlap (exact ppm) of each
    language pair's top-{_VOCAB_TOP} vocabularies — shared loanwords /
    code-switching / mislabeled-language mass. High en↔es overlap on a
    supposedly-separated corpus means the lang labels (or the lang-id
    model, cf. ``text_lang_confusion``) are leaking — the corpus-level
    companion to that per-document confusion matrix.

    Scale: the (lang, token) frequency aggregate is Zipf-bounded; the
    top-V per lang is a PARTITIONED rank window (plans partial+final
    WindowGroupLimit — per-partition heaps prune before the shuffle); the
    pair join runs over 5×{_VOCAB_TOP} rows."""
    tok = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias("token"),
    )
    freq = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("token"))
    topv = _staged(
        freq.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _VOCAB_TOP)
        .select("lang", "token")
    )
    sizes = topv.groupBy("lang").agg(F.count(F.lit(1)).alias("sz"))
    a = topv.select(F.col("lang").alias("lang_a"), "token")
    b = topv.select(F.col("lang").alias("lang_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("lang", "lang_a")
                        .withColumnRenamed("sz", "sa")),
            "lang_a",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("lang", "lang_b")
                        .withColumnRenamed("sz", "sb")),
            "lang_b",
        )
        .select(
            "lang_a",
            "lang_b",
            "n_common",
            F.expr(
                "cast(n_common * 1000000 div (sa + sb - n_common) as bigint)"
            ).alias("jaccard_ppm"),
        )
    )
