"""Text-analysis operators over the ``documents`` table (SURVEY §2.7).

Training-data-pipeline surface the reference lacks: token counting,
language-ID, quality scoring, fingerprinting, n-gram stats. All pure
JVM-side expressions (split/filter/aggregate lambdas) — no Python UDFs in
the hot path, so whole-stage codegen applies end-to-end and the same logic
is expressible in the DuckDB oracle.

Tokenization contract (shared by every query + oracle): collapse whitespace,
trim, split on single space. Scale note: each query is a scan → narrow
projection → (optional) single shuffle; at 100 TB they parallelize per
parquet row-group with no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

# one token-array expression, used verbatim in all queries
_TOKS = "split(regexp_replace(trim(text), '\\\\s+', ' '), ' ')"
_TOKS_SQL = "string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')"

# stopword list for quality/lang scoring (must stay in sync with oracles)
_STOP = "array('the', 'a', 'of', 'and')"
_STOP_SQL = "['the', 'a', 'of', 'and']"


@register(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS_SQL})                AS n_tokens,
           n_chars,
           length(text)                    AS n_chars_actual
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting — the basic budget/pricing primitive."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"size({_TOKS})").alias("n_tokens"),
        "n_chars",
        F.length("text").alias("n_chars_actual"),
    )


@register(
    "text_token_count_bpe",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens
    FROM documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: letter runs, digit runs, and single symbols —
    the regex pre-tokenization step every BPE tokenizer (GPT-2 style) applies
    before merges. A deterministic token-budget estimator."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            r"size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0))"
        ).alias("n_bpe_tokens"),
    )


@register(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_filter({_TOKS_SQL}, t -> t IN ('the', 'a', 'of', 'and', 'is')))  AS s_en,
             len(list_filter({_TOKS_SQL}, t -> t IN ('le', 'la', 'et', 'les', 'un')))  AS s_fr,
             len(list_filter({_TOKS_SQL}, t -> t IN ('el', 'los', 'y', 'que', 'una'))) AS s_es,
             len(list_filter({_TOKS_SQL}, t -> t IN ('der', 'die', 'und', 'das', 'ist'))) AS s_de,
             CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 1000 ELSE 0 END AS s_zh
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN s_zh >= greatest(s_en, s_fr, s_es, s_de) AND s_zh > 0 THEN 'zh'
                WHEN s_fr > greatest(s_en, s_es, s_de) THEN 'fr'
                WHEN s_es > greatest(s_en, s_de) THEN 'es'
                WHEN s_de > s_en THEN 'de'
                ELSE 'en' END AS pred_lang
    FROM scored
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: per-language stopword hit counts + CJK-codepoint
    check, argmax with a deterministic tie-break order (zh > fr > es > de > en).
    (The synthetic corpus shares one vocabulary, so 'en' dominates — the
    operator logic is what's under test, mirrored exactly in the oracle.)"""
    doc = load_table(spark, sf_dir, "documents")
    def hits(words: str) -> F.Column:
        return F.expr(f"size(filter({_TOKS}, t -> array_contains(array({words}), t)))")
    scored = doc.select(
        "doc_id",
        "lang",
        hits("'the', 'a', 'of', 'and', 'is'").alias("s_en"),
        hits("'le', 'la', 'et', 'les', 'un'").alias("s_fr"),
        hits("'el', 'los', 'y', 'que', 'una'").alias("s_es"),
        hits("'der', 'die', 'und', 'das', 'ist'").alias("s_de"),
        F.when(F.col("text").rlike("[\\u4e00-\\u9fff]"), 1000).otherwise(0).alias("s_zh"),
    )
    return scored.select(
        "doc_id",
        "lang",
        F.when(
            (F.col("s_zh") >= F.greatest("s_en", "s_fr", "s_es", "s_de")) & (F.col("s_zh") > 0),
            "zh",
        )
        .when(F.col("s_fr") > F.greatest("s_en", "s_es", "s_de"), "fr")
        .when(F.col("s_es") > F.greatest("s_en", "s_de"), "es")
        .when(F.col("s_de") > F.col("s_en"), "de")
        .otherwise("en")
        .alias("pred_lang"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             len({_TOKS_SQL}) AS n_tokens,
             len(list_filter({_TOKS_SQL}, t -> t IN ('the', 'a', 'of', 'and'))) AS n_stop,
             length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct,
             length(text) AS n_char
      FROM documents
    )
    SELECT doc_id, n_tokens,
           floor(n_stop * 10000.0 / n_tokens + 0.5) / 10000 AS stopword_ratio,
           floor(n_punct * 10000.0 / n_char + 0.5) / 10000  AS punct_ratio,
           floor((0.5 * least(n_tokens / 100.0, 1.0)
                + 0.3 * least(n_stop * 5.0 / n_tokens, 1.0)
                + 0.2 * (1.0 - least(n_punct * 10.0 / n_char, 1.0))) * 10000 + 0.5)
             / 10000 AS quality
    FROM feat
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length, stopword ratio, punctuation density
    folded into one bounded [0,1] score — the C4/Gopher-style filter stage.
    Integer-derived doubles, so rounding is engine-stable."""
    doc = load_table(spark, sf_dir, "documents")
    feat = doc.select(
        "doc_id",
        F.expr(f"size({_TOKS})").alias("n_tokens"),
        F.expr(f"size(filter({_TOKS}, t -> array_contains({_STOP}, t)))").alias("n_stop"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[!-/:-@\[-`{-~]", ""))
        ).alias("n_punct"),
        F.length("text").alias("n_char"),
    )
    # half-up rounding via floor(x*1e4 + 0.5) on the RAW double in both
    # engines — Spark's round() goes through a decimal string repr and can
    # disagree with DuckDB's at exact .xxxx5 boundaries.
    return feat.select(
        "doc_id",
        "n_tokens",
        (F.floor(F.col("n_stop") * 10000.0 / F.col("n_tokens") + 0.5) / 10000).alias(
            "stopword_ratio"
        ),
        (F.floor(F.col("n_punct") * 10000.0 / F.col("n_char") + 0.5) / 10000).alias(
            "punct_ratio"
        ),
        (
            F.floor(
                (
                    0.5 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
                    + 0.3 * F.least(F.col("n_stop") * 5.0 / F.col("n_tokens"), F.lit(1.0))
                    + 0.2
                    * (1.0 - F.least(F.col("n_punct") * 10.0 / F.col("n_char"), F.lit(1.0)))
                )
                * 10000
                + 0.5
            )
            / 10000
        ).alias("quality"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
           CAST(('0x' || substr(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 8)) AS BIGINT) % 1024 AS bucket
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the normalized text + a 1024-way
    shard bucket derived from the fingerprint — the partition key a 100 TB
    dedup pipeline shuffles on."""
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    fp = F.md5(norm)
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        fp.alias("fingerprint"),
        (F.conv(F.substring(fp, 1, 8), 16, 10).cast("long") % 1024).alias("bucket"),
    )


@register(
    "text_bigram_top",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    bg AS (
      SELECT toks[i] || ' ' || toks[i + 1] AS bigram
      FROM tok, unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS t(i)
    )
    SELECT bigram, count(*) AS n
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def text_bigram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 bigrams — n-gram statistics via explode + hash agg +
    TakeOrdered (no full sort). Deterministic tie-break on the bigram."""
    doc = load_table(spark, sf_dir, "documents").select(F.expr(_TOKS).alias("toks"))
    bg = doc.select(
        F.explode(
            F.expr(
                "CASE WHEN size(toks) < 2 THEN array()"
                " ELSE transform(sequence(1, size(toks) - 1),"
                "   i -> concat_ws(' ', toks[i - 1], toks[i])) END"
            )
        ).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


@register(
    "pipeline_corpus_curation",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, source, lang, text,
             len({_TOKS_SQL}) AS n_tokens,
             len(list_filter({_TOKS_SQL}, t -> list_contains({_STOP_SQL}, t))) AS n_stop,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dup_rnk
      FROM documents
    ),
    flagged AS (
      SELECT source, lang, n_tokens,
             (dup_rnk = 1 AND n_tokens BETWEEN 10 AND 5000
              AND 20 * n_stop >= n_tokens) AS kept
      FROM feat
    )
    SELECT source, lang,
           count(*)                                        AS n_docs,
           count(*) FILTER (WHERE kept)                    AS n_kept,
           CAST(coalesce(sum(n_tokens) FILTER (WHERE kept), 0) AS BIGINT) AS kept_tokens
    FROM flagged
    GROUP BY source, lang
    """,
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data curation funnel as ONE composed plan:
    exact dedup (first doc per content hash wins) → length gate (10..5000
    tokens) → stopword-ratio gate (>= 5%, computed as the integer comparison
    ``20·n_stop >= n_tokens`` so no float boundary can disagree between
    engines) → per-(source, lang) yield accounting.

    Composition is the point: dedup rank, gates, and rollup fuse into scan →
    window-on-hash → hash agg. At 100 TB the content-hash window is the only
    wide stage, and it shuffles (hash, doc_id) pairs, not documents."""
    doc = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    feat = doc.select(
        "source",
        "lang",
        F.expr(f"size({_TOKS})").alias("n_tokens"),
        F.expr(f"size(filter({_TOKS}, t -> array_contains({_STOP}, t)))").alias(
            "n_stop"
        ),
        F.row_number().over(w).alias("dup_rnk"),
    )
    flagged = feat.select(
        "source",
        "lang",
        "n_tokens",
        (
            (F.col("dup_rnk") == 1)
            & F.col("n_tokens").between(10, 5000)
            & (20 * F.col("n_stop") >= F.col("n_tokens"))
        ).alias("kept"),
    )
    kept_tokens = F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0))
    return flagged.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("kept"), 1)).alias("n_kept"),
        kept_tokens.alias("kept_tokens"),
    )
