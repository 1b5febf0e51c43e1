"""Corpus-quality operators: repetition filters and content scrubbing.

The Gopher/MassiveText-style quality gates (Rae et al. 2021, §A1.1) a
training-data pipeline runs before anything else: drop documents dominated
by repeated n-grams, and scrub sensitive spans (PII patterns, denylisted
terms) from what survives. The reference engine has no text surface at all
(SURVEY §2.6-2.7 — `TimeoutJoinTest.scala` processes opaque JSON strings);
these extend the `documents` table surface mandated by BASELINE.json.

Scale design: repetition stats build ONE exploded (doc, position) frame
carrying all three gram widths, stage it (`_staged` — the corpus is read
once), and fan three hash-aggregations out of it; each is a partial+final
codegen'd aggregate. Scrubbing is a pure per-row projection: a
regexp_replace chain that pipelines inside whole-stage codegen with zero
shuffles — at 100 TB it is scan-bound, the best case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from ..operators.staging import staged as _staged
from .registry import register

# tokenization contract — imported from text.py, the single source of truth
from .text import _TOKS, _TOKS_SQL  # noqa: E402


@register(
    "text_repetition_stats",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    grams AS (
      SELECT doc_id,
             toks[i] AS uni,
             CASE WHEN i + 1 <= len(toks)
                  THEN toks[i] || ' ' || toks[i + 1] END AS bi,
             CASE WHEN i + 4 <= len(toks)
                  THEN toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                       || ' ' || toks[i + 3] || ' ' || toks[i + 4] END AS five
      FROM tok, unnest(generate_series(1, len(toks))) AS t(i)
    ),
    uni_top AS (
      SELECT doc_id, max(c) AS top_uni, sum(c) AS n_uni FROM (
        SELECT doc_id, uni, count(*) AS c FROM grams GROUP BY doc_id, uni
      ) GROUP BY doc_id
    ),
    bi_top AS (
      SELECT doc_id, max(c) AS top_bi, sum(c) AS n_bi FROM (
        SELECT doc_id, bi, count(*) AS c FROM grams
        WHERE bi IS NOT NULL GROUP BY doc_id, bi
      ) GROUP BY doc_id
    ),
    five_stats AS (
      SELECT doc_id, count(DISTINCT five) AS d5, count(five) AS n5
      FROM grams WHERE five IS NOT NULL GROUP BY doc_id
    )
    SELECT u.doc_id,
           round(top_uni * 1.0 / n_uni, 4)                   AS top_unigram_frac,
           round(top_bi * 1.0 / n_bi, 4)                     AS top_bigram_frac,
           round(1.0 - d5 * 1.0 / n5, 4)                     AS dup_5gram_frac
    FROM uni_top u JOIN bi_top b USING (doc_id)
    JOIN five_stats f USING (doc_id)
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition fractions per document: share of tokens
    taken by the most frequent unigram / bigram, and the fraction of
    duplicated 5-grams (1 − distinct/total). Documents exceeding these
    thresholds (Gopher drops top-2-gram > 0.2, dup-5-gram > 0.15 etc.) are
    boilerplate/spam — the first gate of every corpus-curation funnel.

    One corpus scan: a single posexplode emits (uni, bi, five) per token
    position, the frame is staged, and three aggregations (each
    partial+final, codegen'd) fan out of it — no window functions, no
    per-doc sorts, no second scan."""
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TOKS).alias("toks")
    )
    grams = doc.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks)), i -> named_struct("
                " 'uni', toks[i - 1],"
                " 'bi', CASE WHEN i + 1 <= size(toks)"
                "   THEN concat_ws(' ', toks[i - 1], toks[i]) END,"
                " 'five', CASE WHEN i + 4 <= size(toks)"
                "   THEN concat_ws(' ', toks[i - 1], toks[i], toks[i + 1],"
                "        toks[i + 2], toks[i + 3]) END))"
            )
        ).alias("g"),
    ).select("doc_id", "g.uni", "g.bi", "g.five")
    grams = _staged(grams)
    uni = (
        grams.groupBy("doc_id", "uni")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_uni"), F.sum("c").alias("n_uni"))
    )
    bi = (
        grams.filter(F.col("bi").isNotNull())
        .groupBy("doc_id", "bi")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bi"), F.sum("c").alias("n_bi"))
    )
    five = (
        grams.filter(F.col("five").isNotNull())
        .groupBy("doc_id")
        .agg(
            F.countDistinct("five").alias("d5"),
            F.count("five").alias("n5"),
        )
    )
    return (
        uni.join(bi, "doc_id")
        .join(five, "doc_id")
        .select(
            "doc_id",
            F.round(F.col("top_uni") / F.col("n_uni"), 4).alias("top_unigram_frac"),
            F.round(F.col("top_bi") / F.col("n_bi"), 4).alias("top_bigram_frac"),
            F.round(1.0 - F.col("d5") / F.col("n5"), 4).alias("dup_5gram_frac"),
        )
    )


# Scrub patterns — Java regex and RE2 (DuckDB) agree on this subset:
# character classes, bounded repetition, \\b word boundaries, alternation.
_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
_PHONE = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"
# denylisted terms (stand-in for a contractual/sensitive-term list); word
# bounded so 'customer' does not hit 'customers'-like tokens partially
_DENY = r"\b(customer|supplier)\b"


def _esc(p: str) -> str:
    """Embed a regex in a Spark SQL string literal (backslashes double)."""
    return p.replace("\\", "\\\\").replace("'", "\\'")


def scrub_expressions(text_col: str) -> dict[str, str]:
    """The scrub op as named SQL expressions over ``text_col`` — shared by
    the batch query and the streaming composition (a stateless projection
    applies to a streaming frame unchanged; tests/test_streaming_quality.py
    certifies stream output == batch output row-for-row)."""
    clean = (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"{text_col}, '{_esc(_EMAIL)}', '<EMAIL>'),"
        f" '{_esc(_IPV4)}', '<IP>'),"
        f" '{_esc(_PHONE)}', '<PHONE>'),"
        f" '{_esc(_DENY)}', '<REDACTED>')"
    )
    return {
        "n_email": f"size(regexp_extract_all({text_col}, '{_esc(_EMAIL)}', 0))",
        "n_ip": f"size(regexp_extract_all({text_col}, '{_esc(_IPV4)}', 0))",
        "n_phone": f"size(regexp_extract_all({text_col}, '{_esc(_PHONE)}', 0))",
        "n_denied": f"size(regexp_extract_all({text_col}, '{_esc(_DENY)}', 0))",
        "clean": clean,
    }


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH scrubbed AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{_EMAIL}'))  AS n_email,
             len(regexp_extract_all(text, '{_IPV4}'))   AS n_ip,
             len(regexp_extract_all(text, '{_PHONE}'))  AS n_phone,
             len(regexp_extract_all(text, '{_DENY}'))   AS n_denied,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g'),
                   '{_IPV4}', '<IP>', 'g'),
                 '{_PHONE}', '<PHONE>', 'g'),
               '{_DENY}', '<REDACTED>', 'g') AS clean
      FROM documents
    )
    SELECT doc_id, n_email, n_ip, n_phone, n_denied, md5(clean) AS clean_hash
    FROM scrubbed
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / sensitive-term scrubbing: replace emails, IPv4s, phone
    numbers, and denylisted terms with typed placeholder tokens; report
    per-pattern hit counts and the hash of the scrubbed text (the hash
    keeps the driver-compared output narrow while still certifying every
    byte of the transformation).

    The synthetic corpus contains no PII (the regex counts certify that
    end-to-end — zero n_email/n_ip/n_phone rows are a *verified* result,
    not dead code), while the denylist does fire, proving the replacement
    path. Pure projection: the whole chain runs inside one codegen stage,
    no shuffle, scan-bound at any scale."""
    doc = load_table(spark, sf_dir, "documents")
    ex = scrub_expressions("text")
    return doc.select(
        "doc_id",
        F.expr(ex["n_email"]).alias("n_email"),
        F.expr(ex["n_ip"]).alias("n_ip"),
        F.expr(ex["n_phone"]).alias("n_phone"),
        F.expr(ex["n_denied"]).alias("n_denied"),
        F.md5(F.expr(ex["clean"])).alias("clean_hash"),
    )
