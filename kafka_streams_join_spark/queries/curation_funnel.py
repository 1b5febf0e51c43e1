"""The curation FUNNEL REPORT: every gate in the training-data pipeline
applied cumulatively, with per-stage survivor counts — the yield sheet a
data team reads before a training run ("we started with X docs / Y
tokens; exact dedup cost 3%, the repetition gate 9%, near-dup 2%,
decontamination 1%").

Seven stages, strictly cumulative (each applies to the previous stage's
survivors), every gate an exact integer comparison:

1. raw                 all documents
2. exact_dedup         first doc per content hash (md5 window)
3. length_gate         10 <= n_tokens <= 5000
4. stopword_gate       20·n_stop >= n_tokens          (ratio >= 5%)
5. repetition_gate     5·top_unigram <= n_tokens      (Gopher <= 0.2)
                       AND 20·(n5 − d5) <= 3·n5       (dup-5-gram <= 0.15)
6. neardup_gate        drop doc_b of any 3-gram-Jaccard >= 0.8 pair
                       AMONG STAGE-5 SURVIVORS (lowest id kept; pairwise
                       greedy, not transitive closure — the transitive
                       variant is dedup_cluster_canonical)
7. decontam_gate       drop the benchmark slice itself and any doc
                       sharing a verbatim 7-token shingle with it

Stage 6 is the only survivor-set-DEPENDENT gate (a dropped near-dup must
not suppress a survivor), so the pair join runs on the stage-5 frame,
via the lossless prefix filter (queries/dedup_prefix.py). Everything
else is row-local or a broadcast probe, so the funnel is: one corpus
scan → row-local flags → the bounded pair stage → one aggregate.

Output: (stage_ord, stage, n_docs, n_tokens) — 7 rows, all integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register
from .dedup import JACCARD_THRESHOLD
from .dedup_prefix import prefix_jaccard_pairs, shingle_docsets
from .pipeline import DECONTAM_N, _IS_BENCH, decontam_gram_rows
from .quality import _grams, _max_run
from .text import _STOP, _STOP_SQL, _TOKS, _TOKS_SQL

_STAGES = [
    "raw",
    "exact_dedup",
    "length_gate",
    "stopword_gate",
    "repetition_gate",
    "neardup_gate",
    "decontam_gate",
]


def _oracle_sql() -> str:
    # the dedup.py shingling contract, re-rooted on the stage-5 survivors
    shingles = f"""tok2 AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM s5_docs),
    sh AS (
      SELECT DISTINCT doc_id,
             toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS shingle
      FROM tok2, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS t(i)
    )"""
    return f"""
    WITH feat AS (
      SELECT doc_id, text, {_TOKS_SQL} AS toks,
             len({_TOKS_SQL}) AS n_toks,
             len(list_filter({_TOKS_SQL}, t -> list_contains({_STOP_SQL}, t)))
               AS n_stop,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rnk
      FROM documents
    ),
    uni_top AS (
      SELECT doc_id, max(c) AS top_uni FROM (
        SELECT doc_id, t.u, count(*) AS c
        FROM feat, unnest(toks) AS t(u) GROUP BY doc_id, t.u
      ) GROUP BY doc_id
    ),
    five AS (
      SELECT doc_id, count(DISTINCT g) AS d5, count(*) AS n5 FROM (
        SELECT doc_id,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                       || toks[i+3] || ' ' || toks[i+4] AS g
        FROM feat, unnest(generate_series(1, len(toks) - 4)) AS t(i)
        WHERE len(toks) >= 5
      ) GROUP BY doc_id
    ),
    flags0 AS (
      SELECT f.doc_id, f.n_toks,
             (f.rnk = 1)                                       AS s2,
             (f.rnk = 1 AND f.n_toks BETWEEN 10 AND 5000)      AS s3,
             (f.rnk = 1 AND f.n_toks BETWEEN 10 AND 5000
              AND 20 * f.n_stop >= f.n_toks)                   AS s4,
             (f.rnk = 1 AND f.n_toks BETWEEN 10 AND 5000
              AND 20 * f.n_stop >= f.n_toks
              AND 5 * u.top_uni <= f.n_toks
              AND coalesce(n5, 0) > 0
              AND 20 * (coalesce(n5, 0) - coalesce(d5, 0))
                  <= 3 * coalesce(n5, 0))                      AS s5
      FROM feat f
      JOIN uni_top u USING (doc_id)
      LEFT JOIN five USING (doc_id)
    ),
    s5_docs AS (
      SELECT d.doc_id, d.text FROM documents d
      JOIN flags0 fl ON fl.doc_id = d.doc_id AND fl.s5
    ),
    {shingles},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    dupb AS (
      SELECT DISTINCT doc_b AS doc_id FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE c * 1.0 / (sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
    ),
    lgrams AS (
      SELECT doc_id,
             array_to_string(ltoks[g.i : g.i + {DECONTAM_N} - 1], ' ') AS gram
      FROM (SELECT doc_id,
                   list_transform({_TOKS_SQL}, t -> lower(t)) AS ltoks
            FROM documents),
           LATERAL (SELECT unnest(generate_series(1, len(ltoks) - {DECONTAM_N} + 1)) AS i) g
    ),
    bench AS (SELECT DISTINCT gram FROM lgrams WHERE {_IS_BENCH}),
    contaminated AS (
      SELECT DISTINCT g.doc_id FROM lgrams g JOIN bench b USING (gram)
      WHERE NOT ({_IS_BENCH.replace("doc_id", "g.doc_id")})
    ),
    flags AS (
      SELECT fl.*,
             (fl.s5 AND dupb.doc_id IS NULL)                   AS s6,
             (fl.s5 AND dupb.doc_id IS NULL
              AND NOT ({_IS_BENCH.replace("doc_id", "fl.doc_id")})
              AND contaminated.doc_id IS NULL)                 AS s7
      FROM flags0 fl
      LEFT JOIN dupb ON dupb.doc_id = fl.doc_id
      LEFT JOIN contaminated ON contaminated.doc_id = fl.doc_id
    )
    SELECT stage_ord, stage,
           count(*) FILTER (WHERE ok)                          AS n_docs,
           CAST(coalesce(sum(n_toks) FILTER (WHERE ok), 0) AS BIGINT)
             AS n_tokens
    FROM flags, (VALUES (1, 'raw'), (2, 'exact_dedup'), (3, 'length_gate'),
                        (4, 'stopword_gate'), (5, 'repetition_gate'),
                        (6, 'neardup_gate'), (7, 'decontam_gate'))
         AS st(stage_ord, stage),
         LATERAL (SELECT CASE stage_ord WHEN 1 THEN TRUE WHEN 2 THEN s2
                         WHEN 3 THEN s3 WHEN 4 THEN s4 WHEN 5 THEN s5
                         WHEN 6 THEN s6 ELSE s7 END AS ok)
    GROUP BY stage_ord, stage
    ORDER BY stage_ord
    """


@register("pipeline_curation_funnel", oracle=_oracle_sql())
def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cumulative curation funnel (module docstring): one row per
    stage with surviving doc and token counts. Every gate is an exact
    integer comparison; the one survivor-set-dependent stage (near-dup)
    joins only the stage-5 survivor subset through the lossless prefix
    filter."""
    doc = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    # Round 15: ``base`` is consumed exactly once (by flags0), so staging
    # it only added a second corpus-sized cache materialization (toks + 5
    # feature columns) and a barrier before the ONE persist that pays for
    # itself (flags0, which fans out to the pair stage, the decontam
    # probe and the final aggregate).
    base = (
        doc.select(
            "doc_id",
            F.expr(_TOKS).alias("toks"),
            F.row_number().over(w).alias("rnk"),
        ).select(
            "doc_id",
            "toks",
            "rnk",
            F.expr("size(toks)").alias("n_toks"),
            F.expr(f"size(filter(toks, t -> array_contains({_STOP}, t)))").alias(
                "n_stop"
            ),
            F.expr(_max_run("toks")).alias("top_uni"),
            F.expr(f"size(array_distinct({_grams(5)}))").alias("d5"),
            F.expr(
                "CASE WHEN size(toks) >= 5 THEN size(toks) - 4 ELSE 0 END"
            ).alias("n5"),
        )
    )
    flags0 = base.select(
        "doc_id",
        "toks",
        "n_toks",
        (F.col("rnk") == 1).alias("s2"),
        ((F.col("rnk") == 1) & F.col("n_toks").between(10, 5000)).alias("s3"),
        (
            (F.col("rnk") == 1)
            & F.col("n_toks").between(10, 5000)
            & (20 * F.col("n_stop") >= F.col("n_toks"))
        ).alias("s4"),
        (
            (F.col("rnk") == 1)
            & F.col("n_toks").between(10, 5000)
            & (20 * F.col("n_stop") >= F.col("n_toks"))
            & (5 * F.col("top_uni") <= F.col("n_toks"))
            & (F.col("n5") > 0)
            & (20 * (F.col("n5") - F.col("d5")) <= 3 * F.col("n5"))
        ).alias("s5"),
    )
    flags0 = _staged(flags0)
    # stage 6: near-dup pairs among stage-5 survivors, prefix-filtered
    s5_docs = flags0.filter("s5").select("doc_id", "toks")
    pairs = prefix_jaccard_pairs(shingle_docsets(s5_docs))
    dupb = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    # stage 7: decontamination probe (bench shingle dict broadcasts).
    # Gram machinery is the SHARED pipeline.py contract (lowercase once
    # per doc, then shingle); the bench side must stay corpus-wide, but
    # the probe side only needs docs still alive after stage 6 — flags
    # on already-dropped docs would be ANDed away, so skipping their
    # gram explode is output-identical and saves corpus-proportional
    # map-side work.
    lowered = lambda df: df.select(  # noqa: E731
        "doc_id", F.expr("transform(toks, t -> lower(t))").alias("toks")
    )
    # The bench slice is corpus-wide (every doc_id % 10 = 7, gated or not),
    # so it does NOT need the staged flag frame: tokenize it straight off
    # a fresh pruned scan (doc_id + text only) instead of forcing the
    # broadcast build to wait on — and read back — the wide persisted
    # flags0 (round 15; the probe side, by contrast, is survivor-dependent
    # and correctly stays on flags0).
    bench_docs = doc.filter(F.expr(_IS_BENCH)).select(
        "doc_id", F.expr(_TOKS).alias("toks")
    )
    bench = (
        decontam_gram_rows(lowered(bench_docs))
        .select("gram")
        .distinct()
    )
    probe_side = flags0.filter("s5").filter(~F.expr(_IS_BENCH)).join(
        dupb, "doc_id", "left_anti"
    )
    contaminated = (
        decontam_gram_rows(lowered(probe_side))
        .join(F.broadcast(bench), "gram")
        .select("doc_id")
        .distinct()
    )
    flagged = (
        flags0.join(dupb.withColumn("is_dupb", F.lit(True)), "doc_id", "left")
        .join(
            contaminated.withColumn("is_cont", F.lit(True)), "doc_id", "left"
        )
        .select(
            "doc_id",
            "n_toks",
            "s2",
            "s3",
            "s4",
            "s5",
            (F.col("s5") & F.col("is_dupb").isNull()).alias("s6"),
            (
                F.col("s5")
                & F.col("is_dupb").isNull()
                & ~F.expr(_IS_BENCH)
                & F.col("is_cont").isNull()
            ).alias("s7"),
        )
    )
    stage_structs = ", ".join(
        f"named_struct('stage_ord', {i + 1}, 'stage', '{name}', 'ok',"
        + ("true" if i == 0 else f"s{i + 1}")
        + ")"
        for i, name in enumerate(_STAGES)
    )
    exploded = flagged.select(
        "n_toks", F.explode(F.expr(f"array({stage_structs})")).alias("st")
    ).select("n_toks", "st.stage_ord", "st.stage", "st.ok")
    return (
        exploded.groupBy("stage_ord", "stage")
        .agg(
            F.count(F.when(F.col("ok"), 1)).alias("n_docs"),
            F.coalesce(
                F.sum(F.when(F.col("ok"), F.col("n_toks"))), F.lit(0)
            ).alias("n_tokens"),
        )
        .orderBy("stage_ord")
    )
