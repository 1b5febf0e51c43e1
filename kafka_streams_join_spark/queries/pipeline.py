"""Training-data pipeline operators over the documents corpus.

The reference stops at stream joins; a corpus pipeline at 100 TB also needs
deterministic splitting, stratified sampling, and chunking before anything
reaches a trainer. All three are pure built-in-function plans (no Python on
the data path) and — the part that actually matters operationally — fully
DETERMINISTIC: re-running the pipeline on the same corpus yields the same
split/sample/chunks on any cluster size, because the "randomness" is an
arithmetic hash of the stable doc_id, not rand() (which is per-task and
per-execution). That's also what makes them oracle-checkable.

The hash is a multiplicative LCG step ``(doc_id * 40503 + 17) mod m``:
identical integer semantics in Spark and DuckDB, and the multiplier is small
enough that ``doc_id * 40503`` stays far from int64 overflow for any realistic
id space (ids to ~2e14), so no engine-specific wraparound can diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from ..sources.parquet import load_table
from .registry import register

CHUNK = 256  # characters per chunk in pipeline_chunk_documents


def _bucket(id_col: str, mod: int) -> F.Column:
    return (F.col(id_col) * 40503 + 17) % mod


@register(
    "pipeline_train_test_split",
    oracle="""
    SELECT lang,
           CASE WHEN (doc_id * 40503 + 17) % 1000 < 900
                THEN 'train' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def pipeline_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/10 train/test split by hashed doc_id, summarized per language.

    Scale: the split column is a per-row projection (no shuffle, no state);
    the only Exchange is the final small rollup. Assigning by id-hash rather
    than rand() means train/test membership is stable across reruns,
    backfills, and partition layouts — the property audits actually need.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn(
            "split",
            F.when(_bucket("doc_id", 1000) < 900, F.lit("train")).otherwise(
                F.lit("test")
            ),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "pipeline_stratified_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY (doc_id * 40503 + 17) % 1000000 ASC, doc_id ASC
             ) AS rn
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars FROM ranked WHERE rn <= 50
    """,
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """50 documents per language, picked by deterministic hash order.

    The idiomatic scale plan for "n per stratum": one shuffle on the stratum
    key, a rank window, a rank filter — same shape as window_topk_per_group,
    with the hash as the (stable) random order. sampleBy() would be cheaper
    by a shuffle but gives only a fraction, not an exact per-stratum count,
    and is not deterministic across executions.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        _bucket("doc_id", 1_000_000).asc(), F.col("doc_id").asc()
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("doc_id", "lang", "source", "n_chars")
    )


@register(
    "pipeline_chunk_documents",
    oracle=f"""
    WITH e AS (
      SELECT doc_id, text,
             unnest(generate_series(
               0, CAST(floor((length(text) - 1) / {CHUNK}) AS BIGINT)
             )) AS chunk_id
      FROM documents
      WHERE length(text) > 0
    )
    SELECT doc_id, chunk_id,
           substr(text, CAST(chunk_id * {CHUNK} + 1 AS BIGINT), {CHUNK}) AS chunk,
           least({CHUNK}, length(text) - chunk_id * {CHUNK}) AS chunk_chars
    FROM e
    """,
)
def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size character chunking (the pre-tokenization step of every
    training pipeline), as a lateral explode of substring offsets.

    Scale: explode is a narrow transformation — chunking never shuffles, and
    output size is input size + one small int per chunk. The alternative
    (a Python UDF slicing strings) moves every byte through Arrow twice;
    sequence+explode+substring stays entirely in the JVM.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return (
        d.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.length("text") - 1) / CHUNK).cast("long"),
                )
            ).alias("chunk_id"),
            F.col("text"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.expr(f"substring(text, CAST(chunk_id * {CHUNK} + 1 AS INT), {CHUNK})").alias(
                "chunk"
            ),
            F.least(
                F.lit(CHUNK), F.length("text") - F.col("chunk_id") * CHUNK
            ).alias("chunk_chars"),
        )
    )


N_SHARDS = 32  # packing parallelism: sequences never cross a shard
SEQ_TOKENS = 2048  # target tokens per packed training sequence


@register(
    "pipeline_pack_sequences",
    oracle=f"""
    WITH e AS (
      SELECT doc_id, text,
             unnest(generate_series(
               0, CAST(floor((length(text) - 1) / {CHUNK}) AS BIGINT)
             )) AS chunk_id
      FROM documents
      WHERE length(text) > 0
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             CAST(ceil(least({CHUNK}, length(text) - chunk_id * {CHUNK}) / 4.0)
                  AS BIGINT) AS n_tokens,
             doc_id % {N_SHARDS} AS shard
      FROM e
    ),
    packed AS (
      SELECT shard, n_tokens,
             CAST((sum(n_tokens) OVER (
                PARTITION BY shard ORDER BY doc_id, chunk_id
                ROWS UNBOUNDED PRECEDING
              ) - n_tokens) // {SEQ_TOKENS} AS BIGINT) AS seq_id
      FROM chunks
    )
    SELECT shard, seq_id,
           count(*) AS n_chunks,
           CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
    FROM packed
    GROUP BY 1, 2
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack chunked documents into ~{SEQ_TOKENS}-token training sequences.

    The last pre-trainer step: chunks are laid end-to-end and cut every
    SEQ_TOKENS tokens (chunks may straddle a cut — exactly how causal-LM
    packing works). A single global running sum would serialize the corpus
    through one partition, so packing is sharded by doc_id hash: each shard
    packs independently (one shuffle, {N_SHARDS}-way parallel), sequences
    never cross shards, and the layout is reproducible because shard and
    order are functions of stable ids — not of partition layout. Output is
    the per-sequence manifest a loader would consume.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    chunks = d.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        F.explode(
            F.sequence(
                F.lit(0), F.floor((F.length("text") - 1) / CHUNK).cast("long")
            )
        ).alias("chunk_id"),
        F.length("text").alias("text_len"),
    ).select(
        "doc_id",
        "shard",
        "chunk_id",
        F.ceil(
            F.least(F.lit(CHUNK), F.col("text_len") - F.col("chunk_id") * CHUNK)
            / 4.0
        )
        .cast("long")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = chunks.withColumn(
        "seq_id",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / SEQ_TOKENS).cast("long"),
    )
    return packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("seq_tokens"),
    )


# --- benchmark decontamination -------------------------------------------

DECONTAM_N = 7  # tokens per shingle; real pipelines use 8-13ish on benchmarks

# Deterministic "benchmark" membership: every 10th-ish doc plays the held-out
# eval set. In production this is a real benchmark corpus (GSM8K, MMLU, ...),
# which is always tiny relative to the training corpus — that asymmetry is
# what the plan exploits.
_IS_BENCH = "doc_id % 10 = 7"


def decontam_gram_rows(df):
    """(doc_id, gram): exploded DECONTAM_N-token shingles from a
    (doc_id, toks) frame whose tokens are ALREADY lowercased — THE
    decontamination shingling contract, shared by pipeline_decontaminate
    and the curation funnel so the two cannot drift.

    Short docs (< N tokens) MUST hit the CASE arm: Spark's sequence(1, 0)
    counts DOWN to [1, 0] and slice(toks, 0, N) throws — the empty-array
    guard dedup.py uses for the same shingle pattern (DuckDB's
    generate_series(1, 0) is [] so the oracle needs no guard)."""
    return df.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) < {DECONTAM_N} THEN array()"
                f" ELSE transform(sequence(1, size(toks) - {DECONTAM_N} + 1),"
                f"   i -> array_join(slice(toks, i, {DECONTAM_N}), ' ')) END"
            )
        ).alias("gram"),
    )

from .text import _TOKS_SQL as _DOC_TOKS_SQL  # noqa: E402  (shared tokenizer)
from .text import _TOKS as _TOKS_PIPE  # noqa: E402


@register(
    "pipeline_decontaminate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_transform({_DOC_TOKS_SQL}, t -> lower(t)) AS toks
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             array_to_string(toks[g.i : g.i + {DECONTAM_N} - 1], ' ') AS gram
      FROM tok, LATERAL (
        SELECT unnest(generate_series(1, len(toks) - {DECONTAM_N} + 1)) AS i
      ) g
    ),
    bench AS (SELECT DISTINCT gram FROM grams WHERE {_IS_BENCH}),
    hits AS (
      SELECT g.doc_id, count(DISTINCT g.gram) AS n_hit_grams
      FROM grams g JOIN bench b USING (gram)
      WHERE NOT ({_IS_BENCH.replace('doc_id', 'g.doc_id')})
      GROUP BY g.doc_id
    )
    SELECT doc_id, n_hit_grams FROM hits
    """,
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — flag training documents sharing verbatim
    {N}-token shingles with the held-out benchmark set (here: a deterministic
    doc_id slice standing in for a real eval corpus). Output: every
    contaminated train doc with its count of distinct overlapping shingles;
    downstream either drops these docs or trims the overlapping spans.

    Scale shape (the reason this beats a doc×doc similarity join): benchmark
    corpora are tiny and fixed (MBs) while the training corpus is the 100 TB
    side, so the distinct benchmark-shingle set BROADCASTS and the train side
    needs ZERO shuffle for the probe — shingling is a narrow explode, the
    hash-join is map-side, and the only shuffle is the final per-doc count
    over the (rare) hits. An equi-join on the shingle string, never a
    similarity cross-join. Shingle strings could be xxhash64'd to 8 bytes to
    shrink the broadcast at no recall cost; kept verbatim here so the oracle
    is byte-identical."""
    from .text import _TOKS

    doc = load_table(spark, sf_dir, "documents")
    grams = decontam_gram_rows(
        doc.select("doc_id", F.expr(f"transform({_TOKS}, t -> lower(t))").alias("toks"))
    )
    bench = (
        grams.filter(F.expr(_IS_BENCH)).select("gram").distinct()
    )
    return (
        grams.filter(~F.expr(_IS_BENCH))
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_hit_grams"))
    )


# Domain-mixture targets: parts-per-million keep rates per source group. The
# "premium" sources keep everything; the long tail is downsampled 5× — the
# data-mixing step every multi-source training corpus runs (cf. the Pile /
# LLaMA mixture tables). Integer ppm so the keep decision is exact integer
# arithmetic in both engines.
_MIX_PREMIUM = ("src0", "src1", "src2", "src3", "src4")
_MIX_PREMIUM_PPM = 1_000_000
_MIX_TAIL_PPM = 200_000


@register(
    "pipeline_domain_mix",
    oracle=f"""
    SELECT source,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           count(*)                                              AS n_total,
           CAST(sum(CASE WHEN kept THEN doc_id END) AS BIGINT)   AS kept_id_sum
    FROM (
      SELECT source, doc_id,
             (doc_id * 40503 + 17) % 1000000 <
               CASE WHEN source IN {_MIX_PREMIUM}
                    THEN {_MIX_PREMIUM_PPM} ELSE {_MIX_TAIL_PPM} END AS kept
      FROM documents
    ) GROUP BY source
    """,
)
def pipeline_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture resampling: each source keeps a target
    fraction of its documents (premium sources 100%, tail sources 20%),
    selected by the same rerun-stable id-hash used by the split/sample ops
    (``(doc_id*40503+17) % 1e6 < rate_ppm`` — no rand(), so retried tasks
    and re-runs select identical rows). Emits the per-domain mixture audit:
    kept/total counts plus a checksum of the kept ids, certifying the exact
    selection, not just its size.

    Scale: one scan, the keep decision is a map-side integer expression,
    one partial+final aggregate on source — no shuffle of the kept rows
    themselves (a real pipeline writes them out partitioned by source;
    the audit here is the oracle-checkable contract)."""
    doc = load_table(spark, sf_dir, "documents")
    rate_ppm = F.when(
        F.col("source").isin(*_MIX_PREMIUM), F.lit(_MIX_PREMIUM_PPM)
    ).otherwise(F.lit(_MIX_TAIL_PPM))
    kept = ((F.col("doc_id") * 40503 + 17) % 1_000_000) < rate_ppm
    return (
        doc.select("source", "doc_id", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.sum(F.col("kept").cast("int")).alias("n_kept"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("kept"), F.col("doc_id"))).alias("kept_id_sum"),
        )
    )


# Global training-order shuffle: shard count scales with the writer fleet
# (64 here; a 100 TB run picks shards so each output file lands near the
# target file size). The ORDER key is a 60-bit md5 prefix of the id — the
# engine-identical string-hash contract the minhash/weighted-sample queries
# use — NOT another small-modulus LCG: a 1e6-range order key would collide
# ~16x per value in a 1.6e7-row shard, and the doc_id tie-break would then
# emit long ingestion-ordered runs inside the "shuffled" output. At 2^60
# values collisions are negligible at any corpus size; the shard hash
# (40503 LCG) and the md5 order key are trivially decorrelated.
_SHUF_SHARDS = 64
_SHUF_ORD_SQL = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
_SHUF_ORD_SPARK = "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"


@register(
    "pipeline_global_shuffle",
    oracle=f"""
    SELECT doc_id,
           CAST((doc_id * 40503 + 17) % {_SHUF_SHARDS} AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY (doc_id * 40503 + 17) % {_SHUF_SHARDS}
             ORDER BY {_SHUF_ORD_SQL} ASC, doc_id ASC
           ) AS INT) AS pos
    FROM documents
    """,
)
def pipeline_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training order: every document gets
    a (shard, pos) address — a uniform random permutation of the corpus,
    grouped into {_SHUF_SHARDS} shard files — without a global sort and
    without rand(). A trainer reads shards in any order and rows within a
    shard in pos order; re-running the job (or re-trying a task) yields the
    identical permutation, and a new epoch is a new salt on the order key.

    Scale: the shard assignment is a map-side projection, so the ONLY
    shuffle is the exchange on the shard key; within-shard rank is a
    per-shard local sort over corpus/{_SHUF_SHARDS} rows. A global
    ``ORDER BY hash`` would range-partition and totally sort the corpus;
    this plan never materializes a total order — exactly how shuffled
    training shards are written at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("shard").orderBy(
        F.expr(_SHUF_ORD_SPARK).asc(), F.col("doc_id").asc()
    )
    return (
        d.select("doc_id", _bucket("doc_id", _SHUF_SHARDS).alias("shard"))
        .withColumn("pos", F.row_number().over(w))
    )


@register(
    "pipeline_group_holdout_split",
    oracle="""
    SELECT source,
           CASE WHEN CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 10 < 8
                THEN 'train'
                WHEN CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 10 = 8
                THEN 'val' ELSE 'test' END AS fold,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def pipeline_group_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-holdout (leakage-safe) split: every SOURCE lands wholly in one
    fold (80/10/10 by an md5 hash of the source name), so near-duplicates
    and stylistic twins — which cluster within a source — can never straddle
    train and eval. The complement of ``pipeline_train_test_split``'s
    per-document split: that one maximizes balance, this one guarantees
    group isolation (the sklearn GroupShuffleSplit contract, distributed).
    The fold is a function of the group KEY alone, so membership is
    rerun-stable and new documents from a known source join its existing
    fold without reshuffling history.

    Scale: fold assignment is a map-side string-hash projection; the only
    Exchange is the (source, fold) rollup. The md5-prefix hash is the same
    engine-identical string-hash contract the weighted-sample and minhash
    queries use (Spark ``conv(substring(md5(x),1,8),16,10)`` = DuckDB
    ``('0x' || substr(md5(x),1,8))::BIGINT``)."""
    d = load_table(spark, sf_dir, "documents")
    h = F.expr("cast(conv(substring(md5(source), 1, 8), 16, 10) as bigint) % 10")
    return (
        d.withColumn(
            "fold",
            F.when(h < 8, F.lit("train")).when(h == 8, F.lit("val")).otherwise(
                F.lit("test")
            ),
        )
        .groupBy("source", "fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# Mixture planning under a token budget: the step BEFORE domain resampling.
# pipeline_domain_mix applies FIXED per-source keep rates; this computes
# them — given per-source weights and a total token budget, derive the
# integer-ppm rate each source needs so the kept corpus hits the budget in
# the target proportions. Premium sources weigh 3, the long tail 1; the
# budget is a quarter of the corpus. All arithmetic is BIGINT floor
# division (Spark `div` = DuckDB `//`), so the plan is bit-stable.
_PLAN_BUDGET_DEN = 4  # budget = corpus_tokens / 4
_PLAN_W_PREMIUM = 3
_PLAN_W_TAIL = 1


@register(
    "pipeline_token_budget_plan",
    oracle=f"""
    WITH per_src AS (
      SELECT source,
             CAST(sum((n_chars + 3) // 4) AS BIGINT) AS total_tokens,
             CAST(CASE WHEN source IN {_MIX_PREMIUM}
                  THEN {_PLAN_W_PREMIUM} ELSE {_PLAN_W_TAIL} END AS BIGINT) AS weight
      FROM documents GROUP BY source
    ),
    corpus AS (
      SELECT CAST(sum(total_tokens) // {_PLAN_BUDGET_DEN} AS BIGINT) AS budget,
             CAST(sum(weight) AS BIGINT) AS w_total
      FROM per_src
    )
    SELECT source, total_tokens, weight,
           CAST(budget * weight // w_total AS BIGINT) AS target_tokens,
           CAST(CASE WHEN total_tokens = 0 THEN 0
                ELSE least(1000000,
                     CAST(budget AS HUGEINT) * weight * 1000000
                     // (CAST(w_total AS HUGEINT) * total_tokens)) END
                AS BIGINT) AS rate_ppm,
           CAST(CASE WHEN total_tokens = 0 THEN 0
                ELSE CAST(total_tokens AS HUGEINT)
                * least(1000000,
                        CAST(budget AS HUGEINT) * weight * 1000000
                        // (CAST(w_total AS HUGEINT) * total_tokens))
                // 1000000 END AS BIGINT) AS planned_tokens
    FROM per_src, corpus
    """,
)
def pipeline_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture planning: given per-source mixture weights
    (premium {_PLAN_W_PREMIUM}:{_PLAN_W_TAIL} tail) and a corpus-wide token
    budget (1/{_PLAN_BUDGET_DEN} of total tokens, with tokens estimated as
    ceil(n_chars/4) — the pack_sequences contract), derive each source's
    integer-ppm sampling rate, capped at 100% (a source smaller than its
    target share simply keeps everything — the under-supplied-domain case
    every real mixture table has to handle). Emits the per-source plan:
    inventory, weight, target, rate, and the tokens the rate actually
    yields. ``pipeline_domain_mix`` is the downstream op that applies such
    rates row-wise.

    Scale: one map-side token estimate + one (source) rollup; the corpus
    totals are a 1-row broadcast joined back onto the per-source rows.
    Every step is BIGINT floor division (Spark ``div`` ≡ DuckDB ``//``),
    so both engines plan the identical integers — no float share ever
    exists. Headroom contract: ``budget * weight * 1e6`` stays inside
    int64 for corpora to ~1e12 tokens (≈4 TB of text per weight unit);
    beyond that, compute a per-mille rate first and scale by 1000 — the
    same two-step both engines would floor identically."""
    per_src = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.expr("(n_chars + 3) div 4")).alias("total_tokens"),
            F.max(
                F.when(
                    F.col("source").isin(*_MIX_PREMIUM), F.lit(_PLAN_W_PREMIUM)
                ).otherwise(F.lit(_PLAN_W_TAIL)).cast("bigint")
            ).alias("weight"),
        )
    )
    corpus = per_src.agg(
        F.expr(f"sum(total_tokens) div {_PLAN_BUDGET_DEN}").alias("budget"),
        F.sum("weight").alias("w_total"),
    )
    return per_src.join(F.broadcast(corpus)).select(
        "source",
        "total_tokens",
        "weight",
        F.expr("budget * weight div w_total").alias("target_tokens"),
        # total_tokens = 0 (a source of only empty docs) must plan rate 0,
        # not divide by zero: DuckDB errors on // 0 while Spark div yields
        # NULL — either way a parity split without the guard.
        # DECIMAL(38,0) numerators: budget·weight·1e6 exceeds BIGINT once
        # the corpus holds ~1e13 tokens (the 100-TB target) and ANSI
        # throws; the oracle widens to HUGEINT. All operands nonneg.
        F.expr(
            "CASE WHEN total_tokens = 0 THEN 0L"
            " ELSE cast(least(cast(1000000 as decimal(38,0)),"
            "   cast(budget as decimal(38,0)) * weight * 1000000"
            "   div (cast(w_total as decimal(38,0)) * total_tokens))"
            "   as bigint) END"
        ).alias("rate_ppm"),
        F.expr(
            "CASE WHEN total_tokens = 0 THEN 0L"
            " ELSE cast(cast(total_tokens as decimal(38,0))"
            "   * least(cast(1000000 as decimal(38,0)),"
            "   cast(budget as decimal(38,0)) * weight * 1000000"
            "   div (cast(w_total as decimal(38,0)) * total_tokens))"
            "   div 1000000 as bigint) END"
        ).alias("planned_tokens"),
    )


# --------------------------------------------------------------------------
# pipeline_curriculum_order — difficulty-ordered training schedule
# --------------------------------------------------------------------------


@register(
    "pipeline_curriculum_order",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             round(n_chars * 1.0 / greatest(1, len(string_split(
               regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '))), 4)
               AS difficulty
      FROM documents
    ),
    r AS (
      SELECT doc_id, difficulty,
             CAST(row_number() OVER (ORDER BY difficulty, doc_id) AS INT)
               AS curriculum_rank,
             (SELECT count(*) FROM d) AS n_docs
      FROM d
    )
    SELECT doc_id, difficulty, curriculum_rank,
           CAST((curriculum_rank - 1) * 10 // n_docs AS BIGINT) AS decile
    FROM r
    """,
)
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning schedule: every document globally ranked
    easy→hard by a difficulty proxy (mean word length in chars, rounded to
    4 dp — longer words ≈ rarer/more technical register), plus the decile
    each document lands in — the schedule a curriculum trainer feeds
    shards from (easy deciles in early epochs, full mixture later).

    Scale shape: difficulty is a row-local projection; the GLOBAL rank is
    the round-5 two-phase rank (``operators/ranking.py``) over the
    bounded 4-dp difficulty levels — the per-doc frame never crosses an
    Exchange SinglePartition (same gate as ``pipeline_importance_resample``,
    which shares the helper); the decile is exact integer arithmetic on
    that rank against the broadcast 1-row count."""
    from .text import _TOKS

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.round(
            F.col("n_chars") * 1.0 / F.greatest(F.lit(1), F.expr(f"size({_TOKS})")),
            4,
        ).alias("difficulty"),
    )
    from ..operators.ranking import two_phase_rank

    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        two_phase_rank(
            d, level_col="difficulty", id_col="doc_id",
            rank_col="curriculum_rank", ascending=True,
        )
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "difficulty",
            "curriculum_rank",
            F.expr("cast((curriculum_rank - 1) * 10 div n_docs as bigint)").alias(
                "decile"
            ),
        )
    )


# --------------------------------------------------------------------------
# pipeline_mixture_temperature — temperature-scaled source sampling weights
# --------------------------------------------------------------------------

_TEMP_ALPHA = 0.7  # the multilingual-sampling standard (mBERT/XLM-R lineage)


@register(
    "pipeline_mixture_temperature",
    oracle=f"""
    WITH s AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY source
    ),
    p AS (
      SELECT source, n_docs, n_chars,
             CAST(round(pow(n_chars, {_TEMP_ALPHA}) * 1000000) AS BIGINT)
               AS p6
      FROM s
    ),
    t AS (SELECT CAST(sum(p6) AS BIGINT) AS tp,
                 CAST(sum(n_chars) AS BIGINT) AS tc FROM p)
    SELECT p.source, p.n_docs, p.n_chars,
           CAST(p.p6 * 1000000 // t.tp AS BIGINT) AS sample_ppm,
           CAST(p.n_chars * 1000000 // t.tc AS BIGINT) AS natural_ppm,
           CAST(CASE WHEN p.n_chars * 1000000 // t.tc = 0 THEN 0
                     ELSE (p.p6 * 1000000 // t.tp) * 1000000
                          // (p.n_chars * 1000000 // t.tc) END AS BIGINT)
             AS boost_ppm
    FROM p CROSS JOIN t
    """,
)
def pipeline_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights: per-source sampling probability
    ∝ size^α with α={_TEMP_ALPHA} — the standard multilingual/multi-domain
    rebalancing (XLM-R's exponential smoothing) that up-samples small
    sources without letting the head dominate. Emits the temperature
    share, the natural (proportional) share, and the boost ratio each
    source gets — all exact integer ppm: size^α is quantized to integer
    micro-units BEFORE the normalizing sums (the zipf-fit contract), so
    both engines divide identical integers.

    Scale: one (source) rollup — map-side combined, source-vocabulary
    sized — and a 1-row total broadcast. Pure planning math; the
    downstream sampler is ``pipeline_domain_mix``'s ppm keep rule."""
    s = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
        .withColumn(
            "p6",
            F.expr(
                f"cast(round(pow(n_chars, {_TEMP_ALPHA}) * 1000000) as bigint)"
            ),
        )
    )
    t = s.agg(
        F.sum("p6").cast("long").alias("tp"),
        F.sum("n_chars").cast("long").alias("tc"),
    )
    return (
        s.join(F.broadcast(t))
        .select(
            "source",
            "n_docs",
            "n_chars",
            F.expr("cast(p6 * 1000000 div tp as bigint)").alias("sample_ppm"),
            F.expr("cast(n_chars * 1000000 div tc as bigint)").alias("natural_ppm"),
        )
        .withColumn(
            "boost_ppm",
            F.expr(
                "cast(CASE WHEN natural_ppm = 0 THEN 0"
                " ELSE sample_ppm * 1000000 div natural_ppm END as bigint)"
            ),
        )
    )


# --------------------------------------------------------------------------
# pipeline_dataset_card — the one-row dataset summary
# --------------------------------------------------------------------------


@register(
    "pipeline_dataset_card",
    oracle=f"""
    WITH base AS (
      SELECT count(*) AS n_docs,
             count(DISTINCT source) AS n_sources,
             count(DISTINCT lang) AS n_langs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(sum(len({_DOC_TOKS_SQL})) AS BIGINT) AS total_tokens,
             count(DISTINCT md5(text)) AS n_unique_texts
      FROM documents
    ),
    top_src AS (
      SELECT max(c) AS top_n FROM (
        SELECT count(*) AS c FROM documents GROUP BY source)
    )
    SELECT base.n_docs, base.n_sources, base.n_langs,
           base.total_chars, base.total_tokens,
           CAST(base.total_chars // base.n_docs AS BIGINT) AS mean_chars,
           CAST((base.n_docs - base.n_unique_texts) * 1000000 // base.n_docs
                AS BIGINT) AS exact_dup_ppm,
           CAST(top_src.top_n * 1000000 // base.n_docs AS BIGINT)
             AS top_source_ppm
    FROM base CROSS JOIN top_src
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row dataset card: corpus size (docs/chars/tokens),
    source/language diversity, the exact-duplicate rate, and head-source
    concentration — the numbers a dataset README leads with and a
    curation review asks for first. Every ratio is exact integer ppm or
    floor division; the duplicate rate reuses the md5-text identity
    ``dedup_exact`` certifies.

    Scale: one documents scan feeds a single multi-distinct aggregate
    (Spark plans the three DISTINCTs via one Expand — the
    ``dq_table_profile`` shape, not N union'd scans) plus a
    source-vocabulary rollup for the head share; both 1-row frames
    broadcast into the final projection."""
    from .text import _TOKS

    doc = load_table(spark, sf_dir, "documents")
    base = doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.expr(f"size({_TOKS})")).cast("long").alias("total_tokens"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
    )
    top_src = (
        doc.groupBy("source")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("top_n"))
    )
    return base.join(F.broadcast(top_src)).select(
        "n_docs",
        "n_sources",
        "n_langs",
        "total_chars",
        "total_tokens",
        F.expr("cast(total_chars div n_docs as bigint)").alias("mean_chars"),
        F.expr(
            "cast((n_docs - n_unique_texts) * 1000000 div n_docs as bigint)"
        ).alias("exact_dup_ppm"),
        F.expr("cast(top_n * 1000000 div n_docs as bigint)").alias(
            "top_source_ppm"
        ),
    )


# --------------------------------------------------------------------------
# pipeline_repeat_epochs — per-source repeat factors under a token budget
# --------------------------------------------------------------------------

_EPOCH_BUDGET_X = 3  # total training tokens = 3x the corpus (the repeat regime)
_EPOCH_CAP_MILLI = 8_000  # no source repeats more than 8 epochs


@register(
    "pipeline_repeat_epochs",
    oracle=f"""
    WITH s AS (
      SELECT source, CAST(sum(len({_DOC_TOKS_SQL})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    p AS (
      SELECT source, n_tokens,
             CAST(round(pow(n_tokens, {_TEMP_ALPHA}) * 1000000) AS BIGINT)
               AS p6
      FROM s
    ),
    t AS (SELECT CAST(sum(p6) AS BIGINT) AS tp,
                 CAST(sum(n_tokens) AS BIGINT) AS tc FROM p)
    SELECT p.source, p.n_tokens,
           CAST(p.p6 * 1000000 // t.tp AS BIGINT) AS share_ppm,
           CAST(t.tc * {_EPOCH_BUDGET_X} * (p.p6 * 1000000 // t.tp)
                // 1000000 AS BIGINT) AS target_tokens,
           CAST(least(
             t.tc * {_EPOCH_BUDGET_X} * (p.p6 * 1000000 // t.tp)
               // 1000000 * 1000 // p.n_tokens,
             {_EPOCH_CAP_MILLI}) AS BIGINT) AS epochs_milli,
           CASE WHEN t.tc * {_EPOCH_BUDGET_X} * (p.p6 * 1000000 // t.tp)
                     // 1000000 * 1000 // p.n_tokens > {_EPOCH_CAP_MILLI}
                THEN 1 ELSE 0 END AS capped
    FROM p CROSS JOIN t
    """,
)
def pipeline_repeat_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repeat-factor plan a pretraining mixture actually trains from:
    total budget = {_EPOCH_BUDGET_X}× the corpus's tokens, split across
    sources by the temperature share (α={_TEMP_ALPHA}, the
    ``pipeline_mixture_temperature`` rule applied to TOKEN counts), and
    expressed per source as milli-epochs (target ÷ source size), capped at
    {_EPOCH_CAP_MILLI} milli-epochs — the "how many times does each source
    repeat" table, with a flag on sources the cap truncated (tiny sources
    a temperature mixture would over-repeat past the data-reuse sweet
    spot). Every step is exact integer arithmetic on quantized
    temperature weights — two engines, one plan, no float drift.

    Scale: one token-count rollup per source (map-side combined; the token
    explode is the only corpus-sized work) and a 1-row broadcast total."""
    from .text import _TOKS

    s = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.expr(f"size({_TOKS})")).cast("long").alias("n_tokens"))
        .withColumn(
            "p6",
            F.expr(
                f"cast(round(pow(n_tokens, {_TEMP_ALPHA}) * 1000000) as bigint)"
            ),
        )
    )
    t = s.agg(
        F.sum("p6").cast("long").alias("tp"),
        F.sum("n_tokens").cast("long").alias("tc"),
    )
    joined = s.join(F.broadcast(t)).withColumn(
        "share_ppm", F.expr("cast(p6 * 1000000 div tp as bigint)")
    ).withColumn(
        "target_tokens",
        F.expr(
            f"cast(tc * {_EPOCH_BUDGET_X} * share_ppm div 1000000 as bigint)"
        ),
    ).withColumn(
        "raw_milli", F.expr("target_tokens * 1000 div n_tokens")
    )
    return joined.select(
        "source",
        "n_tokens",
        "share_ppm",
        "target_tokens",
        F.expr(
            f"cast(least(raw_milli, {_EPOCH_CAP_MILLI}) as bigint)"
        ).alias("epochs_milli"),
        F.when(F.col("raw_milli") > _EPOCH_CAP_MILLI, F.lit(1))
        .otherwise(F.lit(0))
        .alias("capped"),
    )


# --------------------------------------------------------------------------
# pipeline_split_leakage_audit — near-dup contamination across the split
# --------------------------------------------------------------------------

# dedup registers before pipeline in queries/__init__ import order
from .registry import ORACLES as _PIPE_ORACLES  # noqa: E402

_SPLIT_RULE_SQL = "CASE WHEN (doc_id * 40503 + 17) % 1000 < 900 THEN 'train' ELSE 'test' END"


@register(
    "pipeline_split_leakage_audit",
    oracle=f"""
    WITH pairs AS ({_PIPE_ORACLES["dedup_ngram_jaccard"]}),
    tagged AS (
      SELECT p.doc_a, p.doc_b,
             (SELECT {_SPLIT_RULE_SQL} FROM (SELECT p.doc_a AS doc_id)) AS sa,
             (SELECT {_SPLIT_RULE_SQL} FROM (SELECT p.doc_b AS doc_id)) AS sb
      FROM pairs p
    ),
    agg AS (
      SELECT count(*) AS n_pairs,
             count(*) FILTER (WHERE sa != sb) AS n_leaking
      FROM tagged
    ),
    t AS (
      SELECT count(*) FILTER (WHERE {_SPLIT_RULE_SQL} = 'test') AS n_test
      FROM documents
    ),
    leaked_test AS (
      SELECT count(DISTINCT d) AS n_test_docs_leaked FROM (
        SELECT doc_a AS d FROM tagged WHERE sa = 'test' AND sb = 'train'
        UNION
        SELECT doc_b AS d FROM tagged WHERE sb = 'test' AND sa = 'train'
      )
    )
    SELECT agg.n_pairs, agg.n_leaking, t.n_test,
           leaked_test.n_test_docs_leaked,
           CAST(leaked_test.n_test_docs_leaked * 1000000
                // greatest(1, t.n_test) AS BIGINT) AS test_leak_ppm
    FROM agg CROSS JOIN t CROSS JOIN leaked_test
    """,
)
def pipeline_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: near-duplicate pairs that STRADDLE the
    train/test boundary — the contamination an id-hash split cannot see
    (random/hashed splits put a page and its scraped near-copy on opposite
    sides, and the test metric silently becomes a memorization probe).
    Reports the straddling pair count and the fraction of TEST documents
    with a train-side near-dup (exact ppm) — the number that decides
    whether the split must be re-cut on dedup CLUSTERS (the
    ``pipeline_group_holdout_split`` rule) instead of raw ids. Both legs
    reuse registered contracts verbatim: the near-dup pair list
    (``dedup_ngram_jaccard``) and the literal split hash
    (``pipeline_train_test_split``).

    Scale: the pair list is the already-gated bounded-candidate pipeline;
    tagging is a row-local hash on the pair list; the rollups are 1-row."""

    def split_of(id_col: str) -> F.Column:
        # the literal pipeline_train_test_split rule, via the shared LCG
        return F.when(_bucket(id_col, 1000) < 900, F.lit("train")).otherwise(
            F.lit("test")
        )

    split_col = split_of("doc_id")
    # three consumers below (agg + two filtered legs of leaked) — the pair
    # list comes off the cross-query staged table, so each consumer is a
    # scan of the materialized frame plus this row-local projection.
    from .dedup import neardup_pairs

    pairs = neardup_pairs(spark, sf_dir).select(
        "doc_a",
        "doc_b",
        split_of("doc_a").alias("sa"),
        split_of("doc_b").alias("sb"),
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count(F.when(F.col("sa") != F.col("sb"), 1)).alias("n_leaking"),
    )
    t = (
        load_table(spark, sf_dir, "documents")
        .select(split_col.alias("split"))
        .agg(F.count(F.when(F.col("split") == "test", 1)).alias("n_test"))
    )
    leaked = (
        pairs.filter((F.col("sa") == "test") & (F.col("sb") == "train"))
        .select(F.col("doc_a").alias("d"))
        .unionByName(
            pairs.filter((F.col("sb") == "test") & (F.col("sa") == "train"))
            .select(F.col("doc_b").alias("d"))
        )
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_test_docs_leaked"))
    )
    return (
        agg.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(leaked))
        .select(
            "n_pairs",
            "n_leaking",
            "n_test",
            "n_test_docs_leaked",
            F.expr(
                "cast(n_test_docs_leaked * 1000000 div greatest(1, n_test)"
                " as bigint)"
            ).alias("test_leak_ppm"),
        )
    )


# --------------------------------------------------------------------------
# pipeline_length_bucket_batching — padding-waste planner (round 6)
# --------------------------------------------------------------------------


@register(
    "pipeline_length_bucket_batching",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, len({_DOC_TOKS_SQL}) AS n_tokens FROM documents
    ),
    b AS (
      SELECT doc_id, n_tokens,
             length(bin(greatest(1, n_tokens))) AS bucket
      FROM d
    ),
    per_bucket AS (
      SELECT bucket, count(*) AS n_docs,
             CAST(max(n_tokens) AS BIGINT) AS max_len,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      FROM b GROUP BY bucket
    ),
    global_row AS (
      -- derived from the bucket aggregates (sums/max distribute), so the
      -- corpus is scanned once, not twice
      SELECT -1 AS bucket, CAST(sum(n_docs) AS BIGINT) AS n_docs,
             CAST(max(max_len) AS BIGINT) AS max_len,
             CAST(sum(total_tokens) AS BIGINT) AS total_tokens
      FROM per_bucket
    ),
    rows_ AS (SELECT * FROM per_bucket UNION ALL SELECT * FROM global_row)
    SELECT bucket, n_docs, max_len, total_tokens,
           CAST(n_docs * max_len AS BIGINT) AS padded_tokens,
           CAST((n_docs * max_len - total_tokens) * 1000000
                // greatest(1, n_docs * max_len) AS BIGINT) AS waste_ppm
    FROM rows_
    """,
)
def pipeline_length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste planner for length-bucketed batching: assign every
    document to a power-of-two length bucket (bucket = bit-length of its
    token count — pure integer/string arithmetic, no float log2 whose
    exact-power values could round differently across engines), pad each
    bucket to its own longest member, and report the padded-token waste
    per bucket in exact ppm — next to the bucket = −1 row, which is the
    pad-everything-to-global-max baseline a naive batcher pays. The
    difference between that row's waste and the buckets' is the token
    bill length-bucketing saves at training time.

    Scale: one row-local projection (token count + bit-length bucket),
    one ~log(max_len)-group aggregate, map-side combined. Nothing else
    moves."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(f"size({_TOKS_PIPE})").alias("n_tokens")
    )
    b = d.select(
        "doc_id",
        "n_tokens",
        F.length(F.expr("bin(greatest(1, n_tokens))")).alias("bucket"),
    )
    per_bucket = _staged(
        b.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").cast("bigint").alias("max_len"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )
    # the global row re-aggregates the BUCKET frame (sums/max distribute),
    # so the corpus is scanned once, not twice
    global_row = per_bucket.agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.max("max_len").cast("bigint").alias("max_len"),
        F.sum("total_tokens").cast("bigint").alias("total_tokens"),
    ).select(F.lit(-1).alias("bucket"), "n_docs", "max_len", "total_tokens")
    rows_ = per_bucket.unionByName(global_row)
    return rows_.select(
        "bucket",
        "n_docs",
        "max_len",
        "total_tokens",
        (F.col("n_docs") * F.col("max_len")).cast("bigint").alias(
            "padded_tokens"
        ),
        F.expr(
            "cast((n_docs * max_len - total_tokens) * 1000000"
            " div greatest(1, n_docs * max_len) as bigint)"
        ).alias("waste_ppm"),
    )
