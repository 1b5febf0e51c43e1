"""Corpus- and activity-level statistics: engagement ratios (DAU/WAU),
seasonality profiles, and Heaps-law vocabulary growth.

All three are aggregate-of-aggregate pipelines over narrow rows; the
time dimensions (days, hours) are bounded, so second-stage joins
broadcast. Ratios are exact integer ppm (the domain-mix contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register
from .text import _TOKS, _TOKS_SQL


@register(
    "events_dau_wau_stickiness",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM activity),
    dau AS (SELECT d, count(*) AS dau FROM activity GROUP BY d),
    wau AS (
      SELECT days.d, count(DISTINCT a.user_id) AS wau
      FROM days JOIN activity a
        ON a.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
      GROUP BY days.d
    )
    SELECT CAST(dau.d AS VARCHAR) AS day, dau.dau, wau.wau,
           dau.dau * 1000000 // wau.wau AS stickiness_ppm
    FROM dau JOIN wau ON wau.d = dau.d
    """,
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement ratio every product
    dashboard leads with. The WAU side is a bounded-band join: the day
    list (one row per active day — bounded) broadcasts against the
    distinct (user, day) activity frame, so no events-sized relation is
    ever on both sides of a join. Stickiness is exact integer ppm via
    floor division in BOTH engines (the cohort-retention contract)."""
    activity = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d"))
        .distinct()
    )
    days = activity.select("d").distinct()
    dau = activity.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    a = activity.select(F.col("user_id"), F.col("d").alias("ad"))
    wau = (
        F.broadcast(days)
        .join(
            a,
            (F.col("ad") >= F.date_sub(F.col("d"), 6)) & (F.col("ad") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    # emit the day as an ISO string: engine DATE types render differently
    # through the comparison harness (DATE vs midnight TIMESTAMP)
    return dau.join(wau, "d").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "dau",
        "wau",
        F.expr("dau * 1000000 div wau").alias("stickiness_ppm"),
    )


@register(
    "events_hourly_seasonality",
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour_of_day,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT event_type, sum(n) AS t FROM h GROUP BY event_type)
    SELECT h.event_type, h.hour_of_day, h.n,
           CAST(h.n * 1000000 // tot.t AS BIGINT) AS share_ppm
    FROM h JOIN tot USING (event_type)
    """,
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type: counts and the
    exact-ppm share of the type's total. One map-side-combined aggregate
    over (type, hour) — a 24×types-bounded result — and a broadcast join
    against the per-type totals; the session's UTC timezone is what makes
    hour() engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour_of_day")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = h.groupBy("event_type").agg(F.sum("n").alias("t"))
    return h.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hour_of_day",
        "n",
        F.expr("n * 1000000 div t").alias("share_ppm"),
    )


@register(
    "text_vocab_growth",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lower(unnest({_TOKS_SQL})) AS token FROM documents
    ),
    firsts AS (
      SELECT token, min(doc_id) AS first_doc FROM tok GROUP BY token
    ),
    new_terms AS (
      SELECT first_doc AS doc_id, count(*) AS n_new FROM firsts GROUP BY first_doc
    ),
    doclen AS (
      SELECT doc_id, count(*) AS n_toks FROM tok GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(sum(d.n_toks) OVER w AS BIGINT)                 AS cum_tokens,
           CAST(sum(coalesce(nt.n_new, 0)) OVER w AS BIGINT)    AS vocab_size
    FROM doclen d LEFT JOIN new_terms nt USING (doc_id)
    WINDOW w AS (ORDER BY d.doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: cumulative token count vs distinct
    vocabulary size as the corpus is consumed in doc_id order — the
    curve (V ≈ K·Nᵝ) that tells a tokenizer/dedup pipeline whether a
    corpus's vocabulary is saturating or still growing. The heavy lift
    is one token aggregate (first-occurrence doc per token, map-side
    combined); the cumulative sums over the DOCS-sized (doc_id, n_new,
    n_toks) frame then run as TWO-PHASE PREFIX SUMS, never a
    single-partition global sort: docs are bucketed into doc_id-range
    shards (shard = doc_id div width, width from the 1-row max-id
    aggregate — range sharding preserves global doc_id order across
    shards), each shard computes its running sums under a window
    PARTITIONED by shard, the per-shard totals (a shard-count-sized
    frame, bounded by the chosen shard count, not the corpus) get
    exclusive cumulative offsets, and the broadcast offsets are added
    back. Gated: no Exchange SinglePartition carries doc_id."""
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.expr(f"transform({_TOKS}, t -> lower(t))")).alias("token"),
    )
    firsts = tok.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    new_terms = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    doclen = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    per_doc = doclen.join(new_terms, "doc_id", "left").select(
        "doc_id",
        "n_toks",
        F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
    )
    # Phase 0: shard width from the 1-row bounds aggregate (broadcasts);
    # div is BIGINT floor division, so shard ranges partition the id space
    # in order: every doc in shard i precedes every doc in shard i+1.
    bounds = per_doc.agg(F.max("doc_id").alias("max_id"))
    sharded = per_doc.join(F.broadcast(bounds)).select(
        "doc_id",
        "n_toks",
        "n_new",
        F.expr("doc_id div (greatest(cast(1 as bigint), (max_id div 64) + 1))").alias(
            "shard"
        ),
    )
    # Phase 1: running sums within each shard (partitioned window — the
    # per-doc frame only crosses a hash exchange on shard).
    in_shard = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = sharded.select(
        "doc_id",
        "shard",
        F.sum("n_toks").over(in_shard).alias("loc_toks"),
        F.sum("n_new").over(in_shard).alias("loc_new"),
    )
    # Phase 2: exclusive cumulative offsets over the per-shard totals — a
    # shard-count-sized frame; its unpartitioned window is bounded by
    # construction, not by the corpus.
    off_w = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        sharded.groupBy("shard")
        .agg(F.sum("n_toks").alias("t_toks"), F.sum("n_new").alias("t_new"))
        .select(
            "shard",
            F.coalesce(F.sum("t_toks").over(off_w), F.lit(0)).alias("off_toks"),
            F.coalesce(F.sum("t_new").over(off_w), F.lit(0)).alias("off_new"),
        )
    )
    return local.join(F.broadcast(offsets), "shard").select(
        "doc_id",
        (F.col("loc_toks") + F.col("off_toks")).alias("cum_tokens"),
        (F.col("loc_new") + F.col("off_new")).alias("vocab_size"),
    )


@register(
    "events_daily_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT CAST(date_trunc('day', min(ts)) AS DATE) AS lo,
             CAST(date_trunc('day', max(ts)) AS DATE) AS hi
      FROM events
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(s.d AS VARCHAR) AS day, t.event_type,
           coalesce(a.n, 0) AS n,
           CASE WHEN a.n IS NULL THEN 1 ELSE 0 END AS gap_filled
    FROM spine s CROSS JOIN types t
    LEFT JOIN actual a ON a.d = s.d AND a.event_type = t.event_type
    """,
)
def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-spine gap filling: the complete (day × event_type) grid over
    the corpus's date range, with zero-filled counts and a gap flag —
    the resampling primitive every metrics pipeline needs before rates,
    moving averages, or anomaly windows make sense (a missing day must
    read as 0, not as absent). The spine is generated from the 1-row
    min/max bounds (sequence() — bounded, broadcasts), the type dim is
    bounded, and the actuals are one map-side-combined aggregate; the
    left join is spine-sized, not events-sized."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("lo"),
        F.date_trunc("day", F.max("ts")).cast("date").alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    types = ev.select("event_type").distinct()
    actual = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.crossJoin(types)
        .join(actual, ["d", "event_type"], "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.when(F.col("n").isNull(), F.lit(1)).otherwise(F.lit(0)).alias(
                "gap_filled"
            ),
        )
    )


@register(
    "corpus_length_histogram",
    oracle="""
    WITH b AS (
      SELECT source,
             CAST(floor(log2(n_chars + 1)) AS BIGINT) AS len_bucket,
             count(*) AS n
      FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS t FROM b GROUP BY source)
    SELECT b.source, b.len_bucket, b.n,
           CAST(b.n * 1000000 // tot.t AS BIGINT) AS share_ppm
    FROM b JOIN tot USING (source)
    """,
)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed document-length distribution per source — the shape
    check every ingestion pipeline runs before setting chunking/packing
    parameters (a source whose mass sits in bucket 4 needs concatenation;
    one with a heavy 16+ tail needs splitting). Buckets are
    floor(log2(n_chars+1)): integer-exact in both engines (powers of two
    are exactly representable, so the floor can't straddle an ulp).

    Scale: one map-side bucket projection on the pruned (source, n_chars)
    scan, one map-side-combined (source, bucket) aggregate — the result is
    sources × ~40 buckets — and a broadcast join of per-source totals;
    exact-ppm shares."""
    b = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.floor(F.log2(F.col("n_chars") + 1)).cast("long").alias("len_bucket"),
        )
        .groupBy("source", "len_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = b.groupBy("source").agg(F.sum("n").alias("t"))
    return b.join(F.broadcast(tot), "source").select(
        "source",
        "len_bucket",
        "n",
        F.expr("n * 1000000 div t").alias("share_ppm"),
    )
