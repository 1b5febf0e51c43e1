"""Count-Min point queries and equi-width histogram quantiles (round 14):
two mergeable-sketch rungs the sketch family still lacked. Both have
SIBLINGS in ``sketches.py`` and differ from them on exactly the axis the
rung exists for — stated here so the distinction is checkable, not implied:

- ``agg_count_min_sketch`` probes per-user event frequencies on a
  near-uniform key (a deterministic user subset, crossJoin of RAW events
  with the hash rows). ``sketch_countmin_point_error`` is the heavy-hitter
  form CM was designed for: a ZIPFIAN token stream, point queries on the
  top-k exact tokens, the overestimate normalized to exact-integer ppm of
  the stream beside the frozen ε = e/w analytic bound — and the cells are
  derived FROM the pre-aggregated token counts, so the raw stream is hashed
  once, not d times.
- ``agg_quantile_sketch_rollup`` scales its bins to the observed min/max,
  so merging two independently-built sketches requires agreeing on the
  range first (a pre-pass), and its estimates interpolate in IEEE double.
  ``sketch_histogram_quantiles`` freezes the domain a priori (clamped
  edges), which is what makes two histograms built on different machines
  mergeable by PURE cell-wise addition with no coordination — and its
  read-off is the integer lower-quantile rule, so no float leaves either
  engine.

``sketch_countmin_point_error`` — the Cormode–Muthukrishnan (2005) Count-Min
sketch over the document token stream: d = 4 hash rows × w = 512 buckets of
ADDITIVE counters (state = d·w longs regardless of corpus size; merge = cell-
wise sum, which is how 1000 executors each fold their partition and a tree
of sums produces the corpus sketch). Point query = min over rows of the
hashed cell — never an underestimate, and over-counts by at most ε·N with
probability 1 − e^(−d) per query, ε = e/w. The audit builds the sketch,
point-queries the top-20 exact-count tokens, and reports the overestimate
in exact-integer ppm of the token stream beside the frozen ε bound.

``sketch_histogram_quantiles`` — the equi-width histogram quantile sketch:
B = 256 fixed bins of width 512 whole dollars over the FROZEN value domain
[0, 131072) (clamped at the edges; frozen, not data-dependent, so two
histograms built on different machines merge by cell-wise addition — the
property t-digest/KLL trade accuracy for and the reason warehouses ship
fixed-bin histograms as table stats). Quantile read-off is the integer
lower-quantile rule: the first bin whose cumulative count reaches
ceil(q·n/100); the estimate (the bin's inclusive upper edge) can exceed the
exact lower-quantile by at most bin_width − 1 = 511, which the output
certifies per q ∈ {50, 90, 99}.

Exactness contract (both queries): the registered 60-bit md5 hash shape
(``sketches_ext``-style, salt ``cm{row}_``), truncating integer division
everywhere (Spark ``div`` ≡ DuckDB ``//`` on non-negatives), counts and ppm
in BIGINT/DECIMAL(38,0) — no float leaves either engine. The exact counts /
exact quantiles computed alongside exist only as the certification target;
production reads the sketch.

Scale: both sketches are built FROM pre-aggregated frames (token counts /
distinct clamped dollar values), i.e. one hash-aggregate shuffle whose
output is already the map-side-combined form; the sketch itself is a
constant-size frame (2048 / 256 rows) that is explicitly broadcast on every
read path. The only windows run over value-domain frames bounded by the
frozen domain (≤ 131072 rows at ANY corpus size), never over per-row ids —
the registry meta-gate's definition of not-data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.literals import values_frame
from ..operators.staging import staged as _staged
from ..operators.staging import staged_table
from ..sources.parquet import load_table
from .registry import register
from .text import _TOKS, _TOKS_SQL

# --- Count-Min parameters (frozen) ---------------------------------------
_CM_D = 4  # hash rows; per-query failure prob e^-4 ≈ 1.8%
_CM_W = 512  # buckets per row; eps = e/512
_CM_TOPK = 20
_CM_EPS_PPM = 5310  # ceil(e / 512 * 1e6) — frozen integer literal


def _cm_bucket_spark(j: int, col: str = "token") -> str:
    return (
        f"cast(conv(substring(md5(concat('cm{j}_', {col})), 1, 15), 16, 10)"
        f" as bigint) % {_CM_W}"
    )


def _cm_bucket_sql(j: int, col: str = "token") -> str:
    return (
        f"CAST(('0x' || substr(md5('cm{j}_' || {col}), 1, 15)) AS BIGINT)"
        f" % {_CM_W}"
    )


@register(
    "sketch_countmin_point_error",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOKS_SQL}) AS token FROM documents
    ),
    toks AS (SELECT token FROM tok WHERE token <> ''),
    exact AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
    tot AS (SELECT sum(cnt) AS n_total FROM exact),
    top AS (SELECT token, cnt FROM exact ORDER BY cnt DESC, token
            LIMIT {_CM_TOPK}),
    cells AS (
      {" UNION ALL ".join(
          f"SELECT {j} AS j, {_cm_bucket_sql(j)} AS bucket, cnt FROM exact"
          for j in range(_CM_D)
      )}
    ),
    sk AS (SELECT j, bucket, sum(cnt) AS c FROM cells GROUP BY j, bucket),
    tb AS (
      {" UNION ALL ".join(
          f"SELECT token, cnt, {j} AS j, {_cm_bucket_sql(j)} AS bucket"
          " FROM top"
          for j in range(_CM_D)
      )}
    ),
    est AS (
      SELECT tb.token, tb.cnt AS exact_cnt, min(sk.c) AS cm_est
      FROM tb JOIN sk ON sk.j = tb.j AND sk.bucket = tb.bucket
      GROUP BY tb.token, tb.cnt
    )
    SELECT token,
           CAST(exact_cnt AS BIGINT) AS exact_cnt,
           CAST(cm_est AS BIGINT) AS cm_est,
           CAST(cm_est - exact_cnt AS BIGINT) AS overest,
           CAST(CAST(cm_est - exact_cnt AS HUGEINT) * 1000000
                // greatest((SELECT n_total FROM tot), 1) AS BIGINT)
             AS err_ppm,
           CAST({_CM_EPS_PPM} AS BIGINT) AS eps_bound_ppm
    FROM est
    """,
)
def sketch_countmin_point_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch audit: build the d×w additive-counter sketch over
    the document token stream, point-query the top-20 exact tokens, and
    report estimate vs exact with the overestimate in exact-integer ppm of
    the stream beside the frozen ε = e/w bound (module docstring has the
    estimator, merge, and scale contracts).

    Plan shape: one token hash-aggregate (the staged exact frame — also
    the certification target), sketch cells derived FROM the aggregated
    counts (never a second pass over raw tokens), top-k via
    TakeOrderedAndProject, and the point-query join reads the ≤ d·w-row
    sketch as an explicit broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.expr(_TOKS)).alias("token")).filter(
        F.col("token") != ""
    )
    exact = _staged(
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = exact.agg(F.sum("cnt").alias("n_total"))
    top = exact.orderBy(F.col("cnt").desc(), "token").limit(_CM_TOPK)

    cells = exact.select(
        "cnt",
        F.expr(
            f"stack({_CM_D}, "
            + ", ".join(
                f"{j}, ({_cm_bucket_spark(j)})" for j in range(_CM_D)
            )
            + ") as (j, bucket)"
        ),
    ).select("j", "bucket", "cnt")
    sketch = cells.groupBy("j", "bucket").agg(F.sum("cnt").alias("c"))

    tb = top.select(
        "token",
        "cnt",
        F.expr(
            f"stack({_CM_D}, "
            + ", ".join(
                f"{j}, ({_cm_bucket_spark(j)})" for j in range(_CM_D)
            )
            + ") as (j, bucket)"
        ),
    ).select("token", "cnt", "j", "bucket")
    est = (
        tb.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("token", "cnt")
        .agg(F.min("c").alias("cm_est"))
    )
    return est.crossJoin(F.broadcast(tot)).select(
        "token",
        F.col("cnt").cast("bigint").alias("exact_cnt"),
        F.col("cm_est").cast("bigint").alias("cm_est"),
        (F.col("cm_est") - F.col("cnt")).cast("bigint").alias("overest"),
        F.expr(
            "cast(cast(cm_est - cnt as decimal(38,0)) * 1000000"
            " div greatest(n_total, 1) as bigint)"
        ).alias("err_ppm"),
        F.lit(_CM_EPS_PPM).cast("bigint").alias("eps_bound_ppm"),
    )


# --- histogram-quantile parameters (frozen) -------------------------------
_HQ_LO = 0
_HQ_HI = 131072  # 2^17 whole dollars; TPC-H extendedprice tops out ~104950
_HQ_B = 256
_HQ_W = (_HQ_HI - _HQ_LO) // _HQ_B  # 512 — frozen bin width
_HQ_QS = (50, 90, 99)

_HQ_V_SPARK = (
    f"least({_HQ_HI - 1}, greatest({_HQ_LO},"
    " cast(floor(l_extendedprice) as bigint)))"
)
_HQ_V_SQL = (
    f"least({_HQ_HI - 1}, greatest({_HQ_LO},"
    " CAST(floor(l_extendedprice) AS BIGINT)))"
)


def _hq_vals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v, cnt): distinct clamped whole-dollar values with counts — the
    frozen-domain value frame (≤ {_HQ_HI} rows at ANY corpus size) both
    histogram-sketch queries read off. Cross-query staged (round 14):
    the two registered consumers each re-ran the corpus scan + value
    aggregate; the staged table is domain-bounded, not corpus-sized."""
    return staged_table(
        load_table(spark, sf_dir, "lineitem")
        .select(F.expr(_HQ_V_SPARK).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt")),
        f"hq_vals::{sf_dir}",
        src_dir=sf_dir,
    )


@register(
    "sketch_histogram_quantiles",
    oracle=f"""
    WITH vals AS (
      SELECT {_HQ_V_SQL} AS v, count(*) AS cnt FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT sum(cnt) AS n_rows FROM vals),
    hist AS (
      SELECT v // {_HQ_W} AS bin, sum(cnt) AS c FROM vals GROUP BY 1
    ),
    cumh AS (
      SELECT bin, sum(c) OVER (ORDER BY bin) AS cum_c FROM hist
    ),
    cumv AS (
      SELECT v, sum(cnt) OVER (ORDER BY v) AS cum_n FROM vals
    ),
    qs(q) AS (VALUES {", ".join(f"({q})" for q in _HQ_QS)}),
    tgt AS (
      SELECT q, n_rows, (q * n_rows + 99) // 100 AS target_rank
      FROM qs CROSS JOIN tot
    ),
    est AS (
      SELECT t.q, min(h.bin) AS est_bin
      FROM tgt t JOIN cumh h ON h.cum_c >= t.target_rank
      GROUP BY t.q
    ),
    ex AS (
      SELECT t.q, min(c.v) AS exact_value
      FROM tgt t JOIN cumv c ON c.cum_n >= t.target_rank
      GROUP BY t.q
    )
    SELECT CAST(t.q AS BIGINT) AS q,
           CAST(t.n_rows AS BIGINT) AS n_rows,
           CAST(t.target_rank AS BIGINT) AS target_rank,
           CAST(e.est_bin AS BIGINT) AS est_bin,
           CAST((e.est_bin + 1) * {_HQ_W} - 1 AS BIGINT) AS est_value,
           CAST(x.exact_value AS BIGINT) AS exact_value,
           CAST((e.est_bin + 1) * {_HQ_W} - 1 - x.exact_value AS BIGINT)
             AS overest,
           CAST({_HQ_W} AS BIGINT) AS bin_width
    FROM tgt t JOIN est e ON e.q = t.q JOIN ex x ON x.q = t.q
    """,
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram quantile sketch over whole-dollar
    l_extendedprice: 256 frozen-domain bins, integer lower-quantile
    read-off at p50/p90/p99, certified against the exact lower-quantile
    with the ≤ bin_width − 1 overestimate bound visible per row (module
    docstring has the merge and bound contracts).

    Plan shape: one pruned 1-column scan → distinct clamped dollar values
    (hash-aggregate; ≤ 131072 rows at ANY corpus size — the frozen domain,
    not the corpus, bounds it); the histogram and both cumulative windows
    run over that bounded value frame; the 3-row quantile targets
    broadcast onto it."""
    vals = _staged(_hq_vals(spark, sf_dir))
    tot = vals.agg(F.sum("cnt").alias("n_rows"))
    hist = vals.groupBy(F.expr(f"v div {_HQ_W}").alias("bin")).agg(
        F.sum("cnt").alias("c")
    )
    from pyspark.sql.window import Window

    cumh = hist.withColumn(
        "cum_c", F.sum("c").over(Window.orderBy("bin"))
    )
    cumv = vals.withColumn(
        "cum_n", F.sum("cnt").over(Window.orderBy("v"))
    )
    qs = values_frame(spark, [(q,) for q in _HQ_QS], "q int")
    tgt = qs.crossJoin(F.broadcast(tot)).select(
        "q",
        "n_rows",
        F.expr("(q * n_rows + 99) div 100").alias("target_rank"),
    )
    est = (
        F.broadcast(tgt)
        .join(cumh, F.col("cum_c") >= F.col("target_rank"))
        .groupBy("q")
        .agg(F.min("bin").alias("est_bin"))
    )
    ex = (
        F.broadcast(tgt)
        .join(cumv, F.col("cum_n") >= F.col("target_rank"))
        .groupBy("q")
        .agg(F.min("v").alias("exact_value"))
    )
    return (
        tgt.join(F.broadcast(est), "q")
        .join(F.broadcast(ex), "q")
        .select(
            F.col("q").cast("bigint").alias("q"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("target_rank").cast("bigint").alias("target_rank"),
            F.col("est_bin").cast("bigint").alias("est_bin"),
            F.expr(f"cast((est_bin + 1) * {_HQ_W} - 1 as bigint)").alias(
                "est_value"
            ),
            F.col("exact_value").cast("bigint").alias("exact_value"),
            F.expr(
                f"cast((est_bin + 1) * {_HQ_W} - 1 - exact_value as bigint)"
            ).alias("overest"),
            F.lit(_HQ_W).cast("bigint").alias("bin_width"),
        )
    )


# --- histogram bins sweep (the family's memory/accuracy dial) -------------
_HQS_BS = (64, 256, 1024)  # bins: widths 2048 / 512 / 128 over the domain


@register(
    "sketch_histogram_bins_sweep",
    oracle=f"""
    WITH vals AS (
      SELECT {_HQ_V_SQL} AS v, count(*) AS cnt FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT sum(cnt) AS n_rows FROM vals),
    cumv AS (
      SELECT v, sum(cnt) OVER (ORDER BY v) AS cum_n FROM vals
    ),
    bs(n_bins) AS (VALUES {", ".join(f"({b})" for b in _HQS_BS)}),
    qs(q) AS (VALUES {", ".join(f"({q})" for q in _HQ_QS)}),
    tgt AS (
      SELECT b.n_bins, ({_HQ_HI} - {_HQ_LO}) // b.n_bins AS bin_width,
             qs.q, t.n_rows, (qs.q * t.n_rows + 99) // 100 AS target_rank
      FROM bs b CROSS JOIN qs CROSS JOIN tot t
    ),
    hist AS (
      SELECT b.n_bins, vals.v // (({_HQ_HI} - {_HQ_LO}) // b.n_bins) AS bin,
             sum(vals.cnt) AS c
      FROM bs b CROSS JOIN vals GROUP BY 1, 2
    ),
    cumh AS (
      SELECT n_bins, bin,
             sum(c) OVER (PARTITION BY n_bins ORDER BY bin) AS cum_c
      FROM hist
    ),
    est AS (
      SELECT t.n_bins, t.q, min(h.bin) AS est_bin
      FROM tgt t JOIN cumh h
        ON h.n_bins = t.n_bins AND h.cum_c >= t.target_rank
      GROUP BY t.n_bins, t.q
    ),
    ex AS (
      SELECT q, min(c.v) AS exact_value
      FROM (SELECT DISTINCT q, target_rank FROM tgt) t
      JOIN cumv c ON c.cum_n >= t.target_rank
      GROUP BY q
    )
    SELECT CAST(t.n_bins AS BIGINT) AS n_bins,
           CAST(t.bin_width AS BIGINT) AS bin_width,
           CAST(t.q AS BIGINT) AS q,
           CAST((e.est_bin + 1) * t.bin_width - 1 AS BIGINT) AS est_value,
           CAST(x.exact_value AS BIGINT) AS exact_value,
           CAST((e.est_bin + 1) * t.bin_width - 1 - x.exact_value AS BIGINT)
             AS overest
    FROM tgt t
    JOIN est e ON e.n_bins = t.n_bins AND e.q = t.q
    JOIN ex x ON x.q = t.q
    """,
)
def sketch_histogram_bins_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The histogram sketch's memory/accuracy dial, in the family's sweep
    idiom (``sketch_hll_precision_sweep`` / ``sketch_kmv_distinct_sweep``
    / ``sketch_bloom_size_sweep``): the same frozen-domain read-off at
    B ∈ {64, 256, 1024} bins (widths 2048/512/128), each row certifying
    0 ≤ overest < bin_width against the exact lower quantile — the
    halve-the-memory/halve-the-error tradeoff a deployment reads before
    sizing its stats tables.

    Scale: ONE corpus scan (the staged distinct-dollar frame shared with
    ``sketch_histogram_quantiles``); each B's histogram groups the
    ≤ 131072-row bounded value frame, never the corpus; windows run per
    (B, bin) over ≤ B rows; the 9-row target frame broadcasts."""
    vals = _staged(_hq_vals(spark, sf_dir))
    tot = vals.agg(F.sum("cnt").alias("n_rows"))
    from pyspark.sql.window import Window

    cumv = vals.withColumn("cum_n", F.sum("cnt").over(Window.orderBy("v")))
    # literal frames as VALUES LocalRelations (functions/literals.py):
    # single-partition by construction, so the 3x3 literal cross join
    # can't schedule the 32x32 near-empty task grid the earlier
    # coalesce(1) mitigation targeted — and unlike coalesce(1) (one task
    # serially computing 32 Python-backed parents, measured ~5 s per
    # action) they never touch a Python worker. The 9-row (B, q) grid
    # stays one literal frame, not a join.
    bs = values_frame(spark, [(b,) for b in _HQS_BS], "n_bins int")
    bq = values_frame(
        spark, [(b, q) for b in _HQS_BS for q in _HQ_QS], "n_bins int, q int"
    )
    tgt = (
        bq.crossJoin(F.broadcast(tot))
        .select(
            "n_bins",
            F.expr(f"({_HQ_HI} - {_HQ_LO}) div n_bins").alias("bin_width"),
            "q",
            "n_rows",
            F.expr("(q * n_rows + 99) div 100").alias("target_rank"),
        )
    )
    # vals keeps its partitioning: the 3-row bins frame is the broadcast
    # side (streamed BNLJ over both inputs' partition grids otherwise —
    # 32x32 = 1024 near-empty tasks, measured 35+ s of pure overhead)
    hist = (
        vals.crossJoin(F.broadcast(bs))
        .groupBy(
            "n_bins",
            F.expr(f"v div (({_HQ_HI} - {_HQ_LO}) div n_bins)").alias("bin"),
        )
        .agg(F.sum("cnt").alias("c"))
    )
    cumh = hist.withColumn(
        "cum_c",
        F.sum("c").over(Window.partitionBy("n_bins").orderBy("bin")),
    )
    est = (
        F.broadcast(tgt)
        .join(
            cumh,
            (F.col("cum_c") >= F.col("target_rank"))
            & (cumh["n_bins"] == tgt["n_bins"]),
        )
        .groupBy(tgt["n_bins"], "q")
        .agg(F.min("bin").alias("est_bin"))
    )
    ex = (
        F.broadcast(tgt.select("q", "target_rank").distinct())
        .join(cumv, F.col("cum_n") >= F.col("target_rank"))
        .groupBy("q")
        .agg(F.min("v").alias("exact_value"))
    )
    return (
        tgt.join(F.broadcast(est), ["n_bins", "q"])
        .join(F.broadcast(ex), "q")
        .select(
            F.col("n_bins").cast("bigint").alias("n_bins"),
            F.col("bin_width").cast("bigint").alias("bin_width"),
            F.col("q").cast("bigint").alias("q"),
            F.expr("cast((est_bin + 1) * bin_width - 1 as bigint)").alias(
                "est_value"
            ),
            F.col("exact_value").cast("bigint").alias("exact_value"),
            F.expr(
                "cast((est_bin + 1) * bin_width - 1 - exact_value as bigint)"
            ).alias("overest"),
        )
    )
