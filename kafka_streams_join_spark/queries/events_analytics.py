"""Event-sequence analytics over the ``events`` table: ordered funnels
and cohort retention — the two queries every product-analytics engine
(Amplitude/Mixpanel-class) is built around, expressed relationally.

Both are narrow-row pipelines: per-user timestamp aggregates and
user-keyed joins. At 100 TB the events table shuffles only as
(user_id, ts) pairs — never with the ``props`` payload column (pruned at
the scan, plan-gated) — and every aggregate is map-side combined.

Determinism: all sequencing compares microsecond timestamps (exact
integers in both engines); ratios are integer-ppm (the domain-mix
contract) so no float boundary exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_FUNNEL_WINDOW_H = 24


@register(
    "events_funnel_conversion",
    oracle=f"""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts
        AND e.ts <= v.v_ts + INTERVAL {_FUNNEL_WINDOW_H} HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        AND e.ts <= c.c_ts + INTERVAL {_FUNNEL_WINDOW_H} HOUR
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.v_ts, c.c_ts, p.p_ts,
           CASE WHEN p.p_ts IS NOT NULL THEN 3
                WHEN c.c_ts IS NOT NULL THEN 2
                ELSE 1 END AS stage
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (view → click → purchase), each step within
    {_FUNNEL_WINDOW_H} h of the previous: per user, the first view, the
    first click strictly after it, the first purchase strictly after
    that, and the funnel stage reached (1–3). The "first event after a
    per-user anchor" steps are anchor-join + min aggregates — each is one
    user_id-keyed equi-join and one map-side-combined aggregate of
    (user_id, ts) pairs, the shape that survives any event volume.

    Timestamp comparisons are microsecond-exact in both engines; the
    interval bound is closed on the right (<=), stated so the oracle and
    any reimplementation agree on boundary events."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("v_ts"))
            & (F.col("ts") <= F.col("v_ts") + F.expr(f"INTERVAL {_FUNNEL_WINDOW_H} HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("c_ts"))
            & (F.col("ts") <= F.col("c_ts") + F.expr(f"INTERVAL {_FUNNEL_WINDOW_H} HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "v_ts",
            "c_ts",
            "p_ts",
            F.when(F.col("p_ts").isNotNull(), F.lit(3))
            .when(F.col("c_ts").isNotNull(), F.lit(2))
            .otherwise(F.lit(1))
            .alias("stage"),
        )
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH signup AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    cohort_sizes AS (
      SELECT cohort_week, count(*) AS cohort_n FROM signup GROUP BY cohort_week
    ),
    activity AS (
      SELECT DISTINCT s.user_id, s.cohort_week,
             CAST(date_diff('day', CAST(s.cohort_week AS DATE),
                            CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT)
               AS week_offset
      FROM events e JOIN signup s ON s.user_id = e.user_id
      WHERE e.ts >= s.cohort_week
    )
    SELECT a.cohort_week, a.week_offset,
           count(*) AS n_active,
           count(*) * 1000000 // cs.cohort_n AS retention_ppm
    FROM activity a JOIN cohort_sizes cs ON cs.cohort_week = a.cohort_week
    GROUP BY a.cohort_week, a.week_offset, cs.cohort_n
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by the week of their first
    ``signup``, activity bucketed by week offset from the cohort week,
    retention as exact integer ppm of the cohort size (the domain-mix
    arithmetic — no float ratio anywhere). (cohort_week, week_offset,
    n_active, retention_ppm) rows.

    Shape: first-signup aggregate (one user_id shuffle), user-keyed
    activity join, distinct (user, cohort, offset), then the matrix
    aggregate — all narrow (id, week) rows; the cohort-size side of the
    final join is weeks-bounded and broadcasts."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    cohort_sizes = signup.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    activity = (
        ev.join(signup, "user_id")
        .filter(F.col("ts") >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(cohort_sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            # integer FLOOR division on both sides: a float divide + cast
            # truncates in Spark but rounds in DuckDB's BIGINT cast
            F.expr("n_active * 1000000 div cohort_n").alias("retention_ppm"),
        )
    )


@register(
    "events_scd2_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type AS state, ts, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, state, ts AS valid_from,
           lead(ts) OVER w2 AS valid_to,
           CASE WHEN lead(ts) OVER w2 IS NULL THEN 1 ELSE 0 END AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 history from a changelog: collapse
    consecutive same-state records per user (SCD2 emits only on CHANGE),
    then derive each state's validity interval [valid_from, valid_to) via
    lead(), with the open current row flagged. The temporal complement of
    ``latest_state_per_user`` (the SCD1 snapshot) — together they are the
    CDC → warehouse-dimension pair.

    Scale: one shuffle on user_id serves BOTH windows (the change filter
    and the lead interval run over the same partitioning, which Spark
    reuses — no second Exchange); all rows are narrow (user, type, ts).
    Ordering is (ts, event_id), the repo's unique-tie-break contract."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", F.col("event_type").alias("state"), "ts", "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.when(F.lead("ts").over(w2).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_current"),
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ),
    pairs AS (
      SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    totals AS (SELECT from_type, sum(n) AS n_from FROM pairs GROUP BY from_type)
    SELECT p.from_type, p.to_type, p.n,
           CAST(p.n * 1000000 // t.n_from AS BIGINT) AS prob_ppm
    FROM pairs p JOIN totals t USING (from_type)
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event sequences:
    P(next = B | current = A) over consecutive events per user (ordered by
    µs timestamp with event_id tie-breaks — the engine-stable sequencing
    contract), as exact integer ppm. The free-form complement of the FIXED
    view→click→purchase funnel: the funnel asks about one path, this
    measures every observed path — the input to next-event prediction,
    journey mining, and drift detection between product releases.

    Scale: one user_id shuffle feeds the lead() window over narrow
    (user_id, ts, event_id, event_type) rows (props pruned at the scan);
    the pair counts are an event-type-vocabulary-sized aggregate (K² rows
    for K types), the row-normalizing totals join is vocabulary-sized, and
    the ppm division is BIGINT floor division in both engines — no float
    probability exists."""
    from ..operators.staging import staged as _staged

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # staged: the K²-row pair-count frame feeds BOTH the normalizing
    # totals and the final join — without it the events scan + user_id
    # shuffle + window would execute twice (the single-shuffle contract
    # above would be false)
    pairs = _staged(
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr("n * 1000000 div n_from").alias("prob_ppm"),
    )


# --------------------------------------------------------------------------
# events_anomaly_zscore — per-type daily-count anomalies
# --------------------------------------------------------------------------


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, avg(n) AS mu, stddev_pop(n) AS sd
      FROM daily GROUP BY event_type
    )
    SELECT daily.event_type, CAST(daily.d AS VARCHAR) AS day, daily.n,
           round(CASE WHEN stats.sd = 0 THEN 0.0
                      ELSE (daily.n - stats.mu) / stats.sd END, 4) + 0.0
             AS zscore,
           CASE WHEN abs(CASE WHEN stats.sd = 0 THEN 0.0
                              ELSE (daily.n - stats.mu) / stats.sd END) >= 2
                THEN 1 ELSE 0 END AS is_anomaly
    FROM daily JOIN stats USING (event_type)
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: each (event type, day) count scored as a
    z-score against the type's own daily distribution, flagged at |z| ≥ 2
    — the alerting primitive behind every ingestion-volume monitor (a
    day where a type's volume triples or vanishes is a pipeline incident,
    not a data point). The zero-variance guard keeps constant-volume
    types at z = 0 instead of NULL/NaN; + 0.0 normalizes the −0.0 a
    just-below-mean day rounds to (the engines disagree on −0.0 hashing).

    Scale: one map-side-combined (type, day) aggregate — days × types
    bounded — then a broadcast join of the per-type stats; the events
    scan reads only (event_type, ts)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_pop("n").alias("sd")
    )
    z = F.when(F.col("sd") == 0, F.lit(0.0)).otherwise(
        (F.col("n") - F.col("mu")) / F.col("sd")
    )
    return daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n",
        (F.round(z, 4) + F.lit(0.0)).alias("zscore"),
        F.when(F.abs(z) >= 2, F.lit(1)).otherwise(F.lit(0)).alias("is_anomaly"),
    )


# --------------------------------------------------------------------------
# events_path_trigrams — top user-journey 3-step paths
# --------------------------------------------------------------------------

_PATH_TOPN = 20


@register(
    "events_path_trigrams",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type AS t1,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS n
      FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, n FROM paths ORDER BY n DESC, path LIMIT {_PATH_TOPN}
    """,
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_PATH_TOPN} user-journey trigrams: the most common 3-step
    event-type sequences across users, ordered per user by (ts, event_id)
    — the path-mining upgrade of ``events_markov_transitions`` (which
    sees only pairwise hops and cannot distinguish A→B→C from A→B→D).

    Scale: ONE window pass partitioned by user (two leads share the
    window's sort — Spark evaluates them in a single WindowExec), the
    path aggregate is vocabulary³-bounded, and the top-N is a
    TakeOrdered; props and value are pruned at the scan. The (ts,
    event_id) ordering is total, so lead() is deterministic in both
    engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .select(
            F.col("event_type").alias("t1"),
            F.lead("event_type", 1).over(w).alias("t2"),
            F.lead("event_type", 2).over(w).alias("t3"),
        )
    )
    return (
        seq.filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
        .select(F.concat_ws(">", "t1", "t2", "t3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path"))
        .limit(_PATH_TOPN)
    )


# --------------------------------------------------------------------------
# events_rfm_segments — recency/frequency/monetary quintile segmentation
# --------------------------------------------------------------------------


@register(
    "events_rfm_segments",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(date_diff('day', CAST(date_trunc('day', max(ts)) AS DATE),
                  (SELECT CAST(date_trunc('day', max(ts)) AS DATE) FROM events))
               AS BIGINT) AS recency_days,
             count(*) AS frequency,
             round(sum(value), 2) AS monetary
      FROM events GROUP BY user_id
    ),
    fences AS (
      SELECT round(quantile_cont(recency_days, 0.5), 4) AS r_med,
             round(quantile_cont(frequency, 0.5), 4) AS f_med,
             round(quantile_cont(monetary, 0.5), 4) AS m_med
      FROM u
    )
    SELECT u.user_id, u.recency_days, u.frequency, u.monetary,
           CASE WHEN u.recency_days <= fences.r_med THEN 1 ELSE 0 END AS r_hot,
           CASE WHEN u.frequency > fences.f_med THEN 1 ELSE 0 END AS f_hot,
           CASE WHEN u.monetary > fences.m_med THEN 1 ELSE 0 END AS m_hot,
           CASE WHEN u.recency_days <= fences.r_med THEN 'R' ELSE '-' END ||
           CASE WHEN u.frequency > fences.f_med THEN 'F' ELSE '-' END ||
           CASE WHEN u.monetary > fences.m_med THEN 'M' ELSE '-' END AS segment
    FROM u CROSS JOIN fences
    """,
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: each user's Recency (days since last event,
    against the corpus's last day), Frequency (event count) and Monetary
    (2-dp value sum), split hot/cold at the exact median of each metric —
    the 8-segment RFM cube every lifecycle-marketing and churn model
    starts from. Medians are exact interpolated percentiles rounded to
    4 dp before comparison; monetary sums round to 2 dp first, so the
    boundary tests are engine-stable.

    Scale: one (user) aggregate over a 3-column scan, a 1-row exact-median
    fence frame broadcast back (the BM25 stats pattern), and a row-local
    segment projection. No corpus-sized join anywhere."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    anchor = ev.agg(
        F.date_trunc("day", F.max("ts")).cast("date").alias("last_day")
    )
    u = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("day", F.max("ts")).cast("date").alias("u_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
        .join(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff(F.col("last_day"), F.col("u_last"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    fences = u.agg(
        F.round(F.expr("percentile(recency_days, 0.5)"), 4).alias("r_med"),
        F.round(F.expr("percentile(frequency, 0.5)"), 4).alias("f_med"),
        F.round(F.expr("percentile(monetary, 0.5)"), 4).alias("m_med"),
    )
    r_hot = F.when(F.col("recency_days") <= F.col("r_med"), 1).otherwise(0)
    f_hot = F.when(F.col("frequency") > F.col("f_med"), 1).otherwise(0)
    m_hot = F.when(F.col("monetary") > F.col("m_med"), 1).otherwise(0)
    return u.join(F.broadcast(fences)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        r_hot.alias("r_hot"),
        f_hot.alias("f_hot"),
        m_hot.alias("m_hot"),
        F.concat(
            F.when(r_hot == 1, F.lit("R")).otherwise(F.lit("-")),
            F.when(f_hot == 1, F.lit("F")).otherwise(F.lit("-")),
            F.when(m_hot == 1, F.lit("M")).otherwise(F.lit("-")),
        ).alias("segment"),
    )


# --------------------------------------------------------------------------
# events_power_user_share — Pareto concentration of activity
# --------------------------------------------------------------------------


@register(
    "events_power_user_share",
    oracle="""
    WITH u AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ),
    r AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, user_id) AS rnk,
             (SELECT count(*) FROM u) AS n_users,
             (SELECT CAST(sum(n) AS BIGINT) FROM u) AS total_events
      FROM u
    )
    SELECT max(n_users) AS n_users,
           max(total_events) AS total_events,
           CAST(sum(n) FILTER (WHERE rnk * 10 <= n_users) AS BIGINT)
             AS top_decile_events,
           CAST(sum(n) FILTER (WHERE rnk * 10 <= n_users) * 1000000
                // max(total_events) AS BIGINT) AS top_decile_share_ppm
    FROM r
    """,
)
def events_power_user_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: what share of all events do the top-decile
    most-active users produce (exact ppm)? The whale-dependence number
    behind load planning (hot keys!) and abuse review — an 80/20-shaped
    answer also predicts which user_ids will skew every groupBy in this
    corpus. Users are ranked by the round-5 two-phase rank over the
    bounded event-count levels — the per-user frame never crosses an
    Exchange SinglePartition.

    Scale: one user aggregate, the distributed rank, and a 1-row rollup."""
    from ..operators.ranking import two_phase_rank

    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").cast("long").alias("total_events"),
    )
    ranked = two_phase_rank(
        u, level_col="n", id_col="user_id", rank_col="rnk", ascending=False
    ).join(F.broadcast(stats))
    return ranked.agg(
        F.max("n_users").alias("n_users"),
        F.max("total_events").alias("total_events"),
        F.sum(F.when(F.col("rnk") * 10 <= F.col("n_users"), F.col("n")))
        .cast("long")
        .alias("top_decile_events"),
    ).select(
        "n_users",
        "total_events",
        "top_decile_events",
        F.expr(
            "cast(top_decile_events * 1000000 div total_events as bigint)"
        ).alias("top_decile_share_ppm"),
    )


# --------------------------------------------------------------------------
# events_daily_ewma — integer-exact exponential smoothing of daily volumes
# --------------------------------------------------------------------------


@register(
    "events_daily_ewma",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, d, n,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS rnk
      FROM daily
    ),
    ew AS (
      SELECT event_type, d, n, rnk, CAST(n AS BIGINT) AS ewma
      FROM ranked WHERE rnk = 1
      UNION ALL
      SELECT r.event_type, r.d, r.n, r.rnk,
             CAST((r.n + 3 * ew.ewma) // 4 AS BIGINT)
      FROM ranked r JOIN ew
        ON r.event_type = ew.event_type AND r.rnk = ew.rnk + 1
    )
    SELECT event_type, CAST(d AS VARCHAR) AS day, n, ewma,
           CAST(abs(n - ewma) * 1000000 // greatest(1, ewma) AS BIGINT)
             AS dev_ppm
    FROM ew
    """,
)
def events_daily_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily volumes per event
    type, with α = 1/4 in EXACT integer arithmetic: ewma_i =
    (n_i + 3·ewma_{i−1}) div 4, seeded with the first day — the trend
    smoother behind volume dashboards and drift alerts (``dev_ppm`` is the
    day's exact-ppm deviation from its own trend; the companion to
    ``events_anomaly_zscore``'s distribution test). A power-of-two α makes
    the recursion integer-exact, so both engines walk bit-identical
    states — a float EWMA would compound drift just like float PageRank.

    Scale shape: a recursion over an ordered sequence is inherently
    sequential PER KEY, so it runs as a row-local higher-order fold over
    each type's COLLECTED day array — bounded by the calendar window
    (days/type, ~10²–10³ at any horizon), never by event volume; the
    events-sized work is the one map-side-combined (type, day) aggregate
    feeding it. The oracle is the same recursion as a recursive CTE."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    folded = daily.groupBy("event_type").agg(
        F.expr(
            """
            aggregate(
              array_sort(collect_list(struct(d, n))),
              cast(array() as array<struct<d: date, n: bigint, ewma: bigint>>),
              (acc, x) -> acc || array(named_struct(
                'd', x.d, 'n', x.n,
                'ewma', CASE WHEN size(acc) = 0 THEN x.n
                             ELSE (x.n + 3 * element_at(acc, -1).ewma) div 4
                        END))
            )
            """
        ).alias("seq")
    )
    return folded.select(
        "event_type", F.explode("seq").alias("s")
    ).select(
        "event_type",
        F.date_format("s.d", "yyyy-MM-dd").alias("day"),
        F.col("s.n").alias("n"),
        F.col("s.ewma").alias("ewma"),
        F.expr(
            "cast(abs(s.n - s.ewma) * 1000000 div greatest(1, s.ewma) as bigint)"
        ).alias("dev_ppm"),
    )


# --------------------------------------------------------------------------
# events_interarrival_stats — per-type inter-event gap distribution
# --------------------------------------------------------------------------


@register(
    "events_interarrival_stats",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             CAST(date_diff('second',
                  lag(ts) OVER (PARTITION BY event_type, user_id ORDER BY ts, event_id),
                  ts) AS BIGINT) AS gap_s
      FROM events
    ),
    g AS (SELECT event_type, gap_s FROM seq WHERE gap_s IS NOT NULL)
    SELECT event_type,
           count(*) AS n_gaps,
           CAST(min(gap_s) AS BIGINT) AS min_gap_s,
           round(quantile_cont(gap_s, 0.5), 1) AS median_gap_s,
           round(quantile_cont(gap_s, 0.95), 1) AS p95_gap_s,
           CAST(max(gap_s) AS BIGINT) AS max_gap_s
    FROM g GROUP BY event_type
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap distribution per event type, within each user's
    own event sequence (lag over (type, user) ordered by (ts, event_id) —
    a total order, so the gaps are deterministic): min / exact median /
    exact p95 / max in seconds. The cadence profile that sizes session
    gaps, watermark delays, and timeout windows — this repo's own J3
    timeout and ``sessionize_events`` gap constants are exactly what this
    operator measures from data.

    Scale: one window pass PARTITIONED by (type, user) — key-bounded, no
    global sort — then a per-type exact-percentile aggregate over the
    narrow gap column; the scan reads 4 columns."""
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    gaps = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id", "ts", "event_id")
        .select(
            "event_type",
            (
                F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
            ).alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_s").alias("min_gap_s"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 1).alias("median_gap_s"),
        F.round(F.expr("percentile(gap_s, 0.95)"), 1).alias("p95_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


# --------------------------------------------------------------------------
# events_audience_overlap — Jaccard overlap of event-type audiences
# --------------------------------------------------------------------------


@register(
    "events_audience_overlap",
    oracle="""
    WITH a AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (SELECT event_type, count(*) AS n FROM a GROUP BY event_type),
    inter AS (
      SELECT x.event_type AS type_a, y.event_type AS type_b,
             count(*) AS n_both
      FROM a x JOIN a y
        ON x.user_id = y.user_id AND x.event_type < y.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, i.n_both,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(i.n_both * 1000000 // (sa.n + sb.n - i.n_both) AS BIGINT)
             AS jaccard_ppm
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    """,
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: exact-ppm Jaccard of the user
    sets of every type pair — the cross-feature co-usage matrix behind
    "users who search also purchase" product questions, and the same
    set-similarity contract the dedup family uses, applied to behavioral
    sets. The pair stage self-joins the distinct (type, user) frame ON
    user_id, so the pair space is Σ(types-per-user choose 2) — bounded by
    the type vocabulary per user, never users².

    Scale: one distinct pass, a user-keyed self-join with per-user bounded
    fan-out, a types²-bounded aggregate, and broadcast size lookups."""
    a = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    sizes = a.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    x, y = a.alias("x"), a.alias("y")
    inter = (
        x.join(
            y,
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr(
                "cast(n_both * 1000000 div (n_a + n_b - n_both) as bigint)"
            ).alias("jaccard_ppm"),
        )
    )


# --------------------------------------------------------------------------
# events_attribution_last_touch — conversion attribution (round 6)
# --------------------------------------------------------------------------

_ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback, microseconds

# the sortable touch encoding: zero-padded epoch-micros | event_id | type —
# lexicographic max on the string IS (ts, event_id) max, and the winning
# type rides along (struct-max is not portable to a DuckDB window, strings
# are). Fixed widths make parsing a substr, not a regex.
_TOUCH_ENC_SPARK = (
    "concat(lpad(cast(unix_micros(ts) as string), 19, '0'), '|',"
    " lpad(cast(event_id as string), 10, '0'), '|', event_type)"
)
_TOUCH_ENC_SQL = (
    "lpad(CAST(epoch_us(ts) AS VARCHAR), 19, '0') || '|' ||"
    " lpad(CAST(event_id AS VARCHAR), 10, '0') || '|' || event_type"
)


@register(
    "events_attribution_last_touch",
    oracle=f"""
    WITH cand AS (
      SELECT event_type, ts, event_id,
             max(CASE WHEN event_type IN ('view', 'click')
                      THEN {_TOUCH_ENC_SQL} END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS touch
      FROM events
    ),
    conv AS (
      SELECT CASE
               WHEN touch IS NULL THEN 'direct'
               WHEN epoch_us(ts) - CAST(substr(touch, 1, 19) AS BIGINT)
                    > {_ATTR_WINDOW_US} THEN 'direct'
               ELSE substr(touch, 32)
             END AS attributed_type
      FROM cand WHERE event_type = 'purchase'
    ),
    n AS (SELECT count(*) AS n_conv FROM conv)
    SELECT attributed_type, count(*) AS n_conversions,
           CAST(count(*) * 1000000 // n.n_conv AS BIGINT) AS share_ppm
    FROM conv CROSS JOIN n
    GROUP BY attributed_type, n.n_conv
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: every purchase is credited to
    the most recent preceding view/click by the same user within a 7-day
    lookback ('direct' if none) — the marketing-analytics join every
    event warehouse runs nightly, here as ONE pass: a per-user running
    max over a sortable string encoding of (ts, event_id, type) carries
    the winning touch to each purchase row, so no purchases×touches
    self-join ever forms.

    Scale: one user_id shuffle feeds the running-max window over narrow
    encoded rows; the lookback check is row-local integer arithmetic on
    the decoded epoch; the rollup is touch-type-cardinality sized."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = ev.select(
        "event_type",
        "ts",
        F.max(
            F.when(
                F.col("event_type").isin("view", "click"),
                F.expr(_TOUCH_ENC_SPARK),
            )
        )
        .over(w)
        .alias("touch"),
    )
    conv = cand.filter(F.col("event_type") == "purchase").select(
        F.when(F.col("touch").isNull(), F.lit("direct"))
        .when(
            F.expr("unix_micros(ts)")
            - F.expr("cast(substr(touch, 1, 19) as bigint)")
            > _ATTR_WINDOW_US,
            F.lit("direct"),
        )
        .otherwise(F.expr("substr(touch, 32)"))
        .alias("attributed_type")
    )
    # the total derives from the 3-row grouped frame (staged), so events
    # is scanned once, not twice
    from ..operators.staging import staged as _staged

    grouped = _staged(
        conv.groupBy("attributed_type").agg(
            F.count(F.lit(1)).alias("n_conversions")
        )
    )
    n = grouped.agg(F.sum("n_conversions").alias("n_conv"))
    return grouped.join(F.broadcast(n)).select(
        "attributed_type",
        "n_conversions",
        F.expr("cast(n_conversions * 1000000 div n_conv as bigint)").alias(
            "share_ppm"
        ),
    )


# --------------------------------------------------------------------------
# events_active_streaks — gaps-and-islands longest-streak distribution
# --------------------------------------------------------------------------


@register(
    "events_active_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    islands AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY d) AS INTEGER) AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, island, count(*) AS len
      FROM islands GROUP BY user_id, island
    ),
    best AS (
      SELECT user_id, max(len) AS best_streak FROM streaks GROUP BY user_id
    )
    SELECT best_streak, count(*) AS n_users
    FROM best GROUP BY best_streak
    """,
)
def events_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user, reported as a
    distribution (streak length → user count) — the gaps-and-islands
    pattern (island key = day − row_number, constant exactly while days
    are consecutive), the engagement metric behind every retention
    dashboard's "streak" feature and the canonical interview-grade SQL
    idiom this engine should own.

    Scale: one distinct over (user, day) — narrow rows, map-side
    combined — one user-partitioned rank window on the per-day frame
    (≤ days-per-user rows per user, not events), two bounded aggregates."""
    days = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
        )
        .distinct()
    )
    islands = days.select(
        "user_id",
        F.expr("date_sub(d, cast(row_number() over"
               " (partition by user_id order by d) as int))").alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    best = streaks.groupBy("user_id").agg(F.max("len").alias("best_streak"))
    return best.groupBy("best_streak").agg(F.count(F.lit(1)).alias("n_users"))


# --------------------------------------------------------------------------
# orders_reorder_intervals — customer repeat-purchase latency
# --------------------------------------------------------------------------


@register(
    "orders_reorder_intervals",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
               lag(o_orderdate) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS gap_days
      FROM orders
    ),
    g AS (SELECT o_custkey, gap_days FROM gaps WHERE gap_days IS NOT NULL)
    SELECT count(DISTINCT o_custkey) AS n_repeat_customers,
           count(*) AS n_gaps,
           CAST(min(gap_days) AS BIGINT) AS min_days,
           round(quantile_cont(gap_days, 0.25), 4) AS p25_days,
           round(quantile_cont(gap_days, 0.50), 4) AS p50_days,
           round(quantile_cont(gap_days, 0.75), 4) AS p75_days,
           CAST(max(gap_days) AS BIGINT) AS max_days
    FROM g
    """,
)
def orders_reorder_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase latency: per customer, the day gaps between
    consecutive orders (lag over (o_orderdate, o_orderkey) — the unique
    tie-break contract), rolled up to the corpus-level gap distribution
    (min/quartiles/max). The inter-ORDER twin of
    ``events_interarrival_stats``: replenishment cadence for demand
    forecasting and the churn-definition input ("inactive = no order for
    > p75 days").

    Scale: one o_custkey shuffle for the lag window over narrow (custkey,
    date, orderkey) rows; the rollup is one exact-percentile aggregate
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, both exact
    interpolated)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    return gaps.agg(
        F.count_distinct("o_custkey").alias("n_repeat_customers"),
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_days").cast("bigint").alias("min_days"),
        F.round(F.expr("percentile(gap_days, 0.25)"), 4).alias("p25_days"),
        F.round(F.expr("percentile(gap_days, 0.50)"), 4).alias("p50_days"),
        F.round(F.expr("percentile(gap_days, 0.75)"), 4).alias("p75_days"),
        F.max("gap_days").cast("bigint").alias("max_days"),
    )


# --------------------------------------------------------------------------
# orders_cohort_ltv — revenue cohort triangle (round 6)
# --------------------------------------------------------------------------


@register(
    "orders_cohort_ltv",
    oracle="""
    WITH first_order AS (
      SELECT o_custkey, min(o_orderdate) AS first_dt
      FROM orders GROUP BY o_custkey
    ),
    facts AS (
      SELECT year(f.first_dt) AS cohort_year,
             year(o.o_orderdate) - year(f.first_dt) AS age_years,
             o.o_custkey,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
    )
    SELECT cohort_year, age_years,
           count(DISTINCT o_custkey) AS n_active,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM facts GROUP BY 1, 2
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value cohort triangle: customers grouped by
    first-order YEAR, revenue summed per (cohort, age-in-years) cell in
    exact integer cents — the revenue twin of ``events_cohort_retention``
    (which counts active users; this follows the money). Reading a row
    down the triangle answers "how much does a 1995 customer spend in
    year 3" — the payback-model input.

    Scale: one o_custkey shuffle for the first-order aggregate, joined
    back to the fact rows (same key, Spark reuses the partitioning), then
    a cohort²-bounded cell aggregate with a distinct-customer count."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    first = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_dt")
    )
    facts = orders.join(first, "o_custkey").select(
        F.year("first_dt").alias("cohort_year"),
        (F.year("o_orderdate") - F.year("first_dt")).alias("age_years"),
        "o_custkey",
        F.expr("cast(round(o_totalprice * 100, 0) as bigint)").alias("cents"),
    )
    return facts.groupBy("cohort_year", "age_years").agg(
        F.count_distinct("o_custkey").alias("n_active"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )


# --------------------------------------------------------------------------
# events_bot_score — behavioral-rate bot heuristics (round 6)
# --------------------------------------------------------------------------

_BOT_MIN_EVENTS = 100  # flag thresholds: sustained volume with
_BOT_MAX_MEAN_GAP_S = 20_000  # machine-regular cadence


@register(
    "events_bot_score",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             count(*) AS n_events,
             count(DISTINCT event_type) AS n_types,
             CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT)
               AS span_us
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events, n_types,
           CAST(span_us // 1000000 AS BIGINT) AS span_s,
           CAST(CASE WHEN n_events > 1
                     THEN (span_us // 1000000) // (n_events - 1)
                     ELSE 0 END AS BIGINT) AS mean_gap_s,
           CAST(n_events >= {_BOT_MIN_EVENTS}
                AND n_events > 1
                AND (span_us // 1000000) // (n_events - 1)
                    <= {_BOT_MAX_MEAN_GAP_S} AS INTEGER) AS bot_flag
    FROM u
    """,
)
def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral fingerprint + bot heuristic: event volume,
    type diversity, activity span, mean inter-event gap (all exact
    integers), and a flag for sustained machine-cadence accounts
    (≥{_BOT_MIN_EVENTS} events at ≤{_BOT_MAX_MEAN_GAP_S}s mean gap) —
    the first-pass abuse filter every event pipeline runs before
    analytics trust user counts. Thresholds are literals shared with the
    oracle, and every division is BIGINT floor division, so the flag
    decides identically in both engines.

    Scale: ONE map-side-combined aggregate over narrow (user_id, type,
    ts) rows — no window, no self-join; the per-user frame is the
    output."""
    u = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("event_type").alias("n_types"),
            (
                F.expr("unix_micros(max(ts)) - unix_micros(min(ts))")
            ).alias("span_us"),
        )
    )
    return u.select(
        "user_id",
        "n_events",
        "n_types",
        F.expr("cast(span_us div 1000000 as bigint)").alias("span_s"),
        F.expr(
            "cast(CASE WHEN n_events > 1"
            " THEN (span_us div 1000000) div (n_events - 1)"
            " ELSE 0 END as bigint)"
        ).alias("mean_gap_s"),
        F.expr(
            f"cast(n_events >= {_BOT_MIN_EVENTS} AND n_events > 1"
            f" AND (span_us div 1000000) div (n_events - 1)"
            f" <= {_BOT_MAX_MEAN_GAP_S} as int)"
        ).alias("bot_flag"),
    )


# --------------------------------------------------------------------------
# events_bounce_rate — session-size histogram + bounce share (round 7 w5)
# --------------------------------------------------------------------------


@register(
    "events_bounce_rate",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    seq AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    ),
    sz AS (SELECT user_id, session_seq, count(*) AS n_ev
           FROM seq GROUP BY user_id, session_seq),
    tot AS (SELECT count(*) AS n_total FROM sz)
    SELECT least(n_ev, 5) AS events_in_session,
           count(*) AS n_sessions,
           CAST(count(*) * 1000000 // tot.n_total AS BIGINT) AS share_ppm
    FROM sz CROSS JOIN tot
    GROUP BY least(n_ev, 5), tot.n_total
    """,
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-size histogram with exact-ppm shares, sizes capped at 5+
    (``events_in_session = 5`` is the open bucket). Bucket 1's share IS
    the bounce rate — the single-event-session fraction every engagement
    dashboard reports; the other buckets give the depth distribution that
    decides whether sessionized state (the streaming session_window twin)
    is worth its shuffle. Reuses ``sessionize_events``' microsecond-exact
    30-min-gap contract (relational.py).

    Scale: one user-partitioned window pass (key-bounded, no global
    sort), a (user, session) count that reuses the same hash partitioning,
    a 5-row histogram aggregate, and a broadcast 1-row total."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts"))
    flagged = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.when(
                (us - F.lag(us).over(w) > 1_800_000_000)
                | F.lag("ts").over(w).isNull(),
                1,
            )
            .otherwise(0)
            .alias("new_session"),
        )
        .select(
            "user_id",
            F.sum("new_session").over(wsum).alias("session_seq"),
        )
    )
    sz = flagged.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_ev")
    )
    tot = sz.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        sz.select(F.least(F.col("n_ev"), F.lit(5).cast("long")).alias("events_in_session"))
        .groupBy("events_in_session")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .crossJoin(F.broadcast(tot))
        .select(
            "events_in_session",
            "n_sessions",
            F.expr("cast(n_sessions * 1000000 div n_total as bigint)").alias(
                "share_ppm"
            ),
        )
    )


# --------------------------------------------------------------------------
# events_autocorr_daily — lag-1 / lag-7 autocorrelation of daily volume
# --------------------------------------------------------------------------


@register(
    "events_autocorr_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    st AS (
      SELECT event_type, count(*) AS n_days, CAST(sum(cnt) AS BIGINT) AS total
      FROM daily GROUP BY event_type
    ),
    dev AS (
      SELECT d.event_type, s.n_days,
             s.n_days * d.cnt - s.total AS dv,
             lag(s.n_days * d.cnt - s.total, 1)
               OVER (PARTITION BY d.event_type ORDER BY d.day) AS dv1,
             lag(s.n_days * d.cnt - s.total, 7)
               OVER (PARTITION BY d.event_type ORDER BY d.day) AS dv7
      FROM daily d JOIN st s USING (event_type)
    )
    SELECT event_type, CAST(max(n_days) AS BIGINT) AS n_days,
           CASE WHEN sum(dv * dv) > 0
                THEN round(sum(CASE WHEN dv1 IS NULL THEN 0 ELSE dv * dv1 END)
                           * 1.0 / sum(dv * dv), 6) + 0.0 END AS r_lag1,
           CASE WHEN sum(dv * dv) > 0
                THEN round(sum(CASE WHEN dv7 IS NULL THEN 0 ELSE dv * dv7 END)
                           * 1.0 / sum(dv * dv), 6) + 0.0 END AS r_lag7
    FROM dev GROUP BY event_type
    """,
)
def events_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 / lag-7 autocorrelation of each event type's daily volume
    over its observed-day sequence — the seasonality fingerprint (weekly
    cycle shows as r_lag7 >> r_lag1) that decides forecast model shape
    before anyone fits one. Exact-integer core: deviations are computed as
    ``n*x_t - S`` (multiply-through by n, so the mean never becomes a
    float), numerator and denominator are exact BIGINT sums, and only the
    final ratio is a double (rounded 6 dp; ``+ 0.0`` normalizes -0.0).
    NULL when the series is constant (zero variance).

    Scale: daily pre-aggregation shrinks the fact table to (type × day)
    rows; the per-type stats broadcast back; one type-partitioned window
    pass over the bounded daily frame; per-term products stay inside
    BIGINT up to ~3e9 events/day/type (document the decimal fallback past
    that)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("cnt").cast("bigint").alias("total"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    dv = F.col("n_days") * F.col("cnt") - F.col("total")
    dev = daily.join(F.broadcast(st), "event_type").select(
        "event_type",
        "n_days",
        dv.alias("dv"),
        F.lag(dv, 1).over(w).alias("dv1"),
        F.lag(dv, 7).over(w).alias("dv7"),
    )
    den = F.sum(F.col("dv") * F.col("dv"))
    num1 = F.sum(F.coalesce(F.col("dv") * F.col("dv1"), F.lit(0).cast("long")))
    num7 = F.sum(F.coalesce(F.col("dv") * F.col("dv7"), F.lit(0).cast("long")))
    return dev.groupBy("event_type").agg(
        F.max("n_days").cast("bigint").alias("n_days"),
        (
            F.when(den > 0, F.round(num1 * 1.0 / den, 6) + 0.0)
        ).alias("r_lag1"),
        (
            F.when(den > 0, F.round(num7 * 1.0 / den, 6) + 0.0)
        ).alias("r_lag7"),
    )


# --------------------------------------------------------------------------
# events_value_drawdown — largest sustained excursion of daily value
# --------------------------------------------------------------------------


@register(
    "events_value_drawdown",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS v_milli
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    st AS (
      SELECT event_type, count(*) AS n_days,
             CAST(sum(v_milli) AS BIGINT) AS total
      FROM daily GROUP BY event_type
    ),
    cum AS (
      SELECT d.event_type, s.n_days, d.day,
             sum(s.n_days * d.v_milli - s.total)
               OVER (PARTITION BY d.event_type ORDER BY d.day
                     ROWS UNBOUNDED PRECEDING) AS c
      FROM daily d JOIN st s USING (event_type)
    ),
    exc AS (
      SELECT event_type, n_days,
             c - min(c) OVER (PARTITION BY event_type ORDER BY day
                              ROWS UNBOUNDED PRECEDING) AS up,
             max(c) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) - c AS down
      FROM cum
    )
    SELECT event_type, CAST(max(n_days) AS BIGINT) AS n_days,
           CAST(max(up) // max(n_days) AS BIGINT) AS max_upswing_milli,
           CAST(max(down) // max(n_days) AS BIGINT) AS max_drawdown_milli
    FROM exc GROUP BY event_type
    """,
)
def events_value_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest sustained excursion (up-swing and drawdown) of each event
    type's cumulative daily-value deviation from its own mean — the
    magnitude a change-point detector would flag, computed exactly:
    C_t = Σ(n·x_i − S) over the day sequence, max_t(C_t − min_{s≤t} C_s)
    and max_t(max_{s≤t} C_s − C_t), reported in value-milli units (÷n).
    Per-event values are rounded to milli BEFORE summing, so every daily
    sum — and hence the whole excursion algebra — is exact BIGINT; no
    float ever enters. The recursive one-sided CUSUM is deliberately
    reshaped into running-extrema-of-prefix-sums, which IS
    window-expressible (a recursive max is not). Contract split vs
    ``events_cusum_changepoint`` (temporal.py): same CUSUM path, but this
    query reports excursion MAGNITUDE, that one the shift LOCATION.

    Scale: daily pre-aggregation, broadcast per-type stats, one
    type-partitioned window pass over the bounded daily frame; the
    nonnegative excursions divide by n with truncation (identical on
    both engines for nonnegative operands)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.expr("cast(round(value * 1000) as bigint)"))
            .cast("bigint")
            .alias("v_milli")
        )
    )
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("v_milli").cast("bigint").alias("total"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = daily.join(F.broadcast(st), "event_type").select(
        "event_type",
        "n_days",
        "day",
        F.sum(F.col("n_days") * F.col("v_milli") - F.col("total"))
        .over(wrun)
        .alias("c"),
    )
    exc = cum.select(
        "event_type",
        "n_days",
        (F.col("c") - F.min("c").over(wrun)).alias("up"),
        (F.max("c").over(wrun) - F.col("c")).alias("down"),
    )
    return exc.groupBy("event_type").agg(
        F.max("n_days").cast("bigint").alias("n_days"),
        F.expr("cast(max(up) div max(n_days) as bigint)").alias(
            "max_upswing_milli"
        ),
        F.expr("cast(max(down) div max(n_days) as bigint)").alias(
            "max_drawdown_milli"
        ),
    )
