"""Batch twins of the reference's operator inventory (SURVEY §2.2-§2.4).

All run on the ``events`` table (FIXTURES.md "Batch twins"): ``view`` rows
play displays, ``click`` rows play clicks, ``user_id`` is the Kafka key,
W = 1 hour. Each query cites the reference span it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.payload import join_payload
from ..operators.asof_join import asof_join
from ..operators.range_join import bucketed_range_join
from ..operators.interval_join import (
    JoinWindow,
    interval_join,
    missed_join,
    shift_event_time,
)
from ..sources.parquet import load_table
from .registry import register

WINDOW = JoinWindow(before="1 hour")  # JoinWindows.of(...).before(W), TimeoutJoinTest.scala:78
WINDOW_AFTER = JoinWindow(after="1 hour")  # .after(W), TimeoutJoinTest.scala:85


def _typed(spark: SparkSession, sf_dir: str, event_type: str, prefix: str) -> DataFrame:
    """One side of the self-join: events of one type, role-prefixed columns.

    The filter + projection sit directly on the scan so Catalyst pushes the
    ``event_type = X`` predicate and prunes to 4 columns at the parquet level.
    """
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == event_type)
        .select(
            F.col("user_id"),
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("ts").alias(f"{prefix}_ts"),
            F.col("props").alias(f"{prefix}_props"),
        )
    )


# --------------------------------------------------------------------------
# P1 / P2 — filter + mapValues projection (TimeoutJoinTest.scala:86-91)
# --------------------------------------------------------------------------


@register(
    "p1_filter",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, props
    FROM events
    WHERE event_type = 'click' AND value >= 50.0
    """,
)
def p1_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — predicate filter (Predicate[K,V], TimeoutJoinTest.scala:86-88)."""
    return (
        load_table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "click") & (F.col("value") >= 50.0))
        .select("event_id", "user_id", "ts", "event_type", "value", "props")
    )


@register(
    "p2_mapvalues",
    oracle="""
    SELECT event_id, user_id, props AS value
    FROM events
    """,
)
def p2_mapvalues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — mapValues projection (ValueMapper, TimeoutJoinTest.scala:89-91)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("props").alias("value")
    )


@register(
    "p3_value_construction",
    oracle="""
    SELECT event_id,
           '{"type":"' || event_type || '","props":' || props || '}' AS payload
    FROM events
    """,
)
def p3_value_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — composite value by string interpolation (TimeoutJoinTest.scala:76-78).

    Byte-exact concat, not to_json — mirrors the reference's interpolation.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.concat(
            F.lit('{"type":"'),
            F.col("event_type"),
            F.lit('","props":'),
            F.col("props"),
            F.lit("}"),
        ).alias("payload"),
    )


# --------------------------------------------------------------------------
# J1-J4 — the windowed joins (TimeoutJoinTest.scala:75-92)
# --------------------------------------------------------------------------


@register(
    "j1_interval_join_inner",
    oracle="""
    SELECT c.user_id AS user_id,
           c.event_id AS click_id, c.ts AS click_ts,
           v.event_id AS view_id,  v.ts AS view_ts,
           '{"display":' || v.props || ',"click":' || c.props || '}' AS payload
    FROM events c
    JOIN events v
      ON c.user_id = v.user_id
     AND v.ts BETWEEN c.ts - INTERVAL 1 HOUR AND c.ts
    WHERE c.event_type = 'click' AND v.event_type = 'view'
    """,
)
def j1_interval_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — windowed inner join, "clicked displays" (TimeoutJoinTest.scala:75-79).

    Equi on key + band [t-W, t] on event time; payload is the byte-exact P3
    interpolation. Plans as a shuffled join partitioned by user_id — the band
    is a within-key filter, so state/work per key is window-bounded at scale.
    """
    clicks = _typed(spark, sf_dir, "click", "click")
    views = _typed(spark, sf_dir, "view", "view")
    j = interval_join(
        clicks, views, on="user_id", window=WINDOW,
        left_ts="click_ts", right_ts="view_ts",
    )
    return j.select(
        F.col("l_user_id").alias("user_id"),
        F.col("l_click_id").alias("click_id"),
        F.col("l_click_ts").alias("click_ts"),
        F.col("r_view_id").alias("view_id"),
        F.col("r_view_ts").alias("view_ts"),
        join_payload(F.col("r_view_props"), F.col("l_click_props")).alias("payload"),
    )


@register(
    "j2_interval_join_left_outer",
    oracle="""
    SELECT v.user_id AS user_id,
           v.event_id AS view_id, v.ts AS view_ts, v.props AS view_props,
           c.event_id AS click_id, c.ts AS click_ts, c.props AS click_props
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id
     AND c.ts BETWEEN v.ts AND v.ts + INTERVAL 1 HOUR
    """,
)
def j2_interval_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — windowed left-outer join, "display, maybe click"
    (TimeoutJoinTest.scala:82-85): clicks in [t, t+W], null-padded when absent.
    """
    views = _typed(spark, sf_dir, "view", "view")
    clicks = _typed(spark, sf_dir, "click", "click")
    j = interval_join(
        views, clicks, on="user_id", window=WINDOW_AFTER,
        left_ts="view_ts", right_ts="click_ts", how="left_outer",
    )
    return j.select(
        F.col("l_user_id").alias("user_id"),
        F.col("l_view_id").alias("view_id"),
        F.col("l_view_ts").alias("view_ts"),
        F.col("l_view_props").alias("view_props"),
        F.col("r_click_id").alias("click_id"),
        F.col("r_click_ts").alias("click_ts"),
        F.col("r_click_props").alias("click_props"),
    )


@register(
    "j3_missed_anti",
    oracle="""
    SELECT v.event_id AS view_id, v.user_id AS user_id, v.ts AS view_ts,
           v.props AS value
    FROM events v
    WHERE v.event_type = 'view'
      AND NOT EXISTS (
        SELECT 1 FROM events c
        WHERE c.event_type = 'click'
          AND c.user_id = v.user_id
          AND c.ts BETWEEN v.ts AND v.ts + INTERVAL 1 HOUR
      )
    """,
)
def j3_missed_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — absence/timeout detection as a left-anti interval join
    (the whole MissedDisplay pipeline, TimeoutJoinTest.scala:82-92 +
    TopicShifter.scala:22-52, collapsed to the anti-join it denotes).
    Output = original display value verbatim (mapValues, :89-91).
    """
    views = _typed(spark, sf_dir, "view", "view")
    clicks = _typed(spark, sf_dir, "click", "click")
    missed = interval_join(
        views, clicks, on="user_id", window=WINDOW_AFTER,
        left_ts="view_ts", right_ts="click_ts", how="left_anti",
    )
    return missed.select(
        F.col("view_id"),
        F.col("user_id"),
        F.col("view_ts"),
        F.col("view_props").alias("value"),
    )


@register(
    "j3_missed_outer_null",
    oracle="""
    SELECT v.user_id AS user_id, v.event_id AS view_id, v.props AS value
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id
     AND c.ts BETWEEN v.ts AND v.ts + INTERVAL 1 HOUR
    WHERE c.event_id IS NULL
    """,
)
def j3_missed_outer_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3, literal composition — leftJoin → filter(right isEmpty) → mapValues,
    exactly as the reference writes it (TimeoutJoinTest.scala:82-91).
    The outer join null-pads only when NO click matched, so the IS NULL
    filter yields each missed display exactly once.
    """
    views = _typed(spark, sf_dir, "view", "view")
    clicks = _typed(spark, sf_dir, "click", "click")
    j = interval_join(
        views, clicks, on="user_id", window=WINDOW_AFTER,
        left_ts="view_ts", right_ts="click_ts", how="left_outer",
    )
    return (
        j.filter(F.col("r_click_id").isNull())  # P1: right side absent
        .select(  # P2: project back to the display value
            F.col("l_user_id").alias("user_id"),
            F.col("l_view_id").alias("view_id"),
            F.col("l_view_props").alias("value"),
        )
    )


@register(
    "j4_clicked_semi",
    oracle="""
    SELECT v.event_id AS view_id, v.user_id AS user_id, v.ts AS view_ts
    FROM events v
    WHERE v.event_type = 'view'
      AND EXISTS (
        SELECT 1 FROM events c
        WHERE c.event_type = 'click'
          AND c.user_id = v.user_id
          AND c.ts BETWEEN v.ts AND v.ts + INTERVAL 1 HOUR
      )
    """,
)
def j4_clicked_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — semi-join flavor: displays that WERE clicked (SURVEY §2.3 J4)."""
    views = _typed(spark, sf_dir, "view", "view")
    clicks = _typed(spark, sf_dir, "click", "click")
    hit = interval_join(
        views, clicks, on="user_id", window=WINDOW_AFTER,
        left_ts="view_ts", right_ts="click_ts", how="left_semi",
    )
    return hit.select("view_id", "user_id", "view_ts")


# --------------------------------------------------------------------------
# T1 — event-time shift (TopicShifter.scala:22-37, batch twin)
# --------------------------------------------------------------------------


@register(
    "t1_shift_event_time",
    oracle="""
    SELECT event_id, user_id, ts + INTERVAL 1 SECOND AS ts, event_type
    FROM events
    """,
)
def t1_shift_event_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 — the TopicShifter's only event-time-visible effect: ts + Δ.

    (Wall-clock delayed *delivery* is the streaming variant,
    streaming/shifter.py; a watermark subsumes it for correctness.)
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    return shift_event_time(ev, "1 second")


# --------------------------------------------------------------------------
# As-of joins — nearest-match completion of the JoinWindows family.
# The reference's band join (TimeoutJoinTest.scala:75-79) emits EVERY match
# in [t-W, t]; the as-of join emits only the nearest one. operators/asof_join
# does it with one shuffle + sort (no band blowup) — see its module docstring.
# --------------------------------------------------------------------------


def _asof_sides(spark: SparkSession, sf_dir: str, left_type: str, right_type: str):
    left = _typed(spark, sf_dir, left_type, left_type).drop(f"{left_type}_props")
    right = _typed(spark, sf_dir, right_type, right_type).drop(f"{right_type}_props")
    return left, right


def _asof_project(df: DataFrame, left_type: str, right_type: str) -> DataFrame:
    return df.select(
        F.col(f"l_user_id").alias("user_id"),
        F.col(f"l_{left_type}_id").alias(f"{left_type}_id"),
        F.col(f"l_{left_type}_ts").alias(f"{left_type}_ts"),
        F.col(f"r_{right_type}_id").alias(f"{right_type}_id"),
        F.col(f"r_{right_type}_ts").alias(f"{right_type}_ts"),
    )


@register(
    "asof_latest_view",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
               FROM events WHERE event_type = 'click'),
         v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
               FROM events WHERE event_type = 'view'),
         j AS (
           SELECT c.user_id, c.click_id, c.click_ts, v.view_id, v.view_ts,
                  ROW_NUMBER() OVER (
                    PARTITION BY c.click_id
                    ORDER BY v.view_ts DESC NULLS LAST, v.view_id DESC NULLS LAST
                  ) AS rn
           FROM c LEFT JOIN v
             ON c.user_id = v.user_id AND v.view_ts <= c.click_ts
         )
    SELECT user_id, click_id, click_ts, view_id, view_ts FROM j WHERE rn = 1
    """,
)
def asof_latest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of: for each click, THE latest view at-or-before it.

    Ties on view_ts break to the max view_id (right_tiebreak), matching the
    oracle's ORDER BY ts DESC, id DESC / rn = 1.
    """
    clicks, views = _asof_sides(spark, sf_dir, "click", "view")
    return _asof_project(
        asof_join(
            clicks,
            views,
            on="user_id",
            left_ts="click_ts",
            right_ts="view_ts",
            right_tiebreak="view_id",
        ),
        "click",
        "view",
    )


@register(
    "asof_latest_view_tolerance",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
               FROM events WHERE event_type = 'click'),
         v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
               FROM events WHERE event_type = 'view'),
         j AS (
           SELECT c.user_id, c.click_id, c.click_ts, v.view_id, v.view_ts,
                  ROW_NUMBER() OVER (
                    PARTITION BY c.click_id
                    ORDER BY v.view_ts DESC NULLS LAST, v.view_id DESC NULLS LAST
                  ) AS rn
           FROM c LEFT JOIN v
             ON c.user_id = v.user_id
            AND v.view_ts <= c.click_ts
            AND v.view_ts >= c.click_ts - INTERVAL 2 HOUR
         )
    SELECT user_id, click_id, click_ts, view_id, view_ts FROM j WHERE rn = 1
    """,
)
def asof_latest_view_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 2 h tolerance (pandas merge_asof ``tolerance``).

    Nearest-then-filter ≡ filter-then-nearest for a one-sided direction, so
    the post-hoc tolerance null-out matches the oracle's banded join.
    """
    clicks, views = _asof_sides(spark, sf_dir, "click", "view")
    return _asof_project(
        asof_join(
            clicks,
            views,
            on="user_id",
            left_ts="click_ts",
            right_ts="view_ts",
            tolerance="2 hours",
            right_tiebreak="view_id",
        ),
        "click",
        "view",
    )


@register(
    "asof_next_purchase",
    oracle="""
    WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
               FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
               FROM events WHERE event_type = 'purchase'),
         j AS (
           SELECT v.user_id, v.view_id, v.view_ts, p.purchase_id, p.purchase_ts,
                  ROW_NUMBER() OVER (
                    PARTITION BY v.view_id
                    ORDER BY p.purchase_ts ASC NULLS LAST, p.purchase_id DESC NULLS LAST
                  ) AS rn
           FROM v LEFT JOIN p
             ON v.user_id = p.user_id AND p.purchase_ts >= v.view_ts
         )
    SELECT user_id, view_id, view_ts, purchase_id, purchase_ts FROM j WHERE rn = 1
    """,
)
def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of (attribution): for each view, the next purchase by the
    same user at-or-after it."""
    views, purchases = _asof_sides(spark, sf_dir, "view", "purchase")
    return _asof_project(
        asof_join(
            views,
            purchases,
            on="user_id",
            left_ts="view_ts",
            right_ts="purchase_ts",
            direction="forward",
            right_tiebreak="purchase_id",
        ),
        "view",
        "purchase",
    )


# --------------------------------------------------------------------------
# Keyless range joins — the band predicate WITHOUT the reference's key
# equality. A bare theta join would plan BroadcastNestedLoop (O(n·m));
# operators/range_join.py rewrites it to a bucket equi-join.
# --------------------------------------------------------------------------


def _range_sides(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("error_end"),
    )
    return purchases, errors


@register(
    "range_join_error_window",
    oracle="""
    SELECT p.event_id AS purchase_id, p.ts AS purchase_ts,
           e.event_id AS error_id, e.ts AS error_start
    FROM events p
    JOIN events e
      ON p.ts >= e.ts AND p.ts < e.ts + INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase' AND e.event_type = 'error'
    """,
)
def range_join_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases made during ANY error window [error_ts, error_ts + 30 min) —
    no join key, pure range predicate. Bucketed at 30 min so each error
    window explodes to ≤ 2 buckets; the join is hash-on-bucket, never a
    nested loop (gated in test_plans)."""
    purchases, errors = _range_sides(spark, sf_dir)
    return bucketed_range_join(
        purchases,
        errors,
        point_ts="purchase_ts",
        interval_start="error_start",
        interval_end="error_end",
        bucket_seconds=1800,
        point_prefix="",
        interval_prefix="",
    ).select("purchase_id", "purchase_ts", "error_id", "error_start")


@register(
    "range_join_quiet_purchases",
    oracle="""
    SELECT p.event_id AS purchase_id, p.ts AS purchase_ts
    FROM events p
    WHERE p.event_type = 'purchase'
      AND NOT EXISTS (
        SELECT 1 FROM events e
        WHERE e.event_type = 'error'
          AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 30 MINUTE
      )
    """,
)
def range_join_quiet_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti flavor: purchases inside NO error window — absence detection
    (J3's shape) with the key equality removed."""
    purchases, errors = _range_sides(spark, sf_dir)
    return bucketed_range_join(
        purchases,
        errors,
        point_ts="purchase_ts",
        interval_start="error_start",
        interval_end="error_end",
        bucket_seconds=1800,
        how="left_anti",
        point_prefix="",
        interval_prefix="",
    )


# --------------------------------------------------------------------------
# Golden scenarios (TimeoutJoinTest.scala:106-164) as a driver-checkable
# batch twin — FIXTURES.md scenarios 1-3 with byte-exact payloads
# --------------------------------------------------------------------------

_GOLDEN_KEY = "0f1f53a0-44f5-4b84-9699-fe853c90ed1c"
_GOLDEN_OTHER_KEY = "9750c569-44c2-49e6-854e-01e0eae04bb6"
_GOLDEN_DISPLAY = '{"type":"display"}'
_GOLDEN_CLICK = '{"type":"click"}'


@register(
    "golden_scenarios",
    oracle=f"""
    WITH displays(scenario, k, val, ts) AS (VALUES
      (1, '{_GOLDEN_KEY}', '{_GOLDEN_DISPLAY}', TIMESTAMP '2024-01-01 00:00:00'),
      (2, '{_GOLDEN_KEY}', '{_GOLDEN_DISPLAY}', TIMESTAMP '2024-01-01 00:00:00'),
      (3, '{_GOLDEN_KEY}', '{_GOLDEN_DISPLAY}', TIMESTAMP '2024-01-01 00:00:00')
    ),
    clicks(scenario, k, val, ts) AS (VALUES
      (1, '{_GOLDEN_KEY}',       '{_GOLDEN_CLICK}', TIMESTAMP '2024-01-01 00:00:00.5'),
      (2, '{_GOLDEN_KEY}',       '{_GOLDEN_CLICK}', TIMESTAMP '2024-01-01 00:00:02'),
      (3, '{_GOLDEN_OTHER_KEY}', '{_GOLDEN_CLICK}', TIMESTAMP '2024-01-01 00:00:00.5')
    ),
    clicked AS (
      SELECT c.scenario AS scenario, 'clicked-display' AS topic,
             c.k AS key, '{{"display":' || d.val || ',"click":' || c.val || '}}' AS value
      FROM clicks c JOIN displays d
        ON d.scenario = c.scenario AND d.k = c.k
       AND d.ts BETWEEN c.ts - INTERVAL 1 SECOND AND c.ts
    ),
    missed AS (
      SELECT d.scenario AS scenario, 'missed-display' AS topic,
             d.k AS key, d.val AS value
      FROM displays d
      WHERE NOT EXISTS (
        SELECT 1 FROM clicks c
        WHERE c.scenario = d.scenario AND c.k = d.k
          AND c.ts BETWEEN d.ts AND d.ts + INTERVAL 1 SECOND
      )
    )
    SELECT * FROM clicked UNION ALL SELECT * FROM missed
    """,
)
def golden_scenarios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's three golden scenarios (TimeoutJoinTest.scala:106-164)
    as batch twins through the REAL operators, hash-checked by the driver:

    1. in-window click  → exactly one clicked-display row with the byte-exact
       interpolated payload (TimeoutJoinTest.scala:121);
    2. out-of-window click → the display lands on missed-display verbatim
       (:143);
    3. same-time click under a different key → still missed (:163) — key
       equality is part of the join predicate.

    Inputs are the FIXTURES.md literals (W = 1 second), not corpus rows, so
    the check certifies the flagship semantics end-to-end: interval_join
    (equi + band), missed_join (anti composition), and join_payload
    (byte-exact concat) — the same code paths the streaming topologies call.
    """
    import datetime as dt

    from ..functions.literals import values_frame

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "scenario int, k string, val string, ts timestamp"
    displays = values_frame(
        spark, [(s, _GOLDEN_KEY, _GOLDEN_DISPLAY, t0) for s in (1, 2, 3)], schema
    )
    clicks = values_frame(
        spark,
        [
            (1, _GOLDEN_KEY, _GOLDEN_CLICK, t0 + dt.timedelta(seconds=0.5)),
            (2, _GOLDEN_KEY, _GOLDEN_CLICK, t0 + dt.timedelta(seconds=2)),
            (3, _GOLDEN_OTHER_KEY, _GOLDEN_CLICK, t0 + dt.timedelta(seconds=0.5)),
        ],
        schema,
    )
    # scenarios are independent topologies; the composite key keeps them so
    keyed = lambda df: df.withColumn("jk", F.concat_ws("|", "scenario", "k"))  # noqa: E731
    w = JoinWindow(before="1 second")  # JoinWindows.of(...).before(W), :78
    clicked = interval_join(
        keyed(clicks), keyed(displays), on="jk", window=w
    ).select(
        F.col("l_scenario").alias("scenario"),
        F.lit("clicked-display").alias("topic"),
        F.col("l_k").alias("key"),
        join_payload(F.col("r_val"), F.col("l_val")).alias("value"),
    )
    missed = missed_join(
        keyed(displays), keyed(clicks), on="jk", window=JoinWindow(after="1 second")
    ).select(
        F.col("scenario"),
        F.lit("missed-display").alias("topic"),
        F.col("k").alias("key"),
        F.col("val").alias("value"),
    )
    return clicked.unionByName(missed)


@register(
    "asof_nearest_view",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
               FROM events WHERE event_type = 'click'),
         v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
               FROM events WHERE event_type = 'view'),
         j AS (
           SELECT c.user_id, c.click_id, c.click_ts, v.view_id, v.view_ts,
                  ROW_NUMBER() OVER (
                    PARTITION BY c.click_id
                    ORDER BY abs(epoch_us(v.view_ts) - epoch_us(c.click_ts))
                               ASC NULLS LAST,
                             CAST(v.view_ts <= c.click_ts AS INT) DESC,
                             v.view_id DESC NULLS LAST
                  ) AS rn
           FROM c LEFT JOIN v ON c.user_id = v.user_id
         )
    SELECT user_id, click_id, click_ts, view_id, view_ts FROM j WHERE rn = 1
    """,
)
def asof_nearest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of (round 6): for each click, the view closest in time
    in EITHER direction — pandas ``merge_asof(direction='nearest')``,
    completing the family next to backward / backward-with-tolerance /
    forward. Composed from the two one-sided ``asof_join``s plus a
    row-local chooser: |Δt| decides, exact ties prefer the backward
    candidate (the "what did they see before clicking" reading), same-ts
    ties inside a side resolve by the operator's max-id tie-break.

    Scale: two runs of the single-shuffle as-of operator (each one
    Exchange + sort, zero band blowup) joined on the Q-sized click key —
    the oracle's unconstrained LEFT JOIN + rank formulation would
    materialize every (click, view) pair per user instead."""
    clicks, views = _asof_sides(spark, sf_dir, "click", "view")
    back = _asof_project(
        asof_join(
            clicks, views, on="user_id", left_ts="click_ts",
            right_ts="view_ts", direction="backward", right_tiebreak="view_id",
        ),
        "click", "view",
    ).select(
        "user_id", "click_id", "click_ts",
        F.col("view_id").alias("b_id"), F.col("view_ts").alias("b_ts"),
    )
    fwd = _asof_project(
        asof_join(
            clicks, views, on="user_id", left_ts="click_ts",
            right_ts="view_ts", direction="forward", right_tiebreak="view_id",
        ),
        "click", "view",
    ).select(
        F.col("click_id").alias("f_click_id"),
        F.col("view_id").alias("f_id"), F.col("view_ts").alias("f_ts"),
    )
    j = back.join(fwd, back.click_id == fwd.f_click_id)
    b_gap = F.expr("unix_micros(click_ts) - unix_micros(b_ts)")
    f_gap = F.expr("unix_micros(f_ts) - unix_micros(click_ts)")
    pick_b = (
        F.col("f_ts").isNull()
        | (F.col("b_ts").isNotNull() & (b_gap <= f_gap))
    )
    return j.select(
        "user_id",
        "click_id",
        "click_ts",
        F.when(pick_b, F.col("b_id")).otherwise(F.col("f_id")).alias("view_id"),
        F.when(pick_b, F.col("b_ts")).otherwise(F.col("f_ts")).alias("view_ts"),
    )
