"""Streaming windowed aggregations (SURVEY §2.6 "streaming windows").

The reference has only join-scoped sliding bands (``JoinWindows``,
``TimeoutJoinTest.scala:78,85``) — no tumbling/sliding/session *aggregation*
windows. These helpers fill that deliberately-absent surface with the stock
Structured Streaming operators; the batch twins (``window_tumbling_agg``,
``window_sliding_agg``, ``sessionize_events``) are oracle-checked, so these
only need emission-timing tests.

Scale notes: watermark + append mode emits each window once, when it can no
longer change — state per open window per key, watermark-evicted. The
aggregation is the same partial+final hash agg as batch; only finalization
is deferred.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _default_aggs() -> list[Column]:
    return [F.count(F.lit(1)).alias("n")]


def _flatten_window(out: DataFrame, key: str | None) -> DataFrame:
    """(w, key?, aggs...) → (win_start, win_end, key?, aggs...). The agg
    columns are listed explicitly — a ``F.col(key), "*"`` select would emit
    the key twice and make any downstream by-name reference ambiguous."""
    agg_cols = [c for c in out.columns if c != "w" and c != key]
    return out.select(
        F.col("w.start").alias("win_start"),
        F.col("w.end").alias("win_end"),
        *([F.col(key)] if key else []),
        *agg_cols,
    )


def stream_tumbling_agg(
    df: DataFrame,
    window: str = "1 minute",
    ts: str = "ts",
    watermark_delay: str | None = None,
    key: str | None = "key",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling event-time windows: each record in exactly one window;
    windows finalize (append-mode emission) when the watermark passes their
    end."""
    keys = [F.window(ts, window).alias("w")] + ([F.col(key)] if key else [])
    out = (
        df.withWatermark(ts, watermark_delay or window)
        .groupBy(*keys)
        .agg(*(aggs or _default_aggs()))
    )
    return _flatten_window(out, key)


def stream_sliding_agg(
    df: DataFrame,
    window: str = "1 minute",
    slide: str = "30 seconds",
    ts: str = "ts",
    watermark_delay: str | None = None,
    key: str | None = "key",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Sliding event-time windows (window/slide overlapping copies per
    record) — the streaming twin of ``window_sliding_agg``."""
    keys = [F.window(ts, window, slide).alias("w")] + ([F.col(key)] if key else [])
    out = (
        df.withWatermark(ts, watermark_delay or window)
        .groupBy(*keys)
        .agg(*(aggs or _default_aggs()))
    )
    return _flatten_window(out, key)


def stream_session_agg(
    df: DataFrame,
    gap: str = "30 seconds",
    ts: str = "ts",
    watermark_delay: str = "1 minute",
    key: str = "key",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Session windows: per-key sessions split on ``gap`` of event-time
    silence (``session_window`` — dynamic, data-driven window bounds; the
    streaming twin of the gaps-and-islands ``sessionize_events``)."""
    out = (
        df.withWatermark(ts, watermark_delay)
        .groupBy(F.session_window(ts, gap).alias("w"), F.col(key))
        .agg(*(aggs or _default_aggs()))
    )
    return _flatten_window(out, key)
