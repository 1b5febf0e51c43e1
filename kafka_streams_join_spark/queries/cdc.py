"""Incremental SCD2 / CDC MERGE apply (round 6, VERDICT r5 gap #2).

``events_scd2_history`` REBUILDS the type-2 dimension from the full
changelog every run; the production shape is the incremental apply: an
existing dimension (built from everything before a cutoff) plus today's
delta, merged close-and-insert — the ``MERGE INTO`` a warehouse runs
nightly. This operator implements that merge in pure DataFrame ops and
certifies it the strongest way available: the DuckDB oracle is the FULL
REBUILD (``events_scd2_history``'s registered oracle, verbatim), so a
hash-green row PROVES merge(dim, delta) ≡ rebuild(changelog) on the real
corpus — the ``agg_incremental_merge`` in-row certification pattern
applied to a dimension table.

The two CDC subtleties the proof covers:
- a delta record whose state equals the user's current OPEN state must
  NOT open a new row (the run straddles the cutoff) — handled by seeding
  the delta's change detection with the dimension's current state;
- users born in the delta (no dimension rows) insert from their first
  record, and untouched users' rows pass through byte-identical.

Scale design (100 TB): the dimension side is touched only on the user
keys present in the delta — ``cur`` (open rows) left-joins the
delta-users' first-change frame (delta-sized, broadcastable on a real
day/corpus ratio); history rows pass through without a shuffle. The
delta shuffles once on user_id for its change windows. Nothing is
corpus-sized except the pass-through union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import ORACLES, register

# everything strictly before the cutoff is the existing dimension's world;
# the rest is today's CDC delta (corpus spans Jan 2024)
SCD2_CUTOFF = "2024-01-21 00:00:00"


def _scd2(ev: DataFrame) -> DataFrame:
    """events_scd2_history's collapse → interval derivation, reused for
    building the pre-cutoff dimension (same (ts, event_id) tie-break)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", F.col("event_type").alias("state"), "ts", "event_id")
    )
    return changes.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.when(F.lead("ts").over(w).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_current"),
    )


@register(
    # oracle = the FULL REBUILD over all events — hash equality proves the
    # incremental close-and-insert reproduces it exactly
    "events_scd2_merge_apply",
    oracle=ORACLES["events_scd2_history"],
)
def events_scd2_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC delta (events ≥ {SCD2_CUTOFF}) to the existing SCD2
    dimension (built from events before it) with the warehouse MERGE
    semantics: close each touched user's open row at their first new
    change, insert the delta's change rows, pass everything else through.
    Output schema = ``events_scd2_history`` (user_id, state, valid_from,
    valid_to, is_current); the oracle is that query's full rebuild, so
    the certification IS the merge ≡ rebuild theorem on this corpus."""
    cut = F.lit(SCD2_CUTOFF).cast("timestamp")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    dim = _scd2(ev.filter(F.col("ts") < cut))
    cur = dim.filter(F.col("is_current") == 1).select(
        "user_id",
        F.col("state").alias("cur_state"),
        F.col("valid_from").alias("cur_from"),
        F.col("valid_to").alias("cur_to"),
    )
    hist = dim.filter(F.col("is_current") == 0)

    # delta change extraction, seeded with the dimension's current state so
    # a cross-cutoff same-state run does not open a duplicate row
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = (
        ev.filter(F.col("ts") >= cut)
        .join(cur.select("user_id", "cur_state"), "user_id", "left")
        .withColumn(
            "prev_type",
            F.coalesce(F.lag("event_type").over(w), F.col("cur_state")),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", F.col("event_type").alias("state"), "ts", "event_id")
    )
    new_rows = delta.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.when(F.lead("ts").over(w).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_current"),
    )

    # close-and-keep: users with a first delta change get their open row
    # closed at that change's ts; untouched users keep it open
    first_change = delta.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id")).alias("fc")
    ).select("user_id", F.col("fc.ts").alias("close_ts"))
    cur_merged = cur.join(first_change, "user_id", "left").select(
        "user_id",
        F.col("cur_state").alias("state"),
        F.col("cur_from").alias("valid_from"),
        F.coalesce(F.col("close_ts"), F.col("cur_to")).alias("valid_to"),
        F.when(F.col("close_ts").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_current"),
    )
    return hist.unionByName(cur_merged).unionByName(new_rows)
