"""Skew mitigation: salted joins and two-phase salted aggregation.

AQE's skew-join splitting (on in ``session.get_spark``) handles most batch
skew at runtime by splitting oversized shuffle partitions. Salting is the
explicit fallback for the cases AQE can't touch: streaming stateful ops
(AQE is disabled under stateful workloads), a single hot key that no
partition split can spread (all rows share one shuffle key), and
aggregations where the partial-combine still funnels one key's partials
into one reducer.

The pattern: append a deterministic salt in [0, S) to the skewed side's
key (fanning one hot key across S reducers), and replicate the other side
S× so every (key, salt) pair still meets its match. Replication costs
S × |small side| — use it when the small side is dimension-sized but too
big (or too dynamic) to broadcast outright.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"

# Join types safe under replication of ``other``: each skewed-side row meets
# exactly one (key, salt) copy, so inner/left/semi/anti results are
# row-identical to the unsalted join. The ``other``-preserving types
# (right/full) are NOT replication-safe directly — every unmatched
# ``other`` row would be null-padded ``buckets`` times — and are instead
# decomposed below into a salted core plus an anti-join of the unmatched
# ``other`` rows.
_SALT_SAFE_HOW = {
    "inner",
    "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi",
    "anti", "leftanti", "left_anti",
}
_RIGHT_HOW = {"right", "rightouter", "right_outer"}
_FULL_HOW = {"full", "fullouter", "full_outer", "outer"}


def _salt_expr(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt: hash of the full row, mod buckets.
    Deterministic (unlike rand()) so retried/recomputed tasks salt
    identically — a nondeterministic salt can lose or duplicate rows when
    a stage retries after shuffle-fetch failure."""
    return F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in df.columns])), F.lit(buckets)
    ).cast("int")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``buckets``
    reducers and ``other`` is replicated ``buckets``× to compensate.
    Result is row-identical to ``skewed.join(other, on, how)`` for the
    full join matrix except cross:

    - skewed-side-preserving types (inner/left/semi/anti) salt directly —
      each skewed row meets exactly one (key, salt) replica;
    - ``other``-preserving types (right/full) are DECOMPOSED: the matched
      (+ skewed-preserved, for full) part runs as the salted inner/left
      join, and the unmatched ``other`` rows come from one anti-join
      against ``skewed``'s distinct keys, null-padded and unioned in.
      The anti-join is skew-immune by construction: distinct-on-keys
      collapses any hot key to a single row via map-side partial
      aggregation before the shuffle, so no reducer sees the hot key's
      row volume. Cost is one extra pass over ``other`` + the key
      distinct — the price of not emitting each unmatched ``other`` row
      ``buckets`` times."""
    how_n = how.lower()
    keys = [on] if isinstance(on, str) else list(on)
    if how_n in _RIGHT_HOW or how_n in _FULL_HOW:
        core_how = "inner" if how_n in _RIGHT_HOW else "left"
        matched = salted_join(skewed, other, on=keys, buckets=buckets, how=core_how)
        unmatched = other.join(
            skewed.select(*keys).distinct(), on=keys, how="left_anti"
        )
        # Resolve key names against the schemas CASE-INSENSITIVELY, like
        # Spark's own analyzer (default caseSensitive=false): a Python
        # `not in keys` comparison would treat a case-mismatched key
        # column as payload and null-pad a duplicate of it.
        key_set = {k.lower() for k in keys}
        pad = [
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in skewed.schema.fields
            if f.name.lower() not in key_set
        ]
        other_rest = [c for c in other.columns if c.lower() not in key_set]
        unmatched = unmatched.select(*keys, *pad, *other_rest)
        return matched.unionByName(unmatched)
    if how_n not in _SALT_SAFE_HOW:
        raise ValueError(
            f"salted_join how={how!r} is not replication-safe; use one of "
            f"inner/left/left_semi/left_anti/right/full"
        )
    s = skewed.withColumn(SALT_COL, _salt_expr(skewed, buckets))
    o = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    joined = s.join(o, on=keys + [SALT_COL], how=how)
    return joined.drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot group keys: partial agg on
    (keys + salt) — spreading each hot key over ``buckets`` reducers —
    then final agg on keys. Supports the algebraic aggregates whose
    partials compose: count, sum, min, max.

    (Catalyst's partial+final hash agg already does map-side combining;
    this adds a *reduce-side* split for the case where one key's partials
    alone overwhelm a single reducer — e.g. billions of rows under one
    key at 100 TB.)
    """
    composable = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    for col, fn in aggs.items():
        if fn not in composable:
            raise ValueError(
                f"{fn!r} is not algebraic-composable; use count/sum/min/max"
            )
    salted = df.withColumn(SALT_COL, _salt_expr(df, buckets))
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[getattr(F, fn)(col).alias(f"__p_{col}_{fn}") for col, fn in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            getattr(F, composable[fn])(f"__p_{col}_{fn}").alias(f"{fn}_{col}")
            for col, fn in aggs.items()
        ]
    )
