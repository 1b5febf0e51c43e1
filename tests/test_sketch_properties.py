"""Property tests (hypothesis) for the sketch-family math contracts.

The unit suites certify fixed replays; these randomize the STREAM and pin
the algebraic properties the 100-TB deployment story rests on: Count-Min
grids and frozen-domain histograms are exact homomorphisms from stream
concatenation to cell-wise addition (that is what makes executor-local
folds tree-mergeable), CM point queries are one-sided, the histogram
read-off lands within one bin of the exact lower quantile, and KMV state
is a set function with exact merge. Pure Python on the shared helpers —
no Spark session, so the whole file runs in seconds.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_join_spark.streaming.countmin import (
    CM_D,
    CM_W,
    cm_point_query,
)
from kafka_streams_join_spark.streaming.kmv import KMV_K, kmv_insert
from kafka_streams_join_spark.queries.sketches_cm import _HQ_HI, _HQ_LO, _HQ_W

# -- shared pure replays of the registered contracts -----------------------


def _cm_buckets(uid: int) -> list[int]:
    return [
        int(hashlib.md5(f"{j}:{uid}".encode()).hexdigest()[:15], 16) % CM_W
        for j in range(1, CM_D + 1)
    ]


def _cm_grid(stream: list[int]) -> list[int]:
    grid = [0] * (CM_D * CM_W)
    for uid in stream:
        for j, b in enumerate(_cm_buckets(uid)):
            grid[j * CM_W + b] += 1
    return grid


uids = st.integers(min_value=0, max_value=10_000)
streams = st.lists(uids, max_size=300)


@settings(max_examples=60)
@given(streams, streams)
def test_cm_grid_is_additive_under_concatenation(a, b):
    """grid(a ++ b) == grid(a) + grid(b), cell-wise — the tree-merge
    contract, exact, for ANY pair of streams."""
    ga, gb, gc = _cm_grid(a), _cm_grid(b), _cm_grid(a + b)
    assert [x + y for x, y in zip(ga, gb)] == gc


@settings(max_examples=60)
@given(streams)
def test_cm_point_query_one_sided_and_order_free(stream):
    """est >= exact for every key in the stream, and the grid (hence every
    estimate) is invariant under stream reordering."""
    grid = _cm_grid(stream)
    exact = Counter(stream)
    for uid, n in exact.items():
        assert cm_point_query(grid, _cm_buckets(uid)) >= n
    assert _cm_grid(sorted(stream)) == grid
    # total mass per hash row is the stream length (nothing lost/duplicated)
    for j in range(CM_D):
        assert sum(grid[j * CM_W : (j + 1) * CM_W]) == len(stream)


def _hist(vals: list[int]) -> Counter:
    return Counter(
        min(_HQ_HI - 1, max(_HQ_LO, v)) // _HQ_W for v in vals
    )


values = st.lists(
    st.integers(min_value=-1000, max_value=_HQ_HI + 1000), min_size=1, max_size=300
)


@settings(max_examples=60)
@given(values, values)
def test_histogram_is_additive_under_concatenation(a, b):
    """Frozen-domain histograms merge by cell-wise addition exactly — no
    range agreement needed (the axis this rung exists for)."""
    assert _hist(a) + _hist(b) == _hist(a + b)


@settings(max_examples=60)
@given(values, st.integers(min_value=1, max_value=100))
def test_histogram_readoff_within_one_bin(vals, q):
    """The integer lower-quantile read-off: est (bin's inclusive upper
    edge) >= exact lower quantile, and est - exact < bin width — for any
    value list (clamping included) and any q."""
    clamped = sorted(min(_HQ_HI - 1, max(_HQ_LO, v)) for v in vals)
    n = len(clamped)
    target = (q * n + 99) // 100
    exact = clamped[target - 1]
    hist = _hist(vals)
    cum = 0
    est_bin = None
    for bin_ in sorted(hist):
        cum += hist[bin_]
        if cum >= target:
            est_bin = bin_
            break
    est = (est_bin + 1) * _HQ_W - 1
    assert est >= exact
    assert est - exact < _HQ_W
    assert est_bin == exact // _HQ_W  # the exact quantile's own bin


@settings(max_examples=60)
@given(values, st.sampled_from((50, 90, 99)))
def test_streaming_readoff_agrees_with_batch_rule(vals, q):
    """The streaming monitor's ``hist_quantile_est`` computes exactly the
    batch query's read-off (first bin reaching ceil(q·n/100), inclusive
    upper edge) for any value list — one rule, two surfaces."""
    from kafka_streams_join_spark.streaming.histogram import (
        HB,
        hist_bin,
        hist_quantile_est,
    )

    grid = [0] * HB
    for v in vals:
        grid[hist_bin(v)] += 1
    clamped = sorted(min(_HQ_HI - 1, max(_HQ_LO, v)) for v in vals)
    n = len(clamped)
    target = (q * n + 99) // 100
    exact = clamped[target - 1]
    est = hist_quantile_est(grid, q)
    assert est == (exact // _HQ_W + 1) * _HQ_W - 1


@settings(max_examples=60)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 60) - 1), max_size=300))
def test_kmv_state_is_set_function_with_exact_merge(hs):
    """KMV state == k smallest DISTINCT hashes regardless of order or
    duplication, and merging two split-streams' states reproduces the
    global state (take k smallest of the union)."""
    st_all: list[int] = []
    for h in hs:
        kmv_insert(st_all, KMV_K, h)
    assert st_all == sorted(set(hs))[: KMV_K]
    a, b = hs[::2], hs[1::2]
    sa: list[int] = []
    sb: list[int] = []
    for h in a:
        kmv_insert(sa, KMV_K, h)
    for h in b:
        kmv_insert(sb, KMV_K, h)
    assert sorted(set(sa) | set(sb))[: KMV_K] == st_all
