"""Property test of the prefix-filtering lemma as implemented (pure
python, no Spark): for ANY two sets with Jaccard >= tau under ANY global
total order, the p = n - ceil(tau*n) + 1 prefixes must intersect, and
the integer length filter must accept the pair. This guards the exact
integer formulas dedup_prefix.py ships — an implementation bug in the
prefix length or length filter would break losslessness silently (the
corpus test would only catch it if this corpus happened to expose it)."""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from kafka_streams_join_spark.queries.dedup_prefix import _TAU_DEN, _TAU_NUM

_TAU = _TAU_NUM / _TAU_DEN


def _prefix(s: set[int], order: dict[int, int]) -> set[int]:
    n = len(s)
    p = n - (n * _TAU_NUM + (_TAU_DEN - 1)) // _TAU_DEN + 1  # the shipped formula
    return set(sorted(s, key=order.__getitem__)[:p])


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_prefixes_intersect_for_all_qualifying_pairs(data):
    universe = list(range(60))
    base = data.draw(
        st.sets(st.sampled_from(universe), min_size=5, max_size=40).map(set)
    )
    # derive a second set by small edits so near-dup pairs are common
    n_edits = data.draw(st.integers(min_value=0, max_value=4))
    other = set(base)
    for _ in range(n_edits):
        if data.draw(st.booleans()) and other:
            other.discard(data.draw(st.sampled_from(sorted(other))))
        else:
            other.add(data.draw(st.sampled_from(universe)))
    if not other:
        return
    seed = data.draw(st.integers(min_value=0, max_value=10_000))
    order_list = universe[:]
    random.Random(seed).shuffle(order_list)
    order = {v: i for i, v in enumerate(order_list)}

    inter = len(base & other)
    union = len(base | other)
    if union == 0 or inter / union < _TAU:
        return  # the lemma only promises anything for qualifying pairs
    # 1) the shipped integer length filter must accept the pair
    na, nb = len(base), len(other)
    assert _TAU_DEN * min(na, nb) >= _TAU_NUM * max(na, nb)
    # 2) the prefixes under the arbitrary global order must intersect
    assert _prefix(base, order) & _prefix(other, order), (
        sorted(base),
        sorted(other),
        order_list,
    )
