"""Executable test-scale-only contracts for the exact quadratic baselines.

The registry deliberately keeps two exact all-pairs/full-scan operators as
ground truth for the recall audits (``dedup_embedding_cosine``,
``sim_topk_bruteforce``). Their docstrings have always said "test scale
only — the production path is the bucketed variant"; this module makes
that contract EXECUTABLE: the operator counts its corpus side up front and
refuses to build the quadratic plan past an explicit ceiling, naming the
registered scale path in the error. A docstring can be ignored; a raised
error cannot.

The count is one cheap driver-side job over the (pruned, two-column)
corpus scan — noise next to the GEMM stage it guards, and at production
scale it is exactly the run you want to fail in seconds instead of
occupying a cluster for hours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Per-process memo of guard counts keyed on (op_name, cache_key): the
# guarded corpora are immutable per sf_dir within a process, so the
# ceiling check only needs its full-scan count job ONCE per (op, dir) —
# without this, every bench rep and explain-only plan-gate invocation
# paid a corpus scan inside the timed/plan region (round-13 advice).
_COUNT_MEMO: dict[tuple[str, str], int] = {}


class TestScaleCeilingError(RuntimeError):
    """Raised when an exact-baseline operator is pointed at a corpus larger
    than its documented test-scale ceiling."""


def clear_ceiling_counts() -> int:
    """Forget memoized guard counts (test hook — the pytest suite swaps
    data under dummy sf_dirs between tests)."""
    n = len(_COUNT_MEMO)
    _COUNT_MEMO.clear()
    return n


def enforce_row_ceiling(
    df: DataFrame,
    *,
    op_name: str,
    ceiling: int,
    scale_path: str,
    cache_key: str | None = None,
) -> int:
    """Count ``df`` and raise :class:`TestScaleCeilingError` if it exceeds
    ``ceiling`` rows. Returns the count so callers can reuse it. With
    ``cache_key`` (the sf_dir), the count is memoized per process."""
    memo_key = (op_name, cache_key) if cache_key is not None else None
    if memo_key is not None and memo_key in _COUNT_MEMO:
        n = _COUNT_MEMO[memo_key]
    else:
        n = df.count()
        if memo_key is not None:
            _COUNT_MEMO[memo_key] = n
    if n > ceiling:
        raise TestScaleCeilingError(
            f"{op_name} is the exact test-scale baseline and refuses to run "
            f"on {n:,} corpus rows (ceiling {ceiling:,}): its cost grows "
            f"quadratically / as queries x corpus. Use the registered scale "
            f"path instead: {scale_path}."
        )
    return n
