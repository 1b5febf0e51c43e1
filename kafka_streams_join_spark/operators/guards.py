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


class TestScaleCeilingError(RuntimeError):
    """Raised when an exact-baseline operator is pointed at a corpus larger
    than its documented test-scale ceiling."""


def enforce_row_ceiling(
    df: DataFrame, *, op_name: str, ceiling: int, scale_path: str
) -> int:
    """Count ``df`` and raise :class:`TestScaleCeilingError` if it exceeds
    ``ceiling`` rows. Returns the count so callers can reuse it."""
    n = df.count()
    if n > ceiling:
        raise TestScaleCeilingError(
            f"{op_name} is the exact test-scale baseline and refuses to run "
            f"on {n:,} corpus rows (ceiling {ceiling:,}): its cost grows "
            f"quadratically / as queries x corpus. Use the registered scale "
            f"path instead: {scale_path}."
        )
    return n
