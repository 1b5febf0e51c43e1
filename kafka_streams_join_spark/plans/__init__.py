"""Physical-plan inspection helpers (the 100 TB design gate).

The reference executes its topology verbatim with zero optimization
(SURVEY §4.1); this engine leans on Catalyst — and these helpers make the
*required* optimizations assertable in tests, so a regression that silently
drops predicate pushdown or flips a broadcast join to shuffle fails CI, not
the cluster bill.
"""

from .inspect import (
    explain_str,
    assert_pushed_filters,
    assert_read_schema_pruned,
    assert_broadcast_join,
    assert_no_cartesian,
    assert_no_wide_shuffle,
    assert_no_single_partition_window_over,
    assert_wholestage_codegen,
)

__all__ = [
    "explain_str",
    "assert_pushed_filters",
    "assert_read_schema_pruned",
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_no_wide_shuffle",
    "assert_no_single_partition_window_over",
    "assert_wholestage_codegen",
]
