from .asof_join import asof_join
from .components import connected_components
from .interval_join import (
    JoinWindow,
    interval_join,
    missed_join,
    shift_event_time,
)
from .range_join import bucketed_range_join

__all__ = [
    "JoinWindow",
    "asof_join",
    "bucketed_range_join",
    "connected_components",
    "interval_join",
    "missed_join",
    "shift_event_time",
]
