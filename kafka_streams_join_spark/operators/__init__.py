from .interval_join import (
    JoinWindow,
    interval_join,
    missed_join,
    shift_event_time,
)

__all__ = ["JoinWindow", "interval_join", "missed_join", "shift_event_time"]
