"""Structured Streaming topologies — the reference's actual capability.

- ``topology``: watermarked interval joins + timeout detection
  (``TimeoutJoinTest.scala:53-104`` re-expressed declaratively).
- ``shifter``: the TopicShifter delay primitive (``TopicShifter.scala``).
- ``kafka``: Kafka source/sink adapters (SURVEY §2.1 S1-S8).
- ``harness``: deterministic file-source/memory-sink test harness replacing
  the reference's live-broker choreography (``KafkaUtils.scala``).
"""

from .topology import TimeoutJoinTopology, stream_interval_join, stream_timeout_join
from .shifter import shift_stream

__all__ = [
    "TimeoutJoinTopology",
    "stream_interval_join",
    "stream_timeout_join",
    "shift_stream",
]
