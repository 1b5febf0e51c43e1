"""Streaming lifecycle observability (SURVEY §2.5 L3).

The reference logs stream-thread failures through an uncaught-exception
handler (``TopicShifter.scala:54-57``). Structured Streaming's equivalent is
a ``StreamingQueryListener``: queries fail per-query (not per-thread), and
the terminated event carries the exception.
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

logger = logging.getLogger(__name__)


class ErrorLoggingListener(StreamingQueryListener):
    """Log every query lifecycle transition; surface terminal exceptions at
    ERROR — the reference's uncaught-exception handler, per query."""

    def onQueryStarted(self, event) -> None:
        logger.info("streaming query started: %s (%s)", event.name, event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        logger.debug(
            "progress %s batch=%s rows=%s", p.name, p.batchId, p.numInputRows
        )

    def onQueryIdle(self, event) -> None:
        logger.debug("streaming query idle: %s", event.id)

    def onQueryTerminated(self, event) -> None:
        if event.exception:
            logger.error(
                "streaming query %s FAILED: %s", event.id, event.exception
            )
        else:
            logger.info("streaming query terminated cleanly: %s", event.id)


def install_error_listener(spark: SparkSession) -> ErrorLoggingListener:
    listener = ErrorLoggingListener()
    spark.streams.addListener(listener)
    return listener
