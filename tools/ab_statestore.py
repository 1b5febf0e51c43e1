#!/usr/bin/env python
"""A/B the streaming state-store provider on the stream-stream joins
(VERDICT r14 task 8): HDFSBackedStateStoreProvider (default) vs
RocksDBStateStoreProvider, config-only — emission semantics unchanged.

Runs the interval-join bench at fixed input N times per provider,
INTERLEAVED (A, B, A, B, ...) in one process so co-tenant drift hits both
arms equally. The provider is read per streaming query start, so setting
the session conf between runs is a clean toggle.

Usage: python tools/ab_statestore.py [reps]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state."
               "RocksDBStateStoreProvider",
}


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from kafka_streams_join_spark.session import get_spark
    from tools.bench_streaming import bench_interval_join, bench_timeout_join

    spark = get_spark("ab_statestore")
    results: dict[str, list[float]] = {}
    for i in range(reps):
        for name, cls in PROVIDERS.items():
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
            for bench in (bench_interval_join, bench_timeout_join):
                rec = bench(spark)
                key = f"{rec['metric']}:{name}"
                results.setdefault(key, []).append(rec["value"])
                print(f"# {key} rep {i}: {rec['value']} rows/s "
                      f"({rec['rows_in']} rows in {rec['secs']}s)")
    for key, vals in sorted(results.items()):
        print(f"{key}: runs={vals} best={max(vals)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
