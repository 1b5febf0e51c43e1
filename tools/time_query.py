#!/usr/bin/env python
"""Time registered queries with the noop sink (guide §1.4), best-of-N.

Usage: python tools/time_query.py [-n RUNS] [--count] <query> [<query> ...]

Mirrors bench.py's protocol (clearCache between runs, one warm JVM) but
uses the noop write by default so the timing covers every column of every
row of the computation, not the count-pruned subtree. Pass --count to use
bench.py's .count() action instead (for apples-to-apples with BENCH lines).
Interleave A/B by listing the same query names alternately after editing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_join_spark.queries import QUERIES  # noqa: E402
from kafka_streams_join_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    runs = 3
    use_count = False
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    if args and args[0] == "--count":
        use_count = True
        args = args[1:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_query")
    spark.range(1000).count()
    for name in names:
        fn = QUERIES[name]
        times = []
        for i in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if use_count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: " + " ".join(f"{t:.2f}" for t in times)
            + f"  min={min(times):.2f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
