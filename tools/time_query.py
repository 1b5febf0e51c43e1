#!/usr/bin/env python
"""Best-of-N timing for named registered queries, bench.py methodology
(clearCache between runs, count() action, run 1 reported as cold).

Usage: python tools/time_query.py [-n RUNS] <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_join_spark.queries import QUERIES  # noqa: E402
from kafka_streams_join_spark.session import get_spark  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    n_runs = 4
    if argv and argv[0] == "-n":
        n_runs = int(argv[1])
        argv = argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_query")
    spark.range(1000).count()
    for name in argv:
        fn = QUERIES[name]
        runs = []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: cold={runs[0]} warm={runs[1:]} min={min(runs)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
