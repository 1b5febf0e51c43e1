#!/usr/bin/env python
"""Headline benchmark — the driver's per-round feedback loop (BASELINE.md).

Runs the headline query set at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Protocol (BASELINE.md): warm JVM — each query runs once as warm-up at the
start is amortized by running every query twice and keeping the best; value =
sum of per-query best seconds. Deterministic query set so rounds compare.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_streams_join_spark.queries import QUERIES  # noqa: E402
from kafka_streams_join_spark.session import get_spark  # noqa: E402

# Stable headline set: the reference core (joins), the relational surface's
# heavy hitters, and the scale extensions. Names absent from the registry are
# skipped (earlier rounds) but never renamed (comparability).
HEADLINE = [
    "j1_interval_join_inner",
    "j2_interval_join_left_outer",
    "j3_missed_anti",
    "agg_pricing_summary",
    "window_topk_per_group",
    "sessionize_events",
    "sort_topk_limit",
    "dedup_minhash_lsh",
    "dedup_exact",
    "sim_topk_bruteforce",
    "text_quality_score",
    "text_lang_id",
]

RUNS_PER_QUERY = 2  # best-of-2: first run warms code paths, second measures


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    # JVM warm-up: one tiny action so session startup isn't billed to query 1
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        best = float("inf")
        for _ in range(RUNS_PER_QUERY):
            t0 = time.perf_counter()
            # count() forces full evaluation without driver-side row transfer
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
