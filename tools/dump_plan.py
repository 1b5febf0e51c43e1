#!/usr/bin/env python
"""Dump `.explain("formatted")` for named registered queries to files.

Usage: python tools/dump_plan.py <out_dir> <suffix> <query> [<query> ...]

Writes <out_dir>/<query>_<suffix>.txt for each query — the round-14
optimization evidence artifacts (plans/r14/<query>_before.txt / _after.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_join_spark.plans import explain_str  # noqa: E402
from kafka_streams_join_spark.queries import QUERIES  # noqa: E402
from kafka_streams_join_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plan")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = explain_str(df, "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
