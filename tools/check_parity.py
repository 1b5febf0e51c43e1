#!/usr/bin/env python
"""Run every registered query against its DuckDB oracle and report parity.

Usage: python tools/check_parity.py [--json out.json] [sf_dir] [name_filter ...]
Default sf_dir = /root/testdata/sf0.01 (the driver's correctness scale).

--json writes a machine-readable artifact (one object per query: match,
rows, seconds, detail) so a full-registry sweep is verifiable without
re-running it — the per-round `PARITY_r{N}.json` ledger.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_join_spark.oracle import check_parity, duckdb_connection
from kafka_streams_join_spark.queries import ORACLES, QUERIES
from kafka_streams_join_spark.session import get_spark


def main() -> int:
    argv = sys.argv[1:]
    json_path = None
    if argv and argv[0] == "--json":
        if len(argv) < 2:
            print("ERROR: --json requires an output path")
            return 2
        json_path = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    filters = argv[1:]
    if filters:
        # Filters are SUBSTRINGS, one per argv. A single "a|b|c" arg is not a
        # regex and matches nothing — which used to print a vacuous ALL PASS.
        # Fail loudly instead: every filter must select at least one query.
        dead = [f for f in filters if not any(f in n for n in QUERIES)]
        if dead:
            print(f"ERROR: name filter(s) match no registered query: {dead}")
            print("(filters are plain substrings, one per argument — not regex)")
            return 2
        n_sel = sum(1 for n in QUERIES if any(f in n for f in filters))
        print(f"# filters select {n_sel}/{len(QUERIES)} queries")
    spark = get_spark("check_parity")
    con = duckdb_connection(sf_dir)
    failures = 0
    records: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if filters and not any(f in name for f in filters):
            continue
        # staged frames (operators/staging.py) from the previous query are
        # dead weight here — drop them so a long sweep can't accumulate
        # cached blocks across ~100 queries
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            r = check_parity(spark, con, name, fn, ORACLES[name], sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"✗ ERROR     {name}: {type(e).__name__}: {e}")
            failures += 1
            records[name] = {
                "match": False,
                "err": f"{type(e).__name__}: {e}"[:400],
                "secs": round(time.time() - t0, 2),
            }
            continue
        secs = time.time() - t0
        status = "✓ PASS" if r.match else "✗ FAIL"
        print(f"{status}      {name}: {r.spark_rows} rows  ({secs:.1f}s)  {r.detail[:400]}")
        failures += 0 if r.match else 1
        records[name] = {
            "match": bool(r.match),
            "spark_rows": int(r.spark_rows),
            "secs": round(secs, 2),
            "detail": "" if r.match else r.detail[:400],
        }
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    if json_path:
        artifact = {
            "sf_dir": sf_dir,
            "filters": filters,
            "n_run": len(records),
            "n_registered": len(QUERIES),
            "failures": failures,
            "all_pass": failures == 0,
            "queries": records,
        }
        with open(json_path, "w") as fh:
            json.dump(artifact, fh, indent=1, sort_keys=True)
        print(f"# wrote {json_path} ({len(records)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
