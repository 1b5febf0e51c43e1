#!/usr/bin/env python
"""Oracle-stability stress gate (SURVEY §5.2): run each DuckDB oracle N
times on ONE connection and flag any run whose normalized result diverges
from the first run, or that raises.

Why this exists: DuckDB 1.0.0 evaluated the original `events_wavelet_energy`
oracle — a 5-level chained `list_transform(generate_series(...), i ->
prev[2i-1] ± prev[2i])` CTE pyramid — NONDETERMINISTICALLY: 13 wrong results
and 3 spurious `Overflow in addition of INT128` crashes per 100 single-
connection runs, with garbage operand values ~1e38 (round-9 verdict). The
Spark side was provably correct; the gate that was supposed to certify it
rolled dice. Every NEW or CHANGED oracle must survive ~25 reps here before
registration; the registry-wide audit (default reps) flushes latent cases.

Usage: python tools/stress_oracles.py [--dir SF_DIR] [--reps N] [filter ...]
Default sf_dir = /root/testdata/sf0.001 (cheap; the instability reproduces
at any SF), default reps = 10 for a full-registry audit; use --reps 25+ for
a targeted new-oracle gate. The data directory is ONLY set via the explicit
--dir flag (ADVICE r11 — the old positional isdir+glob sniffing silently
promoted a filter that collided with a local parquet-holding directory to
the data dir, running every oracle on the wrong corpus, and silently
demoted a bare relative data-dir name without top-level parquet to a
filter). Positional args are plain substring name filters, one per
argument; a positional that names an existing directory or contains a path
separator is rejected with a hint to use --dir. Exit 0 = every oracle
stable; 1 = divergence or error observed; 2 = a filter matched nothing or
looked like a path.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_join_spark.oracle import _normalize, duckdb_connection
from kafka_streams_join_spark.queries import ORACLES


def main() -> int:
    args = sys.argv[1:]
    reps = 10
    if "--reps" in args:
        i = args.index("--reps")
        if i + 1 >= len(args):
            print("ERROR: --reps needs a value (e.g. --reps 25)")
            return 2
        reps = int(args[i + 1])
        del args[i : i + 2]
    # The data dir comes ONLY from the explicit --dir flag (ADVICE r11):
    # the earlier isdir+*.parquet sniffing of args[0] could both promote a
    # filter to the data dir (name collides with a local parquet folder →
    # every oracle runs on the wrong corpus) and demote a real data-dir
    # arg to a filter (bare relative name without top-level parquet).
    # Positional args are filters, full stop; anything path-shaped among
    # them is rejected loudly instead of guessed at.
    sf_dir = "/root/testdata/sf0.001"
    if "--dir" in args:
        i = args.index("--dir")
        if i + 1 >= len(args):
            print("ERROR: --dir needs a value "
                  "(pass the data directory with --dir SF_DIR)")
            return 2
        sf_dir = args[i + 1]
        del args[i : i + 2]
    filters = args
    pathlike = [a for a in filters if "/" in a or os.path.isdir(a)]
    if pathlike:
        print(f"ERROR: positional args are name filters, not paths: {pathlike}")
        print("(pass the data directory with --dir SF_DIR)")
        return 2
    if filters:
        dead = [f for f in filters if not any(f in n for n in ORACLES)]
        if dead:
            print(f"ERROR: name filter(s) match no oracle-paired query: {dead}")
            print("(filters are plain substrings, one per argument — not regex)")
            return 2
    names = [n for n in ORACLES if not filters or any(f in n for f in filters)]
    print(f"# stressing {len(names)} oracles x {reps} reps on {sf_dir}")
    con = duckdb_connection(sf_dir)
    unstable = 0
    for name in names:
        sql = ORACLES[name]
        t0 = time.time()
        baseline = None
        diverged = errors = 0
        first_detail = ""
        for _ in range(reps):
            try:
                got = _normalize(con.sql(sql).df())
            except Exception as e:  # noqa: BLE001
                errors += 1
                if not first_detail:
                    first_detail = f"{type(e).__name__}: {e}"
                continue
            if baseline is None:
                baseline = got
            elif not baseline.equals(got):
                diverged += 1
                if not first_detail:
                    # A nondeterministic oracle may change its ROW COUNT
                    # across reps — the exact class this tool hunts — and
                    # elementwise != raises on differently-shaped frames,
                    # which would crash the audit instead of reporting
                    # UNSTABLE (ADVICE r10). Mirror oracle.check_parity's
                    # shape check before comparing values.
                    if (
                        baseline.shape != got.shape
                        or not baseline.index.equals(got.index)
                        or not baseline.columns.equals(got.columns)
                    ):
                        first_detail = (
                            f"shape run1={baseline.shape} later={got.shape}"
                        )
                    else:
                        neq = (baseline != got).any(axis=1)
                        idx = neq[neq].index[:1].tolist()
                        first_detail = "; ".join(
                            f"row {i}: run1={baseline.loc[i].to_dict()}"
                            f" later={got.loc[i].to_dict()}"
                            for i in idx
                        )
        dt = time.time() - t0
        if diverged or errors or baseline is None:
            unstable += 1
            print(
                f"✗ UNSTABLE  {name}: {diverged} divergent,"
                f" {errors} errors / {reps} reps  ({dt:.1f}s)"
                f"  {first_detail[:300]}"
            )
        else:
            print(f"✓ stable    {name}: {reps}/{reps} identical  ({dt:.1f}s)")
    print(f"\n{'ALL STABLE' if unstable == 0 else f'{unstable} UNSTABLE'}")
    return 1 if unstable else 0


if __name__ == "__main__":
    sys.exit(main())
