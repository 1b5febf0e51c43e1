#!/usr/bin/env python
"""Headline benchmark — the driver's per-round feedback loop (BASELINE.md).

Runs the full registered query set at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints TWO JSON lines:
a compact (<200 char) ``{"metric", "value", "unit", "sf", "n_queries"}``
summary first, then the full
``{"queries": {...}, "spread": {...}, "metric", "value", "unit", "sf"}``
line with the headline fields LAST — so both a head-capture and a
tail-capture of the output recover the headline value.

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
# skipped (earlier rounds) but never renamed (comparability). ``value`` sums
# ONLY this set — the 12 queries BASELINE.md holds numbers for — so the
# headline ratio stays an apples-to-apples round-over-round comparison.
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

# Measured and reported in ``queries`` but excluded from ``value`` (no
# BASELINE row): the ANN path next to its brute-force baseline — the
# bucketed-beats-exact scale story under measurement, not assertion — and
# the bounded near-dup candidate stages reworked this round.
EXTRA = [
    "sim_lsh_ann_topk",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    # round-3 additions
    "text_repetition_stats",
    "text_pii_scrub",
    "cluster_kmeans_embeddings",
    "sim_pq_topk",
    # round-4 additions
    "sim_ivfpq_topk",
    "sim_ivfpq_residual_topk",
    "dedup_duplicate_passages",
    "text_remove_duplicate_passages",
    "dedup_semantic",
    # round-4b retrieval & data selection
    "sim_sq_topk",
    "text_bm25_search",
    "pipeline_importance_resample",
    "quality_classifier_logreg",
    "dedup_ngram_prefix_filter",
    "layout_zorder_key",
    "text_bpe_merge_mining",
    "pipeline_weighted_sample",
    "events_funnel_conversion",
    "events_cohort_retention",
    "events_scd2_history",
    "dq_constraint_checks",
    "pipeline_curation_funnel",
    # round-4c: incremental probe, training-order shuffle, bigram LM
    "dedup_incremental_minhash",
    "pipeline_global_shuffle",
    "text_bigram_surprisal",
    "dedup_fuzzy_edit_distance",
    "text_char_entropy",
    "pipeline_group_holdout_split",
    "retrieval_hybrid_rrf",
    "dq_table_profile",
    "pipeline_token_budget_plan",
    "events_markov_transitions",
    "text_pmi_collocations",
    "agg_incremental_merge",
    "sim_recall_report",
    "dedup_normalized_exact",
    "layout_compaction_plan",
]

# Coverage tier: every registered query not already in HEADLINE/EXTRA, so
# BENCH_r{N} rows exist for the whole registry. DERIVED from the registry at
# runtime (round 6) — a hand-maintained list silently drops future
# registrations, the same curated-list drift that caused the round-4
# explain-audit coverage gap. Measured with one warm-up + one timed run
# (RUNS_COVERAGE) to bound total bench wall-clock; the heavy hitters
# already live in EXTRA with full best-of-3 spreads.
COVERAGE = sorted(set(QUERIES) - set(HEADLINE) - set(EXTRA))


def run_streaming_bench(spark, sf_dir: str) -> dict[str, dict[str, float]]:
    """Replay the events table through the certified streaming topologies
    and measure input rows/sec: views ⋈ clicks interval join (inner) and
    the timeout (absence) join. File source (parquet replay shards) →
    noop sink, one availableNow pass — the same topology objects the
    golden-scenario tests certify (streaming/topology.py:47,83)."""
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from kafka_streams_join_spark.operators.interval_join import JoinWindow
    from kafka_streams_join_spark.sources.parquet import load_table
    from kafka_streams_join_spark.streaming.topology import (
        stream_interval_join,
        stream_timeout_join,
    )

    root = tempfile.mkdtemp(prefix="bench-stream-")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            F.col("user_id").cast("string").alias("key"),
            F.col("event_type").alias("value"),
            "ts",
        )
        counts = {}
        for name, typ in (("views", "view"), ("clicks", "click")):
            side = ev.filter(F.col("value") == typ)
            counts[name] = side.count()
            # 8 replay shards ≈ 8 source splits per micro-batch
            side.repartition(8).write.mode("overwrite").parquet(
                os.path.join(root, name)
            )
        schema = "key string, value string, ts timestamp"

        def replay(name: str):
            return (
                spark.readStream.schema(schema)
                .parquet(os.path.join(root, name))
            )

        window = JoinWindow(after="30 minutes")
        topos = {
            "stream_interval_join": lambda: stream_interval_join(
                replay("views"), replay("clicks"), window=window
            ),
            "stream_timeout_join": lambda: stream_timeout_join(
                replay("views"), replay("clicks"), window=window
            ),
        }
        out: dict[str, dict[str, float]] = {}
        rows_in = counts["views"] + counts["clicks"]
        for name, make in topos.items():
            t0 = _time.perf_counter()
            q = (
                make()
                .writeStream.format("noop")
                .option(
                    "checkpointLocation", os.path.join(root, f"ckpt-{name}")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            sec = _time.perf_counter() - t0
            out[name] = {
                "rows_in": rows_in,
                "sec": round(sec, 3),
                "rps": int(rows_in / sec),
            }
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


RUNS_PER_QUERY = 3  # best-of-3: run 1 warms code paths; the min of the rest
# rides out transient co-tenant noise (observed >30% machine-level swings
# between identical runs minutes apart)
RUNS_COVERAGE = 2  # coverage tier: one warm-up + one timed run
RUNS_HEADLINE = 5  # headline tier (round 14): best-of-2 on sub-second
# queries measured the JVM, not the plan — r13's four runs spanned
# 6.43-8.39 s on identical code. Five runs per headline query pulls the
# per-query min to the true plan cost (co-tenant noise only ever inflates),
# and the warm-run median is reported beside it as value_med.

# Declared noise band (round 14, BASELINE.md "Noise band"): the headline
# total of two bench runs on IDENTICAL code is expected within this
# fraction of each other. Out-of-band moves are flagged loudly; in-band
# moves are run noise and must not be read as regressions or speedups.
NOISE_BAND = 0.25


# Streaming throughput floors (round 14, VERDICT r13 task 7): rows/sec a
# stateful-operator regression (state-store config, watermark plumbing)
# must not cross. Best-of-round has never measured below ~3,900 rows/s
# for either topology (BENCH_HISTORY r7-r13); single runs dip to ~1,200
# under co-tenant bursts, so the floor binds the best-of-round, leaving
# >=1.9x margin over noise while catching any >2x structural collapse.
# Calibrated AT SF0.1 (the driver's bench corpus) — smaller corpora are
# dominated by fixed micro-batch overhead and never compare to the floor.
# Round 15 (VERDICT r14 task 8): ratcheted to ~50% of the round-15
# best-of-round (4448 / 3961 rows/s on the RocksDB state store) — the
# timeout floor stays 2000 because 50% of its best (1980) would LOWER it.
STREAMING_FLOORS = {
    "stream_interval_join": 2200,
    "stream_timeout_join": 2000,
}
STREAMING_FLOOR_SF = 0.1


def streaming_floor_breaches(
    records: list[dict], cur_round: int, floors: dict[str, int] | None = None
) -> dict[str, int]:
    """Best-of-round streaming rps per topology for ``cur_round``, where
    it breaches the declared floor: {topology: best_rps}. Empty dict =
    healthy (or no streaming lines for the round — absence is checked by
    the per-run WARNING, not here)."""
    floors = floors or STREAMING_FLOORS
    best: dict[str, int] = {}
    for rec in records:
        if rec.get("round") != cur_round or rec.get("sf") != STREAMING_FLOOR_SF:
            continue
        for name, m in (rec.get("streaming") or {}).items():
            rps = m.get("rps")
            if isinstance(rps, (int, float)):
                best[name] = max(best.get(name, 0), int(rps))
    return {
        name: rps
        for name, rps in best.items()
        if name in floors and rps < floors[name]
    }


def headline_band(
    records: list[dict], sf_val: float, cur_round: int,
    band: float = NOISE_BAND,
) -> tuple[float | None, float | None, float | None]:
    """Band-edge baseline for the headline total: the previous round's
    best (min) headline value at the same sf, widened by the declared
    noise band. Returns (prev_best, lo, hi); (None, None, None) with no
    prior round. Comparisons against lo/hi — never the point value — are
    the round-over-round contract (round-14 noise-floor fix)."""
    prev_round: int | None = None
    for rec in records:
        if (
            rec.get("sf") == sf_val
            and rec.get("metric") == "headline_total"
            and isinstance(rec.get("round"), int)
            and rec["round"] < cur_round
            and rec.get("value") is not None
        ):
            if prev_round is None or rec["round"] > prev_round:
                prev_round = rec["round"]
    if prev_round is None:
        return None, None, None
    best = min(
        rec["value"]
        for rec in records
        if rec.get("sf") == sf_val
        and rec.get("metric") == "headline_total"
        and rec.get("round") == prev_round
        and rec.get("value") is not None
    )
    return best, round(best * (1 - band), 3), round(best * (1 + band), 3)


def prev_round_baseline(
    lines: list[dict], sf_val: float, cur_round: int
) -> tuple[int | None, dict[str, float]]:
    """Canary baseline: per-query MIN across ALL of the newest previous
    round's history lines at the same sf — not just the last line. A single
    noisy run used to poison the baseline both ways (round-7 observed two
    same-round sf0.1 runs where bursty co-tenant load inflated DISJOINT
    query subsets 2-5x each); min-over-runs is the same best-of policy the
    headline metric already uses, so the canary compares like with like."""
    prev_round: int | None = None
    for rec in lines:
        if rec.get("sf") == sf_val and rec.get("round", 0) < cur_round:
            rnd = rec["round"]
            if prev_round is None or rnd > prev_round:
                prev_round = rnd
    if prev_round is None:
        return None, {}
    prev_q: dict[str, float] = {}
    for rec in lines:
        if rec.get("sf") == sf_val and rec.get("round") == prev_round:
            for name, secs in rec.get("queries", {}).items():
                if name not in prev_q or secs < prev_q[name]:
                    prev_q[name] = secs
    return prev_round, prev_q


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    # JVM warm-up: one tiny action so session startup isn't billed to query 1
    spark.range(1000).count()

    # per-query run spread, reported so a judge can tell co-tenant noise
    # from real drift without a re-run (this host shows multi-x swings)
    spread: dict[str, dict[str, float]] = {}

    def run_best(name: str, make_df, n_runs: int = RUNS_PER_QUERY) -> float:
        runs = []
        for _ in range(n_runs):
            # Cold cache per run: several queries stage a multi-consumer
            # aggregate with persist() (operators/staging.py). Clearing
            # between runs keeps best-of-N measuring the real one-pass
            # pipeline (scan → stage → fan-out) rather than a cache read,
            # so round-over-round numbers compare the same computation —
            # and dead caches from earlier queries can't accumulate.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            # count() forces full evaluation without driver-side row transfer
            make_df().count()
            runs.append(time.perf_counter() - t0)
        # spread over the WARM runs only (runs[1:]): run 1 pays one-time
        # code-path warm-up, and folding it in would report deliberate
        # warm-up cost as co-tenant noise; it is still listed as "cold"
        warm = sorted(runs[1:]) or runs
        # true median (mean of the middle two for even counts): with 2
        # warm runs, warm[len//2] would just repeat max
        mid = len(warm) // 2
        med = warm[mid] if len(warm) % 2 else (warm[mid - 1] + warm[mid]) / 2
        spread[name] = {
            "cold": round(runs[0], 3),
            "min": round(warm[0], 3),
            "med": round(med, 3),
            "max": round(warm[-1], 3),
        }
        # the headline value stays min-over-ALL-runs — the r1-r3 metric —
        # so round-over-round totals remain comparable
        return round(min(runs), 3)

    timings: dict[str, float] = {}
    # Per-query failure isolation (round 9, VERDICT r8 task 2): round 8's
    # single broken registration aborted the whole bench mid-COVERAGE and
    # lost even the already-measured headline timings. One red entry in the
    # output is fail-loud; no output at all is fail-silent. Each failure
    # records its first exception line and the run exits nonzero at the end,
    # but BOTH JSON lines always emit.
    errors: dict[str, str] = {}

    def run_safe(name: str, make_df, n_runs: int = RUNS_PER_QUERY) -> None:
        try:
            timings[name] = run_best(name, make_df, n_runs=n_runs)
        except Exception as exc:  # noqa: BLE001 — isolate ANY query failure
            msg = str(exc).strip()
            first = msg.splitlines()[0][:300] if msg else type(exc).__name__
            errors[name] = first
            print(f"# ERROR {name}: {first}")

    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        run_safe(name, lambda: fn(spark, sf_dir), n_runs=RUNS_HEADLINE)
    for name in EXTRA:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        run_safe(name, lambda: fn(spark, sf_dir))
    for name in COVERAGE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        run_safe(name, lambda: fn(spark, sf_dir), n_runs=RUNS_COVERAGE)

    # Skew micro-bench (reported, not summed): events funneled onto one hot
    # key (~90% of rows), joined to a per-key dim — salted_join spreads the
    # hot key over 16 reducers where the plain join funnels one.
    from pyspark.sql import functions as F  # noqa: E402

    from kafka_streams_join_spark.operators.skew import salted_join  # noqa: E402
    from kafka_streams_join_spark.sources.parquet import load_table  # noqa: E402

    skewed = (
        load_table(spark, sf_dir, "events")
        .withColumn(
            "hot_key",
            F.when(F.col("user_id") % 10 < 9, F.lit(0)).otherwise(F.col("user_id")),
        )
        .select("event_id", "hot_key", "value")
    )
    dim = skewed.groupBy("hot_key").agg(F.count(F.lit(1)).alias("n"))
    run_safe(
        "skew_salted_join",
        lambda: salted_join(skewed, dim, on="hot_key", buckets=16),
    )

    # Streaming throughput (round 7, VERDICT r6 task 7): the reference's
    # core capability is stream-stream join; batch has 200+ tracked numbers,
    # streaming had zero. Replay the events table through the two certified
    # topologies (file source -> noop sink, availableNow) and record
    # rows/sec. Correctness of these exact topologies is pytest-certified
    # (golden scenarios); this line tracks only their throughput. Timeout
    # join emits on watermark passage, so its OUTPUT at end-of-replay is
    # partial by design — input rows/sec is the metric. Disable with
    # SPARK_GRAFT_BENCH_STREAMING=0.
    streaming: dict[str, dict[str, float]] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_STREAMING", "1") != "0":
        try:
            streaming = run_streaming_bench(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001 — same isolation contract
            msg = str(exc).strip()
            first = msg.splitlines()[0][:300] if msg else type(exc).__name__
            errors["_streaming"] = first
            print(f"# ERROR _streaming: {first}")
        for name, m in streaming.items():
            print(f"# STREAMING {name}: {m['rows_in']} rows in "
                  f"{m['sec']}s = {m['rps']} rows/s")
            floor = STREAMING_FLOORS.get(name)
            if floor and sf_dir.rstrip("/").endswith("sf0.1") and m["rps"] < floor:
                print(
                    f"WARNING: {name} at {m['rps']} rows/s is below the "
                    f"declared floor {floor} rows/s (BASELINE.md); if the "
                    f"round's BEST run also breaches, a stateful-operator "
                    f"regression landed"
                )

    # A failed HEADLINE query must not silently deflate the headline sum —
    # a round-over-round file diff would misread the error as a speedup
    # (ADVICE r9). The sum is only meaningful when every HEADLINE query
    # timed; otherwise the headline value is null and headline_complete
    # says why.
    # The `n in QUERIES` exemption exists ONLY for trimmed-registry test
    # runs, which declare themselves with SPARK_GRAFT_BENCH_TRIMMED=1 — a
    # DEDICATED flag, not NO_HISTORY (ADVICE r11): NO_HISTORY legitimately
    # also means "don't append to the ledger" (read-only checkouts, ad-hoc
    # runs), and overloading it silently disabled this incompleteness
    # guard on such production runs. In a production run a HEADLINE name
    # absent from the registry is itself an incompleteness — a renamed/
    # retired headline query silently dropped from the sum would recreate
    # the deflated-headline misread (ADVICE r10).
    _trimmed_run = os.environ.get("SPARK_GRAFT_BENCH_TRIMMED", "0") == "1"
    headline_missing = [
        n
        for n in HEADLINE
        if (n in QUERIES or not _trimmed_run) and n not in timings
    ]
    headline_complete = not headline_missing
    baseline_total = (
        round(sum(timings[n] for n in HEADLINE if n in timings), 3)
        if headline_complete
        else None
    )
    # Secondary stable metric (round 14): sum of per-query warm MEDIANS
    # over the headline set. The min-sum stays the headline (comparable
    # back to r1); the median-sum moves less under co-tenant load, so a
    # real regression separates from noise faster in a file diff.
    headline_median_total = (
        round(sum(spread[n]["med"] for n in HEADLINE if n in spread), 3)
        if headline_complete
        else None
    )
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    # Two lines, truncation-robust both ways (round-4 lesson: a 2000-char
    # tail capture of the single long line lost the headline value):
    #  1. a compact (<200 char) summary line FIRST — survives head capture;
    #  2. the full per-query contract line, with the headline fields placed
    #     LAST in the object — survives tail capture.
    compact = {
        "metric": "headline_total",
        "value": baseline_total,
        "value_med": headline_median_total,
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
    }
    if errors:
        compact["n_errors"] = len(errors)
    if not headline_complete:
        compact["headline_complete"] = False
    print(json.dumps(compact))
    # Append to the checked-in history (round 6): round-over-round
    # comparison becomes a file diff instead of a judge re-run. The round
    # tag comes from $SPARK_GRAFT_BENCH_ROUND when set (ADVICE round 6: a
    # re-run AFTER a round's end-of-round CORRECTNESS snapshot lands would
    # otherwise be inferred into the NEXT round); the fallback inference
    # reads the newest checked-in CORRECTNESS_r{N}.json (written at the END
    # of round N, so a bench during round N+1 sees N). Multiple runs per
    # round simply append; readers take the last line per (round, sf).
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    records: list[dict] = []
    try:
        with open(os.path.join(here, "BENCH_HISTORY.jsonl")) as f:
            for line in f:
                try:
                    records.append(json.loads(line))
                except ValueError:
                    continue
    except OSError:
        pass
    env_round = os.environ.get("SPARK_GRAFT_BENCH_ROUND", "")
    if env_round.isdigit():
        cur_round = int(env_round)
        round_source = "env"
    else:
        # Untagged runs are the DRIVER's, which benches at the END of round
        # N — after the builder's env-tagged round-N lines, and (r9 lesson)
        # possibly after CORRECTNESS_r{N}.json has landed, so inferring
        # from CORRECTNESS would shift the line into round N+1 and hand the
        # next round's regression canary a co-tenant-loaded "baseline" for
        # itself. Adopt the newest round already in the history instead
        # (the builder always tags its runs, §5.2 checklist); CORRECTNESS
        # inference remains only as the empty-history bootstrap.
        hist_rounds = [
            r["round"] for r in records if isinstance(r.get("round"), int)
        ]
        if hist_rounds:
            cur_round = max(hist_rounds)
            round_source = "history"
        else:
            rounds = [
                int(m.group(1))
                for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
                if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
            ]
            cur_round = max(rounds) + 1 if rounds else 1
            round_source = "correctness"

    # Quadratic-blowup canary (round 7, VERDICT r6 task 4): the sf0.1-only
    # bench hid graph_common_neighbors' Σdeg² wedge stage until a COVERAGE
    # run surfaced it. Diff against the previous round's best-of-runs
    # baseline at the SAME sf (prev_round_baseline): print the top-5
    # slowest queries this run, and a fail-loud WARNING line for any query
    # regressing >2x round-over-round.
    # Band-edge headline comparison (round 14): the declared noise band is
    # the contract — a headline move INSIDE [lo, hi] of the previous
    # round's best is run noise; only an out-of-band move is a finding.
    prev_best, band_lo, band_hi = headline_band(records, sf_val, cur_round)
    if prev_best is not None and baseline_total is not None:
        print(
            f"# HEADLINE BAND r{cur_round}: {baseline_total:.3f}s vs prev "
            f"best {prev_best:.3f}s, band [{band_lo:.3f}, {band_hi:.3f}] "
            f"(+/-{int(NOISE_BAND * 100)}%)"
        )
        if baseline_total > band_hi:
            print(
                f"WARNING: headline_total {baseline_total:.3f}s is ABOVE the "
                f"noise band hi {band_hi:.3f}s — investigate before reading "
                f"this as co-tenant noise"
            )
        elif baseline_total < band_lo:
            print(
                f"# NOTE: headline_total {baseline_total:.3f}s is BELOW the "
                f"noise band lo {band_lo:.3f}s — a real speedup (or a query "
                f"silently doing less work; check per-query rows)"
            )

    prev_round, prev_q = prev_round_baseline(records, sf_val, cur_round)
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    for name, secs in slowest:
        prev = prev_q.get(name)
        ratio = round(secs / prev, 2) if prev else None
        print(
            f"# SLOWEST {name}: {secs:.2f}s"
            + (f" (r{prev_round}: {prev:.2f}s, x{ratio})" if prev else " (new)")
        )
    for name, secs in sorted(timings.items()):
        prev = prev_q.get(name)
        if prev and prev > 0.2 and secs > 2 * prev:
            print(
                f"WARNING: {name} regressed x{secs / prev:.1f} "
                f"round-over-round ({prev:.2f}s -> {secs:.2f}s at sf={sf_val})"
            )

    # Make an inferred (untagged) round attribution visible in the
    # transcript so a misattributed run is catchable (ADVICE r10: nothing
    # enforces the builder-always-tags assumption).
    if round_source != "env":
        print(f"# ROUND inferred as r{cur_round} (source={round_source}; "
              f"set SPARK_GRAFT_BENCH_ROUND to tag explicitly)")
    history = dict(compact, round=cur_round, round_source=round_source,
                   queries=timings, spread=spread,
                   streaming=streaming, errors=errors)
    # Tests exercise main() on trimmed registries; their runs must not
    # append bogus rounds to the checked-in ledger.
    if os.environ.get("SPARK_GRAFT_BENCH_NO_HISTORY", "0") != "1":
        try:
            with open(os.path.join(here, "BENCH_HISTORY.jsonl"), "a") as f:
                f.write(json.dumps(history) + "\n")
        except OSError:
            pass  # read-only checkout: the printed lines remain the contract
    print(
        json.dumps(
            {
                "queries": timings,
                "streaming": streaming,
                "spread": spread,
                "errors": errors,
                "headline_complete": headline_complete,
                "metric": "headline_total",
                "value": baseline_total,
                "value_med": headline_median_total,
                "unit": "sec",
                "sf": sf_val,
            }
        )
    )
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
