"""Round-7 wave-5 property tests: invariants the oracle hash can't
express — conservation laws, bound checks, merge laws, and Python
recomputation differentials — for the concentration/cadence analytics,
the SQL-surface additions, the linear-counting sketch, and the
passage-containment report.
"""

from __future__ import annotations

from kafka_streams_join_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# --------------------------------------------------------------------------
# events: bounce rate / autocorrelation / drawdown
# --------------------------------------------------------------------------


def test_bounce_rate_histogram_conserves_sessions(spark):
    """Buckets are exactly {1..5}, shares are ≤1e6 and sum to 1e6 within
    the per-bucket truncation slack, and the session total matches an
    independent sessionization (sessionize_events' max session_seq summed
    over users)."""
    rows = QUERIES["events_bounce_rate"](spark, SF).collect()
    assert {r["events_in_session"] for r in rows} <= {1, 2, 3, 4, 5}
    total = sum(r["n_sessions"] for r in rows)
    share = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= share <= 1_000_000
    sess = QUERIES["sessionize_events"](spark, SF)
    import pyspark.sql.functions as F

    n_sessions = (
        sess.groupBy("user_id")
        .agg(F.max("session_seq").alias("m"))
        .agg(F.sum("m"))
        .collect()[0][0]
    )
    assert total == n_sessions


def test_autocorr_is_a_correlation(spark):
    """|r| ≤ 1 (Cauchy–Schwarz on the shared-variance normalization) and
    n_days matches the distinct observed days per type."""
    import pyspark.sql.functions as F

    rows = QUERIES["events_autocorr_daily"](spark, SF01).collect()
    days = {
        r["event_type"]: r["nd"]
        for r in spark.read.parquet(f"{SF01}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct(F.col("ts").cast("date")).alias("nd"))
        .collect()
    }
    for r in rows:
        assert r["n_days"] == days[r["event_type"]]
        for c in ("r_lag1", "r_lag7"):
            if r[c] is not None:
                assert -1.0 <= r[c] <= 1.0, (r["event_type"], c, r[c])


def test_drawdown_matches_python_recompute(spark):
    """Exact-integer differential: recompute the running-extrema
    excursions from the daily milli sums in Python."""
    import pyspark.sql.functions as F

    daily = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.expr("cast(round(value * 1000) as bigint)")).alias("v")
        )
        .collect()
    )
    series: dict[str, list[tuple]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["v"]))
    expect = {}
    for et, pairs in series.items():
        pairs.sort()
        vs = [v for _, v in pairs]
        n, total = len(vs), sum(vs)
        c = 0
        mn = mx = None
        up = down = 0
        for v in vs:
            c += n * v - total
            mn = c if mn is None else min(mn, c)
            mx = c if mx is None else max(mx, c)
            up = max(up, c - mn)
            down = max(down, mx - c)
        expect[et] = (n, up // n, down // n)
    rows = QUERIES["events_value_drawdown"](spark, SF).collect()
    got = {
        r["event_type"]: (
            r["n_days"],
            r["max_upswing_milli"],
            r["max_drawdown_milli"],
        )
        for r in rows
    }
    assert got == expect


# --------------------------------------------------------------------------
# orders: pareto / churn / month-over-month
# --------------------------------------------------------------------------


def test_pareto_deciles_conserve_and_order(spark):
    """Deciles are 1..10, customer counts sum to the repeat+single
    customer total, cumulative share is monotone and ends ≤1e6 (within
    truncation), Gini ∈ [0, 1e6), and decile-1 mean revenue ≥ decile-10
    mean revenue (desc-rank deciles)."""
    rows = sorted(
        QUERIES["orders_pareto_share"](spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == 10
    import pyspark.sql.functions as F

    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .agg(F.countDistinct("o_custkey"))
        .collect()[0][0]
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    cums = [r["cum_share_ppm"] for r in rows]
    assert all(a <= b for a, b in zip(cums, cums[1:]))
    assert 1_000_000 - 10 <= cums[-1] <= 1_000_000
    g = rows[0]["gini_ppm"]
    assert 0 <= g < 1_000_000
    assert all(r["gini_ppm"] == g for r in rows)
    mean1 = rows[0]["decile_dollars"] / rows[0]["n_customers"]
    mean10 = rows[-1]["decile_dollars"] / rows[-1]["n_customers"]
    assert mean1 >= mean10


def test_churn_flag_consistent_with_ratio(spark):
    """at_risk must equal the cross-multiplied overdue comparison
    recomputed from the row's own reported columns."""
    for r in QUERIES["orders_churn_risk"](spark, SF).collect():
        assert r["n_orders"] >= 2
        lhs = r["days_since_last"] * (r["n_orders"] - 1)
        expect = 1 if lhs > 2 * r["span_days"] else 0
        assert r["at_risk"] == expect, dict(r.asDict())
        assert r["overdue_ppm"] == lhs * 1_000_000 // max(r["span_days"], 1)


def test_mom_growth_matches_python_recompute(spark):
    """Recompute both lags from the month series in Python (6-dp round)."""
    rows = sorted(
        QUERIES["orders_mom_growth"](spark, SF).collect(),
        key=lambda r: r["ym"],
    )
    cents = [r["rev_cents"] for r in rows]
    for i, r in enumerate(rows):
        for lag, col in ((1, "mom_growth"), (12, "yoy_growth")):
            if i < lag:
                assert r[col] is None
            else:
                expect = round((cents[i] - cents[i - lag]) / cents[i - lag], 6)
                assert abs(r[col] - expect) < 1e-9, (r["ym"], col)


# --------------------------------------------------------------------------
# dq_iqr_outliers
# --------------------------------------------------------------------------


def test_iqr_fences_ordered_and_counts_bounded(spark):
    rows = QUERIES["dq_iqr_outliers"](spark, SF).collect()
    assert {r["col_name"] for r in rows} == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    }
    n = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    for r in rows:
        assert r["lo_fence"] <= r["q1"] <= r["q3"] <= r["hi_fence"]
        assert abs((r["q3"] - r["q1"]) - r["iqr"]) < 1e-6
        assert 0 <= r["n_below"] + r["n_above"] < n


# --------------------------------------------------------------------------
# SQL surface: bitwise / FILTER aggregates / multiset set ops
# --------------------------------------------------------------------------


def test_bitwise_matches_python(spark):
    for r in QUERIES["scalar_bitwise_funcs"](spark, SF).limit(200).collect():
        k = r["key_id"]
        assert r["band"] == k & 255
        assert r["bor"] == k | 4096
        assert r["bxor"] == k ^ 1365
        assert r["shl"] == (k & 1023) << 3
        assert r["shr"] == k >> 2
        assert r["bcount"] == bin(k).count("1")


def test_filtered_aggregates_bounded_by_group(spark):
    for r in QUERIES["agg_filtered_aggregates"](spark, SF).collect():
        assert 0 <= r["n_highdisc"] <= r["n_rows"]
        assert r["qty_early"] >= 0
        assert r["rev_cents_highdisc"] >= 0
        assert r["n_parts_bulk"] >= 0


def test_set_ops_all_multiset_conservation(spark):
    """|A ∩all B| + |A \\all B| = |A| — the bag-semantics identity the
    DISTINCT variants violate."""
    import pyspark.sql.functions as F

    rows = (
        QUERIES["set_ops_all"](spark, SF)
        .groupBy("op")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_op = {r["op"]: r["n"] for r in rows}
    n_a = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_shipdate") < F.to_timestamp(F.lit("1995-06-01")))
        .count()
    )
    assert by_op.get("intersect_all", 0) + by_op.get("except_all", 0) == n_a


# --------------------------------------------------------------------------
# sketch_linear_counting — exact merge law
# --------------------------------------------------------------------------


def test_linear_counting_merge_law_is_exact(spark):
    """The __all__ scope's bit set must be EXACTLY the union of the
    per-type bit sets (computed independently here), and the estimator
    must dominate the raw bit count (m·ln(m/(m−b)) ≥ b)."""
    import pyspark.sql.functions as F

    from kafka_streams_join_spark.queries.sketches import _LC_BUCKET_SPARK

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", F.expr(_LC_BUCKET_SPARK).alias("b")
    )
    sets: dict[str, set] = {}
    for r in ev.distinct().collect():
        sets.setdefault(r["event_type"], set()).add(r["b"])
    union = set().union(*sets.values())
    rows = {r["scope"]: r for r in QUERIES["sketch_linear_counting"](spark, SF).collect()}
    assert rows["__all__"]["n_bits_set"] == len(union)
    for et, s in sets.items():
        assert rows[et]["n_bits_set"] == len(s)
    for r in rows.values():
        assert r["n_bits_set"] <= r["exact_distinct"]
        assert r["est_milli"] >= r["n_bits_set"] * 1000


# --------------------------------------------------------------------------
# retrieval_pr_at_k — harmonic-mean bounds
# --------------------------------------------------------------------------


def test_pr_at_k_harmonic_bounds(spark):
    from kafka_streams_join_spark.queries.similarity import TOP_K

    for r in QUERIES["retrieval_pr_at_k"](spark, SF).collect():
        p, rr, f1 = r["precision_ppm"], r["recall_ppm"], r["f1_ppm"]
        assert p == r["n_rel_top"] * 1_000_000 // TOP_K
        assert 0 <= f1 <= 1_000_000
        if p + rr > 0:
            assert f1 <= 2 * min(p, rr)
            assert f1 <= (p + rr) // 2 + 1
        else:
            assert f1 == 0


# --------------------------------------------------------------------------
# dedup_passage_containment
# --------------------------------------------------------------------------


def test_containment_first_doc_is_clean_and_bounded(spark):
    """n_contained ≤ n_windows; the lowest doc_id with any window has
    containment 0 (nothing earlier exists to contain it)."""
    rows = QUERIES["dedup_passage_containment"](spark, SF).collect()
    assert rows
    first = min(rows, key=lambda r: r["doc_id"])
    assert first["n_contained"] == 0 and first["containment_ppm"] == 0
    for r in rows:
        assert 0 <= r["n_contained"] <= r["n_windows"]
        assert r["containment_ppm"] == r["n_contained"] * 1_000_000 // r["n_windows"]
