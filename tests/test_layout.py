"""Z-order layout key: plan gate + the locality property that justifies
the operator — a narrow filter on EITHER dimension touches a bounded
fraction of z-buckets, where a single-dimension sort layout only serves
its own dimension."""

from __future__ import annotations

from kafka_streams_join_spark.plans.inspect import assert_no_wide_shuffle, explain_str
from tests.conftest import SF_SMOKE


def test_zorder_is_map_side_projection(spark):
    """The only Exchanges are the 1-row stats aggregate + its broadcast;
    the data path itself is never hash/range-repartitioned."""
    from kafka_streams_join_spark.queries.layout import layout_zorder_key

    df = layout_zorder_key(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "Exchange hashpartitioning" not in plan, plan[:1500]
    assert "Exchange rangepartitioning" not in plan, plan[:1500]
    assert_no_wide_shuffle(df, col="o_orderdate")


def test_zorder_prunes_both_dimensions(spark):
    """The layout claim, measured: under a z-ordered layout (rows grouped
    by zbucket), a narrow o_custkey range touches a small fraction of
    buckets, while under a date-sorted layout (buckets = day >> 4) the
    same filter touches nearly everything. And symmetrically, a narrow
    date range is ALSO bounded under z-order — one layout serving both
    predicates is the whole point."""
    from kafka_streams_join_spark.queries.layout import layout_zorder_key

    rows = layout_zorder_key(spark, SF_SMOKE).collect()
    zbuckets = {r["zbucket"] for r in rows}
    datebuckets = {r["dday"] >> 4 for r in rows}

    cust_slice = [r for r in rows if 100 <= r["o_custkey"] < 120]
    assert cust_slice
    z_frac = len({r["zbucket"] for r in cust_slice}) / len(zbuckets)
    date_frac = len({r["dday"] >> 4 for r in cust_slice}) / len(datebuckets)
    assert z_frac < 0.5 < date_frac  # z prunes, date-sort cannot

    day_slice = [r for r in rows if 400 <= r["dday"] < 500]
    assert day_slice
    z_frac_day = len({r["zbucket"] for r in day_slice}) / len(zbuckets)
    assert z_frac_day < 0.5  # the SAME layout also prunes the date range
