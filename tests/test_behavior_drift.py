"""Attribution / RFM / drift / CUSUM semantics on planted rows.

Each operator's fixture-level correctness is hash-checked by the oracle
gate (tools/verify_local.py); these tests pin the SEMANTICS on small
constructed inputs where the right answer is computable by hand.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


# ---------------------------------------------------------------------------
# attribution
# ---------------------------------------------------------------------------


def _attribution_on(spark, rows):
    """Run the events_attribution pipeline on a constructed events frame."""
    from trafsys_data_transfer_spark.plans import behavior
    from trafsys_data_transfer_spark.sources import fixtures

    df = spark.createDataFrame(rows)
    orig = fixtures.load_table
    try:
        fixtures.load_table = lambda _s, _d, name: df
        behavior.load_table = fixtures.load_table
        return behavior.events_attribution(spark, "unused")
    finally:
        fixtures.load_table = orig
        behavior.load_table = orig


def _ev(eid, uid, etype, ts):
    return Row(event_id=eid, user_id=uid, event_type=etype, ts=ts,
               value=0.0, props="{}")


def test_attribution_linear_credits_sum_to_1e6_per_conversion(spark):
    # user 1: two touches (view then click) inside 24 h, one purchase.
    rows = [
        _ev(1, 1, "view", _ts(1, 8)),
        _ev(2, 1, "click", _ts(1, 9)),
        _ev(3, 1, "purchase", _ts(1, 10)),
        # user 2: three views -> purchase (1e6 not divisible by 3: floor
        # share 333333, remainder 1 goes to the most recent touch).
        _ev(4, 2, "view", _ts(2, 8)),
        _ev(5, 2, "view", _ts(2, 9)),
        _ev(6, 2, "view", _ts(2, 9, 30)),
        _ev(7, 2, "purchase", _ts(2, 10)),
        # user 3: touch OUTSIDE the 24 h lookback -> no credit at all.
        _ev(8, 3, "view", _ts(1, 8)),
        _ev(9, 3, "purchase", _ts(3, 8)),
    ]
    out = {r["channel"]: r for r in _attribution_on(spark, rows).collect()}
    # user1: view 500000, click 500000 + last-touch conv.
    # user2: views 333333+333333+(333333+1 to most recent).
    assert out["click"]["last_touch_convs"] == 1
    assert out["view"]["last_touch_convs"] == 1
    assert out["click"]["linear_credit_ppm"] == 500_000
    assert out["view"]["linear_credit_ppm"] == 500_000 + 999_999 + 1
    total = sum(r["linear_credit_ppm"] for r in out.values())
    assert total == 2_000_000  # exactly 1e6 per attributed conversion


def test_attribution_touch_at_conversion_instant_excluded(spark):
    # touch_ts < conv_ts is strict: a simultaneous event earns nothing.
    rows = [
        _ev(1, 1, "click", _ts(1, 10)),
        _ev(2, 1, "purchase", _ts(1, 10)),
    ]
    assert _attribution_on(spark, rows).count() == 0


# ---------------------------------------------------------------------------
# RFM
# ---------------------------------------------------------------------------


def test_rfm_segments_cover_all_customers_and_scores_in_range(spark, sf_dir):
    from trafsys_data_transfer_spark.plans.behavior import orders_rfm_segments
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    seg = orders_rfm_segments(spark, sf_dir).collect()
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in seg) == n_cust
    for r in seg:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5


# ---------------------------------------------------------------------------
# drift
# ---------------------------------------------------------------------------


def test_drift_chi2_zero_on_identical_distributions(spark):
    """Same per-bin shares in both periods -> every contribution 0 and no
    drift flags."""
    from trafsys_data_transfer_spark.operators import drift

    rows = []
    okey = 0
    d_a = dt.datetime(1996, 1, 1)
    d_b = dt.datetime(1999, 1, 1)
    for d in (d_a, d_b):
        for price in (10_000.0, 60_000.0, 60_000.0, 120_000.0):
            okey += 1
            rows.append(Row(o_orderkey=okey, o_custkey=1, o_orderstatus="F",
                            o_totalprice=price, o_orderdate=d,
                            o_orderpriority="1-URGENT"))
    df = spark.createDataFrame(rows)
    orig = drift.load_table
    try:
        drift.load_table = lambda _s, _d, name: df
        out = drift.orders_drift_chi2(spark, "unused").collect()
    finally:
        drift.load_table = orig
    assert len(out) == 3
    for r in out:
        assert r["chi2_contrib_ppm"] == 0
        assert not r["drifted"]
        assert r["a_ppm"] == r["b_ppm"]


def test_drift_chi2_flags_shifted_bin(spark):
    from trafsys_data_transfer_spark.operators import drift

    rows = []
    okey = 0
    # period A: all mass in bin 0; period B: all mass in bin 2.
    for _ in range(10):
        okey += 1
        rows.append(Row(o_orderkey=okey, o_custkey=1, o_orderstatus="F",
                        o_totalprice=10_000.0,
                        o_orderdate=dt.datetime(1996, 1, 1),
                        o_orderpriority="1-URGENT"))
        okey += 1
        rows.append(Row(o_orderkey=okey, o_custkey=1, o_orderstatus="F",
                        o_totalprice=110_000.0,
                        o_orderdate=dt.datetime(1999, 1, 1),
                        o_orderpriority="1-URGENT"))
    df = spark.createDataFrame(rows)
    orig = drift.load_table
    try:
        drift.load_table = lambda _s, _d, name: df
        out = {r["price_bin"]: r for r in
               drift.orders_drift_chi2(spark, "unused").collect()}
    finally:
        drift.load_table = orig
    assert out[0]["drifted"] and out[2]["drifted"]
    # total disjoint shift: contribution = (1e6)^2 / 1e6 = 1e6 per bin
    assert out[0]["chi2_contrib_ppm"] == 1_000_000
    assert out[2]["chi2_contrib_ppm"] == 1_000_000


# ---------------------------------------------------------------------------
# CUSUM
# ---------------------------------------------------------------------------


def _cusum_on(spark, rows):
    from trafsys_data_transfer_spark.operators import drift

    df = spark.createDataFrame(rows)
    orig = drift.load_table
    try:
        drift.load_table = lambda _s, _d, name: df
        return drift.events_cusum_changepoints(
            spark, "unused"
        ).collect()
    finally:
        drift.load_table = orig


def _hourly_events(eid0, etype, day0, hours, per_hour):
    rows = []
    eid = eid0
    for i in range(hours):
        base = dt.datetime(2024, 1, day0) + dt.timedelta(hours=i)
        for j in range(per_hour):
            eid += 1
            rows.append(_ev(eid, 1, etype, base + dt.timedelta(minutes=j)))
    return rows


def test_cusum_flat_series_has_no_changepoints(spark):
    rows = _hourly_events(0, "view", 1, 48, 3)
    assert _cusum_on(spark, rows) == []


def test_cusum_detects_sustained_level_shift(spark):
    # 48 flat hours at 2/h, then 24 hours at 12/h: the shift accumulates
    # and must cross the 5-sigma limit; the flat prefix alone must not.
    rows = _hourly_events(0, "view", 1, 48, 2)
    rows += _hourly_events(10_000, "view", 3, 24, 12)
    out = _cusum_on(spark, rows)
    assert out, "sustained shift not detected"
    shift_start = dt.datetime(2024, 1, 3)
    first_flag_hour = min(r["epoch_hour"] for r in out)
    assert first_flag_hour >= int(shift_start.timestamp()) // 3600
    # running statistic is non-decreasing through the sustained shift
    svals = [r["cusum_scaled"] for r in
             sorted(out, key=lambda r: r["epoch_hour"])]
    assert svals == sorted(svals)


def test_time_to_convert_approx_within_tolerance_of_exact(spark, sf_dir):
    """VERDICT r06 task 5 / r08 task 3: the approx_percentile scale tier
    tracks the exact nearest-rank twin — counts/min/max exact, and the
    strict certificate booleans (approx percentile within 5% of exact,
    computed in-query) hold TRUE."""
    from trafsys_data_transfer_spark.registry import all_queries

    q = all_queries()
    exact = q["events_time_to_convert"].build(spark, sf_dir).first()
    approx = q["events_time_to_convert_approx"].build(spark, sf_dir).first()
    assert approx["n_converters"] == exact["n_converters"]
    assert approx["min_sec"] == exact["min_sec"]
    assert approx["max_sec"] == exact["max_sec"]
    assert approx["p50_within_tol"] and approx["p90_within_tol"]


def test_sliding_active_users_hll_within_tolerance_of_exact(spark, sf_dir):
    """The HLL tier emits the SAME window set with exact n_events and
    exact_users matching the exact twin, and the strict certificate
    boolean (HLL estimate within 4*rsd of exact, computed in-query)
    holds TRUE per window."""
    from trafsys_data_transfer_spark.registry import all_queries

    q = all_queries()
    exact = {
        r["w_start"]: (r["n_users"], r["n_events"])
        for r in q["events_sliding_active_users"].build(spark, sf_dir).collect()
    }
    approx = {
        r["w_start"]: (r["exact_users"], r["n_events"], r["users_within_tol"])
        for r in q["events_sliding_active_users_hll"]
        .build(spark, sf_dir)
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, (eu, ee) in exact.items():
        au, ae, ok = approx[k]
        assert ae == ee  # event counts are exact either way
        assert au == eu  # the exact column IS the exact twin's count
        assert ok, (k, eu)


def test_sequence_pattern_nonoverlapping_greedy(spark):
    """Pin the match semantics: greedy leftmost non-overlapping — a second
    view INSIDE a pending v..p window does not start a second conversion."""
    import datetime as dt

    from trafsys_data_transfer_spark.registry import all_queries

    base = dt.datetime(2024, 1, 1)
    # journey: v c v p p  -> 'vcvpp': matches of v[cs]*p = ['vcvp'?]
    # greedy: at pos0 v, [cs]* eats 'c' then sees 'v' (not in cs, not p) —
    # backtrack: Java/RE2 both fail v[cs]*p at pos0? 'v' 'c' then needs p,
    # next char 'v' != p -> no match at 0; pos2 'v' 'p' matches 'vp'.
    seq = ["view", "click", "view", "purchase", "purchase"]
    rows = [
        (1, i, base + dt.timedelta(minutes=i), t, 1.0, "{}")
        for i, t in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string, "
        "value double, props string"
    )
    import tempfile as _tf

    d = _tf.mkdtemp(prefix="t_seqpat_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = all_queries()["events_sequence_pattern"].build(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.journey_len, r.n_conversions) == (5, 1)


def test_segment_migration_partitions_customers(spark, sf_dir):
    """Every ordering customer lands in exactly one matrix cell, and the
    impossible (absent, absent) cell never appears."""
    from pyspark.sql import functions as F

    from trafsys_data_transfer_spark.registry import all_queries
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    out = all_queries()["orders_segment_migration"].build(spark, sf_dir)
    rows = out.collect()
    assert all(not (r.seg_a == 0 and r.seg_b == 0) for r in rows)
    total = sum(r.n_customers for r in rows)
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert total == n_cust


def test_abc_xyz_matrix_partitions_parts(spark, sf_dir):
    from trafsys_data_transfer_spark.registry import all_queries
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    out = all_queries()["part_abc_xyz_matrix"].build(spark, sf_dir)
    rows = out.collect()
    total = sum(r.n_parts for r in rows)
    n_parts = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert total == n_parts
    assert {r.abc_class for r in rows} <= {"A", "B", "C"}
    assert {r.xyz_class for r in rows} <= {"X", "Y", "Z", "N"}


def test_kendall_tau_self_association_is_one(spark, sf_dir):
    """tau_b(x, x) == 1: replay the registered query's pairwise algebra
    with vol := cents (perfect concordance, ties cancel)."""
    from pyspark.sql import functions as F

    from trafsys_data_transfer_spark.sources.fixtures import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100)).cast("long").alias("cents")
    )
    a = daily.select(
        "event_type", F.col("d").alias("ad"), F.col("cents").alias("ac")
    )
    b = daily.select(
        F.col("event_type").alias("bt"),
        F.col("d").alias("bd"),
        F.col("cents").alias("bc"),
    )
    prod = (F.col("bc") - F.col("ac")) * (F.col("bc") - F.col("ac"))
    stats = (
        a.join(
            b,
            (F.col("bt") == F.col("event_type"))
            & (F.col("bd") > F.col("ad")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0)).alias("c"),
            F.sum(F.when(F.col("bc") == F.col("ac"), 1).otherwise(0)).alias(
                "t"
            ),
            F.count(F.lit(1)).alias("n0"),
        )
        .collect()
    )
    import math

    for r in stats:
        tau = (r.c - 0) / math.sqrt((r.n0 - r.t) * (r.n0 - r.t))
        assert abs(tau - 1.0) < 1e-12
