"""Round-7 batch-2 operators: CDF replay (consume side), equi-depth
histogram invariants, group-aware holdout split, nested higher-order
aggregation, UNPIVOT, and the Q22-shape dormant-customer query."""

from __future__ import annotations

from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# cdf_apply — feed replay reconstructs the post-merge table
# ---------------------------------------------------------------------------


def test_cdf_apply_reconstructs_merge(spark):
    """base + feed == merge_with_tombstones(base, upd) exactly, including
    the silent cases (no-op update emits nothing to apply; tombstone on an
    absent key applies as a no-op)."""
    from trafsys_data_transfer_spark.operators.merge import (
        cdf_apply,
        merge_cdf,
        merge_with_tombstones,
    )

    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(30)], "k long, v string"
    )
    upd = spark.createDataFrame(
        # 20..24 update (22 is a no-op: same value), 25..29 delete-present,
        # 40..44 insert, 50 tombstone-on-absent (must emit/apply nothing)
        [(i, "v22" if i == 22 else f"w{i}", False) for i in range(20, 25)]
        + [(i, None, True) for i in range(25, 30)]
        + [(i, f"n{i}", False) for i in range(40, 45)]
        + [(50, None, True)],
        "k long, v string, is_delete boolean",
    )
    feed = merge_cdf(base, upd, ["k"], "is_delete")
    applied = cdf_apply(base, feed, ["k"])
    want = merge_with_tombstones(base, upd, ["k"])
    assert {(r.k, r.v) for r in applied.collect()} == {
        (r.k, r.v) for r in want.collect()
    }
    # the no-op update (k=22, identical value) produced no feed rows
    assert feed.filter(F.col("k") == 22).count() == 0
    # the absent-key tombstone (k=50) produced no feed rows
    assert feed.filter(F.col("k") == 50).count() == 0


def test_cdf_apply_is_idempotent_on_empty_feed(spark):
    from trafsys_data_transfer_spark.operators.merge import (
        cdf_apply,
        merge_cdf,
    )

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    empty = merge_cdf(base, base.limit(0), ["k"])
    out = cdf_apply(base, empty, ["k"])
    assert sorted((r.k, r.v) for r in out.collect()) == [(1, "a"), (2, "b")]


# ---------------------------------------------------------------------------
# events_equidepth_histogram — depth balance + tie discipline
# ---------------------------------------------------------------------------


def test_equidepth_buckets_cover_and_balance(spark, sf_dir):
    from trafsys_data_transfer_spark.plans.analytics import (
        events_equidepth_histogram,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    out = events_equidepth_histogram(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_rows for r in out) == total  # partition of the rows
    assert [r.bucket for r in out] == list(range(len(out)))
    # boundaries are disjoint and ordered: bucket i's hi < bucket i+1's lo
    for a, b in zip(out, out[1:]):
        assert a.hi < b.lo
    # depth balance: every bucket within 50% of the ideal N/8 (ties can
    # distort, but the fixture's value column is near-continuous)
    ideal = total / len(out)
    for r in out:
        assert 0.5 * ideal <= r.n_rows <= 1.5 * ideal, (r.bucket, r.n_rows)


def test_equidepth_ties_never_straddle(spark):
    """All rows sharing a value land in ONE bucket even when the tie run
    is larger than a bucket's ideal depth."""
    from trafsys_data_transfer_spark.plans.analytics import (
        events_equidepth_histogram,
    )
    import os
    import tempfile
    import uuid

    import datetime as dt

    # 64 rows of value 1.0 (half the data) + 64 distinct values
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, i, "view", 1.0, "{}") for i in range(64)] + [
        (100 + i, t0, i, "view", 2.0 + i, "{}") for i in range(64)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = os.path.join(tempfile.gettempdir(), f"eqd_{uuid.uuid4().hex[:8]}")
    df.write.parquet(os.path.join(d, "events.parquet"))
    out = events_equidepth_histogram(spark, d).collect()
    tied = [r for r in out if r.lo <= 1.0 <= r.hi]
    assert len(tied) == 1 and tied[0].n_rows >= 64


# ---------------------------------------------------------------------------
# split_group_holdout — leakage guard
# ---------------------------------------------------------------------------


def test_group_holdout_no_user_straddles(spark, sf_dir):
    """No user_id appears in both folds — the invariant row-level
    splitting cannot give."""
    from trafsys_data_transfer_spark.operators.sampling import split_column
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.select(
            "user_id", split_column(F.col("user_id"), 0.8).alias("fold")
        )
        .groupBy("user_id")
        .agg(F.countDistinct("fold").alias("nf"))
    )
    assert per_user.filter(F.col("nf") > 1).count() == 0


# ---------------------------------------------------------------------------
# orders_lineitem_nested_agg — lambda-expression semantics
# ---------------------------------------------------------------------------


def test_nested_agg_per_order_identities(spark, sf_dir):
    """top2 <= total, n_big <= n_items, and a hand-checked order."""
    from trafsys_data_transfer_spark.plans.relational import (
        orders_lineitem_nested_agg,
    )

    out = orders_lineitem_nested_agg(spark, sf_dir)
    bad = out.filter(
        (F.col("top2_cents") > F.col("total_cents"))
        | (F.col("n_big") > F.col("n_items"))
        | (F.col("n_items") < 1)
    )
    assert bad.count() == 0
    # top2 of a 1-item order equals its total
    ones = out.filter(F.col("n_items") == 1)
    assert (
        ones.filter(F.col("top2_cents") != F.col("total_cents")).count() == 0
    )


# ---------------------------------------------------------------------------
# events_stats_unpivot — melt round-trips the wide block
# ---------------------------------------------------------------------------


def test_unpivot_shape_and_roundtrip(spark, sf_dir):
    from trafsys_data_transfer_spark.plans.analytics import (
        events_stats_unpivot,
    )

    out = events_stats_unpivot(spark, sf_dir)
    rows = out.collect()
    types = {r.event_type for r in rows}
    # exactly 4 metrics per type, none null
    assert len(rows) == 4 * len(types)
    assert all(r.metric_value is not None for r in rows)
    # pivoting back recovers one row per type with all 4 metrics
    back = (
        out.groupBy("event_type")
        .pivot("metric")
        .agg(F.first("metric_value"))
    )
    assert back.count() == len(types)
    assert set(back.columns) == {
        "event_type",
        "sum_value",
        "min_value",
        "max_value",
        "n_rows",
    }


# ---------------------------------------------------------------------------
# customers_dormant_above_avg — exact-integer threshold semantics
# ---------------------------------------------------------------------------


def test_dormant_above_avg_matches_bruteforce(spark, sf_dir):
    from trafsys_data_transfer_spark.plans.relational import (
        customers_dormant_above_avg,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    got = {
        (r.c_mktsegment, r.numcust, r.total_cents)
        for r in customers_dormant_above_avg(spark, sf_dir).collect()
    }
    cust = load_table(spark, sf_dir, "customer").collect()
    orders = load_table(spark, sf_dir, "orders").collect()
    recent = {
        o.o_custkey
        for o in orders
        if o.o_orderdate >= __import__("datetime").datetime(2000, 6, 1)
    }
    cents = [
        (c.c_custkey, c.c_mktsegment, int(c.c_acctbal * 100 // 1))
        for c in cust
        if c.c_acctbal > 0
    ]
    s = sum(b for _, _, b in cents)
    n = len(cents)
    agg: dict[str, list[int]] = {}
    for k, seg, b in cents:
        if b * n > s and k not in recent:
            agg.setdefault(seg, [0, 0])
            agg[seg][0] += 1
            agg[seg][1] += b
    want = {(seg, v[0], v[1]) for seg, v in agg.items()}
    assert got == want


# ---------------------------------------------------------------------------
# events_max_drawdown
# ---------------------------------------------------------------------------


def test_max_drawdown_hand_series(spark):
    """Hand-checked series: cum [10, 30, 5, 20, -5] → peaks
    [10, 30, 30, 30, 30] → max drawdown 35, global peak 30."""
    import datetime as dt
    import os
    import tempfile
    import uuid

    from trafsys_data_transfer_spark.plans.analytics import (
        events_max_drawdown,
    )

    t0 = dt.datetime(2024, 1, 1)
    deltas = [10.0, 20.0, -25.0, 15.0, -25.0]
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "t", d, "{}")
        for i, d in enumerate(deltas)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = os.path.join(tempfile.gettempdir(), f"dd_{uuid.uuid4().hex[:8]}")
    df.write.parquet(os.path.join(d, "events.parquet"))
    out = {r.event_type: r for r in events_max_drawdown(spark, d).collect()}
    assert out["t"].max_drawdown_cents == 3500
    assert out["t"].peak_cum_cents == 3000
