"""Round-9 operators: largest-remainder allocation, clamped running
balance, MAD outliers, interval gaps — property tests beyond the driver
hash (penny exactness, fold equivalence, complementarity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.registry import all_queries


def test_allocation_is_penny_exact_and_within_quota(spark, sf_dir):
    """Every order's allocations sum to exactly 10,000 cents, and each
    line's allocation is within 1 cent of its exact proportional share
    (the Hamilton-method quota guarantee: floor ≤ alloc ≤ floor+1)."""
    out = all_queries()["lineitem_allocate_rebate"].build(spark, sf_dir)
    per_order = out.groupBy("l_orderkey").agg(
        F.sum("alloc_cents").alias("total")
    )
    bad = per_order.filter(F.col("total") != 10_000).count()
    assert bad == 0
    # quota check against the exact share
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 50 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("pc"),
        )
    )
    tot = li.groupBy("l_orderkey").agg(F.sum("pc").alias("total_pc"))
    # (l_orderkey, l_linenumber) is NOT unique in the fixture — compare
    # group-level sums: |Σalloc − Σexact_share| < group row count (each
    # row deviates < 1 by the quota bound)
    shares = (
        li.join(tot, "l_orderkey")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.sum(10_000.0 * F.col("pc") / F.col("total_pc")).alias(
                "exact_share"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )
    agg_out = out.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum("alloc_cents").alias("alloc")
    )
    dev = (
        agg_out.join(shares, ["l_orderkey", "l_linenumber"])
        .select(
            (
                F.abs(F.col("alloc") - F.col("exact_share")) / F.col("n")
            ).alias("d")
        )
        .agg(F.max("d"))
        .first()[0]
    )
    assert dev < 1.0, dev


def test_clamped_balance_equals_sequential_fold(spark, sf_dir):
    """The two-window prefix identity reproduces the literal sequential
    fold balance_t = max(0, balance_{t-1} + delta_t) for every user."""
    rows = (
        all_queries()["events_clamped_balance"]
        .build(spark, sf_dir)
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:  # output is ordered (user_id, event_id)
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, seq in by_user.items():
        bal = 0
        for r in seq:
            bal = max(0, bal + r.delta)
            assert r.balance_cents == bal, (user, r.event_id)
        assert all(r.balance_cents >= 0 for r in seq)


def test_mad_outliers_resist_contamination(spark):
    """A 100× spike cluster inflates stddev enough to mask a smaller
    genuine outlier; the MAD flag still catches it (50% breakdown
    point), and never flags the bulk."""
    import trafsys_data_transfer_spark.plans.analytics as an
    from unittest import mock

    rows = (
        [(i, "t", 10.0 + (i % 7) * 0.1) for i in range(200)]
        + [(900 + i, "t", 1000.0) for i in range(5)]  # contamination
        + [(999, "t", 25.0)]  # genuine moderate outlier
    )
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    with mock.patch.object(an, "load_table", lambda s, d, n: df):
        out = an.events_value_outliers_mad(spark, "unused").collect()
    flagged = {r.event_id for r in out}
    assert 999 in flagged  # MAD sees through the contamination
    assert all(e >= 900 for e in flagged)  # bulk never flagged


def test_interval_gaps_complement_islands(spark, sf_dir):
    """Gaps interleave islands exactly: per user, gap i runs from island
    i's end to island i+1's start, and counts are islands − 1."""
    q = all_queries()
    isl = [
        r
        for r in q["events_interval_islands"].build(spark, sf_dir).collect()
        if r.user_id % 10 == 0
    ]
    gaps = q["events_interval_gaps"].build(spark, sf_dir).collect()
    isl_by_user: dict[int, list] = {}
    for r in isl:  # ordered by (user_id, island_start)
        isl_by_user.setdefault(r.user_id, []).append(r)
    gaps_by_user: dict[int, list] = {}
    for r in gaps:
        gaps_by_user.setdefault(r.user_id, []).append(r)
    for user, islands in isl_by_user.items():
        got = gaps_by_user.get(user, [])
        assert len(got) == len(islands) - 1, user
        for g, (a, b) in zip(got, zip(islands, islands[1:])):
            assert g.gap_start == a.island_end
            assert g.gap_end == b.island_start
            assert g.gap_secs > 0
