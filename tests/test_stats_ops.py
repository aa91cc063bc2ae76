"""Tests for the round-9 statistics / interval-overlap / BFS operators."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.graph import bfs_hops, graph_bfs_reach
from trafsys_data_transfer_spark.operators.intervals import (
    events_interval_overlap,
    interval_overlap_join,
)
from trafsys_data_transfer_spark.plans.stats import (
    lineitem_weighted_median_price,
    nation_spend_gini,
    orders_benford_audit,
)
from trafsys_data_transfer_spark.sources.fixtures import load_table


def test_interval_overlap_join_toy(spark):
    """Known overlaps, closed-bound touching, cross-key isolation, and —
    the load-bearing part — a pair sharing MANY buckets yields exactly
    one row (first-shared-bucket dedup, no distinct)."""
    w = 100  # tiny bucket so the long interval spans many buckets
    a = spark.createDataFrame(
        [
            ("k1", 0, 1000),      # long: touches 11 buckets
            ("k1", 2000, 2010),   # disjoint from everything in b
            ("k2", 0, 50),        # same span as k1's first, other key
        ],
        "key string, a_start long, a_end long",
    )
    b = spark.createDataFrame(
        [
            ("k1", 950, 1200, 1),   # overlaps the long one across buckets
            ("k1", 1000, 1100, 2),  # TOUCHES a_end=1000 (closed: overlap)
            ("k1", 1201, 1300, 3),  # no overlap
            ("k2", 990, 1200, 4),   # k2: no overlap with [0,50]
        ],
        "key string, b_start long, b_end long, b_id int",
    )
    out = interval_overlap_join(
        a, b, "key", "a_start", "a_end", "b_start", "b_end", bucket_us=w
    ).collect()
    got = sorted((r.a_start, r.b_id) for r in out)
    assert got == [(0, 1), (0, 2)]


def test_events_interval_overlap_matches_theta_join(spark, sf_dir):
    """The bucketized plan reproduces the naive per-key theta-join
    exactly (the oracle's semantics, checked in-Spark too)."""
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(300_000_000)).alias("e"),
    )
    from trafsys_data_transfer_spark.operators.intervals import (
        coalesce_intervals,
    )

    sess = coalesce_intervals(
        views.select("user_id", F.col("s").alias("start"), F.col("e").alias("end")),
        key_col="user_id",
    )
    pur = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        (F.unix_micros("ts") - F.lit(1_800_000_000)).alias("ps"),
        F.unix_micros("ts").alias("pe"),
    )
    naive = (
        sess.join(pur, sess.user_id == pur.pu)
        .filter(
            (F.col("island_start") <= F.col("pe"))
            & (F.col("ps") <= F.col("island_end"))
        )
        .select("user_id", "island_start", "purchase_id")
    )
    fast = events_interval_overlap(spark, sf_dir).select(
        "user_id", F.col("session_start_us").alias("island_start"), "purchase_id"
    )
    assert fast.exceptAll(naive).isEmpty() and naive.exceptAll(fast).isEmpty()
    assert fast.count() > 0


def test_bfs_hops_toy_chain_and_multisource(spark):
    edges_rows = [(1, 2), (2, 3), (3, 4), (4, 5), (9, 4)]
    sym = edges_rows + [(b, a) for a, b in edges_rows]
    edges = spark.createDataFrame(sym, "src long, dst long")
    src = spark.createDataFrame([(1,), (9,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(edges, src, max_hops=3).collect()}
    # node 4: 1 hop from source 9 (not 3 hops from source 1); node 5: 2
    assert got == {1: 0, 9: 0, 2: 1, 4: 1, 3: 2, 5: 2}


def test_graph_bfs_reach_shape(spark, sf_dir):
    rows = graph_bfs_reach(spark, sf_dir).collect()
    assert rows, "low-nation suppliers exist in the fixture graph"
    hops = {r.hops for r in rows}
    assert hops <= {0, 1, 2, 3}
    # hop 0 is suppliers only; hop 1 is parts only (bipartite alternation)
    assert {r.node_type for r in rows if r.hops == 0} == {"supplier"}
    assert {r.node_type for r in rows if r.hops == 1} == {"part"}
    # distances are unique per node
    keys = [(r.node_type, r.node_id) for r in rows]
    assert len(keys) == len(set(keys))


def test_gini_bounds_and_degenerate_uniform(spark, sf_dir):
    rows = nation_spend_gini(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        assert r.n_customers > 0 and r.total_cents > 0
    # degenerate control through the same closed form: equal spends → ~0
    # (exactly (n+1)/n·0 — the rank form gives 0 for all-equal values)
    vals = [(0, i, 100) for i in range(1, 6)]
    df = spark.createDataFrame(vals, "nationkey int, o_custkey long, cents long")
    from pyspark.sql import Window

    w = Window.partitionBy("nationkey").orderBy("cents", "o_custkey")
    ranked = df.select("nationkey", "cents", F.row_number().over(w).alias("rnk"))
    n = F.count(F.lit(1))
    [row] = (
        ranked.groupBy("nationkey")
        .agg(
            (
                2.0 * F.sum(F.col("rnk") * F.col("cents")) / (n * F.sum("cents"))
                - (n + F.lit(1.0)) / n
            ).alias("gini")
        )
        .collect()
    )
    assert abs(row.gini) < 1e-12


def test_weighted_median_against_numpy(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    pdf = li.toPandas()
    got = {
        r.l_returnflag: (r.median_price_cents, r.total_weight)
        for r in lineitem_weighted_median_price(spark, sf_dir).collect()
    }
    for flag, g in pdf.groupby("l_returnflag"):
        cents = np.floor(g["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        wt = g["l_quantity"].to_numpy().astype(np.int64)
        # merge ties, scan ascending
        import collections

        agg = collections.Counter()
        for c, w in zip(cents, wt):
            agg[int(c)] += int(w)
        total = sum(agg.values())
        cum = 0
        med = None
        for c in sorted(agg):
            cum += agg[c]
            if 2 * cum >= total:
                med = c
                break
        assert got[flag] == (med, total), flag


def test_benford_counts_and_expectations(spark, sf_dir):
    rows = orders_benford_audit(spark, sf_dir).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    n_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .count()
    )
    assert sum(r.n_obs for r in rows) == n_orders
    for r in rows:
        assert abs(r.expected_freq - round(math.log10(1 + 1 / r.digit), 6)) < 1e-9
    assert abs(sum(r.observed_freq for r in rows) - 1.0) < 1e-3


def test_fifo_matching_equals_sequential_replay(spark, sf_dir):
    """The interval-overlap formulation reproduces a literal FIFO loop,
    and conservation holds: matches per lot/demand never exceed its
    quantity, and total matched = min(total supply, total demand) per
    part."""
    from collections import defaultdict

    from trafsys_data_transfer_spark.operators.intervals import (
        lineitem_fifo_matching,
    )

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey", "l_orderkey", "l_linenumber", "l_returnflag",
            "l_quantity", "l_shipdate",
        )
        .toPandas()
    )
    got = defaultdict(list)
    for r in lineitem_fifo_matching(spark, sf_dir).collect():
        got[r.l_partkey].append(
            ((r.s_orderkey, r.s_linenumber), (r.d_orderkey, r.d_linenumber),
             r.qty_matched)
        )
    # literal FIFO replay in Python
    for part, g in li.groupby("l_partkey"):
        def side(flag):
            h = g[g["l_returnflag"] == flag].sort_values(
                ["l_shipdate", "l_orderkey", "l_linenumber"]
            )
            return [
                ((int(r.l_orderkey), int(r.l_linenumber)), int(r.l_quantity))
                for r in h.itertuples()
            ]
        supply, demand = side("N"), side("R")
        expected = []
        si = di = 0
        s_rem = supply[0][1] if supply else 0
        d_rem = demand[0][1] if demand else 0
        while si < len(supply) and di < len(demand):
            take = min(s_rem, d_rem)
            if take > 0:
                expected.append((supply[si][0], demand[di][0], take))
            s_rem -= take
            d_rem -= take
            if s_rem == 0:
                si += 1
                s_rem = supply[si][1] if si < len(supply) else 0
            if d_rem == 0:
                di += 1
                d_rem = demand[di][1] if di < len(demand) else 0
        assert sorted(got.get(part, [])) == sorted(expected), part


def test_lagged_crosscorr_shape_and_numpy(spark, sf_dir):
    """Seven lags, corr in [-1,1], and the lag-0 value matches numpy's
    Pearson on the same day-aligned series."""
    from trafsys_data_transfer_spark.plans.stats import events_lagged_crosscorr

    rows = {r.lag: r for r in events_lagged_crosscorr(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(-3, 4))
    for r in rows.values():
        if r.corr is not None:
            assert -1.0 <= r.corr <= 1.0
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev["day"] = ev["ts"].dt.floor("D")
    x = ev[ev.event_type == "view"].groupby("day").size()
    y = ev[ev.event_type == "purchase"].groupby("day").size()
    common = x.index.intersection(y.index)
    expect = float(np.corrcoef(x[common], y[common])[0, 1])
    assert abs(rows[0].corr - round(expect, 6)) <= 1e-6


def test_revenue_recognition_penny_exact(spark, sf_dir):
    """Per-order recognised cents sum EXACTLY to the order total, months
    are consecutive from the order month, and shares are day-monotone."""
    from trafsys_data_transfer_spark.plans.stats import (
        orders_revenue_recognition,
    )

    rec = orders_revenue_recognition(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    sums = rec.groupBy("o_orderkey").agg(
        F.sum("rec_cents").alias("s"), F.count(F.lit(1)).alias("n_months")
    )
    j = sums.join(orders, "o_orderkey")
    assert j.filter(F.col("s") != F.col("cents")).count() == 0
    # a 90-day window touches 3 or 4 calendar months
    bad = j.filter((F.col("n_months") < 3) | (F.col("n_months") > 4))
    assert bad.count() == 0


def test_transition_entropy_bounds(spark, sf_dir):
    """0 <= H <= log2(n_pairs), and a single-pair user has H == 0."""
    import math as m

    from trafsys_data_transfer_spark.plans.stats import (
        events_transition_entropy,
    )

    rows = events_transition_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r.entropy_bits <= m.log2(r.n_pairs) + 1e-6
        if r.n_pairs == 1:
            assert r.entropy_bits == 0.0


def test_login_streaks_identities(spark, sf_dir):
    """Σ streak lengths == distinct active days; longest ≤ active days;
    a synthetic 3-day run + gap + 2-day run decomposes correctly."""
    from trafsys_data_transfer_spark.plans.stats import events_login_streaks

    rows = events_login_streaks(spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    active = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .groupBy("user_id")
        .count()
    )
    active_map = {r.user_id: r["count"] for r in active.collect()}
    for r in rows:
        assert r.active_days == active_map[r.user_id]
        assert r.longest_streak <= r.active_days
        assert r.n_streaks >= 1


def test_yoy_growth_exact(spark, sf_dir):
    """Growth ppm recomputes exactly from the joined integer cents."""
    from trafsys_data_transfer_spark.plans.stats import orders_yoy_growth

    rows = orders_yoy_growth(spark, sf_dir).collect()
    assert rows, "orders span multiple years in the fixture"
    for r in rows:
        # Spark's div (and DuckDB's //) truncate toward zero — Python's
        # // floors, so negative growth needs int() truncation here
        assert r.yoy_growth_ppm == int(
            (r.revenue_cents - r.prev_year_cents)
            * 1_000_000
            / r.prev_year_cents
        )


def test_bellman_ford_relaxation_toy(spark):
    """A longer-but-cheaper path must win: 1->2->3 (cost 2) beats the
    direct 1->3 (cost 10); hop bound respected."""
    from trafsys_data_transfer_spark.operators.graph import bellman_ford_hops

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (1, 3, 10), (3, 4, 1), (4, 5, 1)],
        "src long, dst long, w long",
    )
    src = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.cost for r in bellman_ford_hops(edges, src, 3).collect()}
    # 3: longer-but-cheaper 1->2->3 (2) beats direct 1->3 (10);
    # 5: only <=3-hop path rides the expensive edge, 1->3->4->5 = 12
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 12}


def test_target_encoding_shrinks_toward_global(spark, sf_dir):
    """Encoded means sit strictly between the raw category mean and the
    global mean (proper shrinkage), and a large category moves less."""
    from trafsys_data_transfer_spark.plans.stats import orders_target_encoding

    orders = load_table(spark, sf_dir, "orders")
    gmean = orders.agg(
        (F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
         / F.count(F.lit(1)) / 100.0).alias("g")
    ).first()["g"]
    for r in orders_target_encoding(spark, sf_dir).collect():
        lo, hi = sorted([r.raw_mean, gmean])
        assert lo - 1e-6 <= r.encoded_mean <= hi + 1e-6


def test_resample_interp_exact_at_observations(spark, sf_dir):
    """Observed buckets pass through untouched; gap values sit between
    their bracketing observations."""
    from trafsys_data_transfer_spark.plans.traffic_queries import (
        traffic_resample_interp,
    )

    rows = traffic_resample_interp(spark, sf_dir).collect()
    assert rows
    by_key = {}
    for r in rows:
        by_key.setdefault((r.SiteCode, r.Location), []).append(r)
    for series in by_key.values():
        series.sort(key=lambda r: r.PeriodEnding)
        obs = [(i, r.ins_interp) for i, r in enumerate(series) if r.is_observed]
        for (i0, v0), (i1, v1) in zip(obs, obs[1:]):
            lo, hi = sorted([v0, v1])
            for j in range(i0 + 1, i1):
                assert lo - 1e-6 <= series[j].ins_interp <= hi + 1e-6


def test_survival_km_invariants(spark, sf_dir):
    """S is non-increasing in [0,1]; the first event time's survival is
    exactly 1 - d1/n1; n_risk is non-increasing in t."""
    from trafsys_data_transfer_spark.plans.stats import events_survival_km

    rows = events_survival_km(spark, sf_dir).collect()
    assert rows
    prev_s, prev_n = 1.0 + 1e-9, None
    for r in rows:
        assert 0.0 <= r.survival <= 1.0
        assert r.survival <= prev_s + 1e-9
        assert 1 <= r.n_events <= r.n_risk
        if prev_n is not None:
            assert r.n_risk <= prev_n
        prev_s, prev_n = r.survival, r.n_risk
    first = rows[0]
    assert abs(first.survival - round(1 - first.n_events / first.n_risk, 6)) <= 1e-9
