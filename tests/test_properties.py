"""Property-based tests (SURVEY.md §5.4): the algebraic invariants the
engine's correctness rests on, checked over generated inputs.

Spark round-trips are expensive, so examples are capped — the properties
are about structure (idempotence, grain additivity), not scale.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.merge import (
    dedupe_last_write,
    merge_additive,
    merge_dataframes,
)
from trafsys_data_transfer_spark.plans.traffic import rollup_traffic

KEYS = ["SiteCode", "Location", "PeriodEnding"]
COLS = KEYS + ["IsInternal", "Ins", "Outs"]


#: One traffic row: tiny key domains force PK collisions, which is the
#: interesting case for MERGE.
row_st = st.tuples(
    st.sampled_from(["S1", "S2"]),
    st.sampled_from(["door", "gate"]),
    st.integers(min_value=0, max_value=5),  # hour offset
    st.booleans(),
    st.integers(min_value=0, max_value=100),
    st.integers(min_value=0, max_value=100),
)


def _df(spark, rows):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    data = [
        (s, l, base + dt.timedelta(hours=h), int(i), ins, outs)
        for (s, l, h, i, ins, outs) in rows
    ]
    return spark.createDataFrame(
        data,
        "SiteCode string, Location string, PeriodEnding timestamp, "
        "IsInternal int, Ins long, Outs long",
    )


def _canon(df):
    return sorted(tuple(r[c] for c in COLS) for r in df.collect())


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    target_rows=st.lists(row_st, max_size=8),
    batch_rows=st.lists(row_st, max_size=8),
)
def test_merge_idempotent(spark, target_rows, batch_rows):
    """merge(merge(T,B),B) == merge(T,B): replaying any batch is a no-op —
    the invariant that turns at-least-once delivery into effectively-once
    (reference script.js:195-200)."""
    target = dedupe_last_write(_df(spark, target_rows), KEYS, ["Ins", "Outs"])
    batch = dedupe_last_write(_df(spark, batch_rows), KEYS, ["Ins", "Outs"])
    once = merge_dataframes(target, batch, KEYS)
    twice = merge_dataframes(once, batch, KEYS)
    assert _canon(once) == _canon(twice)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(row_st, min_size=1, max_size=12),
    split=st.integers(min_value=0, max_value=12),
)
def test_additive_merge_equals_one_shot(spark, rows, split):
    """Partition invariance of incremental aggregation: rolling up any two
    halves of a batch and additively merging the partials must equal the
    one-shot rollup — for EVERY split point, not just the parity split the
    correctness gate uses."""
    df = _df(spark, rows)
    whole = rollup_traffic(df, grain="hour")
    a = rollup_traffic(_df(spark, rows[:split]), grain="hour")
    b = rollup_traffic(_df(spark, rows[split:]), grain="hour")
    merged = merge_additive(
        a, b, keys=["SiteCode", "Location", "PeriodEnding"], sum_cols=["Ins", "Outs"]
    )
    cols = ["SiteCode", "Location", "PeriodEnding", "Ins", "Outs"]
    assert sorted(tuple(r[c] for c in cols) for r in merged.collect()) == sorted(
        tuple(r[c] for c in cols) for r in whole.collect()
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(row_st, min_size=1, max_size=12))
def test_hourly_rollup_sums_to_daily(spark, rows):
    """Grain consistency: summing the hourly rollup over each day equals the
    daily rollup (the DataSummedByDay knob must be a pure re-grouping)."""
    df = _df(spark, rows)
    hourly = rollup_traffic(df, grain="hour")
    daily = rollup_traffic(df, grain="day")
    re_daily = (
        hourly.groupBy(
            "SiteCode",
            "Location",
            (F.date_trunc("day", F.col("PeriodEnding") - F.expr("INTERVAL 1 SECOND"))
             + F.expr("INTERVAL 1 DAY")).alias("PeriodEnding"),
        )
        .agg(F.sum("Ins").alias("Ins"), F.sum("Outs").alias("Outs"))
    )
    cols = ["SiteCode", "Location", "PeriodEnding", "Ins", "Outs"]
    assert sorted(tuple(r[c] for c in cols) for r in re_daily.collect()) == sorted(
        tuple(r[c] for c in cols) for r in daily.collect()
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),          # user_id
            st.integers(min_value=0, max_value=6 * 3600),   # seconds offset
        ),
        min_size=1,
        max_size=24,
    )
)
def test_session_window_native_equals_gaps_and_islands(spark, events):
    """Property: for ANY event set, the built-in session_window aggregate
    produces exactly the sessions of the gaps-and-islands plan — including
    duplicate timestamps and exactly-on-the-gap boundaries."""
    from pyspark.sql import functions as F

    from trafsys_data_transfer_spark.operators.sessions import sessionize_batch

    df = spark.createDataFrame(
        [(u, i, off) for i, (u, off) in enumerate(events)],
        "user_id long, event_id long, off long",
    ).select(
        "user_id",
        "event_id",
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("off"))).alias("ts"),
    )
    native = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    gi = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(df).collect()
    }
    assert native == gi


# ---------------------------------------------------------------------------
# round-9 operators: interval overlap join, Bellman-Ford (SURVEY §5.4)
# ---------------------------------------------------------------------------

#: Small intervals over a tiny key/coordinate domain: collisions, touching
#: bounds, containment, and multi-bucket spans all occur.
#: Starts span NEGATIVE coordinates too: Spark `div` truncates toward
#: zero, so the bucket containing zero is double-width — monotone
#: bucketing is all the join's correctness needs, and the property run
#: proves it (a floor-div bucketing would also work; neither misses).
iv_st = st.tuples(
    st.sampled_from(["k1", "k2"]),
    st.integers(min_value=-40, max_value=40),
    st.integers(min_value=0, max_value=25),
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    a_rows=st.lists(iv_st, min_size=1, max_size=8),
    b_rows=st.lists(iv_st, min_size=1, max_size=8),
    bucket=st.sampled_from([3, 7, 64]),
)
def test_overlap_join_equals_naive(spark, a_rows, b_rows, bucket):
    """Bucketized overlap join == naive quadratic reference, for every
    bucket width (the first-shared-bucket dedup must be exact)."""
    from trafsys_data_transfer_spark.operators.intervals import (
        interval_overlap_join,
    )

    a = spark.createDataFrame(
        [(k, s, s + d, i) for i, (k, s, d) in enumerate(a_rows)],
        "key string, a_start long, a_end long, a_id int",
    )
    b = spark.createDataFrame(
        [(k, s, s + d, i) for i, (k, s, d) in enumerate(b_rows)],
        "key string, b_start long, b_end long, b_id int",
    )
    got = sorted(
        (r.key, r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, "key", "a_start", "a_end", "b_start", "b_end",
            bucket_us=bucket,
        ).collect()
    )
    want = sorted(
        (ka, ia, ib)
        for ia, (ka, sa, da) in enumerate(a_rows)
        for ib, (kb, sb, db) in enumerate(b_rows)
        if ka == kb and sa <= sb + db and sb <= sa + da
    )
    assert got == want


#: Weights include NEGATIVES: the hop-bounded Jacobi relaxation is exact
#: for any weights (no cycle can be exploited within a finite hop bound),
#: unlike unbounded Bellman-Ford which requires no negative cycles.
edge_st = st.tuples(
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=-4, max_value=9),
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    edges=st.lists(edge_st, min_size=1, max_size=12),
    n_src=st.integers(min_value=1, max_value=2),
    hops=st.integers(min_value=1, max_value=3),
)
def test_bellman_ford_equals_reference(spark, edges, n_src, hops):
    """Distributed hop-bounded Bellman-Ford == pure-python reference
    (min cost over all <=h-hop paths) on random small weighted digraphs."""
    from trafsys_data_transfer_spark.operators.graph import bellman_ford_hops

    edges = [(s, d, w) for s, d, w in edges if s != d]
    if not edges:
        return
    sources = sorted({e[0] for e in edges})[:n_src]
    # reference: dist_h(v) = min(dist_{h-1}(v), min_u dist_{h-1}(u)+w)
    INF = float("inf")
    nodes = {x for e in edges for x in e[:2]}
    dist = {v: (0 if v in sources else INF) for v in nodes}
    for _ in range(hops):
        nxt = dict(dist)
        for s, d, w in edges:
            if dist[s] + w < nxt[d]:
                nxt[d] = dist[s] + w
        dist = nxt
    want = {v: c for v, c in dist.items() if c < INF}
    e_df = spark.createDataFrame(edges, "src long, dst long, w long")
    s_df = spark.createDataFrame([(s,) for s in sources], "node long")
    got = {
        r.node: r.cost
        for r in bellman_ford_hops(e_df, s_df, max_hops=hops).collect()
    }
    assert got == want


lot_st = st.tuples(
    st.sampled_from(["N", "R"]),
    st.integers(min_value=0, max_value=3),   # shipdate day (ties likely)
    st.integers(min_value=1, max_value=6),   # quantity
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(lot_st, min_size=2, max_size=10))
def test_fifo_interval_formulation_equals_sequential(spark, rows):
    """The cumulative-interval FIFO == a literal sequential consume loop,
    on random lot/demand mixes including shipdate ties (broken by the
    (shipdate, orderkey, linenumber) total order both sides share)."""
    import datetime as d

    from pyspark.sql import Window
    from pyspark.sql import functions as FF
    from trafsys_data_transfer_spark.operators.intervals import (
        interval_overlap_join,
    )

    base = d.datetime(2024, 1, 1)
    data = [
        (1, i, 1, flag, float(q), base + d.timedelta(days=day))
        for i, (flag, day, q) in enumerate(rows)
    ]
    li = spark.createDataFrame(
        data,
        "l_partkey long, l_orderkey long, l_linenumber int, "
        "l_returnflag string, l_quantity double, l_shipdate timestamp",
    )

    def cum(flag, p):
        w = (
            Window.partitionBy("l_partkey")
            .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        q = FF.col("l_quantity").cast("long")
        return li.filter(FF.col("l_returnflag") == flag).select(
            "l_partkey",
            FF.col("l_orderkey").alias(f"{p}_id"),
            (FF.sum(q).over(w) - q).alias(f"{p}_lo"),
            FF.sum(q).over(w).alias(f"{p}_hi"),
        )

    j = interval_overlap_join(
        cum("N", "s"), cum("R", "d"), key_col="l_partkey",
        a_start="s_lo", a_end="s_hi", b_start="d_lo", b_end="d_hi",
        bucket_us=4,
    )
    got = sorted(
        (r.s_id, r.d_id, r.q)
        for r in j.select(
            "s_id", "d_id",
            (FF.least("s_hi", "d_hi") - FF.greatest("s_lo", "d_lo")).alias("q"),
        ).filter(FF.col("q") > 0).collect()
    )
    # sequential reference in the same total order
    ordered = sorted(enumerate(rows), key=lambda t: (t[1][1], t[0]))
    supply = [(i, q) for i, (f, _d, q) in ordered if f == "N"]
    demand = [(i, q) for i, (f, _d, q) in ordered if f == "R"]
    want, si, di = [], 0, 0
    s_rem = supply[0][1] if supply else 0
    d_rem = demand[0][1] if demand else 0
    while si < len(supply) and di < len(demand):
        take = min(s_rem, d_rem)
        if take > 0:
            want.append((supply[si][0], demand[di][0], take))
        s_rem -= take
        d_rem -= take
        if s_rem == 0:
            si += 1
            s_rem = supply[si][1] if si < len(supply) else 0
        if d_rem == 0:
            di += 1
            d_rem = demand[di][1] if di < len(demand) else 0
    assert got == sorted(want)


# --- time-series statistics battery vs literal brute force ----------------


def _mk_brute(xs):
    """Literal O(n²) Mann-Kendall S and tie-corrected variance."""
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(xs)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    return s, var


@given(
    st.lists(st.integers(min_value=-50, max_value=50), min_size=3, max_size=40)
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mann_kendall_matches_bruteforce(spark, xs):
    """The engine's join-aggregate S/var algebra equals the literal
    pairwise loop on a random integer series."""
    rows = [(1, i, x) for i, x in enumerate(xs)]
    daily = spark.createDataFrame(rows, "k int, di int, cents long")
    a = daily.select("k", F.col("di").alias("ai"), F.col("cents").alias("ac"))
    b = daily.select(
        F.col("k").alias("bk"),
        F.col("di").alias("bi"),
        F.col("cents").alias("bc"),
    )
    s_row = (
        a.join(b, (F.col("bk") == F.col("k")) & (F.col("bi") > F.col("ai")))
        .agg(
            F.sum(
                F.when(F.col("bc") > F.col("ac"), 1)
                .when(F.col("bc") < F.col("ac"), -1)
                .otherwise(0)
            ).alias("s")
        )
        .collect()[0]
    )
    ties = (
        daily.groupBy("cents")
        .count()
        .agg(
            F.sum(
                F.col("count") * (F.col("count") - 1) * (2 * F.col("count") + 5)
            ).alias("tt")
        )
        .collect()[0]
    )
    n = len(xs)
    var = (n * (n - 1) * (2 * n + 5) - (ties.tt or 0)) / 18.0
    s_exp, var_exp = _mk_brute(xs)
    assert s_row.s == s_exp
    assert var == var_exp


def _runs_brute(xs):
    """Literal runs count over the above/below-median sequence."""
    import statistics

    # 2·rank ≥ n+1 picks the UPPER middle for even n — median_high
    med = statistics.median_high(sorted(xs))
    seq = [x > med for x in xs if x != med]
    if not seq:
        return None
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    return sum(seq), len(seq) - sum(seq), runs


@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=5, max_size=30)
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_runs_algebra_matches_bruteforce(spark, xs):
    """The rank-selected median + LAG runs algebra equals the literal
    sequential scan (median convention: first value with 2·rank ≥ n+1 —
    the lower median)."""
    rows = [(1, i, x) for i, x in enumerate(xs)]
    daily = spark.createDataFrame(rows, "k int, di int, cents long")
    from pyspark.sql.window import Window

    ranked = daily.select(
        "k",
        "di",
        "cents",
        F.row_number()
        .over(Window.partitionBy("k").orderBy("cents", "di"))
        .alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("k")).alias("n"),
    )
    med = (
        ranked.where(2 * F.col("rk") >= F.col("n") + 1)
        .groupBy("k")
        .agg(F.min("cents").alias("m"))
        .collect()[0]
        .m
    )
    signed = [
        (i, x > med) for i, x in enumerate(xs) if x != med
    ]
    expect = _runs_brute(xs)
    if expect is None:
        assert not signed
        return
    n1e, n2e, re_ = expect
    n1 = sum(1 for _, a in signed if a)
    n2 = len(signed) - n1
    runs = 1 + sum(
        1 for (_, a), (_, b) in zip(signed, signed[1:]) if a != b
    )
    assert (n1, n2, runs) == (n1e, n2e, re_)


@given(
    st.lists(
        st.integers(min_value=-100, max_value=100), min_size=3, max_size=18
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_theilsen_median_rank_matches_bruteforce(spark, xs):
    """The rank-window median-of-pairwise-slopes equals the literal
    sort-and-average over all pairs (mean of middle rank(s), the
    registered query's convention)."""
    rows = [(1, i + 1, x) for i, x in enumerate(xs)]
    daily = spark.createDataFrame(rows, "k int, di int, cents long")
    a = daily.select("k", F.col("di").alias("ai"), F.col("cents").alias("ac"))
    b = daily.select(
        F.col("k").alias("bk"),
        F.col("di").alias("bi"),
        F.col("cents").alias("bc"),
    )
    from pyspark.sql.window import Window

    slopes = (
        a.join(b, (F.col("bk") == F.col("k")) & (F.col("bi") > F.col("ai")))
        .select(
            "k",
            (
                F.lit(1.0) * (F.col("bc") - F.col("ac"))
                / (F.col("bi") - F.col("ai"))
            ).alias("slope"),
        )
        .select(
            "k",
            "slope",
            F.row_number()
            .over(Window.partitionBy("k").orderBy("slope"))
            .alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy("k")).alias("np"),
        )
    )
    mid = (
        (F.col("rk") * 2 == F.col("np"))
        | (F.col("rk") * 2 == F.col("np") + 1)
        | (F.col("rk") * 2 == F.col("np") + 2)
    )
    got = (
        slopes.where(mid)
        .groupBy("k")
        .agg(F.avg("slope").alias("m"))
        .collect()[0]
        .m
    )
    brute = sorted(
        (xs[j] - xs[i]) / (j - i)
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    )
    n = len(brute)
    expect = (
        brute[(n - 1) // 2]
        if n % 2
        else (brute[n // 2 - 1] + brute[n // 2]) / 2
    )
    assert abs(got - expect) < 1e-12
