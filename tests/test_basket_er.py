"""Market-basket, triangle-census and entity-resolution semantics on
planted inputs (fixture-level correctness is oracle-hash-checked)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators import basket, er


def _li(okey, pkey):
    return Row(l_orderkey=okey, l_partkey=pkey, l_suppkey=1, l_linenumber=1,
               l_quantity=1.0, l_extendedprice=1.0, l_discount=0.0, l_tax=0.0,
               l_returnflag="N", l_linestatus="O",
               l_shipdate=__import__("datetime").datetime(1996, 1, 1))


def _with_lineitem(monkey_rows, spark, fn):
    df = spark.createDataFrame(monkey_rows)
    orig = basket.load_table
    try:
        basket.load_table = lambda _s, _d, name: df
        return fn(spark, "unused").collect()
    finally:
        basket.load_table = orig


def test_association_rules_exact_metrics(spark):
    # orders: {1: A,B,C}, {2: A,B}, {3: A,C}, {4: B}  (A=1, B=2, C=3)
    rows = [_li(1, 1), _li(1, 2), _li(1, 3),
            _li(2, 1), _li(2, 2),
            _li(3, 1), _li(3, 3),
            _li(4, 2)]
    out = {(r["antecedent"], r["consequent"]): r
           for r in _with_lineitem(rows, spark, basket.basket_association_rules)}
    # AB co-occurs twice, AC twice, BC once (below minsup) -> 4 directed rules
    assert set(out) == {(1, 2), (2, 1), (1, 3), (3, 1)}
    r = out[(1, 2)]
    assert r["n_ab"] == 2
    assert r["support_ppm"] == 2 * 1_000_000 // 4
    assert r["confidence_ppm"] == 2 * 1_000_000 // 3  # A in 3 orders
    assert r["lift_ppm"] == 2 * 4 * 1_000_000 // (3 * 3)
    r = out[(2, 1)]
    assert r["confidence_ppm"] == 2 * 1_000_000 // 3  # B in 3 orders
    assert r["lift_ppm"] == out[(1, 2)]["lift_ppm"]  # lift is symmetric


def test_triangle_census_counts_one_planted_triangle(spark):
    # parts 1,2,3 pairwise co-occur in >=2 orders (triangle); part 4 hangs
    # off part 1 with support 2 (edge, no triangle).
    rows = []
    for okey in (1, 2):
        rows += [_li(okey, 1), _li(okey, 2), _li(okey, 3)]
    for okey in (3, 4):
        rows += [_li(okey, 1), _li(okey, 4)]
    out = _with_lineitem(rows, spark, basket.graph_triangle_census)
    assert len(out) == 1
    r = out[0]
    assert r["n_edges"] == 4       # 12,13,23,14
    assert r["n_nodes"] == 4
    assert r["n_triangles"] == 1
    # degrees: 1->3, 2->2, 3->2, 4->1 => wedges 3+1+1+0 = 5
    assert r["n_wedges"] == 5
    assert r["clustering_ppm"] == 3 * 1 * 1_000_000 // 5


def _part(pk, name):
    return Row(p_partkey=pk, p_name=name, p_mfgr="m", p_brand="b",
               p_type="t", p_size=1, p_container="c", p_retailprice=1.0)


def test_er_finds_planted_corruptions_and_respects_blocks(spark):
    # keys chosen for their corruption class: 3,7 clean (%4=3), 4 char-drop
    # (%4=0), 5 adjacent transposition (%4=1); 6 a different entity in a
    # different block.
    rows = [_part(3, "red widget"), _part(7, "red widget"),
            _part(4, "red widget"), _part(5, "red widget"),
            _part(6, "blue bolt"), _part(11, "blue bolt")]
    df = spark.createDataFrame(rows)
    orig = er.load_table
    try:
        er.load_table = lambda _s, _d, name: df
        out = er.er_fuzzy_matches(spark, "unused").collect()
    finally:
        er.load_table = orig
    pairs = {(r["pk_a"], r["pk_b"]): r for r in out}
    # no pair crosses the first-character block boundary
    for a, b in pairs:
        assert ({a, b} <= {3, 4, 5, 7}) or ({a, b} <= {6, 11})
    dists = {frozenset(k): v["dist"] for k, v in pairs.items()}
    assert dists[frozenset({3, 7})] == 0     # clean == clean
    assert dists[frozenset({3, 4})] == 1     # one dropped char
    assert dists[frozenset({3, 5})] == 2     # one transposition
    # every verified pair here is a true match
    assert all(r["same_entity"] for r in out)


def test_er_fixture_precision_is_high(spark, sf_dir):
    out = er.er_fuzzy_matches(spark, sf_dir)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("same_entity"), 1)).alias("tp"),
    ).collect()[0]
    assert agg["n"] > 0
    assert agg["tp"] / agg["n"] >= 0.9


def test_kcore_converges_inside_round_budget_and_peels_planted_graph(spark):
    """Planted graph: a 4-clique (parts 1-4, every pair in >=2 shared
    orders) plus a pendant chain 5-6.  The 3-core is exactly the clique;
    the chain and its attachment must peel away.  Also assert the round
    budget strictly covers convergence (one extra round changes nothing
    — the bounded unrolling IS the fixpoint)."""
    rows = []
    okey = 0
    # two orders containing parts 1..4 -> all 6 clique pairs at support 2
    for _ in range(2):
        okey += 1
        rows += [_li(okey, p) for p in (1, 2, 3, 4)]
    # pendant: part 5 with part 1 (support 2), part 6 with part 5
    for _ in range(2):
        okey += 1
        rows += [_li(okey, 1), _li(okey, 5)]
        okey += 1
        rows += [_li(okey, 5), _li(okey, 6)]
    out = _with_lineitem(rows, spark, basket.graph_kcore_members)
    assert {(r["node"], r["core_degree"]) for r in out} == {
        (1, 3), (2, 3), (3, 3), (4, 3)
    }


def test_kcore_fixture_is_converged(spark, sf_dir):
    """On the real fixture, one extra peeling round must change nothing —
    proof the bounded unrolling reached the fixpoint."""
    import trafsys_data_transfer_spark.operators.basket as b

    base = b.graph_kcore_members(spark, sf_dir).collect()
    orig = b.KCORE_ROUNDS
    try:
        b.KCORE_ROUNDS = orig + 1
        more = b.graph_kcore_members(spark, sf_dir).collect()
    finally:
        b.KCORE_ROUNDS = orig
    assert sorted(map(tuple, base)) == sorted(map(tuple, more))


def test_item_similarity_ranks_by_exact_cosine(spark):
    """Hand-computed: orders {1:AB, 2:AB, 3:AC, 4:AC, 5:A} — A pairs with
    B (2 of 5×2) and C (2 of 5×2) at equal cos²; B–C never co-occur."""
    rows = []
    for okey, parts in ((1, (1, 2)), (2, (1, 2)), (3, (1, 3)), (4, (1, 3)),
                        (5, (1,))):
        rows += [_li(okey, p) for p in parts]
    out = _with_lineitem(rows, spark, basket.basket_item_similarity)
    got = {(r["item"], r["rnk"]): (r["other"], r["cos2_ppm"]) for r in out}
    # A: n=5; B,C: n=2; cos2 = 4*1e6/(5*2) = 400000, tie -> lower id first
    assert got[(1, 1)] == (2, 400_000)
    assert got[(1, 2)] == (3, 400_000)
    # B's only neighbour is A; C's only neighbour is A
    assert got[(2, 1)] == (1, 400_000)
    assert got[(3, 1)] == (1, 400_000)
    assert (2, 2) not in got and (3, 2) not in got  # B-C absent


def test_edit_distance_join_complete_vs_bruteforce(spark):
    """FastSS must find EVERY pair at distance <= 1 (substitution,
    insertion, deletion, equality) and nothing above."""
    import itertools

    from trafsys_data_transfer_spark.operators.er import edit_distance_join

    names = [
        "alpha", "alpha",       # equal pair
        "alphb",                # substitution of alpha
        "alpa",                 # deletion
        "alphax",               # insertion at end
        "xalpha",               # insertion at front
        "beta", "betta",        # insertion middle
        "gamma", "gamm", "gxmma",
        "delta", "dzlta", "dleta",  # dleta is transposition: dist 2
    ]
    rows = [(i, n) for i, n in enumerate(names)]

    def lev(s, t):
        dp = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            prev, dp[0] = dp[0], i
            for j, ct in enumerate(t, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (cs != ct)
                )
        return dp[len(t)]

    want = {
        (i, j)
        for (i, si), (j, sj) in itertools.combinations(rows, 2)
        if lev(si, sj) <= 1
    }
    df = spark.createDataFrame(rows, "k long, name string")
    got = {
        (r.k1, r.k2) for r in edit_distance_join(df, "k", "name").collect()
    }
    assert got == want and any(
        lev(names[i], names[j]) == 1 for i, j in want
    )


def test_golden_record_survivorship_properties(spark, sf_dir):
    """Every record maps to exactly one entity; the golden name is a
    member's name of maximal length; matched pairs share an entity."""
    from trafsys_data_transfer_spark.operators.er import (
        er_fuzzy_matches,
        er_golden_record,
    )

    out = er_golden_record(spark, sf_dir).collect()
    by_key = {r.p_partkey: r for r in out}
    # total-function: one row per part record
    assert len(out) == len(by_key)
    # golden name is the longest in its cluster
    from collections import defaultdict

    members = defaultdict(list)
    for r in out:
        members[r.component].append(r)
    for comp, rows in members.items():
        g = rows[0].golden_name
        assert all(r.golden_name == g for r in rows)
        assert all(r.cluster_size == len(rows) for r in rows)
    # every verified match pair landed in the same component
    pairs = er_fuzzy_matches(spark, sf_dir).collect()
    for p in pairs[:500]:
        assert by_key[p.pk_a].component == by_key[p.pk_b].component
