"""Connected components: topology correctness and convergence."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.graph import connected_components


def _cc(spark, n_nodes, edge_list, **kw):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], ["id"])
    edges = spark.createDataFrame(edge_list or [(0, 0)], ["src", "dst"])
    if not edge_list:
        edges = edges.filter(F.lit(False))
    got = connected_components(nodes, edges, **kw).collect()
    return {r["id"]: r["component"] for r in got}

def test_chain_cycle_singleton(spark):
    # 0-1-2-3 chain, 4-5-6-4 cycle, 7 isolated.
    comp = _cc(spark, 8, [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (6, 4)])
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 4, 7: 7}


def test_no_edges_all_singletons(spark):
    comp = _cc(spark, 5, [])
    assert comp == {i: i for i in range(5)}


def test_long_chain_converges_within_log_rounds(spark):
    # A 64-node path has diameter 63; hash-to-min pointer jumping must
    # resolve it well within max_iter=10 (~log2 rounds), where plain
    # one-hop propagation would need 63.
    comp = _cc(spark, 64, [(i, i + 1) for i in range(63)], max_iter=10)
    assert set(comp.values()) == {0}


def test_direction_and_duplicates_ignored(spark):
    comp = _cc(spark, 4, [(1, 0), (1, 0), (2, 1), (0, 2), (3, 3)])
    assert comp == {0: 0, 1: 0, 2: 0, 3: 3}


# ---------------------------------------------------------------------------
# PageRank (fixed-point)
# ---------------------------------------------------------------------------

from trafsys_data_transfer_spark.operators.graph import (  # noqa: E402
    PR_INIT,
    pagerank_fixed,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _pr_reference(pairs, n_iters, nodes=None):
    """Plain-Python mirror of the integer recurrence."""
    from collections import defaultdict

    out = defaultdict(int)
    adj = defaultdict(list)
    ns = set(nodes or [])
    for s, d in pairs:
        out[s] += 1
        adj[s].append(d)
        ns.update((s, d))
    rank = {v: PR_INIT for v in ns}
    teleport = PR_INIT * 3 // 20
    for _ in range(n_iters):
        inflow = defaultdict(int)
        for s, ds in adj.items():
            c = rank[s] // out[s]
            for d in ds:
                inflow[d] += c
        rank = {v: teleport + (17 * inflow[v]) // 20 for v in ns}
    return rank


def test_pagerank_matches_python_reference(spark):
    pairs = [(0, 1), (1, 0), (1, 2), (2, 0), (3, 0)]  # 3 dangles into 0
    got = {r.node: r.rank for r in pagerank_fixed(_edges(spark, pairs), 4).collect()}
    assert got == _pr_reference(pairs, 4)


def test_pagerank_symmetric_pair_and_star(spark):
    # two mutually-linked nodes: identical ranks, fixpoint at PR_INIT
    # minus only truncation leak
    got = {r.node: r.rank for r in pagerank_fixed(_edges(spark, [(0, 1), (1, 0)]), 5).collect()}
    assert got[0] == got[1]
    assert abs(got[0] - PR_INIT) <= 5
    # star: center receives from all leaves → outranks them
    star = [(i, 9) for i in range(5)] + [(9, i) for i in range(5)]
    ranks = {r.node: r.rank for r in pagerank_fixed(_edges(spark, star), 5).collect()}
    assert all(ranks[9] > ranks[i] for i in range(5))


def test_pagerank_bit_deterministic_and_mass_bounded(spark, sf_dir):
    from trafsys_data_transfer_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    links = li.select(
        (F.col("l_partkey") * 2).alias("p"), (F.col("l_suppkey") * 2 + 1).alias("s")
    ).distinct()
    edges = links.selectExpr("p as src", "s as dst").union(
        links.selectExpr("s as src", "p as dst")
    )
    a = {r.node: r.rank for r in pagerank_fixed(edges, 3).collect()}
    b = {r.node: r.rank for r in pagerank_fixed(edges.repartition(13), 3).collect()}
    assert a == b  # integer arithmetic: partitioning cannot change a bit
    n = len(a)
    total = sum(a.values())
    # truncation only ever LEAKS mass; teleport floor bounds it below
    assert total <= n * PR_INIT
    assert total >= n * (PR_INIT * 3 // 20)


# ---------------------------------------------------------------------------
# label propagation communities
# ---------------------------------------------------------------------------


def _clique_edges(lo, n):
    return [(lo + i, lo + j) for i in range(n) for j in range(i + 1, n)]


def test_lpa_separates_bridged_cliques(spark):
    """Two 6-cliques joined by ONE bridge edge: connected components see
    one blob; LPA keeps two dense communities."""
    from trafsys_data_transfer_spark.operators.graph import (
        connected_components,
        lpa_communities,
    )

    edges = _clique_edges(0, 6) + _clique_edges(10, 6) + [(0, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(6)) + list(range(10, 16))], "id long"
    )
    comp = connected_components(nodes, e)
    assert comp.select("component").distinct().count() == 1
    lpa = {r.id: r.community for r in lpa_communities(nodes, e).collect()}
    a = {lpa[i] for i in range(6)}
    b = {lpa[i] for i in range(10, 16)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_lpa_deterministic_under_partitioning(spark):
    from trafsys_data_transfer_spark.operators.graph import lpa_communities

    edges = _clique_edges(0, 5) + _clique_edges(20, 4) + [(2, 20), (3, 21)]
    nodes = [(i,) for i in list(range(5)) + list(range(20, 24))]
    e1 = spark.createDataFrame(edges, "src long, dst long")
    n1 = spark.createDataFrame(nodes, "id long")
    a = sorted(map(tuple, lpa_communities(n1, e1).collect()))
    b = sorted(
        map(
            tuple,
            lpa_communities(n1.repartition(7), e1.repartition(5)).collect(),
        )
    )
    assert a == b
    # totality: every node labeled
    assert len(a) == len(nodes)


def test_components_apply_edges_bridging_and_singletons(spark):
    """Incremental maintenance: a delta edge BRIDGING two old components
    merges them; singleton arrivals label themselves; result equals the
    one-shot closure over the union."""
    from trafsys_data_transfer_spark.operators.graph import (
        components_apply_edges,
        connected_components,
    )

    old_edges = spark.createDataFrame(
        _clique_edges(0, 3) + _clique_edges(10, 3), "src long, dst long"
    )
    old_nodes = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 10, 11, 12]], "id long"
    )
    base = connected_components(old_nodes, old_edges)
    delta = spark.createDataFrame([(2, 10), (20, 21)], "src long, dst long")
    new_nodes = spark.createDataFrame([(20,), (21,), (30,)], "id long")
    got = {
        (r.id, r.component)
        for r in components_apply_edges(base, delta, new_nodes).collect()
    }
    want_nodes = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 10, 11, 12, 20, 21, 30]], "id long"
    )
    want = {
        (r.id, r.component)
        for r in connected_components(
            want_nodes, old_edges.unionByName(delta)
        ).collect()
    }
    assert got == want
    d = dict(got)
    assert d[10] == 0  # bridge merged the cliques
    assert d[30] == 30  # singleton arrival


def test_hits_scores_bounded_and_positive(spark, sf_dir):
    """Rescaled HITS scores live in (0, HITS_SCALE]; the max on each
    side is exactly HITS_SCALE (the rescale pins it)."""
    from trafsys_data_transfer_spark.operators.graph import HITS_SCALE
    from trafsys_data_transfer_spark.registry import all_queries

    rows = all_queries()["graph_hits_bipartite"].build(spark, sf_dir).collect()
    for kind in ("authority", "hub"):
        scores = [r.score for r in rows if r.kind == kind]
        assert scores, kind
        assert max(scores) == HITS_SCALE
        assert all(0 < s <= HITS_SCALE for s in scores)
