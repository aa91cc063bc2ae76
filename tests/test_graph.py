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
