"""Distributed k-means: planted-cluster recovery, monotone inertia,
bit-determinism, and plan shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.clustering import (
    _assign,
    kmeans_cluster_profile,
    kmeans_fit,
)
from trafsys_data_transfer_spark.sources.fixtures import load_table


def _planted(spark, n_per=30, dim=8, k=3, spread=0.01):
    """Three well-separated blobs at distance >> spread."""
    rng = random.Random(42)
    centers = [[float(5 * c)] * dim for c in range(k)]
    rows = []
    vid = 0
    for c in range(k):
        for _ in range(n_per):
            rows.append(
                (
                    vid,
                    [centers[c][d] + rng.uniform(-spread, spread) for d in range(dim)],
                    c,
                )
            )
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_kmeans_recovers_planted_clusters(spark):
    vecs = _planted(spark)
    centroids = kmeans_fit(vecs, k=3, iters=4)
    out = (
        _assign(vecs, centroids)
        .join(vecs.select("vec_id", "label"), "vec_id")
        .collect()
    )
    # each found cluster maps 1:1 onto one planted label
    mapping: dict[int, set[int]] = {}
    for r in out:
        mapping.setdefault(r.cluster, set()).add(r.label)
    assert all(len(v) == 1 for v in mapping.values())
    assert len(mapping) == 3


def test_kmeans_inertia_monotone_nonincreasing(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    prev = None
    for iters in (1, 2, 4):
        prof = kmeans_cluster_profile(vecs, k=8, iters=iters).collect()
        inertia = sum(r.inertia_micro for r in prof)
        if prev is not None:
            # Lloyd's never increases inertia (micro-quantization adds
            # ±0.5 per row; allow that slack)
            assert inertia <= prev + len(prof) * 500
        prev = inertia


def test_kmeans_bit_deterministic(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    c1 = kmeans_fit(vecs, k=8, iters=3)
    c2 = kmeans_fit(vecs.repartition(7), k=8, iters=3)
    # exact equality across different physical partitionings: the
    # fixed-point DECIMAL accumulation is order-free
    assert c1 == c2
    a = kmeans_cluster_profile(vecs, k=8, iters=3).collect()
    b = kmeans_cluster_profile(vecs, k=8, iters=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_kmeans_assignment_plan_is_narrow(spark, sf_dir):
    """Assignment must not shuffle or row-multiply: centroids broadcast
    into one Arrow stage, nothing corpus-sized crosses a boundary."""
    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = [[0.0] * 64 for _ in range(4)]
    plan = (
        _assign(vecs, centroids)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan  # Arrow mapInPandas only


def test_kmeans_all_vectors_assigned_once(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    prof = kmeans_cluster_profile(vecs, k=16, iters=2).collect()
    assert sum(r.n_vecs for r in prof) == vecs.count()
    for r in prof:
        assert r.mean_d2_micro == r.inertia_micro // r.n_vecs


def test_kmeans_more_clusters_than_points(spark):
    """k > n: empty clusters keep their seed positions; every point still
    assigned exactly once; profile only reports non-empty clusters."""
    vecs = _planted(spark, n_per=2, dim=4, k=2)  # 4 points
    prof = kmeans_cluster_profile(vecs, k=4, iters=2).collect()
    assert sum(r.n_vecs for r in prof) == 4
    assert len(prof) <= 4
