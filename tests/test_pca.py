"""Distributed PCA: exact-integer covariance vs numpy, planted-axis
recovery, projection correctness, partitioning determinism."""

from __future__ import annotations

import numpy as np
import pytest

from trafsys_data_transfer_spark.operators.pca import (
    _MFP,
    pca_fit,
    pca_project,
)


def _df(spark, x, partitions=4):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(partitions)


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(42)
    # variance concentrated on two planted orthogonal axes in 16-d
    d, n = 16, 600
    a = np.zeros(d); a[3] = 1.0
    b = np.zeros(d); b[11] = 1.0
    x = (
        rng.normal(0, 3.0, (n, 1)) * a
        + rng.normal(0, 1.5, (n, 1)) * b
        + rng.normal(0, 0.05, (n, d))
        + 0.7
    ).astype(np.float32)
    return x.astype(np.float64)


def test_covariance_matches_numpy_at_quantized_precision(spark, planted):
    x = planted
    mean, vals, w = pca_fit(_df(spark, x), k=4)
    xq = np.rint(x * _MFP) / _MFP  # the quantization the operator applies
    assert np.allclose(mean, xq.mean(axis=0), atol=1e-9)
    cov = np.cov(xq, rowvar=False, bias=True)
    nvals, nvecs = np.linalg.eigh(cov)
    assert np.allclose(sorted(vals, reverse=True), nvals[::-1][:4], atol=1e-9)


def test_planted_axes_recovered(spark, planted):
    _mean, vals, w = pca_fit(_df(spark, planted), k=2)
    # top axis ~ e3, second ~ e11
    assert abs(w[3, 0]) > 0.99 and abs(w[11, 1]) > 0.99
    assert vals[0] > vals[1] > 0


def test_projection_matches_numpy(spark, planted):
    x = planted
    mean, _vals, w = pca_fit(_df(spark, x), k=3)
    got = {
        r.vec_id: r.pc
        for r in pca_project(_df(spark, x), mean, w).collect()
    }
    want = np.einsum("nd,dk->nk", x.astype(np.float64) - mean, w)
    for i in range(len(x)):
        assert np.allclose(
            np.array(got[i]) / 1e6, want[i], atol=2e-3
        )  # float32 storage + micro rounding


def test_fit_is_partitioning_invariant(spark, planted):
    x = planted
    outs = []
    for parts in (1, 3, 8):
        mean, vals, w = pca_fit(_df(spark, x, parts), k=3)
        outs.append((mean.tolist(), vals.tolist(), w.tolist()))
    # integer moment sums => bit-identical covariance => identical basis
    assert outs[0] == outs[1] == outs[2]
