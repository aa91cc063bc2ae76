"""Distributed PCA / whitening over the ``embeddings`` table.

Embedding whitening is the standard preprocessing step in front of
semantic dedup and ANN serving (decorrelate + equalize variance so
cosine/L2 behaves; SemDeDup-style pipelines and IVF/PQ quantizers both
train better on whitened vectors).  The decomposition splits exactly
like the k-means fit in clustering.py:

* **Distributed second-moment pass.**  One ``mapInPandas`` stage emits
  per-batch integer partials of the mean vector (d cells) and the upper
  triangle of the raw second-moment matrix (d(d+1)/2 cells) — components
  fixed-point-quantized (×2^20) so the global sums are EXACT integers:
  the covariance matrix every run builds is bit-identical under any
  partitioning (a float SUM would drift by partition order and could
  flip near-degenerate eigenvectors).  Per batch the cross products stay
  in int64 (2^40 per cell × ~10⁴ rows ≪ 2^63); across batches they
  aggregate as DECIMAL(38,0).
* **Driver-side eigendecomposition of a d×d matrix.**  Model-sized
  (64×64 here), independent of corpus size — the same bounded-driver
  invariant the k-means cell table documents.  Eigenvector sign is
  normalized (largest-|component| positive) so the basis is
  deterministic despite eigh's sign ambiguity.
* **Broadcast projection.**  The d×k component matrix rides into one
  ``mapInPandas`` matmul; outputs are micro-quantized ints so downstream
  comparisons are exact.

Iterative/eigen math is not ANSI-SQL-expressible — registered rows-only;
certified by tests/test_pca.py (covariance matches numpy exactly at the
quantized precision, planted-variance axes recovered, projection matches
numpy, cross-partitioning determinism).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table

#: Fixed-point scale for moment accumulation.  2^20 keeps per-batch
#: cross-product sums in int64 with huge margin and quantization error
#: ~1e-6 per component — far below any principal axis of interest.
_MFP = float(1 << 20)

PCA_COMPONENTS = 8


def _moment_partials(vecs: DataFrame) -> DataFrame:
    """Per-batch integer partials: (i, j, s) upper-triangle second moments,
    (-1, pos, s) component sums, (-2, 0, n) row count."""

    def gen(batches):
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.rint(x * _MFP).astype(np.int64)
            d = q.shape[1]
            # int64 is safe per batch: |q|<=2^20 * ~4, products <= 2^44,
            # summed over <=~10^5 batch rows stays < 2^62.
            mom = q.T @ q  # d x d int64 exact
            sums = q.sum(axis=0)
            out = [(-2, 0, int(q.shape[0]))]
            out += [(-1, int(p), int(sums[p])) for p in range(d)]
            out += [
                (int(i), int(j), int(mom[i, j]))
                for i in range(d)
                for j in range(i, d)
            ]
            yield pd.DataFrame(out, columns=["i", "j", "s"])

    return vecs.select("embedding").mapInPandas(gen, "i int, j int, s long")


def pca_fit(vecs: DataFrame, k: int = PCA_COMPONENTS):
    """Exact-integer covariance accumulation + driver eigh.  Returns
    (mean, eigvals_desc, components) as numpy arrays; ``components`` is
    d×k with sign-normalized columns."""
    import numpy as np

    cells = (
        _moment_partials(vecs)
        .groupBy("i", "j")
        .agg(F.sum(F.col("s").cast("decimal(38,0)")).alias("s"))
        .collect()
    )
    n = int(next(r["s"] for r in cells if r["i"] == -2))
    sums = {r["j"]: int(r["s"]) for r in cells if r["i"] == -1}
    d = len(sums)
    mean_q = np.array([sums[p] for p in range(d)], dtype=np.float64) / n
    mom = np.zeros((d, d), dtype=np.float64)
    for r in cells:
        i, j = r["i"], r["j"]
        if i >= 0:
            mom[i, j] = mom[j, i] = float(int(r["s"]))
    cov = (mom / n - np.outer(mean_q, mean_q)) / (_MFP * _MFP)
    vals, vecs_ = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    w = vecs_[:, order]
    # sign normalization: largest-|component| of each axis is positive
    for c in range(w.shape[1]):
        if w[np.argmax(np.abs(w[:, c])), c] < 0:
            w[:, c] = -w[:, c]
    return mean_q / _MFP, vals[order], w


def pca_project(vecs: DataFrame, mean, components) -> DataFrame:
    """(vec_id, pc) with pc in exact micro-units: one broadcast matmul per
    Arrow batch; per-row results are row-independent reductions, so the
    projection is deterministic under any batching."""
    mean_l = [float(v) for v in mean]
    comp_l = [[float(v) for v in row] for row in components]

    def gen(batches):
        import numpy as np

        m = np.array(mean_l)
        w = np.array(comp_l)
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            proj = np.einsum("nd,dk->nk", x - m, w)
            out = pdf[["vec_id"]].copy()
            out["pc"] = [
                [int(v) for v in np.rint(row * 1_000_000.0)] for row in proj
            ]
            yield out

    return vecs.select("vec_id", "embedding").mapInPandas(
        gen, "vec_id long, pc array<long>"
    )


@register("embeddings_pca_project")  # eigen math: not SQL-expressible
def embeddings_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitening-basis projection of every embedding onto the top-8
    principal axes (micro-unit ints).  Covariance is accumulated as
    exact integers distributively; only the d×d moment matrix reaches
    the driver."""
    emb = load_table(spark, sf_dir, "embeddings")
    mean, _vals, w = pca_fit(emb, PCA_COMPONENTS)
    return pca_project(emb, mean, w).orderBy("vec_id")
