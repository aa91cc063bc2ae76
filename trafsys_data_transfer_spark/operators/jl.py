"""Johnson-Lindenstrauss random projection: seeded sign-matrix dimension
reduction for embedding columns.

The cheap, data-independent complement to PCA (``operators/pca.py``):
where PCA pays a distributed covariance pass to find the best k axes, JL
projects onto a FIXED ±1/√k sign matrix and the JL lemma guarantees all
pairwise distances are preserved within (1±ε) for k = O(log n / ε²) —
no fit pass, no model state, no refresh when data drifts.  That is the
right trade at 100 TB: the projection is one broadcast matmul per Arrow
batch (row-independent, deterministic under any batching/partitioning),
and the matrix itself is O(d·k) REGENERATED from a seed — nothing to
ship or version except one integer.

Determinism contract: matrix entries are a pure function of
(seed, i, j) via the splitmix64 finalizer — bit-identical on every
executor, every run, every engine, with none of numpy's global-RNG
ordering hazards.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.fixtures import load_table

#: Output dimensionality (fixture embeddings are d=64; k=16 keeps the
#: JL distortion measurable but bounded for the pytest gate).
JL_K = 16

JL_SEED = 0x5EED_1E55


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit finalizer (public splitmix64 constants)."""
    z = (z + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return z ^ (z >> np.uint64(31))


def jl_matrix(d: int, k: int = JL_K, seed: int = JL_SEED) -> np.ndarray:
    """The d×k Achlioptas sign matrix: entry (i,j) = ±1/√k by the parity
    of splitmix64(seed·d·k + i·k + j).  Pure function of its arguments."""
    idx = (
        np.uint64(seed) * np.uint64(0x100000001)
        + np.arange(d * k, dtype=np.uint64)
    ) & np.uint64(0xFFFFFFFFFFFFFFFF)
    bits = _splitmix64(idx) & np.uint64(1)
    signs = np.where(bits == 1, 1.0, -1.0).reshape(d, k)
    return signs / np.sqrt(k)


def jl_project(vecs: DataFrame, d: int, k: int = JL_K, seed: int = JL_SEED) -> DataFrame:
    """(vec_id, jl) with jl in exact micro-units (ints), one broadcast
    matmul per Arrow batch — same output discipline as ``pca_project`` so
    downstream comparisons are bit-stable."""

    def gen(batches):
        w = jl_matrix(d, k, seed)
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            proj = x @ w
            out = pdf[["vec_id"]].copy()
            out["jl"] = [
                [int(v) for v in np.rint(row * 1_000_000.0)] for row in proj
            ]
            yield out

    return vecs.select("vec_id", "embedding").mapInPandas(
        gen, "vec_id long, jl array<long>"
    )


def _jl_oracle_sql(d: int = 64, k: int = JL_K, seed: int = JL_SEED) -> str:
    """STRICT oracle (r11): the sign matrix is a pure function of the
    seed, so its k columns inline as DOUBLE[] literals and DuckDB replays
    the whole projection.  The ±1/√16 = ±0.25 weights are DYADIC, so
    every product is exact and the engines' sums differ only by
    association order — far below the micro-unit rounding grain."""
    w = jl_matrix(d, k, seed)
    cols = ", ".join(
        "list_sum(list_transform(list_zip(embedding::DOUBLE[], "
        + "[" + ", ".join(repr(x) for x in w[:, j]) + "]::DOUBLE[]"
        + "), s -> s[1] * s[2]))"
        for j in range(k)
    )
    return f"""
    SELECT vec_id,
           array_to_string(
               list_transform([{cols}],
                              x -> CAST(ROUND(x * 1000000.0) AS BIGINT)),
               ',') AS jl
    FROM embeddings ORDER BY vec_id
    """


@register("embeddings_jl_project", oracle=_jl_oracle_sql())
def embeddings_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL sign-projection of every embedding to k=16 micro-unit ints,
    certificate-encoded: ``jl`` is the comma-joined int string (the sq8
    certificate precedent) so the driver's pandas canonicalizer — which
    cannot sort/hash an ``array<bigint>`` cell (VERDICT r11 item 1b) —
    verifies it strictly.  Zero fit pass — the matrix regenerates from
    the seed on each executor; the oracle replays the projection from
    the inlined seed-derived sign columns; the distance-preservation
    guarantee vs the original vectors is pytest-gated (tests/test_jl.py).
    The trailing ORDER BY lives only in the oracle: the driver sorts
    both sides before hashing (r11 sort-drop precedent)."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    d = len(emb.select("embedding").first()["embedding"])
    return jl_project(emb, d).select(
        "vec_id",
        F.concat_ws(",", F.col("jl").cast("array<string>")).alias("jl"),
    )
