"""Similarity search over the ``embeddings`` table (north star §2.10).

Three tiers:

* **Brute-force top-k** — broadcast the (small) query set against the
  corpus, cosine via ``zip_with``/``aggregate`` on double arrays (JVM-side
  higher-order functions, no UDF, no Python), windowed rank.  Exact; the
  baseline every ANN tier is audited against.  At 100 TB the corpus side
  stays partitioned and never shuffles — only the query set moves.
* **Random-hyperplane LSH ANN** — per-row signature bits via the same
  higher-order-function pattern (narrow), bucket on signature prefix,
  search within buckets.  Approximate; cost drops from O(|Q|·|C|) to
  O(|Q|·bucket).
* **Embedding near-dup pairs** — all-pairs cosine above a threshold on a
  bounded scope, the embedding-space analogue of `dedup_ngram_jaccard`.

Determinism: hyperplanes are generated from a fixed seed and inlined as
literal arrays, so plans are identical across runs/executors.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table

# ---------------------------------------------------------------------------
# vector math on array columns (builtin higher-order functions)
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — sequential left-to-right sum,
    deterministic and identical to DuckDB's list accumulation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double(a: Column) -> Column:
    """Cast array<float> → array<double> before any arithmetic: float
    accumulation is lossy and engine-specific; double math matches the
    DuckDB oracle bit-for-bit."""
    return F.transform(a, lambda x: x.cast("double"))


# ---------------------------------------------------------------------------
# brute-force exact top-k
# ---------------------------------------------------------------------------


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast(queries) ⋈ corpus, rank per query.

    The corpus never moves — each partition scores its rows against the
    broadcast query set and the per-query top-k is taken with a window
    (rank by score desc, id asc for deterministic ties).  At scale, replace
    the row_number window with a per-partition top-k + re-rank if |Q| is
    large; for bounded |Q| this plan is already the right one.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("score", 6).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH (approximate, the scale path)
# ---------------------------------------------------------------------------

LSH_DIM = 64  # fixture embedding dimensionality
#: Bits/tables trade candidate-set size against recall, and the right point
#: depends on how *close* true neighbors are: for tightly-clustered corpora
#: (near-dup detection) use more bits; the fixture embeddings are weakly
#: similar (top-5 cosine ≈ 0.4 → P[bit agrees] ≈ 0.63), so few bits + more
#: OR-amplified tables is what reaches usable recall.
LSH_PLANES = 4  # signature bits per table
LSH_TABLES = 8  # OR-amplification: candidate if ANY table's bucket matches
_rng = random.Random(7)
#: Fixed random hyperplanes per table, inlined as literals → deterministic.
HYPERPLANES = tuple(
    tuple(
        tuple(_rng.gauss(0.0, 1.0) for _ in range(LSH_DIM))
        for _ in range(LSH_PLANES)
    )
    for _ in range(LSH_TABLES)
)


#: Hyperplanes as a (TABLES·PLANES, DIM) matrix for the vectorized path.
_H_FLAT = np.array(HYPERPLANES, dtype=np.float64).reshape(-1, LSH_DIM)
_BIT_WEIGHTS = 1 << np.arange(LSH_PLANES, dtype=np.int64)


@pandas_udf(ArrayType(LongType()))
def _lsh_buckets_np(vecs: pd.Series) -> pd.Series:
    """Vectorized bucket ids, one per table: bit p of table t's bucket is
    sign(vec · hyperplane_{t,p}).  The whole Arrow batch is one
    (n,dim)@(dim,tables·planes) matrix multiply — per-row cost is
    TABLES×PLANES fused multiply-adds, no expression-tree interpretation."""
    V = np.stack(
        [
            np.asarray(v, dtype=np.float64)
            if v is not None and len(v) == LSH_DIM
            else np.zeros(LSH_DIM)
            for v in vecs
        ]
    )
    bits = (V @ _H_FLAT.T > 0).astype(np.int64)
    buckets = (bits.reshape(len(V), LSH_TABLES, LSH_PLANES) * _BIT_WEIGHTS).sum(axis=2)
    return pd.Series(list(buckets))


def lsh_buckets(vec: Column) -> Column:
    """Array of per-table bucket ids (index = table).  Narrow per-row
    computation; pair with ``posexplode`` to get (table, bucket) keys."""
    return _lsh_buckets_np(vec)


def lsh_buckets_banded(planes: int, tables: int):
    """Factory: bucket UDF with a custom (planes, tables) banding of the
    SAME fixed hyperplane pool (``planes·tables ≤ 32``), so signatures
    stay deterministic while the bits-per-bucket trade is tunable.

    More planes → smaller buckets → quadratically fewer candidate pairs,
    at lower recall for weakly-similar pairs.  The default 4×8 banding
    targets the weakly-similar fixture corpus; a DUP-DENSE corpus (real
    near-dups at cos ≥ 0.9, where each bit agrees w.p. ~0.97) wants 8×4:
    twin-pair recall stays ≈ 1 while bucket population drops 16× (the
    measured 10× blowup in SCALE.md round 5).
    """
    if planes * tables > _H_FLAT.shape[0]:
        raise ValueError(f"planes*tables must be ≤ {_H_FLAT.shape[0]}")
    H = _H_FLAT[: planes * tables]
    weights = 1 << np.arange(planes, dtype=np.int64)

    @pandas_udf(ArrayType(LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        V = np.stack(
            [
                np.asarray(v, dtype=np.float64)
                if v is not None and len(v) == LSH_DIM
                else np.zeros(LSH_DIM)
                for v in vecs
            ]
        )
        bits = (V @ H.T > 0).astype(np.int64)
        out = (bits.reshape(len(V), tables, planes) * weights).sum(axis=2)
        return pd.Series(list(out))

    return buckets


def topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates = corpus rows sharing any LSH table's bucket
    with the query (OR-amplified across LSH_TABLES), re-scored exactly,
    ranked.  The bucket equi-join replaces the cross join — at 100 TB this
    is the difference between scanning the corpus per query and touching
    ~TABLES·|C|/2^planes rows per query.  Recall is audited against
    :func:`topk_bruteforce` in the test suite."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).select(
        "query_id", "qv", F.posexplode(lsh_buckets(F.col("qv"))).alias("t", "bucket")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).select(
        "neighbor_id", "cv", F.posexplode(lsh_buckets(F.col("cv"))).alias("t", "bucket")
    )
    candidates = (
        c.join(F.broadcast(q), ["t", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.withColumn("score", cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("score", 6).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

IVF_CLUSTERS = 16
IVF_NPROBE = 4


#: Cap on the driver-side training sample: IVF coarse quantizers are always
#: trained on a sample (FAISS defaults to ~256 vectors/centroid); the full
#: corpus only ever flows through the *assignment* matmul, never training.
IVF_TRAIN_SAMPLE = 4096


def _collect_train_sample(
    corpus: DataFrame, vec_col: str, cap: int
) -> np.ndarray:
    """Bounded, DETERMINISTIC training sample: the ``cap`` vectors with
    the smallest ``xxhash64(vec)`` — a single TakeOrderedAndProject job
    (map-side partial top-k per partition, no full-count pre-pass; the
    r8 version's count+filtered-collect pair cost two scans per trainer
    call).  Ordering by (hash, vector) makes both the sample SET and its
    row order independent of partition/scan layout — k-means init
    indexes into this matrix, so row order would otherwise leak scan
    nondeterminism into the codebooks (ADVICE r04)."""
    sample = (
        corpus.select(
            as_double(F.col(vec_col)).alias("v"),
            F.xxhash64(F.col(vec_col)).alias("h"),
        )
        .orderBy("h", "v")
        .limit(cap)
        .collect()
    )
    return np.array([r["v"] for r in sample], dtype=np.float64)


def train_ivf_centroids(
    corpus: DataFrame, vec_col: str = "embedding", n_clusters: int = IVF_CLUSTERS,
    seed: int = 42,
) -> np.ndarray:
    """Coarse quantizer: k-means centroids over a bounded corpus sample.

    A deterministic modulo filter (`pmod(xxhash64(vec), m) = 0`) draws
    ≤ :data:`IVF_TRAIN_SAMPLE` vectors with ONE narrow pruned scan — no
    shuffle, no dependence on row order — and Lloyd's iterations run on the
    driver in numpy (k·|sample|·dim flops per iteration, milliseconds).
    Distributed KMeans would re-scan the corpus ~10× for the same
    centroids; at 100 TB the sample bound is what makes training O(1)
    while assignment stays the only full pass.  Fixed seed → deterministic
    centroids → deterministic inverted lists.
    """
    X = _collect_train_sample(corpus, vec_col, IVF_TRAIN_SAMPLE)
    rng = np.random.RandomState(seed)
    centroids = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(10):  # Lloyd
        d2 = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(len(centroids)):
            members = X[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return centroids


def _ivf_assign_udf(centroids: np.ndarray, nprobe: int):
    """Pandas UDF mapping a vector to its ``nprobe`` nearest centroids by
    L2 (matching KMeans' objective); one matmul per Arrow batch."""
    c = centroids.astype(np.float64)
    c_sq = (c**2).sum(axis=1)

    @pandas_udf(ArrayType(LongType()))
    def assign(vecs: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = (V**2).sum(axis=1)[:, None] - 2.0 * (V @ c.T) + c_sq[None, :]
        order = np.argsort(d2, axis=1)[:, :nprobe].astype(np.int64)
        return pd.Series(list(order))

    return assign


def topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = IVF_CLUSTERS,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: train a coarse quantizer, partition the corpus into
    inverted lists by nearest centroid, and search each query against only
    its ``nprobe`` nearest lists, rescoring candidates exactly.

    Scale shape: corpus assignment is a narrow batch matmul; the search is
    an equi-join on ``cluster`` — each query touches ~nprobe/n_clusters of
    the corpus.  At 100 TB the assigned corpus is written partitioned by
    ``cluster`` so a probe is a partition-pruned scan, and n_clusters grows
    to keep list sizes bounded (√N is the usual rule).
    """
    centroids = train_ivf_centroids(corpus, vec_col, n_clusters)
    assign1 = _ivf_assign_udf(centroids, 1)
    probe = _ivf_assign_udf(centroids, nprobe)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cluster", F.element_at(assign1(F.col("cv")), 1))
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        )
        .withColumn("cluster", F.explode(probe(F.col("qv"))))
    )
    candidates = (
        c.join(F.broadcast(q), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    scored = candidates.withColumn("score", cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("score", 6).alias("score"),
        )
    )


def ivf_index_write(
    corpus: DataFrame,
    path: str,
    n_clusters: int = IVF_CLUSTERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Materialize the IVF index as a cluster-partitioned parquet table.

    The inverted lists become partition directories (``cluster=N/``), so a
    probe is a *partition-pruned scan* — the storage layout IS the index.
    Centroids are persisted alongside under ``_centroids.json`` (underscore
    prefix → invisible to parquet directory listings).  This is the
    batch-build half of a real ANN serving path: build once per corpus
    version, probe many times without re-deriving assignments.
    """
    import json
    import os

    centroids = train_ivf_centroids(corpus, vec_col, n_clusters, seed)
    assign1 = _ivf_assign_udf(centroids, 1)
    # NOTE (r11): deliberately NOT spread — a paired A/B on the sibling
    # ivfpq write measured the pre-UDF embedding-payload exchange
    # costlier than the cheap assign matmul it parallelises; the cluster
    # repartition below is the only exchange this build needs.
    assigned = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cluster", F.element_at(assign1(F.col("cv")), 1))
    assigned.repartition(F.col("cluster")).write.mode("overwrite").partitionBy(
        "cluster"
    ).parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump(centroids.tolist(), f)


def ivf_index_probe(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a materialized IVF index: the query set's probed clusters
    become an ``isin`` partition filter, so the scan touches only
    ~|probed clusters|/n_clusters of the index files (PartitionFilters in
    the plan — asserted in tests), then candidates are exactly rescored
    and ranked as in :func:`topk_ivf`."""
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        centroids = np.array(json.load(f), dtype=np.float64)
    probe = _ivf_assign_udf(centroids, nprobe)
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        )
        .withColumn("cluster", F.explode(probe(F.col("qv"))))
    )
    # Driver-side collect INVARIANT (VERDICT r06): this set is at most
    # min(n_clusters, |queries| x nprobe) cluster IDS (ints, no vectors),
    # and |queries| is capped by MAX_QUERY_ROWS at the serving shape —
    # bounded metadata like a partition-pruning predicate, never
    # data-sized.  It exists to turn the probe into a partition-pruned
    # scan (`cluster IN (...)` on the partitioned index).
    probed = sorted({r["cluster"] for r in q.select("cluster").distinct().collect()})
    index = spark.read.parquet(path).filter(F.col("cluster").isin(probed))
    candidates = (
        index.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(q), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    scored = candidates.withColumn("score", cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("score", 6).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


@register(
    "sim_topk_bruteforce",
    oracle="""
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, score FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                            c.vec_id ASC) AS rank,
               ROUND(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS score
        FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 8
    ) WHERE rank <= 5
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for query vectors vec_id < 8."""
    emb = load_table(spark, sf_dir, "embeddings")
    return topk_bruteforce(emb, emb.filter(F.col("vec_id") < 8), k=5)


def _lsh_planes_sql() -> str:
    """The fixed LSH hyperplanes as a SQL VALUES relation ``(t, p, w)``.

    The planes are seed-deterministic module constants, so inlining them
    as literals lets the DuckDB oracle recompute the ENTIRE bucketing —
    the same trick that makes the SQ8 tier strict.  Python ``repr`` emits
    shortest-round-trip doubles, so the oracle's plane values are
    bit-identical to the numpy matrix."""
    rows = []
    for t, table in enumerate(HYPERPLANES):
        for p, plane in enumerate(table):
            vec = "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"
            rows.append(f"({t}, {p}, {vec})")
    return "SELECT * FROM (VALUES " + ", ".join(rows) + ") AS planes(t, p, w)"


@register(
    "sim_topk_lsh",
    # STRICT (r11, VERDICT r10 task 4): the random hyperplanes are fixed
    # literals, so the oracle replays sign-bit bucketing, OR-amplified
    # candidate generation, and the exact-cosine rescore end to end.  The
    # sign test is rounding-robust (|v·h| ~ O(1), never within double
    # noise of 0 on the frozen fixtures), so engine summation order
    # cannot flip a bit.
    oracle=f"""
    WITH planes AS ({_lsh_planes_sql()}),
    b AS (
        SELECT e.vec_id, pl.t,
               CAST(SUM(CASE WHEN list_sum(list_transform(
                        list_zip(e.embedding::DOUBLE[], pl.w),
                        s -> s[1] * s[2])) > 0
                        THEN (1 << pl.p) ELSE 0 END) AS BIGINT) AS bucket
        FROM embeddings e CROSS JOIN planes pl
        GROUP BY e.vec_id, pl.t
    ),
    cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM b q JOIN b c ON c.t = q.t AND c.bucket = q.bucket
                         AND c.vec_id != q.vec_id
        WHERE q.vec_id < 8
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, score FROM (
        SELECT cand.query_id, cand.neighbor_id,
               row_number() OVER (PARTITION BY cand.query_id ORDER BY
                   list_cosine_similarity(qe.embedding::DOUBLE[],
                                          ne.embedding::DOUBLE[]) DESC,
                   cand.neighbor_id ASC) AS rank,
               ROUND(list_cosine_similarity(qe.embedding::DOUBLE[],
                                            ne.embedding::DOUBLE[]), 6)
                   AS score
        FROM cand
        JOIN embeddings qe ON qe.vec_id = cand.query_id
        JOIN embeddings ne ON ne.vec_id = cand.neighbor_id
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via random-hyperplane LSH for query vectors vec_id < 8.
    Strict: the oracle recomputes bucketing from the inlined hyperplane
    literals, so a broken signature, a lost OR-amplification table, or a
    wrong rescore all hash-mismatch; recall vs brute force is ALSO
    asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    return topk_lsh(emb, emb.filter(F.col("vec_id") < 8), k=5).orderBy(
        "query_id", "rank"
    )


@register(
    "sim_topk_ivf",
    # STRICT certificate (r11, VERDICT r10 task 4): k-means centroids are
    # data-derived (not SQL-replayable), so the registered row carries
    # oracle-recomputable constants plus in-band booleans computed
    # Spark-side — exact-rescore equality, rank monotonicity, self
    # exclusion, and aggregate recall >= 0.5 vs the in-plan brute-force
    # truth (0.525 on the frozen fixtures, deterministic).  The raw
    # (query, neighbor, rank, score) table stays available via topk_ivf.
    oracle="""
    SELECT vec_id AS query_id,
           CAST(5 AS BIGINT) AS n_returned,
           TRUE AS scores_exact, TRUE AS ranks_monotone,
           TRUE AS self_excluded, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 8 ORDER BY query_id
    """,
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 certificate for query vectors vec_id < 8: per query
    the returned-row count plus four invariants the oracle expects TRUE.
    All booleans are computed in-plan (no driver-side actions): the
    rescore check re-derives cosine from the stored vectors, monotonicity
    uses a lag window over the ranking, and recall joins against the
    brute-force truth — one bounded 8-query comparison."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    return ann_topk_certificate(emb, q, topk_ivf(emb, q, k=5))


def ann_topk_certificate(emb: DataFrame, q: DataFrame, got: DataFrame) -> DataFrame:
    """Per-query strict certificate over an ANN tier's (query_id,
    neighbor_id, rank, score) output: returned-row count plus four
    invariants computed IN-PLAN (no driver actions) — exact-rescore
    equality from the stored vectors, rank monotonicity via a lag window,
    self exclusion, and aggregate recall ≥ 0.5 against the in-plan
    brute-force truth.  Shared by the IVF / PQ / stored-PQ / IVF-PQ tiers
    (their k-means codebooks are data-derived, so a full SQL replay à la
    ``sim_topk_lsh`` is impossible — this is the strongest
    oracle-checkable contract)."""
    e_n = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double(F.col("embedding")).alias("nv"),
    )
    e_q = emb.select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qv2"),
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    checked = (
        got.join(e_n, "neighbor_id")
        .join(F.broadcast(e_q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            "score",
            (F.round(cosine(F.col("qv2"), F.col("nv")), 6) == F.col("score"))
            .alias("score_ok"),
            (F.coalesce(F.lag("score").over(w) >= F.col("score"), F.lit(True)))
            .alias("mono_ok"),
        )
    )
    per_q = checked.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_returned"),
        F.min("score_ok").alias("scores_exact"),
        F.min("mono_ok").alias("ranks_monotone"),
        (~F.max(F.col("neighbor_id") == F.col("query_id"))).alias(
            "self_excluded"
        ),
    )
    truth = topk_bruteforce(emb, q, k=5).select("query_id", "neighbor_id")
    hits = got.join(truth, ["query_id", "neighbor_id"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    total = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    recall = hits.join(total).select(
        (2 * F.col("n_hit") >= F.col("n_truth")).alias("recall_ok")
    )
    return (
        per_q.join(F.broadcast(recall))
        .select(
            "query_id",
            "n_returned",
            "scores_exact",
            "ranks_monotone",
            "self_excluded",
            "recall_ok",
        )
        .orderBy("query_id")
    )


#: Shared oracle for the ANN certificate tiers (see ann_topk_certificate).
ANN_CERT_ORACLE = """
    SELECT vec_id AS query_id,
           CAST(5 AS BIGINT) AS n_returned,
           TRUE AS scores_exact, TRUE AS ranks_monotone,
           TRUE AS self_excluded, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 8 ORDER BY query_id
    """


@register(
    "sim_label_centroids",
    oracle=f"""
    SELECT label, CAST(t.i - 1 AS INT) AS pos,
           ROUND(AVG(CAST(embedding[t.i] AS DOUBLE)), 6) AS centroid,
           COUNT(*) AS n_vectors
    FROM embeddings CROSS JOIN range(1, {LSH_DIM + 1}) AS t(i)
    GROUP BY label, t.i
    ORDER BY label, pos
    """,
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-wise class centroids: per-label mean embedding, exploded to
    (label, pos) rows.  ``posexplode`` is narrow (×dim row multiplier, no
    Python), and the groupBy reduce side is bounded by labels×dims
    regardless of corpus size — map-side partial sums do the heavy lifting.
    The centroid table is the training step of nearest-class-mean
    classification and the audit view for embedding drift."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode(as_double(F.col("embedding"))).alias("pos", "x")
        )
        .groupBy("label", F.col("pos").cast("int").alias("pos"))
        .agg(
            F.round(F.avg("x"), 6).alias("centroid"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .orderBy("label", "pos")
    )


@register(
    "sim_embedding_neardup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 150 AND b.vec_id < 150
      AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
    """,
)
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs on a bounded scope (vec_id < 150,
    cos ≥ 0.3) — exact ground truth; the LSH tier
    (:func:`embedding_neardup_pairs_lsh`) is the scale path.  The guard
    makes the bound HARD: >1000 input rows raises before the cross join
    executes (VERDICT r07 task 7)."""
    from .dedup import quadratic_scope_guard

    emb = quadratic_scope_guard(
        load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150),
        1000,
        "sim_embedding_neardup",
        "embedding_neardup_pairs_lsh",
    )
    a = emb.select(F.col("vec_id").alias("id_a"), as_double(F.col("embedding")).alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), as_double(F.col("embedding")).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim_raw", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos_sim_raw") >= 0.3)
        .select("id_a", "id_b", F.round("cos_sim_raw", 6).alias("cos_sim"))
    )


@pandas_udf(DoubleType())
def _cos_pairs_np(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Vectorized pair-cosine: one numpy pass per Arrow batch.  The bulk
    candidate-verification path — the interpreted ``zip_with/aggregate``
    expression form measured ~6× slower on the ~1M-pair sf0.1 candidate
    set (BASELINE.md round-5 note)."""
    A = np.stack(va.values)
    B = np.stack(vb.values)
    num = (A * B).sum(axis=1)
    den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    den[den == 0.0] = 1.0
    return pd.Series(num / den)


def embedding_neardup_pairs_lsh(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = LSH_PLANES,
    tables: int = LSH_TABLES,
) -> DataFrame:
    """Embedding near-dup pairs at scale: LSH-bucket candidate generation
    (banded equi-join, never an all-pairs cross join) + exact cosine
    verification (numpy per Arrow batch).  The scale-path form of
    :func:`sim_embedding_neardup`'s bounded exact scan: precision is exact
    (every returned pair really has ``cos ≥ threshold`` under float64
    arithmetic); the bucket stage only affects recall, audited in tests
    against the exact pairs on a bounded scope.

    Plan shape (the MinHash lesson, re-learned here by measurement): the
    bucket self-join and the pair dedupe run on the SKINNY (id, table,
    bucket) projection — at sf0.1 the candidate stage is ~1M rows, and
    carrying two 64-dim double arrays through that join + distinct was
    ~1 GB of shuffle (11.8 s for 700 final pairs).  Vectors are attached
    AFTER the distinct, by joining the deduped id pairs back to the
    corpus (broadcast here; at 100 TB two hash joins on the narrow pair
    table), then verified in one numpy pass per Arrow batch.  Measured
    11.8 s → 1.7 s on identical output.

    Fixture-tuning note: the synthetic corpus is only weakly similar
    (true neighbor cosines ≈ 0.4), which forces few LSH planes and a low
    threshold → dense candidates.  A production near-dup pass (cos ≥ 0.9)
    uses more planes per table, collapsing candidate counts by orders of
    magnitude at the same recall."""
    bucket_fn = (
        _lsh_buckets_np
        if (planes, tables) == (LSH_PLANES, LSH_TABLES)
        else lsh_buckets_banded(planes, tables)
    )
    from ..session import spread

    vecs = corpus.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    )
    # r11: spread before the bucket UDF (one core off a single-file scan
    # otherwise) and checkpoint the skinny band table so the self-join's
    # two sides share one materialisation instead of re-running the
    # Scan→ArrowEvalPython→Generate chain per side.
    skinny = (
        spread(vecs, "id")
        .select("id", F.posexplode(bucket_fn(F.col("v"))).alias("t", "bucket"))
        # eager (r12): the self-join's two sides are CONCURRENT stages —
        # a lazy checkpoint let both recompute the Scan→ArrowEvalPython
        # chain before the cache filled (the minhash sh_df finding);
        # interleaved A/B: sim_semantic_dedup_pipeline 5.24 → 4.72 s.
        .localCheckpoint(eager=True)
    )
    a = skinny.select(F.col("id").alias("id_a"), "t", "bucket")
    b = skinny.select(F.col("id").alias("id_b"), "t", "bucket")
    pair_ids = (
        a.join(b, ["t", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    attached = pair_ids.join(
        F.broadcast(vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"))),
        "id_a",
    ).join(
        F.broadcast(vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))),
        "id_b",
    )
    return (
        attached.withColumn("cos_sim_raw", _cos_pairs_np(F.col("va"), F.col("vb")))
        .filter(F.col("cos_sim_raw") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim_raw", 6).alias("cos_sim"))
    )


@register(
    "sim_semantic_dedup_pipeline",
    # STRICT (r11s6): the hyperplanes are fixed literals (the sim_topk_lsh
    # conversion) and the cluster closure is a recursive CTE (the
    # dedup_components conversion) — composing the two replays the WHOLE
    # pipeline in SQL: sign-bit bucketing → OR-amplified candidates →
    # exact-cosine ≥ 0.4 verify → connected components → min-id keeper →
    # per-label yield.
    oracle="""
    WITH RECURSIVE planes AS ({planes}),
    b AS (
        SELECT e.vec_id, pl.t,
               CAST(SUM(CASE WHEN list_sum(list_transform(
                        list_zip(e.embedding::DOUBLE[], pl.w),
                        s -> s[1] * s[2])) > 0
                        THEN (1 << pl.p) ELSE 0 END) AS BIGINT) AS bucket
        FROM embeddings e CROSS JOIN planes pl
        GROUP BY e.vec_id, pl.t
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS u, c.vec_id AS v
        FROM b a JOIN b c ON c.t = a.t AND c.bucket = a.bucket
                         AND a.vec_id < c.vec_id
    ),
    pairs AS (
        SELECT u, v FROM cand
        JOIN embeddings ea ON ea.vec_id = cand.u
        JOIN embeddings eb ON eb.vec_id = cand.v
        WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
                                     eb.embedding::DOUBLE[]) >= 0.4
    ),
    edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
    reach AS (
        SELECT vec_id AS id, vec_id AS r FROM embeddings
        UNION
        SELECT e.v AS id, reach.r FROM reach JOIN edges e ON e.u = reach.id
    ),
    comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
    keep AS (SELECT component, MIN(id) AS keeper_id FROM comp GROUP BY component)
    SELECT emb.label,
           COUNT(*) AS n_vectors,
           CAST(SUM(CASE WHEN comp.id = keep.keeper_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keepers,
           ROUND(CAST(SUM(CASE WHEN comp.id = keep.keeper_id THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS yield_frac
    FROM embeddings emb
    JOIN comp ON comp.id = emb.vec_id
    JOIN keep USING (component)
    GROUP BY emb.label
    ORDER BY emb.label
    """.format(planes=_lsh_planes_sql()),
)
def sim_semantic_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup, end to end: LSH-bucketed embedding
    near-dup pairs (cos ≥ 0.4) → connected components → min-id keeper per
    cluster → per-label yield accounting — the embedding-space twin of
    ``dedup_neardup_pipeline``, certifying the similarity and graph
    operators compose on the vector id space."""
    from .graph import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs_lsh(emb, threshold=0.4)
    nodes = emb.select(F.col("vec_id").alias("id"))
    comp = connected_components(
        nodes, pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    # r12: keeper == component (components returns the min reachable id),
    # so the keeper groupBy + join re-derived an existing column.
    labeled = emb.join(comp, emb.vec_id == comp.id).withColumn(
        "is_keeper", (F.col("vec_id") == F.col("component")).cast("int")
    )
    return (
        labeled.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("is_keeper").alias("n_keepers"),
            F.round(F.sum("is_keeper") / F.count(F.lit(1)), 6).alias("yield_frac"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization (SQ8) + exact-integer MIPS
# ---------------------------------------------------------------------------

#: Hard cap on driver-collected query sets (SQ8/PQ LUT construction and the
#: broadcast dot-product matrices).  |Q|·dim·8 bytes at this cap is ~2 MB —
#: far under driver/broadcast limits; a larger query set should be chunked
#: by the caller, not silently collected (ADVICE r04).
MAX_QUERY_ROWS = 4096


def _collect_bounded_queries(queries: DataFrame, op: str) -> list:
    """Enforce the bounded-|Q| contract: collect at most MAX_QUERY_ROWS
    rows, raising a clear error (instead of a downstream numpy shape
    failure or a silent driver OOM) when the query set exceeds the cap."""
    rows = queries.limit(MAX_QUERY_ROWS + 1).collect()
    if len(rows) > MAX_QUERY_ROWS:
        raise ValueError(
            f"{op}: query set exceeds MAX_QUERY_ROWS={MAX_QUERY_ROWS}; "
            "chunk the query set and union the per-chunk results"
        )
    return rows


def sq8_quantize(vec: Column) -> Column:
    """Symmetric per-vector int8 scalar quantization: ``round(x·127/max|x|)``.

    The FAISS-``SQ8``-style compression step — 4× smaller than float32, so
    4× more vectors per executor memory/scan byte, which is the lever that
    matters when the embedding table is the 100 TB part.  All-zero vectors
    quantize to zero (guarded identically in the DuckDB oracle).  The
    quantized dot product below is then EXACT int64 arithmetic — no float
    accumulation order to disagree about between engines.

    Geometry note: the per-vector scale makes the codes SCALE-INVARIANT
    (``q(c·x) == q(x)`` for c>0 — L2-normalising first would be a no-op),
    and the quantized dot ranks by ``(a·b)/(max|a|·max|b|)`` — close to
    cosine when max-norm tracks L2-norm, but not equal to either cosine or
    raw MIPS.  Where exact-cosine ranking is required from the compressed
    scan, use :func:`topk_sq8_rescored`, which shortlists on the quantized
    score and rescores candidates with float cosine (the PQ recipe).
    """
    dv = as_double(vec)
    m = F.array_max(F.transform(dv, lambda x: F.abs(x)))
    return F.transform(
        dv,
        lambda x: F.when(m == 0, F.lit(0))
        .otherwise(F.round(x * 127.0 / m))
        .cast("bigint"),
    )


def int_dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ over int arrays — exact, order-independent (int addition is
    associative), hence bit-identical on any engine."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def topk_sq8(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantized max-inner-product top-k: SQ8 both sides, rank by the exact
    int64 dot product.  The corpus never moves; the bounded query set is
    collected once (the same bounded-driver-step contract as the PQ/IVF
    tiers) and every Arrow batch scores ALL queries with ONE int64 numpy
    matmul — exact, so the result is bit-identical to the
    :func:`int_dot` expression form, which evaluates as an interpreted
    higher-order function and measured ~4× slower (BASELINE.md).  This
    inline form quantizes per run (fixture convenience); the production
    shape — codes stored once, probed without touching the float corpus —
    is :func:`sq8_index_write` / :func:`sq8_index_probe`, whose results
    are bit-identical to this tier (asserted in tests)."""
    q_rows = _collect_bounded_queries(
        queries.select(
            F.col(id_col).alias("query_id"), sq8_quantize(F.col(vec_col)).alias("qq")
        ),
        "topk_sq8",
    )
    if not q_rows:  # empty query set → empty result, not a 0-d matmul crash
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, qdot bigint"
        )
    qids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    QM = np.array([r["qq"] for r in q_rows], dtype=np.int64)

    from ..session import spread

    # r11: spread before the per-row quantize expression + Python matmul
    # boundary — inline tier only; the stored-index probe reads its own
    # partitioned parquet and must NOT pay a corpus shuffle.
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), sq8_quantize(F.col(vec_col)).alias("cq")
    )
    return _sq8_scan_topk(c, qids, QM, k)


def _sq8_scan_topk(encoded: DataFrame, qids: np.ndarray, QM: np.ndarray, k: int) -> DataFrame:
    """Shared SQ8 scan: one int64 numpy matmul per Arrow batch over an
    encoded corpus ``(neighbor_id, cq array<int>)`` — used by both the
    inline tier (quantize-per-run) and the stored-index probe (codes read
    from parquet)."""

    def dots(batches):
        for pdf in batches:
            C = np.stack(pdf["cq"].values).astype(np.int64)  # (N, dim)
            S = QM @ C.T  # (|Q|, N) — exact: |values| ≤ 127, dim ≤ 2^13
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, len(C)),
                    "neighbor_id": np.tile(pdf["neighbor_id"].values, len(qids)),
                    "qdot": S.reshape(-1),
                }
            )

    scored = encoded.mapInPandas(
        dots, schema="query_id long, neighbor_id long, qdot long"
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("qdot").cast("bigint").alias("qdot"),
        )
    )


@register(
    "sim_topk_sq8",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[], x ->
                  CASE WHEN m = 0 THEN CAST(0 AS BIGINT)
                       ELSE CAST(ROUND(x * 127.0 / m) AS BIGINT) END) AS qv
        FROM (SELECT vec_id, embedding,
                     list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS m
              FROM embeddings)
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           CAST(qdot AS BIGINT) AS qdot
    FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               list_sum(list_transform(list_zip(a.qv, b.qv), s -> s[1] * s[2])) AS qdot,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY
                   list_sum(list_transform(list_zip(a.qv, b.qv), s -> s[1] * s[2])) DESC,
                   b.vec_id ASC) AS rank
        FROM q a JOIN q b ON b.vec_id != a.vec_id
        WHERE a.vec_id < 8
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def sim_topk_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8-quantized max-inner-product top-5 for query vectors vec_id < 8 —
    the compressed-scan ANN tier; ranking is exact int64 arithmetic, so the
    result (unlike any float path) is engine- and order-independent."""
    emb = load_table(spark, sf_dir, "embeddings")
    return topk_sq8(emb, emb.filter(F.col("vec_id") < 8), k=5).orderBy(
        "query_id", "rank"
    )


def topk_sq8_rescored(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SQ8 scan + exact cosine rescore — the PQ recipe applied to the SQ8
    tier: the int8 matmul shortlists ``shortlist`` candidates per query,
    and only those rows are joined back to the float corpus for exact
    cosine ranking.  Quantization noise then affects recall only (whether
    a true neighbor makes the shortlist), never the reported scores — the
    fix for the raw-qdot tier's norm-geometry gap (see
    :func:`sq8_quantize`)."""
    short = topk_sq8(corpus, queries, k=shortlist, id_col=id_col, vec_col=vec_col)
    c_float = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    q_float = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    # Broadcast the SHORTLIST side (r12, guide §3.1 / VERDICT r11 item 7):
    # it is |Q|·shortlist rows of two longs (bounded by MAX_QUERY_ROWS),
    # while c_float is the corpus — without the hint Catalyst's estimate
    # for the windowed shortlist picks a sort-merge join and shuffles the
    # float corpus by neighbor_id just to attach ≤400 candidate rows.
    rescored = (
        F.broadcast(short.select("query_id", "neighbor_id"))
        .join(c_float, "neighbor_id")
        .join(F.broadcast(q_float), "query_id")
        .withColumn("score", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("score", 6).alias("score"),
        )
    )


@register(
    "sim_topk_sq8_rescored",
    oracle="""
    WITH q AS (
        SELECT vec_id, embedding,
               list_transform(embedding::DOUBLE[], x ->
                  CASE WHEN m = 0 THEN CAST(0 AS BIGINT)
                       ELSE CAST(ROUND(x * 127.0 / m) AS BIGINT) END) AS qv
        FROM (SELECT vec_id, embedding,
                     list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS m
              FROM embeddings)
    ),
    shortlist AS (
        SELECT query_id, neighbor_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY a.vec_id ORDER BY
                       list_sum(list_transform(list_zip(a.qv, b.qv), s -> s[1] * s[2])) DESC,
                       b.vec_id ASC) AS r
            FROM q a JOIN q b ON b.vec_id != a.vec_id
            WHERE a.vec_id < 8
        ) WHERE r <= 50
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, score FROM (
        SELECT s.query_id, s.neighbor_id,
               row_number() OVER (PARTITION BY s.query_id ORDER BY
                   list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]) DESC,
                   s.neighbor_id ASC) AS rank,
               ROUND(list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 6) AS score
        FROM shortlist s
        JOIN embeddings qe ON qe.vec_id = s.query_id
        JOIN embeddings ne ON ne.vec_id = s.neighbor_id
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def sim_topk_sq8_rescored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8-shortlist + exact cosine rescore top-5 for query vectors
    vec_id < 8 — compressed scan with exact reported scores, hash-checked
    end to end (shortlist election AND rescore ranking)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return topk_sq8_rescored(emb, emb.filter(F.col("vec_id") < 8), k=5).orderBy(
        "query_id", "rank"
    )


# ---------------------------------------------------------------------------
# product quantization (PQ) — the compressed-index ANN tier
# ---------------------------------------------------------------------------

#: Subspaces (64-dim fixture vectors → 8 dims per subspace).
PQ_M = 8
#: Codes per subspace codebook — the standard FAISS setting (8-bit codes;
#: 8 logical bytes per vector, a 32× compression of the float64 corpus).
#: Raised from 16 in round 5: 4-bit codes measured recall@5 = 0.43 on the
#: sf0.1 corpus where 8-bit reaches ~0.9 at identical scan shape.
PQ_KS = 256
#: Bounded, deterministic training-sample size (same pmod trick as IVF).
PQ_TRAIN_SAMPLE = 1024
#: ADC shortlist width before the exact rescore.
PQ_SHORTLIST = 50


def _l2_normalize_rows(X: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return X / n


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = PQ_M,
    ks: int = PQ_KS,
    seed: int = 42,
) -> np.ndarray:
    """Per-subspace k-means codebooks over a bounded corpus sample.

    Vectors are L2-normalised before training (and before encoding), so
    the ADC inner product approximates cosine directly.  Sampling and
    Lloyd's follow :func:`train_ivf_centroids` exactly: one narrow pruned
    scan, O(1) driver compute, fixed seed → deterministic codebooks.
    Returns an (m, ks_eff, dim/m) array where ``ks_eff = min(ks, |sample|)``
    — the codebook is SLICED to the trained centroids rather than
    zero-padded, so encode's argmin can never select a phantom all-zero
    code (ADVICE r04).
    """
    X = _l2_normalize_rows(
        _collect_train_sample(corpus, vec_col, PQ_TRAIN_SAMPLE)
    ).astype(np.float32)  # fp32 Lloyd: 8× faster on the 1024×256 distance
    # matrices, codebook drift ~1e-8 vs fp64, and the reported scores are
    # untouched (the shortlist is exact-rescored in fp64) — VERDICT r08 #2
    d = X.shape[1]
    ds = d // m
    ks_eff = min(ks, len(X))
    rng = np.random.RandomState(seed)
    books = np.zeros((m, ks_eff, ds), dtype=np.float32)
    for j in range(m):
        sub = X[:, j * ds : (j + 1) * ds]
        cent = sub[rng.choice(len(sub), size=ks_eff, replace=False)].copy()
        sub_sq = (sub**2).sum(axis=1)[:, None]
        for _ in range(10):  # Lloyd, fully vectorized (ks=256 makes the
            # per-centroid mask loop the dominant training cost otherwise)
            d2 = sub_sq - 2.0 * (sub @ cent.T) + (cent**2).sum(axis=1)[None, :]
            assign = d2.argmin(axis=1)
            counts = np.bincount(assign, minlength=ks_eff)
            sums = np.zeros_like(cent)
            np.add.at(sums, assign, sub)
            nz = counts > 0
            cent[nz] = sums[nz] / counts[nz, None]
        books[j] = cent
    # LUT / ADC math downstream stays fp64 on top of fp32-trained books
    return books.astype(np.float64)


def _pq_encode_udf(books: np.ndarray):
    """Pandas UDF: vector → m argmin codes (one matmul batch per subspace).
    Encode math runs fp32 (same precision the codebooks were trained at;
    halves the corpus-scan bandwidth) — borderline argmin flips only move
    a vector between near-equidistant codes, and the reported scores come
    from the fp64 exact rescore either way."""
    books = books.astype(np.float32)
    m, ks, ds = books.shape

    @pandas_udf(ArrayType(LongType()))
    def encode(vecs: pd.Series) -> pd.Series:
        V = _l2_normalize_rows(
            np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        ).astype(np.float32)
        codes = np.empty((len(V), m), dtype=np.int64)
        for j in range(m):
            sub = V[:, j * ds : (j + 1) * ds]
            d2 = (
                (sub**2).sum(axis=1)[:, None]
                - 2.0 * (sub @ books[j].T)
                + (books[j] ** 2).sum(axis=1)[None, :]
            )
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return encode


def topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = PQ_M,
    ks: int = PQ_KS,
    shortlist: int = PQ_SHORTLIST,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ ANN top-k: encode the corpus as ``m`` 4-bit codes, scan with
    asymmetric distance (per-query lookup tables), exact-rescore an ADC
    shortlist.

    Scale shape: the scan side touches only the 8-byte code column — a
    32× narrower read than the float corpus (at 100 TB the codes are a
    *stored* index column, encode-once like the IVF lists).  Per Arrow
    batch the ADC score for ALL queries is one numpy gather-sum; no
    per-row Python, no JVM higher-order functions (the measured-slow path
    of the SQ8 tier).  The query set is bounded and collected once to
    build the LUTs — the same bounded-driver-step contract as IVF's
    centroid training.  The exact rescore joins only shortlist rows back
    to the float corpus, so approximation affects recall, never the
    reported scores.
    """
    books = train_pq_codebooks(corpus, vec_col, m, ks)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )

    # Bounded |Q| driver step: LUT[q, j, code] = <q_subvec_j, codebook[j][code]>.
    qrows = _collect_bounded_queries(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        ),
        "topk_pq",
    )
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, score double"
        )
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    Q = _l2_normalize_rows(np.array([r["qv"] for r in qrows], dtype=np.float64))
    # Inline tier: encode+scan fused into one corpus pass (VERDICT r08
    # #2); the stored tier's separate encode/_pq_adc_topk path is what
    # materializes the narrow code column.
    return _pq_fused_scan_topk(c, books, qids, Q, k, shortlist)


def _pq_adc_topk(
    encoded: DataFrame,
    c_float: DataFrame,
    books: np.ndarray,
    qids: np.ndarray,
    Q: np.ndarray,
    k: int,
    shortlist: int,
) -> DataFrame:
    """Shared PQ search: ADC scan of an encoded corpus ``(neighbor_id,
    codes array<int>)`` with per-query LUTs, shortlist, exact rescore
    against the float corpus ``c_float = (neighbor_id, cv)``.  Used by both
    the inline tier (encode-per-run) and the stored-index probe (codes
    read from parquet)."""
    m = books.shape[0]
    ds = Q.shape[1] // m
    lut = np.stack(
        [
            np.stack([books[j] @ Q[i, j * ds : (j + 1) * ds] for j in range(m)])
            for i in range(len(Q))
        ]
    )  # (|Q|, m, ks)

    def adc(batches):
        for pdf in batches:
            codes = np.stack(pdf["codes"].values).astype(np.int64)  # (N, m)
            S = np.zeros((len(qids), len(codes)))
            for j in range(m):
                S += lut[:, j, codes[:, j]]
            n_ids = pdf["neighbor_id"].values
            # Per-batch partial top-k (VERDICT r08 #2): the global
            # shortlist is a subset of the per-batch shortlists, so emit
            # only those — the window shuffle sees |Q|·shortlist rows per
            # Arrow batch instead of |Q|·N.  Self-matches are masked here
            # so they never consume a shortlist slot; the lexsort breaks
            # ADC ties by neighbor_id exactly like the window's ordering,
            # keeping the surviving candidate set deterministic.
            take = min(shortlist, len(codes))
            qcol, ncol, scol = [], [], []
            for i, qid in enumerate(qids):
                s = S[i]
                s = np.where(n_ids == qid, -np.inf, s)
                order = np.lexsort((n_ids, -s))[:take]
                qcol.append(np.full(take, qid, dtype=np.int64))
                ncol.append(n_ids[order])
                scol.append(s[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(qcol),
                    "neighbor_id": np.concatenate(ncol),
                    "adc": np.concatenate(scol),
                }
            )

    scored = encoded.mapInPandas(
        adc, schema="query_id long, neighbor_id long, adc double"
    ).filter(F.col("adc") != float("-inf"))
    return _pq_shortlist_rescore(scored, c_float, qids, Q, k, shortlist)


def _pq_shortlist_rescore(
    scored: DataFrame,
    c_float: DataFrame,
    qids: np.ndarray,
    Q: np.ndarray,
    k: int,
    shortlist: int,
) -> DataFrame:
    """Shared PQ tail: global shortlist over the per-batch ADC
    candidates, exact fp64 cosine rescore against the float corpus,
    final top-k."""
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    short = scored.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= shortlist
    )

    q_df = c_float.sparkSession.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(qids, Q)],
        "query_id long, qv array<double>",
    )
    # Broadcast the shortlist side (r12, guide §3.1): bounded
    # |Q|·shortlist rows vs the float corpus — see topk_sq8_rescored.
    rescored = (
        F.broadcast(short.select("query_id", "neighbor_id"))
        .join(c_float, "neighbor_id")
        .join(F.broadcast(q_df), "query_id")
        .withColumn("score", cosine(F.col("qv"), F.col("cv")))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("score", 6).alias("score"),
        )
    )


def _pq_fused_scan_topk(
    c_float: DataFrame,
    books: np.ndarray,
    qids: np.ndarray,
    Q: np.ndarray,
    k: int,
    shortlist: int,
) -> DataFrame:
    """Inline-tier PQ search in ONE corpus pass: encode (fp32, identical
    codes to :func:`_pq_encode_udf`), ADC-score against the per-query
    LUTs, and per-batch partial top-k — all inside a single mapInPandas,
    so the float corpus crosses the Arrow boundary once instead of twice
    (encode job + scan job).  The stored-index tier keeps the separate
    :func:`_pq_adc_topk` path, where the scan genuinely reads only the
    code column."""
    m = books.shape[0]
    ds = Q.shape[1] // m
    lut = np.stack(
        [
            np.stack([books[j] @ Q[i, j * ds : (j + 1) * ds] for j in range(m)])
            for i in range(len(Q))
        ]
    )  # (|Q|, m, ks)
    books32 = books.astype(np.float32)

    def scan(batches):
        for pdf in batches:
            V = _l2_normalize_rows(
                np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["cv"]]
                )
            ).astype(np.float32)
            n_ids = pdf["neighbor_id"].values
            S = np.zeros((len(qids), len(V)))
            for j in range(m):
                sub = V[:, j * ds : (j + 1) * ds]
                # bitwise the SAME fp32 expression as _pq_encode_udf, so
                # fused codes match the stored-index encoder exactly
                d2 = (
                    (sub**2).sum(axis=1)[:, None]
                    - 2.0 * (sub @ books32[j].T)
                    + (books32[j] ** 2).sum(axis=1)[None, :]
                )
                S += lut[:, j, d2.argmin(axis=1)]
            take = min(shortlist, len(V))
            qcol, ncol, scol = [], [], []
            for i, qid in enumerate(qids):
                s = np.where(n_ids == qid, -np.inf, S[i])
                order = np.lexsort((n_ids, -s))[:take]
                qcol.append(np.full(take, qid, dtype=np.int64))
                ncol.append(n_ids[order])
                scol.append(s[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(qcol),
                    "neighbor_id": np.concatenate(ncol),
                    "adc": np.concatenate(scol),
                }
            )

    scored = c_float.mapInPandas(
        scan, schema="query_id long, neighbor_id long, adc double"
    ).filter(F.col("adc") != float("-inf"))
    return _pq_shortlist_rescore(scored, c_float, qids, Q, k, shortlist)


@register("sim_topk_pq", oracle=ANN_CERT_ORACLE)  # strict certificate (r11)
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN top-5 certificate for query vectors vec_id < 8 (ADC scan
    over 8-byte codes + exact rescore), via :func:`ann_topk_certificate`;
    the raw ranking stays available through :func:`topk_pq` and recall
    vs brute force is ALSO asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    return ann_topk_certificate(emb, q, topk_pq(emb, q, k=5))


# ---------------------------------------------------------------------------
# stored quantized indexes (SQ8 / PQ codes as parquet — the serving tier)
# ---------------------------------------------------------------------------
#
# The inline SQ8/PQ tiers quantize the corpus on every run — correct, but
# the "4×/32× narrower scan" claim only materializes when the codes are a
# STORED column probed without touching the float vectors.  This section is
# that tier, mirroring ivf_index_write/probe's index-as-table contract:
# build once per corpus version, probe many times; the probe plan reads
# ONLY the code column (plan-asserted in tests/test_similarity.py).


def sq8_index_write(
    corpus: DataFrame, path: str, id_col: str = "vec_id", vec_col: str = "embedding"
) -> None:
    """Materialize the SQ8 index: ``(vec_id, cq array<tinyint>)`` parquet.

    int8 storage is the whole point — the probe scans 1 byte/dim instead
    of 4 (float32 corpus) or 8 (double math), and symmetric per-vector
    quantization needs no side metadata (queries quantize independently),
    so the table IS the complete index.
    """
    from ..session import spread

    # spread (r11, guide §2): the per-vector quantize expression otherwise
    # runs on the scan's single partition; the keyed exchange parallelises
    # it and sizes the stored code table to defaultParallelism files.
    spread(corpus.select(id_col, vec_col), id_col).select(
        F.col(id_col),
        F.transform(sq8_quantize(F.col(vec_col)), lambda x: x.cast("tinyint")).alias(
            "cq"
        ),
    ).write.mode("overwrite").parquet(path)


def sq8_index_probe(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a stored SQ8 index: the scan touches ONLY the code table —
    the float corpus appears nowhere in the plan (asserted in tests), and
    ranking is the same exact int64 matmul as :func:`topk_sq8`, so probe
    results are bit-identical to the inline tier."""
    q_rows = _collect_bounded_queries(
        queries.select(
            F.col(id_col).alias("query_id"), sq8_quantize(F.col(vec_col)).alias("qq")
        ),
        "sq8_index_probe",
    )
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, qdot bigint"
        )
    qids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    QM = np.array([r["qq"] for r in q_rows], dtype=np.int64)
    encoded = spark.read.parquet(path).select(
        F.col(id_col).alias("neighbor_id"), "cq"
    )
    return _sq8_scan_topk(encoded, qids, QM, k)


def pq_index_write(
    corpus: DataFrame,
    path: str,
    m: int = PQ_M,
    ks: int = PQ_KS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Materialize the PQ index: ``(vec_id, codes array<tinyint>)`` parquet
    (m bytes per vector — a 32× compression of the float64 corpus) plus the
    trained codebooks under ``_codebooks.json`` (underscore prefix →
    invisible to parquet directory listings, same convention as IVF's
    ``_centroids.json``)."""
    import json
    import os

    books = train_pq_codebooks(corpus, vec_col, m, ks, seed)
    encode = _pq_encode_udf(books)
    # smallint storage: codes are logically 8-bit (0..255) but overflow
    # SIGNED int8; parquet dictionary/bit-packing recovers the width.
    # NOTE (r11): deliberately NOT spread — paired A/B measured 0.91 s
    # with the pre-encode exchange vs 0.56 s without (the fp32 encode
    # matmul is cheaper than shuffling the embedding payload).
    corpus.select(
        F.col(id_col),
        F.transform(
            encode(as_double(F.col(vec_col))), lambda x: x.cast("smallint")
        ).alias("codes"),
    ).write.mode("overwrite").parquet(path)
    with open(os.path.join(path, "_codebooks.json"), "w") as f:
        json.dump(books.tolist(), f)


def pq_index_probe(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = PQ_SHORTLIST,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a stored PQ index: ADC scan over the m-byte code column with
    per-query LUTs rebuilt from the persisted codebooks, then exact rescore
    of the shortlist against the float corpus — the only stage that touches
    ``corpus``, and it joins shortlist rows only."""
    import json
    import os

    with open(os.path.join(path, "_codebooks.json")) as f:
        books = np.array(json.load(f), dtype=np.float64)
    qrows = _collect_bounded_queries(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        ),
        "pq_index_probe",
    )
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, score double"
        )
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    Q = _l2_normalize_rows(np.array([r["qv"] for r in qrows], dtype=np.float64))
    encoded = spark.read.parquet(path).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    c_float = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    return _pq_adc_topk(encoded, c_float, books, qids, Q, k, shortlist)


def _index_staging(kind: str, sf_dir: str) -> str:
    """Per-sf staging path under the process-unique mkdtemp base —
    repeated invocations inside one driver/bench/verify process reuse a
    single directory (no tmpdir leak) while concurrent sessions on the
    same fixture can never race each other's overwrites (ADVICE r05 #3)."""
    import os

    from ..fsutil import process_staging_dir

    return os.path.join(
        process_staging_dir(
            f"simindex_{os.path.basename(os.path.normpath(sf_dir))}"
        ),
        kind,
    )


@register(
    "sim_topk_sq8_stored",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[], x ->
                  CASE WHEN m = 0 THEN CAST(0 AS BIGINT)
                       ELSE CAST(ROUND(x * 127.0 / m) AS BIGINT) END) AS qv
        FROM (SELECT vec_id, embedding,
                     list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS m
              FROM embeddings)
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           CAST(qdot AS BIGINT) AS qdot
    FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               list_sum(list_transform(list_zip(a.qv, b.qv), s -> s[1] * s[2])) AS qdot,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY
                   list_sum(list_transform(list_zip(a.qv, b.qv), s -> s[1] * s[2])) DESC,
                   b.vec_id ASC) AS rank
        FROM q a JOIN q b ON b.vec_id != a.vec_id
        WHERE a.vec_id < 8
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def sim_topk_sq8_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-then-probe the STORED SQ8 index: codes land as int8 parquet,
    the probe never reads the float corpus, and because the quantized dot
    product is exact int64 arithmetic the result is bit-identical to the
    inline tier — hence this row shares sim_topk_sq8's hash-checked
    oracle, proving storage round-trip loses nothing."""
    emb = load_table(spark, sf_dir, "embeddings")
    path = _index_staging("sq8", sf_dir)
    sq8_index_write(emb, path)
    return sq8_index_probe(spark, path, emb.filter(F.col("vec_id") < 8), k=5).orderBy(
        "query_id", "rank"
    )


@register("sim_topk_pq_stored", oracle=ANN_CERT_ORACLE)  # strict cert (r11)
def sim_topk_pq_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-then-probe the STORED PQ index (m-byte codes + persisted
    codebooks), certified via :func:`ann_topk_certificate`; probe==inline
    equality and the narrow-scan plan are asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    path = _index_staging("pq", sf_dir)
    pq_index_write(emb, path)
    return ann_topk_certificate(
        emb, q, pq_index_probe(spark, path, emb, q, k=5)
    )


# ---------------------------------------------------------------------------
# IVF-PQ — coarse lists × compressed codes, the combined serving index
# ---------------------------------------------------------------------------


def ivfpq_index_write(
    corpus: DataFrame,
    path: str,
    n_clusters: int = IVF_CLUSTERS,
    m: int = PQ_M,
    ks: int = PQ_KS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """IVF-PQ index-as-table: PQ codes partitioned by coarse cluster.

    The FAISS-style shape for billion-vector serving, composed from the
    two tiers this module already proves separately: the coarse quantizer
    bounds WHICH files a probe reads (``cluster=N/`` partition pruning,
    IVF's contract) and PQ bounds HOW WIDE each read is (m bytes/vector,
    the stored-code contract).  At 100 TB the float corpus is touched only
    by the one-time build pass and per-query shortlist rescore.

    Codes encode the vector directly (no residual subtraction): our ADC
    approximates the *cosine* inner product on L2-normalised vectors,
    where FAISS's residual trick targets L2 distance around centroids —
    direct encoding keeps the codebooks probe-independent and reuses
    :func:`train_pq_codebooks` verbatim.  Centroids and codebooks persist
    as underscore-prefixed JSON beside the partitions.
    """
    import json
    import os

    centroids = train_ivf_centroids(corpus, vec_col, n_clusters, seed)
    assign1 = _ivf_assign_udf(centroids, 1)
    books = train_pq_codebooks(corpus, vec_col, m, ks, seed)
    encode = _pq_encode_udf(books)
    # NOTE (r11): deliberately NOT spread — paired A/B (3 interleaved
    # rounds, same session): spread 1.38 s vs 1.19 s without; the fp32
    # assign+encode matmuls are cheaper than shuffling the embedding
    # payload to parallelise them.
    assigned = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("cv")
    ).select(
        id_col,
        F.element_at(assign1(F.col("cv")), 1).alias("cluster"),
        F.transform(encode(F.col("cv")), lambda x: x.cast("smallint")).alias(
            "codes"
        ),
    )
    assigned.repartition(F.col("cluster")).write.mode("overwrite").partitionBy(
        "cluster"
    ).parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump(centroids.tolist(), f)
    with open(os.path.join(path, "_codebooks.json"), "w") as f:
        json.dump(books.tolist(), f)


def ivfpq_index_probe(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
    shortlist: int = PQ_SHORTLIST,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe an IVF-PQ index: partition-pruned scan of the probed
    clusters' CODE files (never the float corpus), ADC scoring, exact
    rescore of the shortlist.

    One deliberate divergence from FAISS: the scan is pruned to the UNION
    of all queries' probed clusters and every scanned code row is ADC-
    scored for every query (one gather-sum per Arrow batch), instead of
    maintaining a per-query cluster mask.  For a bounded query set this
    reads the same files, costs one matmul, and can only IMPROVE recall
    over per-query masking (extra candidates are extra chances, and the
    exact rescore keeps precision).
    """
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        centroids = np.array(json.load(f), dtype=np.float64)
    with open(os.path.join(path, "_codebooks.json")) as f:
        books = np.array(json.load(f), dtype=np.float64)
    qrows = _collect_bounded_queries(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        ),
        "ivfpq_index_probe",
    )
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, score double"
        )
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    Qraw = np.array([r["qv"] for r in qrows], dtype=np.float64)
    # nprobe nearest coarse centroids per query, computed driver-side
    # (|Q|×n_clusters distances — trivially bounded)
    d2 = (
        (Qraw**2).sum(axis=1)[:, None]
        - 2.0 * (Qraw @ centroids.T)
        + (centroids**2).sum(axis=1)[None, :]
    )
    probed = sorted({int(c) for row in np.argsort(d2, axis=1)[:, :nprobe] for c in row})
    encoded = (
        spark.read.parquet(path)
        .filter(F.col("cluster").isin(probed))
        .select(F.col(id_col).alias("neighbor_id"), "codes")
    )
    c_float = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    Q = _l2_normalize_rows(Qraw)
    return _pq_adc_topk(encoded, c_float, books, qids, Q, k, shortlist)


@register("sim_topk_ivfpq", oracle=ANN_CERT_ORACLE)  # strict cert (r11)
def sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-then-probe the combined IVF-PQ index for query vectors
    vec_id < 8 (partition-pruned coarse lists, stored smallint codes,
    ADC + exact rescore), certified via :func:`ann_topk_certificate`;
    recall and plan shape are asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    path = _index_staging("ivfpq", sf_dir)
    ivfpq_index_write(emb, path)
    return ann_topk_certificate(
        emb, q, ivfpq_index_probe(spark, path, emb, q, k=5)
    )


# ---------------------------------------------------------------------------
# kNN label-noise audit (mislabel detection over the ANN candidate graph)
# ---------------------------------------------------------------------------

KNN_NOISE_K = 8
KNN_NOISE_MIN_NEIGHBORS = 3


def knn_label_noise(
    emb: DataFrame, k: int = KNN_NOISE_K, min_neighbors: int = KNN_NOISE_MIN_NEIGHBORS
) -> DataFrame:
    """Flag vectors whose k nearest neighbors mostly carry a DIFFERENT
    label — the classic confident-learning / deep-kNN mislabel signal,
    run as a corpus audit before the labels feed a training mixture.

    Every vector is a query.  Candidates come from the shared-LSH-bucket
    self-join (OR-amplified over the fixed hyperplane tables), re-scored
    exactly, ranked, and cut at ``k``; a vector is flagged when it found
    ≥ ``min_neighbors`` candidates and a strict majority disagree with
    its label.

    Returns flagged rows only: (vec_id, label, n_neighbors, n_disagree).

    Scale design (100 TB): all-pairs kNN is quadratic and never runs at
    scale — the banded bucket self-join is the same linear-candidate
    shape measured flat at 100× in SCALE.md for the neardup tier.  Pair
    discovery shuffles (t, bucket) keys; vectors are joined back by id
    for the rescore, so wide embedding rows never ride the dedup
    shuffle."""
    from ..session import spread

    # spread before the bucket UDF + spread-keyed checkpoint of the skinny
    # band table: the r11 before-plan showed the Scan→ArrowEvalPython→
    # Generate chain TWICE (once per self-join side), every stage through
    # the candidate cosine rescore glued to the scan's single partition.
    # One narrow exchange parallelises the UDF; the lazy localCheckpoint
    # makes both join sides read the same materialised band table.
    base = spread(
        emb.select("vec_id", "label", as_double(F.col("embedding")).alias("v")),
        "vec_id",
    )
    b = base.select(
        "vec_id", F.posexplode(lsh_buckets(F.col("v"))).alias("t", "bucket")
        # eager (r12): self-join sides are concurrent stages — see
        # embedding_neardup_pairs_lsh (A/B 3.05 → 2.93 s here).
    ).localCheckpoint(eager=True)
    cand = (
        b.alias("q")
        .join(
            b.alias("c"),
            (F.col("q.t") == F.col("c.t"))
            & (F.col("q.bucket") == F.col("c.bucket"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # r11: precompute each vector's norm ONCE in the (broadcast) vector
    # table instead of re-folding both norms per candidate pair — the
    # rescore is `dot(qv,cv) / (nq · nc)`, the exact expression tree
    # `cosine()` builds (`dot / (norm·norm)`), so every score is
    # bit-identical while the per-pair higher-order-function work drops
    # from three 64-element folds to one.
    normed = base.withColumn("nv", norm(F.col("v")))
    scored = (
        cand.join(
            normed.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("label"),
                F.col("v").alias("qv"),
                F.col("nv").alias("nq"),
            ),
            "query_id",
        )
        .join(
            normed.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nlabel"),
                F.col("v").alias("cv"),
                F.col("nv").alias("nc"),
            ),
            "neighbor_id",
        )
        .withColumn(
            "score", dot(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    votes = topk.groupBy(
        F.col("query_id").alias("vec_id"), F.col("label")
    ).agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.sum(
            F.when(F.col("nlabel") != F.col("label"), 1).otherwise(0)
        ).alias("n_disagree"),
    )
    return (
        votes.filter(
            (F.col("n_neighbors") >= F.lit(min_neighbors))
            & (F.col("n_disagree") * 2 > F.col("n_neighbors"))
        )
        .select("vec_id", "label", "n_neighbors", "n_disagree")
        .orderBy("vec_id")
    )


@register(
    "embeddings_knn_label_noise",
    # Strict via the sim_topk_lsh trick: hyperplanes are inlined literals,
    # so the oracle replays bucketing, candidate generation, the exact
    # rescore, the top-k cut, and the majority vote end to end.
    oracle=f"""
    WITH planes AS ({_lsh_planes_sql()}),
    b AS (
        SELECT e.vec_id, pl.t,
               CAST(SUM(CASE WHEN list_sum(list_transform(
                        list_zip(e.embedding::DOUBLE[], pl.w),
                        s -> s[1] * s[2])) > 0
                        THEN (1 << pl.p) ELSE 0 END) AS BIGINT) AS bucket
        FROM embeddings e CROSS JOIN planes pl
        GROUP BY e.vec_id, pl.t
    ),
    cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM b q JOIN b c ON c.t = q.t AND c.bucket = q.bucket
                         AND c.vec_id != q.vec_id
    ),
    topk AS (
        SELECT query_id, neighbor_id, label, nlabel FROM (
            SELECT cand.query_id, cand.neighbor_id,
                   qe.label AS label, ne.label AS nlabel,
                   row_number() OVER (PARTITION BY cand.query_id ORDER BY
                       list_cosine_similarity(qe.embedding::DOUBLE[],
                                              ne.embedding::DOUBLE[]) DESC,
                       cand.neighbor_id ASC) AS rank
            FROM cand
            JOIN embeddings qe ON qe.vec_id = cand.query_id
            JOIN embeddings ne ON ne.vec_id = cand.neighbor_id
        ) WHERE rank <= {KNN_NOISE_K}
    ),
    votes AS (
        SELECT query_id AS vec_id, label,
               CAST(COUNT(*) AS BIGINT) AS n_neighbors,
               CAST(SUM(CASE WHEN nlabel != label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_disagree
        FROM topk GROUP BY query_id, label
    )
    SELECT vec_id, label, n_neighbors, n_disagree
    FROM votes
    WHERE n_neighbors >= {KNN_NOISE_MIN_NEIGHBORS}
      AND n_disagree * 2 > n_neighbors
    ORDER BY vec_id
    """,
)
def embeddings_knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabel audit: vectors whose LSH-kNN majority label disagrees."""
    return knn_label_noise(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Matryoshka truncation recall (dimension-budget eval)
# ---------------------------------------------------------------------------

#: Prefix lengths evaluated against the full 64-dim ranking.
MATRYOSHKA_DIMS = (8, 16, 32, 64)

MATRYOSHKA_K = 5
MATRYOSHKA_MAX_QID = 8


def matryoshka_recall(emb: DataFrame) -> DataFrame:
    """Recall@k of PREFIX-truncated cosine rankings against the full-
    dimension ranking — the Matryoshka-embedding eval: how many
    dimensions can serving truncate away (bandwidth, index size, probe
    FLOPs all scale with d) before top-k quality degrades?

    For each prefix length d: exact cosine top-k over ``embedding[0:d]``,
    intersected per query with the full-d top-k; recall is the exact
    integer ratio ``Σ overlap · 1e6 div (k · |queries|)``.  Rankings
    order by the 6-dp-rounded score with id tie-break, so both engines'
    cutoffs are identical.

    Scale shape: one broadcast(queries) ⋈ corpus pass per dim tier, the
    slice narrowing each tier's arithmetic (at 100 TB the tiers probe a
    STORED truncated index instead — the ranking and recall algebra here
    are unchanged); the intersection joins are O(|queries|·k) rows.
    """
    q = emb.filter(F.col("vec_id") < MATRYOSHKA_MAX_QID).select(
        F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double("embedding").alias("cv"),
    )

    def topk_at(d: int) -> DataFrame:
        qd = F.slice(F.col("qv"), 1, d)
        cd = F.slice(F.col("cv"), 1, d)
        scored = (
            c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
            .withColumn("s", F.round(cosine(qd, cd), 6))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("s"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= MATRYOSHKA_K)
            .select("query_id", "neighbor_id")
        )

    full = topk_at(64)
    out = None
    n_q = q.count()
    for d in MATRYOSHKA_DIMS:
        overlap = (
            topk_at(d)
            .join(full, ["query_id", "neighbor_id"])
            .agg(F.count(F.lit(1)).alias("n_overlap"))
            .select(
                F.lit(d).cast("long").alias("dim"),
                F.lit(n_q).cast("long").alias("n_queries"),
                "n_overlap",
                F.expr(
                    f"n_overlap * 1000000 div {MATRYOSHKA_K * n_q}"
                ).alias("recall_ppm"),
            )
        )
        out = overlap if out is None else out.unionByName(overlap)
    return out.orderBy("dim")


def _matryoshka_oracle() -> str:
    def topk_cte(name: str, d: int) -> str:
        return f"""{name} AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(list_cosine_similarity(
                           (q.embedding::DOUBLE[])[1:{d}],
                           (c.embedding::DOUBLE[])[1:{d}]), 6) DESC,
                                c.vec_id ASC) AS rank
            FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
            WHERE q.vec_id < {MATRYOSHKA_MAX_QID}
        ) WHERE rank <= {MATRYOSHKA_K}
    )"""

    ctes = [topk_cte("tk_full", 64)]
    selects = []
    for d in MATRYOSHKA_DIMS:
        ctes.append(topk_cte(f"tk_{d}", d))
        selects.append(
            f"""SELECT CAST({d} AS BIGINT) AS dim,
               (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT)
                FROM tk_full) AS n_queries,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM tk_{d} t JOIN tk_full f USING (query_id, neighbor_id))
                   AS n_overlap,
               CAST((SELECT COUNT(*) FROM tk_{d} t
                     JOIN tk_full f USING (query_id, neighbor_id))
                    * 1000000 // ({MATRYOSHKA_K}
                    * (SELECT COUNT(DISTINCT query_id) FROM tk_full))
                    AS BIGINT) AS recall_ppm"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + "\n    "
        + "\n    UNION ALL\n    ".join(selects)
        + "\n    ORDER BY dim"
    )


@register("sim_matryoshka_recall", oracle=_matryoshka_oracle())
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of prefix-truncated cosine rankings vs the full 64 dims."""
    return matryoshka_recall(load_table(spark, sf_dir, "embeddings"))
