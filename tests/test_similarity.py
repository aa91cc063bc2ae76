"""Similarity-search semantics: brute-force exactness on a constructed
corpus, LSH recall audit against brute force on the fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.similarity import (
    cosine,
    topk_bruteforce,
    topk_ivf,
    topk_lsh,
)
from trafsys_data_transfer_spark.sources.fixtures import load_table


def test_cosine_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 0.0], [1.0, 0.0]), ([1.0, 1.0], [1.0, 0.0])],
        ["a", "b"],
    )
    got = [r.c for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got[0] == pytest.approx(0.0)
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(1 / math.sqrt(2))


def test_bruteforce_finds_planted_neighbor(spark):
    """A vector nearly parallel to the query must rank first."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),   # nearest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = topk_bruteforce(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    assert [r.neighbor_id for r in out] == [1, 2]
    assert out[0].rank == 1 and out[0].score > 0.99


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    """ANN tier must recover a solid fraction of true top-5 neighbors —
    recall audited against the exact baseline (OR-amplified 4×8-bit LSH)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in topk_bruteforce(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id) for r in topk_lsh(emb, queries, k=5).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"LSH recall {recall:.2f} too low"


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF tier (16 lists, 4 probes → ~25% of the corpus scanned per query)
    must recover most true top-5 neighbors."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in topk_bruteforce(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id) for r in topk_ivf(emb, queries, k=5).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"IVF recall {recall:.2f} too low"


def test_lsh_scores_are_exact_for_returned_pairs(spark, sf_dir):
    """LSH approximates the candidate set, never the score: any pair it
    returns must carry the exact cosine the brute-force tier computes."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    bf = {
        (r.query_id, r.neighbor_id): r.score
        for r in topk_bruteforce(emb, queries, k=50).collect()
    }
    for r in topk_lsh(emb, queries, k=5).collect():
        key = (r.query_id, r.neighbor_id)
        if key in bf:
            assert r.score == pytest.approx(bf[key], abs=1e-9)


def test_ivf_index_write_probe_matches_inline_and_prunes(spark, tmp_path):
    """The materialized index must (a) return exactly what the inline IVF
    search returns (same deterministic centroids) and (b) plan the probe
    as a partition-pruned scan, not a full index read."""
    from trafsys_data_transfer_spark.operators.similarity import (
        ivf_index_probe,
        ivf_index_write,
        topk_ivf,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    path = str(tmp_path / "ivf_index")
    ivf_index_write(emb, path)

    got = ivf_index_probe(spark, path, queries, k=5)
    want = topk_ivf(emb, queries, k=5)
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(got.collect()) == key(want.collect())

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cluster" in plan


def test_sq8_stored_probe_matches_inline_and_never_reads_floats(spark, tmp_path):
    """The stored SQ8 index must return BIT-IDENTICAL results to the
    inline tier (exact int64 ranking survives the int8 parquet round
    trip), and the probe plan must not touch the float corpus at all —
    the narrow code scan is the entire point of storing the index."""
    from trafsys_data_transfer_spark.operators.similarity import (
        sq8_index_probe,
        sq8_index_write,
        topk_sq8,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    path = str(tmp_path / "sq8_index")
    sq8_index_write(emb, path)

    got = sq8_index_probe(spark, path, queries, k=5)
    want = topk_sq8(emb, queries, k=5)
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(got.collect()) == key(want.collect())

    plan = got._jdf.queryExecution().executedPlan().toString()
    # The only file scan feeding the probe is the int8 index; the float
    # embeddings table appears nowhere in the plan.  (Paths are truncated
    # in plan strings, so assert on ReadSchema, which is not.)
    assert "ReadSchema: struct<vec_id:bigint,cq:array<tinyint>>" in plan
    assert "embedding:" not in plan and "embeddings.parquet" not in plan


def test_sq8_index_is_narrower_on_disk(spark, tmp_path):
    """int8 codes must be materially smaller than the float32 corpus —
    the compression claim, measured, not asserted in prose."""
    import os

    from trafsys_data_transfer_spark.operators.similarity import sq8_index_write

    def dir_bytes(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "sq8_index")
    sq8_index_write(emb, path)
    src = dir_bytes("/root/testdata/sf0.001/embeddings.parquet")
    if src == 0:  # fixture is a single file, not a directory
        src = os.path.getsize("/root/testdata/sf0.001/embeddings.parquet")
    assert dir_bytes(path) < 0.6 * src


def test_pq_stored_probe_matches_inline(spark, tmp_path):
    """Stored-PQ probe (codes + persisted codebooks from parquet/json)
    must reproduce the inline tier exactly — same seed, same sample
    protocol, same ADC/rescore — and its ADC stage must scan only the
    m-byte code column."""
    from trafsys_data_transfer_spark.operators.similarity import (
        pq_index_probe,
        pq_index_write,
        topk_pq,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    path = str(tmp_path / "pq_index")
    pq_index_write(emb, path)

    got = pq_index_probe(spark, path, emb, queries, k=5)
    want = topk_pq(emb, queries, k=5)
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(got.collect()) == key(want.collect())

    plan = got._jdf.queryExecution().executedPlan().toString()
    # The ADC scan reads only (vec_id, codes array<tinyint>) — the m-byte
    # code column, never the float vectors.  (Plan strings truncate paths,
    # so assert on ReadSchema.)  The float corpus legitimately appears once,
    # feeding the shortlist rescore join.
    assert "ReadSchema: struct<vec_id:bigint,codes:array<smallint>>" in plan


def test_bounded_query_guards(spark):
    """Empty query sets return empty typed results (not numpy shape
    crashes); query sets beyond MAX_QUERY_ROWS raise a clear contract
    error instead of silently OOMing the driver."""
    import pytest as _pytest

    from trafsys_data_transfer_spark.operators.similarity import (
        MAX_QUERY_ROWS,
        _collect_bounded_queries,
        topk_pq,
        topk_sq8,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    none = emb.filter(F.col("vec_id") < 0)
    assert topk_sq8(emb, none, k=5).count() == 0
    assert topk_pq(emb, none, k=5).count() == 0

    big = spark.range(MAX_QUERY_ROWS + 1).select(F.col("id").alias("vec_id"))
    with _pytest.raises(ValueError, match="MAX_QUERY_ROWS"):
        _collect_bounded_queries(big, "test")


def test_pq_codebooks_deterministic_and_unpadded(spark):
    """Codebooks must be independent of scan order (sample sorted by hash)
    and contain only trained centroids — no phantom zero rows for
    encode's argmin to select."""
    import numpy as np

    from trafsys_data_transfer_spark.operators.similarity import (
        PQ_KS,
        train_pq_codebooks,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    b1 = train_pq_codebooks(emb)
    b2 = train_pq_codebooks(emb.repartition(7))  # different scan order
    assert np.array_equal(b1, b2)
    assert b1.shape[1] <= PQ_KS
    # no all-zero centroid rows (zero-pad artifact)
    assert not np.any(np.all(b1 == 0.0, axis=2))


def test_sq8_rescored_recall_beats_raw_qdot(spark, sf_dir):
    """The exact-cosine rescore must (a) report scores identical to brute
    force for every returned true pair and (b) recall at least as many
    true neighbors as raw-qdot ranking (the shortlist is a superset of
    the raw top-k)."""
    from trafsys_data_transfer_spark.operators.similarity import (
        topk_sq8,
        topk_sq8_rescored,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.neighbor_id): r.score
        for r in topk_bruteforce(emb, queries, k=5).collect()
    }
    raw = {
        (r.query_id, r.neighbor_id) for r in topk_sq8(emb, queries, k=5).collect()
    }
    resc = {
        (r.query_id, r.neighbor_id): r.score
        for r in topk_sq8_rescored(emb, queries, k=5).collect()
    }
    hits = set(truth) & set(resc)
    assert len(hits) >= len(set(truth) & raw)
    assert len(hits) / len(truth) >= 0.7
    for pair in hits:
        assert truth[pair] == resc[pair]


def test_ivfpq_recall_and_pruned_narrow_scan(spark, sf_dir, tmp_path):
    """The combined index must (a) keep most true top-5 neighbors despite
    both approximations stacking (coarse pruning × code quantization) and
    (b) plan the probe as a partition-pruned scan of the smallint code
    column only."""
    from trafsys_data_transfer_spark.operators.similarity import (
        ivfpq_index_probe,
        ivfpq_index_write,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    path = str(tmp_path / "ivfpq_index")
    ivfpq_index_write(emb, path)
    got_df = ivfpq_index_probe(spark, path, emb, queries, k=5)
    got = {(r.query_id, r.neighbor_id): r.score for r in got_df.collect()}
    truth = {
        (r.query_id, r.neighbor_id): r.score
        for r in topk_bruteforce(emb, queries, k=5).collect()
    }
    hits = set(truth) & set(got)
    recall = len(hits) / len(truth)
    assert recall >= 0.5, f"IVF-PQ recall {recall:.2f} too low"
    for pair in hits:  # rescore is exact cosine — scores match bit-for-bit
        assert truth[pair] == got[pair]

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cluster" in plan
    assert "ReadSchema: struct<vec_id:bigint,codes:array<smallint>>" in plan


def test_pq_recall_holds_at_sf01(spark):
    """Recall regression gate at the LARGEST fixture (2 000 vectors): the
    round-5 scale probe caught 4-bit PQ codes at recall@5 = 0.43 here
    while the sf0.001 test corpus (500 vectors, 50-wide shortlists) masked
    it completely.  8-bit codebooks measured 0.91 / rescored-SQ8 0.98 —
    gate with margin below those."""
    from trafsys_data_transfer_spark.operators.similarity import (
        topk_pq,
        topk_sq8_rescored,
    )

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in topk_bruteforce(emb, queries, k=5).collect()
    }
    pq = {(r.query_id, r.neighbor_id) for r in topk_pq(emb, queries, k=5).collect()}
    assert len(truth & pq) / len(truth) >= 0.8
    sq = {
        (r.query_id, r.neighbor_id)
        for r in topk_sq8_rescored(emb, queries, k=5).collect()
    }
    assert len(truth & sq) / len(truth) >= 0.9


def test_embedding_neardup_lsh_precision_exact_recall_audited(spark, sf_dir):
    """The LSH pair generator must return ONLY true pairs (exact cosine
    verify) and recover a solid fraction of the exact pair set on the
    bounded ground-truth scope."""
    from trafsys_data_transfer_spark.operators.similarity import (
        embedding_neardup_pairs_lsh,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    from trafsys_data_transfer_spark.operators.similarity import (
        _cos_pairs_np,
        as_double,
    )

    # ground truth under the SAME float64 arithmetic the pipeline uses, so
    # threshold-boundary pairs can't flip between summation orders
    exact = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "c", _cos_pairs_np(as_double(F.col("ea")), as_double(F.col("eb")))
        )
        .filter(F.col("c") >= 0.4)
        .collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs_lsh(emb, threshold=0.4).collect()
    }
    assert got <= exact, "LSH tier returned a pair below threshold"
    if exact:
        recall = len(got) / len(exact)
        assert recall >= 0.5, f"near-dup recall {recall:.2f} too low"


def test_lsh_banding_factory(spark):
    """Custom bandings reuse the fixed hyperplane pool: shapes honored,
    pool bound enforced, and the default banding matches lsh_buckets."""
    import pytest as _pytest

    from trafsys_data_transfer_spark.operators.similarity import (
        LSH_PLANES,
        LSH_TABLES,
        lsh_buckets,
        lsh_buckets_banded,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    b84 = lsh_buckets_banded(8, 4)
    rows = emb.select(b84(F.col("embedding")).alias("b")).collect()
    assert all(len(r["b"]) == 4 and all(0 <= x < 256 for x in r["b"]) for r in rows)

    default = lsh_buckets_banded(LSH_PLANES, LSH_TABLES)
    got = emb.select(
        lsh_buckets(F.col("embedding")).alias("x"), default(F.col("embedding")).alias("y")
    ).collect()
    assert all(r["x"] == r["y"] for r in got)

    with _pytest.raises(ValueError, match="≤"):
        lsh_buckets_banded(9, 4)


def test_semantic_dedup_pipeline_composes(spark):
    """Yield accounting invariants: keepers ≤ vectors per label, totals
    cover the corpus, and every component elects exactly one keeper."""
    from trafsys_data_transfer_spark.operators.similarity import (
        sim_semantic_dedup_pipeline,
    )

    rows = sim_semantic_dedup_pipeline(spark, "/root/testdata/sf0.001").collect()
    assert rows
    emb_count = load_table(spark, "/root/testdata/sf0.001", "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == emb_count
    for r in rows:
        assert 0 < r["n_keepers"] <= r["n_vectors"]
        assert abs(r["yield_frac"] - r["n_keepers"] / r["n_vectors"]) < 1e-6


def test_pq_recall_vs_bruteforce(spark, sf_dir):
    """PQ tier (8×4-bit codes, ADC shortlist of 50, exact rescore) must
    recover most true top-5 neighbors; reported scores are exact cosine
    (rescored), so any hit matches the brute-force score bit-for-bit."""
    from trafsys_data_transfer_spark.operators.similarity import topk_pq

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.neighbor_id): r.score
        for r in topk_bruteforce(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id): r.score
        for r in topk_pq(emb, queries, k=5).collect()
    }
    hits = set(truth) & set(got)
    recall = len(hits) / len(truth)
    assert recall >= 0.6, f"PQ recall {recall:.2f} too low"
    for pair in hits:
        assert truth[pair] == got[pair]
