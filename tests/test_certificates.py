"""Falsifiability of the r11 strict certificates: each in-band boolean
must actually FLIP under the failure it claims to catch — a certificate
that can't fail certifies nothing.  Tampered inputs are fed through the
same code paths the registered queries use."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.similarity import (
    ann_topk_certificate,
    topk_ivf,
)
from trafsys_data_transfer_spark.sources.fixtures import load_table


def _cert_row(emb, q, got):
    rows = ann_topk_certificate(emb, q, got).collect()
    return {
        col: all(r[col] for r in rows)
        for col in (
            "scores_exact",
            "ranks_monotone",
            "self_excluded",
            "recall_ok",
        )
    }


def test_ann_certificate_passes_on_honest_output(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    got = topk_ivf(emb, q, k=5)
    flags = _cert_row(emb, q, got)
    assert all(flags.values()), flags


def test_ann_certificate_catches_corrupted_scores(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    got = topk_ivf(emb, q, k=5).withColumn(
        "score", F.round(F.col("score") + 0.001, 6)
    )
    assert not _cert_row(emb, q, got)["scores_exact"]


def test_ann_certificate_catches_rank_disorder(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    # invert the ranking: best neighbor gets the worst rank
    got = topk_ivf(emb, q, k=5).withColumn(
        "rank", (F.lit(6) - F.col("rank")).cast("int")
    )
    assert not _cert_row(emb, q, got)["ranks_monotone"]


def test_ann_certificate_catches_junk_neighbors(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    # rotate every neighbor id to a (valid but wrong) vector: recall
    # collapses and the rescore-equality check fails too
    n = emb.count()
    got = topk_ivf(emb, q, k=5).withColumn(
        "neighbor_id", (F.col("neighbor_id") + 101) % F.lit(n)
    )
    flags = _cert_row(emb, q, got)
    assert not flags["recall_ok"]


def test_ann_certificate_catches_self_matches(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    got = topk_ivf(emb, q, k=5).withColumn(
        "neighbor_id",
        F.when(F.col("rank") == 1, F.col("query_id")).otherwise(
            F.col("neighbor_id")
        ),
    )
    assert not _cert_row(emb, q, got)["self_excluded"]


def test_bestfit_guard_rejects_oversize_docs(spark):
    """A document longer than the bin capacity must raise, not silently
    overflow a bin."""
    import pytest

    from trafsys_data_transfer_spark.operators.packing import (
        pack_bestfit_bins,
    )

    docs = spark.createDataFrame(
        [(1, "w " * 300)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="longer than bin capacity"):
        pack_bestfit_bins(docs, capacity=256)


def test_rolling_fingerprint_certificate_catches_broken_roll(spark):
    """_rolling_fps with a WRONG b_pow must disagree with the direct
    polynomial — the exact failure roll_matches_direct exists for."""
    from trafsys_data_transfer_spark.operators.text import (
        RH_BASE,
        RH_MOD,
        RH_WINDOW,
        _rolling_fps,
    )

    hashes = list(range(1, 25))
    _, fps = _rolling_fps(hashes, RH_WINDOW)
    last = hashes[len(hashes) - RH_WINDOW :]
    direct = 0
    for t in last:
        direct = (direct * RH_BASE + t % RH_MOD) % RH_MOD
    assert fps[-1] == direct  # honest roll agrees

    # a broken roll (off-by-one window slide) must disagree
    bad_last = hashes[len(hashes) - RH_WINDOW - 1 : -1]
    bad = 0
    for t in bad_last:
        bad = (bad * RH_BASE + t % RH_MOD) % RH_MOD
    assert bad != direct
