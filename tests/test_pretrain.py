"""Capstone curation funnel: monotonicity, stage semantics, composition
invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.pretrain import (
    SEQ_LEN,
    pretrain_funnel,
)
from trafsys_data_transfer_spark.sources.fixtures import load_table


def test_funnel_monotone_and_consistent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = pretrain_funnel(spark, docs).collect()
    by_stage = {r.stage: r for r in rows}
    order = [
        "ingest",
        "quality_gate",
        "lm_filter",
        "exact_dedup",
        "neardup_dedup",
        "decontaminated",
    ]
    assert [r.stage for r in rows] == order + ["packed_sequences"]
    # docs and tokens only ever shrink through the funnel
    for a, b in zip(order, order[1:]):
        assert by_stage[b].n_docs <= by_stage[a].n_docs
        assert by_stage[b].n_tokens <= by_stage[a].n_tokens
    assert by_stage["ingest"].n_docs == docs.count()
    # every stage retains something at fixture scale (non-vacuous funnel)
    assert by_stage["decontaminated"].n_docs > 0
    # packed sequences = survivor tokens div SEQ_LEN, token total unchanged
    packed = by_stage["packed_sequences"]
    assert packed.n_docs == by_stage["decontaminated"].n_tokens // SEQ_LEN
    assert packed.n_tokens == by_stage["decontaminated"].n_tokens


def test_funnel_stage_semantics_on_toy_corpus(spark):
    """A corpus crafted so every stage drops exactly one known doc."""
    good = (
        "the quick brown fox jumps over the lazy dog and runs in to the "
        "woods where the light of day fades and the night air settles "
        "gently over the quiet field as the stars rise of a winter sky"
    )
    near_dup = good.replace("winter", "summer")
    rows = [
        (1, "train", good, 100),
        (2, "train", "short text", 10),          # fails quality (word count)
        (3, "train", good, 100),                  # exact dup of 1
        (4, "train", near_dup, 100),              # near-dup of 1
        (5, "src0", good, 100),                   # eval shard doc (src0 ∈ EVAL_SOURCES)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars long"
    )
    # lm_keep_pctile=1.0: with four quality survivors, three of them
    # identical (sharing the maximum LM score), any fractional
    # percentile cut would drop the whole triplet — keep-all isolates
    # the other stages' semantics.
    out = {
        r.stage: r.n_docs
        for r in pretrain_funnel(spark, docs, lm_keep_pctile=1.0).collect()
    }
    assert out["ingest"] == 5
    assert out["quality_gate"] == 4   # doc 2 dropped (word-count bound)
    # docs 1, 3 AND the eval doc 5 share identical text: min-id keeper 1
    # survives, so only {1, 4} remain
    assert out["exact_dedup"] == 2
    assert out["neardup_dedup"] == 1  # doc 4 clusters with 1, keeper 1
    # the lone survivor shares every 5-gram with the eval shard (doc 5's
    # text) → decontamination drops it; the funnel bottoms out honestly
    assert out["decontaminated"] == 0
