"""Corpus-LM scoring and duplicated-segment mass: hand-computed oracles,
determinism, and plan shape."""

from __future__ import annotations

import math

from trafsys_data_transfer_spark.operators.lm import LM_LAMBDA, lm_score_docs
from trafsys_data_transfer_spark.operators.spans import (
    SEGMENT_WORDS,
    dup_segment_mass,
)
from trafsys_data_transfer_spark.sources.fixtures import load_table


def _lm_reference(docs: list[tuple[int, str]]) -> dict[int, tuple[int, int]]:
    """Plain-Python reimplementation of the interpolated bigram LM score."""
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for _, text in docs:
        toks = text.split(" ")
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    t_tokens = sum(uni.values())
    v_size = len(uni)
    out: dict[int, tuple[int, int]] = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        if len(toks) < 2:
            continue
        s = 0
        for a, b in zip(toks, toks[1:]):
            p = LM_LAMBDA * big[(a, b)] / uni[a] + (1 - LM_LAMBDA) * (
                uni[b] + 1
            ) / (t_tokens + v_size)
            s += math.floor(-math.log(p) * 1000000.0 + 0.5)
        out[doc_id] = (len(toks) - 1, s)
    return out


def test_lm_matches_plain_python_reference(spark):
    rows = [
        (1, "a b a b c"),
        (2, "a a a"),
        (3, "c b a"),
        (4, "z"),  # one token: no bigram position, excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_scored, r.nll_micro) for r in lm_score_docs(df).collect()}
    assert got == _lm_reference(rows)


def test_lm_repetitive_doc_scores_lower_entropy(spark, sf_dir):
    """A document that is one repeated bigram is maximally predictable:
    its per-position cross-entropy must undercut every word-soup doc."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    loop = docs.sparkSession.createDataFrame(
        [(999999, "x y " * 100 + "x y")], "doc_id long, text string"
    )
    out = lm_score_docs(docs.unionByName(loop)).collect()
    by_id = {r.doc_id: r.avg_nll_micro for r in out}
    loop_score = by_id.pop(999999)
    assert loop_score < min(by_id.values())


def test_lm_deterministic_and_integral(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = lm_score_docs(docs).collect()
    b = lm_score_docs(docs).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    for r in a:
        assert r.avg_nll_micro == r.nll_micro // r.n_scored
        assert r.nll_micro > 0


def test_dup_segments_hand_oracle(spark):
    seg_a = " ".join(["a"] * SEGMENT_WORDS)
    seg_b = " ".join(["b"] * SEGMENT_WORDS)
    seg_c = " ".join(["c"] * SEGMENT_WORDS)
    rows = [
        # doc 1: [A, B] — A dups with doc 2, B unique → 1/2 duplicated
        (1, seg_a + " " + seg_b),
        # doc 2: [A, A] — internal repeat AND cross-doc: both occurrences dup
        (2, seg_a + " " + seg_a),
        # doc 3: [C] plus a 5-word tail that falls off the chunk grid
        (3, seg_c + " t1 t2 t3 t4 t5"),
        # doc 4: shorter than one segment → no segments, excluded
        (4, "u1 u2 u3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_segments, r.n_dup_segments, r.dup_frac_micro)
        for r in dup_segment_mass(df).collect()
    }
    assert got == {
        1: (2, 1, 500000),
        2: (2, 2, 1000000),
        3: (1, 0, 0),
    }


def test_dup_segments_fixture_bounds(spark, sf_dir):
    out = dup_segment_mass(load_table(spark, sf_dir, "documents")).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r.n_dup_segments <= r.n_segments
        assert r.dup_frac_micro == r.n_dup_segments * 1000000 // r.n_segments


def test_new_ops_plan_shape(spark, sf_dir):
    """Unigram/totals joins broadcast; no Python eval anywhere (both
    operators are pure builtin-expression pipelines)."""
    docs = load_table(spark, sf_dir, "documents")
    lm_plan = lm_score_docs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in lm_plan and "ArrowEvalPython" not in lm_plan
    assert "BroadcastHashJoin" in lm_plan
    seg_plan = (
        dup_segment_mass(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in seg_plan and "ArrowEvalPython" not in seg_plan
    assert "CartesianProduct" not in seg_plan


def test_lm_hypothesis_random_corpora(spark):
    """Property: the Spark LM score equals the plain-Python reference for
    arbitrary small corpora (vocabulary, repetition, doc lengths all
    fuzzed)."""
    from hypothesis import given, settings, strategies as st

    word = st.sampled_from(["a", "b", "c", "aa", "xyz"])
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @settings(max_examples=12, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=6))
    def run(texts):
        rows = list(enumerate(texts))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_scored, r.nll_micro)
            for r in lm_score_docs(df).collect()
        }
        assert got == _lm_reference(rows)

    run()
