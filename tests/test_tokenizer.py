"""BPE tokenizer training: hand-computed merge oracle, determinism,
encode semantics, corpus-path plan shape."""

from __future__ import annotations

import random

from trafsys_data_transfer_spark.operators.tokenizer import (
    EOW,
    bpe_token_stats,
    encode_word,
    train_bpe,
)
from trafsys_data_transfer_spark.sources.fixtures import load_table

#: Toy corpus: "ab"×3, "abc"×2.  Merge sequence hand-derived in comments.
TOY = [("ab", 3), ("abc", 2)]


def test_train_bpe_hand_oracle():
    # pairs: (a,b)=5 (b,eow)=3 (b,c)=2 (c,eow)=2 → merge (a,b)
    # then (ab,eow)=3 beats (ab,c)=2,(c,eow)=2 → merge (ab,eow)
    # then tie (ab,c)=2 vs (c,eow)=2 → lexicographic: ("ab","c")
    # then (abc,eow)=2; afterwards no pairs remain → stops at 4 merges.
    assert train_bpe(TOY, 10) == [
        ("a", "b"),
        ("ab", EOW),
        ("ab", "c"),
        ("abc", EOW),
    ]


def test_train_bpe_input_order_invariant():
    merges = train_bpe(TOY, 10)
    shuffled = list(TOY)
    random.Random(7).shuffle(shuffled)
    assert train_bpe(shuffled, 10) == merges
    # split counts for the same word must behave like the summed count
    assert train_bpe([("ab", 1), ("abc", 2), ("ab", 2)], 10) == merges


def test_encode_word_semantics():
    ranks = {p: i for i, p in enumerate(train_bpe(TOY, 10))}
    assert encode_word("ab", ranks) == ["ab" + EOW]
    assert encode_word("abc", ranks) == ["abc" + EOW]
    # unseen word: falls back toward characters, never errors
    assert encode_word("bc", ranks) == ["b", "c", EOW]
    # partially covered word reuses learned subtokens
    assert encode_word("abab", ranks)[0] == "ab"


def test_bpe_token_stats_toy(spark):
    docs = spark.createDataFrame(
        [(1, "ab abc ab", 9), (2, "abc", 3)],
        "doc_id long, text string, n_chars long",
    )
    out = {r.doc_id: (r.n_words, r.n_bpe_tokens) for r in
           bpe_token_stats(docs, num_merges=10).collect()}
    # every toy word compresses to a single learned token
    assert out == {1: (3, 3), 2: (1, 1)}


def test_bpe_fixture_determinism_and_bounds(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = bpe_token_stats(docs).collect()
    b = bpe_token_stats(docs).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    for r in a:
        # each word is 1..len(word)+1 subtokens
        assert r.n_words <= r.n_bpe_tokens
        assert r.n_bpe_tokens <= r.n_chars + r.n_words
    # BPE learned something: corpus-wide tokens well under char count
    total_bpe = sum(r.n_bpe_tokens for r in a)
    total_chars = sum(r.n_chars for r in a)
    assert total_bpe < 0.5 * total_chars


def test_bpe_corpus_path_is_jvm_only(spark, sf_dir):
    """The corpus side of the plan must be explode → broadcast join →
    agg with no row-at-a-time Python; the ONLY Python node is the r8
    distributed vocabulary encode (MapInPandas over the O(V) word-count
    table — the broadcast-join BUILD side, never corpus rows)."""
    plan = (
        bpe_token_stats(load_table(spark, sf_dir, "documents"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    # vocab-side distributed encode present exactly once, and it feeds
    # the broadcast exchange (build side), not the probe side
    assert plan.count("MapInPandas") == 1


def test_bpe_training_cap_is_structural_and_encode_stays_exact(spark):
    """VERDICT r07 task 4: with a vocab_cap below the corpus vocabulary,
    (a) the driver trains on exactly the top-cap words by (count desc,
    word), via TakeOrdered — never an unbounded collect; (b) every
    corpus word, trained or not, still gets its exact encode under the
    learned merges (stats cover all docs, bounds hold)."""
    from trafsys_data_transfer_spark.operators.tokenizer import (
        train_bpe,
        training_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "aaa aaa aaa bbb bbb rare", 24),
            (2, "aaa bbb unseen zz", 17),
        ],
        "doc_id long, text string, n_chars long",
    )
    top2 = training_counts(docs, vocab_cap=2)
    assert top2 == [("aaa", 4), ("bbb", 3)]  # head only, deterministic
    # stats under the capped trainer still cover EVERY document/word
    out = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_token_stats(docs, num_merges=10, vocab_cap=2).collect()
    }
    assert out[1][0] == 6 and out[2][0] == 4  # all words accounted
    # trained words compress to 1 token; untrained words fall back to
    # whatever the learned merges give them (at most chars+EOW)
    merges = train_bpe(top2, 10)
    assert ("aa", "a</w>") in merges or ("a", "a") in merges


def test_bpe_fixture_merges_identical_under_default_cap(spark, sf_dir):
    """On the fixture (vocabulary far below MAX_TRAIN_VOCAB) the
    construction-bounded trainer learns EXACTLY the merges the unbounded
    collect did — the cap changes nothing until it binds."""
    from trafsys_data_transfer_spark.operators.tokenizer import (
        train_bpe,
        training_counts,
        word_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    capped = train_bpe(training_counts(docs), 50)
    uncapped = train_bpe(
        [(r["word"], r["n"]) for r in word_counts(docs).collect()], 50
    )
    assert capped == uncapped


def test_train_bpe_vocab_cap_raises():
    import pytest

    from trafsys_data_transfer_spark.operators import tokenizer as tok

    old = tok.MAX_TRAIN_VOCAB
    tok.MAX_TRAIN_VOCAB = 2
    try:
        with pytest.raises(ValueError, match="training bound"):
            tok.train_bpe([("a", 1), ("b", 1), ("c", 1)], 5)
    finally:
        tok.MAX_TRAIN_VOCAB = old
