"""Decontamination and repetition-quality operator semantics.

Planted-overlap tests build tiny corpora with *known* shared n-grams so
the expected hit counts are computable by hand; the repetition tests use
strings whose bigram multisets are trivial to enumerate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.contamination import (
    decontaminate_hits,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_counts_distinct_shared_ngrams(spark):
    # eval doc: tokens a..h → 5-grams: "a b c d e", "b c d e f", ... (4 of them)
    ev = _docs(spark, [(100, "a b c d e f g h")])
    tr = _docs(
        spark,
        [
            # shares exactly the "a b c d e" and "b c d e f" 5-grams
            (1, "a b c d e f x y z w"),
            # no 5-token span in common (interleaved breakers)
            (2, "a b q c d q e f q g h"),
            # shares "d e f g h" once even though the span repeats twice:
            # hits count DISTINCT grams, not occurrences
            (3, "d e f g h d e f g h"),
        ],
    )
    got = {
        r["doc_id"]: r["n_hit_ngrams"]
        for r in decontaminate_hits(tr, ev, n=5).collect()
    }
    assert got == {1: 2, 3: 1}


def test_decontaminate_short_docs_produce_no_grams(spark):
    ev = _docs(spark, [(100, "a b c d e")])
    tr = _docs(spark, [(1, "a b c d")])  # 4 tokens < n=5 → no 5-grams
    assert decontaminate_hits(tr, ev, n=5).count() == 0


def test_decontaminate_eval_side_never_self_matches(spark):
    """Only training docs appear in the output — a clean corpus yields
    an empty result, not the eval set joined to itself."""
    ev = _docs(spark, [(100, "a b c d e f")])
    tr = _docs(spark, [(1, "p q r s t u v")])
    assert decontaminate_hits(tr, ev, n=5).count() == 0


def test_repetition_stats_known_values(spark):
    docs = _docs(
        spark,
        [
            # bigrams: (x y, y x, x y, y x, x y) → 5 total, 2 distinct,
            # top = "x y" ×3
            (1, "x y x y x y"),
            # all 4 bigrams distinct → no repetition
            (2, "a b c d e"),
        ],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert rows[1]["n_grams"] == 5
    assert abs(rows[1]["top_gram_frac"] - 3 / 5) < 1e-9
    assert abs(rows[1]["dup_gram_frac"] - (1 - 2 / 5)) < 1e-9
    assert rows[2]["n_grams"] == 4
    assert abs(rows[2]["top_gram_frac"] - 1 / 4) < 1e-9
    assert rows[2]["dup_gram_frac"] == 0.0


def test_repetition_single_token_doc_dropped(spark):
    docs = _docs(spark, [(1, "lonely")])
    assert repetition_stats(docs).count() == 0


def test_decontaminate_hash_join_matches_string_join(spark):
    """The production path joins on xxhash64(gram); the audit path joins on
    the gram string.  Per-doc hit counts must be identical on the real
    fixture corpus (the planted near-dup shards give a dense overlap
    surface), proving the 8-byte key loses nothing."""
    from trafsys_data_transfer_spark.operators.contamination import EVAL_SOURCES
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    is_eval = F.col("source").isin(*EVAL_SOURCES)
    tr, ev = docs.filter(~is_eval), docs.filter(is_eval)
    hashed = {
        r["doc_id"]: r["n_hit_ngrams"]
        for r in decontaminate_hits(tr, ev, join_on_hash=True).collect()
    }
    strings = {
        r["doc_id"]: r["n_hit_ngrams"]
        for r in decontaminate_hits(tr, ev, join_on_hash=False).collect()
    }
    assert hashed and hashed == strings


def test_decontaminate_plan_broadcasts_eval_side(spark):
    """The training corpus must never shuffle for the join: the eval gram
    set is broadcast (at 100 TB the corpus-side exchange would dominate
    the whole pipeline)."""
    ev = _docs(spark, [(100, "a b c d e f")])
    tr = _docs(spark, [(1, "a b c d e x")])
    plan = decontaminate_hits(tr, ev, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fuzzy_decontamination_flags_edited_eval_copy(spark):
    """A training doc that is a lightly edited copy of an eval doc must be
    flagged; an unrelated training doc must not; eval-eval and
    train-train near-dups are not decontamination hits."""
    from pyspark.sql import Row

    from trafsys_data_transfer_spark.operators import contamination as c

    base = " ".join(f"w{i}" for i in range(60))
    edited = " ".join(f"w{i}" for i in range(59)) + " zz"
    rows = [
        Row(doc_id=1, text=base, lang="en", source="src0", n_chars=0),  # eval
        Row(doc_id=2, text=edited, lang="en", source="src9", n_chars=0),  # train copy
        Row(doc_id=3, text=" ".join(f"q{i}" for i in range(60)), lang="en",
            source="src9", n_chars=0),  # unrelated train
        Row(doc_id=4, text=edited, lang="en", source="src8", n_chars=0),  # train dup of 2
    ]
    df = spark.createDataFrame(rows)
    orig = c.load_table
    try:
        c.load_table = lambda _s, _d, name: df
        out = c.text_decontaminate_fuzzy(spark, "unused").collect()
    finally:
        c.load_table = orig
    got = {(r["train_doc_id"], r["eval_doc_id"]) for r in out}
    assert (2, 1) in got and (4, 1) in got  # both edited copies flagged
    assert all(t != 3 for t, _ in got)      # unrelated never flagged
    assert all(e == 1 for _, e in got)      # train-train pair (2,4) excluded


def test_compression_ratio_separates_repetition_from_prose(spark):
    """Repetitive text compresses far below varied text; ratios stay in
    (0, ~1.2]; identical inputs give identical signals across batchings."""
    from trafsys_data_transfer_spark.operators.text import compression_ratio

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 50),
        (2, " ".join(f"w{i * 7919 % 1000} x{i * 104729 % 997}" for i in range(300))),
        (3, "spam " * 500),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in compression_ratio(df).collect()}
    assert got[3].ratio_ppm < got[1].ratio_ppm < got[2].ratio_ppm
    for r in got.values():
        assert 0 < r.ratio_ppm <= 1_200_000
        assert r.comp_len == len(__import__("zlib").compress(
            dict(rows)[r.doc_id].encode(), 6))


def test_compression_ratio_certificate_all_true_on_fixture(spark):
    """The registered certificate row (raw_len + codec invariants) holds
    on the real documents fixture — the exact columns the DuckDB oracle
    recomputes (VERDICT r09 task 5)."""
    from trafsys_data_transfer_spark.registry import all_queries

    out = (
        all_queries()["text_compression_ratio"]
        .build(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert out, "empty certificate"
    for r in out:
        assert r.comp_in_bounds and r.roundtrip_ok and r.doubling_ok, r
        assert r.raw_len > 0
