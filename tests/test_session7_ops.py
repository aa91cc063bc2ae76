"""Session-7 operator semantics on planted inputs: segment dedup removal,
per-source boilerplate, NB language-id, hashed linear scorer, kNN label
noise."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.classify import (
    linear_quality_scores,
    nb_langid_confusion,
)
from trafsys_data_transfer_spark.operators.spans import (
    SEGMENT_WORDS,
    boilerplate_by_source,
    plant_boilerplate,
    segment_dedup_clean,
)


def _doc(doc_id, words, lang="en", source="s0"):
    return (doc_id, " ".join(words), lang, source, len(" ".join(words)))


DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def test_segment_dedup_removes_all_copies_and_keeps_tail(spark):
    seg_a = [f"a{i}" for i in range(SEGMENT_WORDS)]
    seg_b = [f"b{i}" for i in range(SEGMENT_WORDS)]
    tail = ["tail1", "tail2"]
    docs = spark.createDataFrame(
        [
            _doc(1, seg_a + seg_b + tail),  # seg_a dup'd with doc 2
            _doc(2, seg_a),  # entirely duplicated -> empty clean text
            _doc(3, ["short", "doc"]),  # sub-segment-width, untouched
        ],
        DOC_COLS,
    )
    got = {r.doc_id: r for r in segment_dedup_clean(docs).collect()}
    assert got[1].n_segments == 2 and got[1].n_removed == 1
    # doc 1 keeps seg_b and the tail words
    assert got[1].clean_n_words == SEGMENT_WORDS + len(tail)
    assert got[2].n_removed == 1 and got[2].clean_n_words == 0
    assert got[3].n_segments == 0 and got[3].n_removed == 0
    assert got[3].clean_n_words == 2


def test_segment_dedup_removes_within_doc_repeats(spark):
    seg = [f"w{i}" for i in range(SEGMENT_WORDS)]
    docs = spark.createDataFrame([_doc(7, seg + seg)], DOC_COLS)
    row = segment_dedup_clean(docs).collect()[0]
    assert row.n_removed == 2 and row.clean_n_words == 0


def test_boilerplate_detects_planted_header(spark):
    # 10 docs in one source, each long enough for one segment.
    body = lambda i: [f"u{i}_{j}" for j in range(SEGMENT_WORDS)]
    docs = spark.createDataFrame(
        [_doc(i, body(i), source="sX") for i in range(10)], DOC_COLS
    )
    out = boilerplate_by_source(plant_boilerplate(docs)).collect()
    row = {r.source: r for r in out}["sX"]
    # doc_id % 10 < 6 -> docs 0-5 planted (6 of 10 = 60% >= 30%).
    assert row.n_docs == 10
    assert row.n_boiler_digests == 1
    assert row.n_affected_docs == 6
    assert row.boiler_occurrences == 6
    # unique body segments must NOT be flagged
    assert row.removed_word_ppm == (
        6 * SEGMENT_WORDS * 1_000_000
    ) // row.total_words


def test_nb_langid_learns_separable_vocab(spark):
    # Train docs (doc_id % 5 != 0) with disjoint vocab per lang; test
    # docs (doc_id % 5 == 0) must be classified correctly.
    train_ids = [1, 2, 3, 4, 6, 7, 8, 9]  # none divisible by 5
    rows = []
    for i in train_ids:
        rows.append(_doc(i, ["aa", "ab", "ac"], lang="en"))
        rows.append(_doc(100 + i, ["zz", "zy", "zx"], lang="de"))
    rows.append(_doc(5, ["aa", "ab"], lang="en"))  # test, en vocab
    rows.append(_doc(110, ["zz", "zy"], lang="de"))  # test, de vocab
    docs = spark.createDataFrame(rows, DOC_COLS)
    cells = {
        (r.labeled_lang, r.predicted_lang): r.n
        for r in nb_langid_confusion(docs).collect()
    }
    assert cells == {("en", "en"): 1, ("de", "de"): 1}


def test_linear_scorer_keep_iff_positive_sum(spark):
    docs = spark.createDataFrame(
        [_doc(1, ["alpha", "beta", "gamma", "delta"])], DOC_COLS
    )
    row = linear_quality_scores(docs).collect()[0]
    assert row.n_tokens == 4
    assert row.keep == (row.score_sum > 0)
    # weight bound: each token weight in [-1000, 1000]
    assert abs(row.score_sum) <= 4000


def test_knn_label_noise_flags_planted_mislabel(spark):
    from trafsys_data_transfer_spark.operators.similarity import (
        knn_label_noise,
    )

    # Two tight clusters of 5 in 64-dim; one vector in cluster A carries
    # cluster B's label -> it (and only it) is majority-disagreed.
    def vec(axis, jitter):
        v = [0.0] * 64
        v[axis] = 1.0
        v[(axis + 1) % 64] = jitter
        return v

    rows = []
    for i in range(5):
        rows.append((i, vec(0, 0.01 * (i + 1)), 1 if i == 0 else 0))
    for i in range(5):
        rows.append((10 + i, vec(32, 0.01 * (i + 1)), 1))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    flagged = {r.vec_id for r in knn_label_noise(emb, k=4).collect()}
    assert flagged == {0}


def test_luhn_valid_separates_real_from_shaped(spark):
    from trafsys_data_transfer_spark.operators.pii import (
        LUHN_VALID_SAMPLE,
        luhn_audit,
    )

    # Flipping the check digit of a Luhn-valid PAN must invalidate it.
    bad = LUHN_VALID_SAMPLE[:-1] + str((int(LUHN_VALID_SAMPLE[-1]) + 1) % 10)
    docs = spark.createDataFrame(
        [
            (1, f"pay {LUHN_VALID_SAMPLE} now"),
            (2, f"ref {bad} thanks"),
            (3, "no digits here"),
            (4, "short 123456789012345 run"),  # 15 digits: not a candidate
        ],
        ["doc_id", "text"],
    )
    rows = luhn_audit(docs).collect()
    got = {(r.doc_id, r.candidate): r.is_luhn_valid for r in rows}
    assert got == {(1, LUHN_VALID_SAMPLE): True, (2, bad): False}


def test_temporal_reach_requires_nondecreasing_path(spark):
    import datetime as dt

    from trafsys_data_transfer_spark.operators.graph import (
        temporal_earliest_arrival,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    # user 1 provides signup->click @ :20; user 2's click->buy edge fires
    # at :06, BEFORE click is reachable, so it must not count; user 3's
    # click->buy @ :40 is the first time-respecting arrival at buy.
    rows = [
        (1, t(10), 100, "signup"),
        (2, t(20), 100, "click"),
        (3, t(5), 200, "click"),
        (4, t(6), 200, "buy"),
        (5, t(30), 300, "click"),
        (6, t(40), 300, "buy"),
        (7, t(1), 400, "other"),
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = {
        r.event_type: (r.reachable, r.arr_ts)
        for r in temporal_earliest_arrival(events).collect()
    }
    assert got["signup"] == (True, dt.datetime(1970, 1, 1))
    assert got["click"] == (True, t(20))
    assert got["buy"] == (True, t(40))  # NOT :06 — that edge pre-dates reach
    assert got["other"] == (False, None)

    # Drop user 3: the only remaining click->buy edge pre-dates click's
    # arrival, so buy becomes temporally UNreachable despite the static
    # signup->click->buy path existing.
    pruned = events.filter(F.col("user_id") != 300)
    got2 = {
        r.event_type: r.reachable
        for r in temporal_earliest_arrival(pruned).collect()
    }
    assert got2["buy"] is False and got2["click"] is True
