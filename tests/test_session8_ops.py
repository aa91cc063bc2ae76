"""Session-8 operator semantics on planted inputs: rank-sum AUC,
calibration bins, Markov stationary distribution, greedy max-coverage
selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.evalmetrics import (
    MARKOV_SCALE,
    auc_from_buckets,
    coverage_greedy,
    markov_stationary,
)


def test_auc_perfect_separation_and_pure_ties(spark):
    buckets = spark.createDataFrame(
        [
            # lang 'sep': all negatives score 1, all positives score 2.
            ("sep", 1, 2, 0),
            ("sep", 2, 2, 2),
            # lang 'tie': everything in one bucket -> AUC exactly 0.5.
            ("tie", 5, 4, 2),
        ],
        ["lang", "mw", "cnt", "pos"],
    )
    got = {r.lang: r for r in auc_from_buckets(buckets).collect()}
    assert got["sep"].auc == 1.0
    # integer certificate: num = 2*(3+4) - 2*3 = 8, den = 2*2*2 = 8
    assert (got["sep"].auc_num, got["sep"].auc_den) == (8, 8)
    assert got["tie"].auc == 0.5


def test_auc_reversed_scorer_is_zero(spark):
    buckets = spark.createDataFrame(
        [("x", 1, 3, 3), ("x", 9, 3, 0)], ["lang", "mw", "cnt", "pos"]
    )
    row = auc_from_buckets(buckets).collect()[0]
    assert row.auc == 0.0 and row.auc_num == 0


def test_auc_degenerate_single_class_is_null(spark):
    buckets = spark.createDataFrame(
        [("only_pos", 3, 4, 4)], ["lang", "mw", "cnt", "pos"]
    )
    row = auc_from_buckets(buckets).collect()[0]
    assert row.auc is None and row.auc_den == 0


def test_markov_absorbing_state_takes_all_mass(spark):
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    # One user: A -> B -> B -> B.  Transitions: A->B once, B->B twice.
    # B is absorbing; A has no incoming edge, so its mass drains to B.
    rows = [
        (1, t(1), 7, "A"),
        (2, t(2), 7, "B"),
        (3, t(3), 7, "B"),
        (4, t(4), 7, "B"),
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = {r.event_type: r.pi_scaled for r in markov_stationary(events).collect()}
    assert got["A"] == 0
    # floor loss only: within |edges| * rounds parts of the full scale
    assert MARKOV_SCALE - got["B"] <= 2 * 8


def test_markov_symmetric_cycle_splits_mass_evenly(spark):
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    # A -> B -> A -> B: each state hands all mass to the other; uniform
    # init is stationary.
    rows = [(i, t(i), 1, "A" if i % 2 else "B") for i in range(1, 6)]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = {r.event_type: r.pi_scaled for r in markov_stationary(events).collect()}
    half = MARKOV_SCALE // 2
    assert abs(got["A"] - half) <= 16 and abs(got["B"] - half) <= 16


def test_coverage_greedy_marginal_gains_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [
            # doc 1: bigrams {a b, b c, c d} (3 unique)
            (1, "a b c d"),
            # doc 2: {a b, b c} — fully covered once doc 1 is chosen
            (2, "a b c"),
            # doc 3: {x y, y z} — 2 new bigrams
            (3, "x y z"),
            # doc 4: {x y, y q} — 1 new after doc 3
            (4, "x y q"),
        ],
        ["doc_id", "text"],
    )
    rows = coverage_greedy(spark, docs, k=4).collect()
    assert [(r.sel_round, r.doc_id, r.marginal_gain) for r in rows] == [
        (1, 1, 3),
        (2, 3, 2),
        (3, 4, 1),
        # round 4: doc 2 contributes nothing new but still wins the
        # argmax over zero... doc 2 has NO uncovered bigrams left, so it
        # drops out of the anti-join entirely; no candidates remain.
    ], rows
    assert rows[-1].covered_total == 6


def test_coverage_greedy_tie_prefers_lower_doc_id(spark):
    docs = spark.createDataFrame(
        [(9, "p q r"), (4, "u v w")], ["doc_id", "text"]
    )
    rows = coverage_greedy(spark, docs, k=1).collect()
    assert rows[0].doc_id == 4 and rows[0].marginal_gain == 2


def test_single_word_doc_contributes_no_bigrams(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "a b")], ["doc_id", "text"]
    )
    rows = coverage_greedy(spark, docs, k=2).collect()
    assert [(r.sel_round, r.doc_id) for r in rows] == [(1, 2)]
