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


def test_kappa_perfect_and_systematic_disagreement(spark):
    from trafsys_data_transfer_spark.operators.evalmetrics import (
        cohens_kappa,
    )

    perfect = spark.createDataFrame(
        [("a", "a"), ("b", "b")], ["r1", "r2"]
    )
    row = cohens_kappa(perfect, "r1", "r2").collect()[0]
    assert row.kappa == 1.0 and (row.kappa_num, row.kappa_den) == (2, 2)

    swapped = spark.createDataFrame(
        [("a", "b"), ("b", "a")], ["r1", "r2"]
    )
    row = cohens_kappa(swapped, "r1", "r2").collect()[0]
    assert row.kappa == -1.0  # worse than chance, symmetric marginals


def test_poisson_weight_cdf_band_edges(spark):
    from trafsys_data_transfer_spark.operators.evalmetrics import (
        _POISSON_CDF_PPM,
        _poisson_weight,
    )

    edges = [0, _POISSON_CDF_PPM[0], _POISSON_CDF_PPM[1] - 1, 999990, 999999]
    df = spark.createDataFrame([(u,) for u in edges], ["u"])
    got = [
        r.w
        for r in df.select(_poisson_weight(F.col("u")).alias("w"))
        .orderBy("u")
        .collect()
    ]
    # below first threshold -> 0, at it -> 1, inside band 1 -> 1,
    # at the last threshold -> 8, above -> 8
    assert got == [0, 1, 1, 8, 8]


def test_bootstrap_ci_brackets_true_mean(spark):
    from trafsys_data_transfer_spark.operators.evalmetrics import (
        bootstrap_mean_ci,
    )

    events = spark.createDataFrame(
        [(i, 10.0 + (i % 5)) for i in range(400)], ["event_id", "value"]
    )
    row = bootstrap_mean_ci(events).collect()[0]
    assert row.n_events == 400
    assert row.ci_lo <= row.ci_hi
    # true mean 12.0; a ~94% order-statistic CI on 400 iid draws with
    # sd≈1.4 is a few tenths wide and must bracket it
    assert row.ci_lo <= 12.0 <= row.ci_hi
    assert abs(row.mean_full - 12.0) < 1e-9


def test_infogain_perfect_vs_constant_feature(spark):
    from trafsys_data_transfer_spark.operators.evalmetrics import (
        feature_infogain,
    )

    rows = []
    for i in range(8):
        y = i % 2
        rows.append((y, "perfect", y))  # band == label
        rows.append((y, "constant", 0))  # single band
    stacked = spark.createDataFrame(rows, ["y", "feature", "band"])
    got = {r.feature: r for r in feature_infogain(stacked).collect()}
    ln2_micro = 693147  # floor(0.5*ln2*1e6+0.5)*2
    assert abs(got["perfect"].h_y_micro - ln2_micro) <= 2
    assert got["perfect"].h_cond_micro == 0
    assert abs(got["perfect"].ig_micro - ln2_micro) <= 2
    assert got["constant"].ig_micro == 0


def test_js_divergence_identical_and_disjoint(spark):
    from trafsys_data_transfer_spark.operators.evalmetrics import (
        domain_js_divergence,
    )

    docs = spark.createDataFrame(
        [
            (1, "x y", "A"),
            (2, "x y", "B"),  # identical unigram dist to A
            (3, "p p", "C"),
            (4, "q q", "D"),  # disjoint vocab from C
        ],
        ["doc_id", "text", "source"],
    )
    got = {
        (r.source_a, r.source_b): r.js_micro
        for r in domain_js_divergence(docs).collect()
    }
    assert got[("A", "B")] == 0
    ln2_micro = 693147
    assert abs(got[("C", "D")] - ln2_micro) <= 2


def test_ndcg_is_perfect_when_lengths_are_equal(spark):
    from trafsys_data_transfer_spark.operators.evalmetrics import (
        retrieval_ndcg,
    )
    from trafsys_data_transfer_spark.operators.retrieval import BM25_QUERY

    term = BM25_QUERY[0]
    # Same document length everywhere -> BM25 is monotone in tf -> the
    # BM25 ranking IS the ideal ranking -> ndcg = 1.0 exactly.
    docs = spark.createDataFrame(
        [
            (1, f"{term} {term} {term} pad"),
            (2, f"{term} {term} pad pad2"),
            (3, f"{term} pad pad2 pad3"),
        ],
        ["doc_id", "text"],
    )
    got = {r.term: r for r in retrieval_ndcg(docs).collect()}
    assert got[term].ndcg_ppm == 1000000 and got[term].n_candidates == 3


def test_ndcg_degrades_when_length_norm_reorders(spark):
    from trafsys_data_transfer_spark.operators.evalmetrics import (
        retrieval_ndcg,
    )
    from trafsys_data_transfer_spark.operators.retrieval import BM25_QUERY

    term = BM25_QUERY[0]
    # doc 1 has the highest tf but is enormously long: BM25's length
    # normalisation demotes it below doc 2, so the BM25 order disagrees
    # with the tf-ideal order and ndcg drops below 1.
    long_pad = " ".join(f"pad{i}" for i in range(400))
    docs = spark.createDataFrame(
        [
            (1, f"{term} {term} {term} {long_pad}"),
            (2, f"{term} {term} pad"),
            (3, f"{term} pad"),
        ],
        ["doc_id", "text"],
    )
    got = {r.term: r for r in retrieval_ndcg(docs).collect()}
    assert got[term].ndcg_ppm < 1000000
    assert got[term].dcg_micro < got[term].idcg_micro


def test_cuped_perfect_covariate_zeroes_the_diff(spark):
    import datetime as dt

    from trafsys_data_transfer_spark.operators.abtest import (
        cuped_adjusted_effect,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # outcome == covariate per user (click value = purchase value), with
    # an arm imbalance: odd users (treatment) spend more.  CUPED with a
    # perfect covariate must explain the entire raw difference away.
    for u in range(40):
        v = 10.0 + u + (5.0 if u % 2 else 0.0)
        for et in ("click", "purchase"):
            eid += 1
            rows.append((eid, t0, u, et, v))
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    row = cuped_adjusted_effect(events).collect()[0]
    assert row.n_users == 40 and row.n_t == 20
    assert row.theta == 1.0
    assert row.rho2_ppm >= 999999  # ρ² == 1 up to floor
    assert abs(row.diff_raw) > 1.0  # raw effect visible
    assert abs(row.diff_cuped) < 1e-6  # fully explained by the covariate


def test_cuped_constant_outcome_has_zero_theta(spark):
    import datetime as dt

    from trafsys_data_transfer_spark.operators.abtest import (
        cuped_adjusted_effect,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(10):
        eid += 1
        rows.append((eid, t0, u, "click", float(u + 1)))
        eid += 1
        rows.append((eid, t0, u, "purchase", 7.0))
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    row = cuped_adjusted_effect(events).collect()[0]
    assert row.theta == 0.0 and row.rho2_ppm == 0
    assert row.diff_cuped == row.diff_raw


def test_log2_histogram_bins_and_percentile_flags(spark):
    from trafsys_data_transfer_spark.operators.quantiles import (
        log2_histogram,
    )

    # 10 values at 1.0 (bin 19: 2^19 <= 1e6 < 2^20) and 90 at 1000.0
    # (bin 29): p50/p95/p99 all land in bin 29.
    vals = [1.0] * 10 + [1000.0] * 90
    events = spark.createDataFrame([(v,) for v in vals], ["value"])
    rows = {r.bin: r for r in log2_histogram(events).collect()}
    assert set(rows) == {19, 29}
    assert rows[19].n == 10 and rows[29].n == 90
    assert rows[29].cum_n == 100
    assert not rows[19].is_p50_bin and rows[29].is_p50_bin
    assert rows[29].is_p95_bin and rows[29].is_p99_bin
    # dyadic bounds: bin 19 covers [0.524288, 1.048576)
    assert rows[19].lo_value == 0.524288 and rows[19].hi_value == 1.048576


def test_join_cardinality_estimate_upper_bounds_actual(spark):
    from trafsys_data_transfer_spark.plans.analytics import (
        join_cardinality_estimate,
    )

    left = spark.createDataFrame([(1,), (1,), (2,)], ["k"])
    right = spark.createDataFrame([(1,), (2,), (2,)], ["j"])
    row = join_cardinality_estimate(left, "k", right, "j", "t").collect()[0]
    assert row.actual == 4  # 2*(1 match) + 1*(2 matches)
    assert row.est >= row.actual  # collisions only inflate
    assert row.err_ppm >= 1000000


def test_source_ablation_algebra(spark):
    from trafsys_data_transfer_spark.operators.evalmetrics import (
        source_ablation,
    )

    # Source A: all kept; source B: none kept (too short for the Gopher
    # word minimum).  Dropping B must raise the corpus rate; delta < 0.
    # 33 words, mean word length 3.8, 6 stopword hits -> passes the gate
    good = " ".join(["the cat and dog run into town with great speed today"] * 3)
    docs = spark.createDataFrame(
        [
            (1, good, "en", "A"),
            (2, good, "en", "A"),
            (3, "tiny", "en", "B"),
        ],
        ["doc_id", "text", "lang", "source"],
    )
    got = {r.source: r for r in source_ablation(docs).collect()}
    assert got["A"].rate_own_ppm == 1000000
    assert got["B"].rate_own_ppm == 0
    assert got["B"].rate_without_ppm == 1000000
    # full rate 2/3; dropping B raises it -> B's delta is negative
    assert got["B"].delta_ppm < 0 < got["A"].delta_ppm


def test_bandit_ips_identity_policy_recovers_full_value(spark):
    from trafsys_data_transfer_spark.operators.evalmetrics import (
        BANDIT_ACTIONS,
        bandit_ips_replay,
    )

    # Make every logged action match the target policy by construction:
    # give each user exactly the action the hash route picks.  Then
    # n_match == n and the IPS estimate is K * mean(reward) — the known
    # uniform-logging identity.
    from trafsys_data_transfer_spark.operators.dedup import portable_hash60

    users = spark.range(50).select(F.col("id").alias("user_id"))
    k = len(BANDIT_ACTIONS)
    act = F.array(*[F.lit(a) for a in BANDIT_ACTIONS])
    events = users.select(
        "user_id",
        F.element_at(
            act,
            (portable_hash60(F.col("user_id").cast("string")) % k + 1).cast(
                "int"
            ),
        ).alias("event_type"),
        F.lit(2.0).alias("value"),
    )
    row = bandit_ips_replay(events).collect()[0]
    assert row.n_match == row.n == 50
    assert row.value_logged == 2.0
    assert row.value_target_ips == 2.0 * k


def test_flesch_simple_counts(spark):
    from trafsys_data_transfer_spark.operators.text import (
        readability_flesch,
    )

    # "go on. me too." -> 4 words, 2 sentences, 4 vowel groups
    docs = spark.createDataFrame(
        [(1, "go on. me too.", "en")], ["doc_id", "text", "lang"]
    )
    row = readability_flesch(docs).collect()[0]
    assert (row.total_words, row.total_sentences, row.total_syllables) == (
        4,
        2,
        4,
    )
    expected = round(206.835 - 1.015 * (4 / 2) - 84.6 * (4 / 4), 6)
    assert row.flesch_score == expected


def test_matryoshka_full_dim_recall_is_perfect(spark):
    from trafsys_data_transfer_spark.operators.similarity import (
        MATRYOSHKA_K,
        matryoshka_recall,
    )

    # 20 deterministic 64-dim vectors; the 64-dim tier compares the
    # ranking against itself so its recall must be exactly 1.0, and
    # every tier's overlap is bounded by k * |queries|.
    def vec(i):
        return [((i * 37 + j * 11) % 19) / 19.0 + 0.01 for j in range(64)]

    emb = spark.createDataFrame(
        [(i, vec(i)) for i in range(20)], ["vec_id", "embedding"]
    )
    rows = {r.dim: r for r in matryoshka_recall(emb).collect()}
    assert set(rows) == {8, 16, 32, 64}
    assert rows[64].recall_ppm == 1000000
    for r in rows.values():
        assert 0 <= r.n_overlap <= MATRYOSHKA_K * r.n_queries


def test_bh_fdr_step_up_rejects_prefix(spark):
    import datetime as dt

    from trafsys_data_transfer_spark.operators.abtest import (
        bh_fdr_correction,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # Plant a strong effect on 'boost' (only odd users do it) and leave
    # 'flat' balanced: BH must rank boost first and flag it, and the
    # flagged set must be a prefix of the ranking (step-up property).
    for u in range(200):
        eid += 1
        rows.append((eid, t0, u, "flat", 1.0))
        if u % 2 == 1:
            eid += 1
            rows.append((eid, t0, u, "boost", 1.0))
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    out = bh_fdr_correction(events).collect()
    by_name = {r.event_type: r for r in out}
    assert by_name["boost"].rnk == 1 and by_name["boost"].fdr_significant
    assert not by_name["flat"].fdr_significant
    # step-up prefix property
    sig_rnks = sorted(r.rnk for r in out if r.fdr_significant)
    assert sig_rnks == list(range(1, len(sig_rnks) + 1))


def test_mde_scales_down_with_sample_size(spark):
    import datetime as dt

    from trafsys_data_transfer_spark.operators.abtest import mde_readout

    t0 = dt.datetime(2024, 1, 1)

    def events_of(n_users):
        rows = []
        for u in range(n_users):
            rows.append((u + 1, t0, u, "m", 1.0))
        return spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value"]
        )

    # conversion rate 100% -> p(1-p)=0 -> mde 0; instead convert half
    def events_half(n_users):
        rows = []
        eid = 0
        for u in range(n_users):
            eid += 1
            rows.append((eid, t0, u, "m" if u % 4 < 2 else "other", 1.0))
        return spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value"]
        )

    small = {r.event_type: r.mde for r in mde_readout(events_half(80)).collect()}
    big = {r.event_type: r.mde for r in mde_readout(events_half(800)).collect()}
    assert big["m"] < small["m"]  # 10x users shrink the detectable effect


def test_canonical_dedup_catches_case_and_punct_variants(spark):
    from trafsys_data_transfer_spark.operators.dedup import dedup_canonical

    docs = spark.createDataFrame(
        [
            (5, "Hello, World!"),
            (9, "hello   world"),
            (2, "HELLO world."),
            (7, "entirely different"),
        ],
        ["doc_id", "text"],
    )
    rows = dedup_canonical(docs).collect()
    assert len(rows) == 1
    assert rows[0].keeper_id == 2  # min doc_id of the class
    assert rows[0].n_copies == 3 and rows[0].n_distinct_raw == 3


def test_feature_snapshot_trend_and_recency(spark):
    import datetime as dt

    from trafsys_data_transfer_spark.operators.features import (
        user_feature_snapshot,
    )

    rows = []
    eid = 0
    # user 1: 1/2/3 events on days 0/1/2 -> slope exactly +1/day;
    # last active day 2 == anchor -> recency 0.
    for day, n in ((0, 1), (1, 2), (2, 3)):
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, 1 + day), 1, "click", 1.0)
            )
    # user 2: single purchase of 2.5 on day 0 -> recency 2, slope 0.
    eid += 1
    rows.append((eid, dt.datetime(2024, 1, 1), 2, "purchase", 2.5))
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    got = {r.user_id: r for r in user_feature_snapshot(events).collect()}
    u1 = got[1]
    assert (u1.n_events, u1.active_days, u1.recency_days) == (6, 3, 0)
    assert u1.trend_slope == 1.0 and u1.n_purchases == 0
    u2 = got[2]
    assert (u2.n_events, u2.recency_days) == (1, 2)
    assert u2.monetary_micro == 2500000 and u2.trend_slope == 0.0


def test_negative_sampling_kinds_and_disjointness(spark):
    from trafsys_data_transfer_spark.operators.retrieval import (
        BM25_QUERY,
        NEG_N_HARD,
        NEG_N_POS,
        NEG_N_RAND,
        negative_sampling_pairs,
    )

    term = BM25_QUERY[0]
    # 8 docs containing the term with distinct tf, plus 5 without it.
    docs = spark.createDataFrame(
        [(i, " ".join([term] * (9 - i) + ["pad"] * 5)) for i in range(1, 9)]
        + [(100 + i, "no match here at all") for i in range(5)],
        ["doc_id", "text"],
    )
    rows = [r for r in negative_sampling_pairs(docs).collect() if r.term == term]
    pos_ids = {r.pos_doc_id for r in rows}
    rand_ids = {r.neg_doc_id for r in rows if r.neg_kind == "random"}
    assert len(pos_ids) == NEG_N_POS
    # every pos pairs with every negative
    assert len(rows) == NEG_N_POS * (NEG_N_HARD + NEG_N_RAND)
    # random negatives must come from the no-term pool
    assert all(nid >= 100 for nid in rand_ids)
    # hard negatives contain the term (doc_id < 100) and are disjoint
    # from positives
    hard = {r.neg_doc_id for r in rows if r.neg_kind == "hard"}
    assert all(nid < 100 for nid in hard) and not (hard & pos_ids)


def test_snippet_window_clamps_at_edges(spark):
    from trafsys_data_transfer_spark.operators.retrieval import (
        BM25_QUERY,
        snippet_extract,
    )

    term = BM25_QUERY[0]
    docs = spark.createDataFrame(
        [
            (1, f"{term} b c d e f g"),  # hit at position 1: left-clamped
            (2, f"a b c d e {term}"),  # hit at the end: right-clamped
            (3, f"a b c d {term} f g h"),  # interior hit: full +/-3 window
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in snippet_extract(docs).collect()}
    assert got[1].snippet == f"{term} b c d"
    assert got[2].snippet == f"c d e {term}"
    assert got[3].snippet == f"b c d {term} f g h"
    assert got[3].first_pos == 5


def test_branch_merge_three_way_with_branch_removal(spark, tmp_path):
    from trafsys_data_transfer_spark.operators.timetravel import (
        branch_create,
        merge_branch,
        versioned_commit,
        versioned_read,
    )

    main = str(tmp_path / "main")
    br = str(tmp_path / "branch")
    import os as _os

    _os.makedirs(_os.path.join(main, "data"))

    k = lambda lo, hi, tag: spark.createDataFrame(
        [(i, tag) for i in range(lo, hi)], ["k", "tag"]
    )
    # main v1: keys 0-9 tagged old
    versioned_commit(spark, k(0, 10, "old"), main)
    branch_create(spark, main, br)
    # branch RESTATES everything: replace -> the base file is removed on
    # the branch and replaced with keys 0-9 tagged new
    versioned_commit(spark, k(0, 10, "new"), br, replace=True)
    # main independently appends keys 10-14
    versioned_commit(spark, k(10, 15, "mainadd"), main)

    # isolation before the merge
    assert versioned_read(spark, br).filter("tag = 'mainadd'").count() == 0
    assert versioned_read(spark, main).filter("tag = 'new'").count() == 0

    v = merge_branch(spark, br)
    merged = versioned_read(spark, main, v)
    tags = {
        r.tag: r.n
        for r in merged.groupBy("tag").agg(F.count("*").alias("n")).collect()
    }
    # branch removal won: no 'old' rows survive; branch addition and
    # main's independent addition both present
    assert "old" not in tags
    assert tags == {"new": 10, "mainadd": 5}
    # pre-merge main version still readable and un-merged
    assert versioned_read(spark, main, 2).filter("tag = 'new'").count() == 0
