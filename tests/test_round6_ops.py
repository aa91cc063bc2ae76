"""Round-6 operators: data-quality expectations, retractable-aggregate
IVM, zone-map skipping, exact prefix-filtered similarity join, k-fold
splits, weighted sampling, decayed heavy hitters."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# dq_expectations
# ---------------------------------------------------------------------------


def test_dq_expectations_flags_planted_violations(spark):
    """Each rule must flip to failed on a fixture that violates exactly
    it, with the failed count equal to the planted violation count."""
    from trafsys_data_transfer_spark.operators.quality import (
        dq_expectations_over,
    )

    t0 = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            # orderkey, custkey, status, totalprice, date
            (1, 10, "O", 100.0),
            (2, None, "X", -5.0),   # null custkey, bad status, negative
            (2, 11, "F", 50.0),     # duplicate orderkey
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 1, 0.05, 10.0),
            (99, 1, 0.5, 99.0),     # orphan orderkey, discount + qty range
        ],
        "l_orderkey long, l_linenumber long, l_discount double, l_quantity double",
    )
    events = spark.createDataFrame(
        [(1, t0)], "event_id long, ts timestamp"
    )  # stale: max ts < freshness contract
    out = {
        (r["rule"], r["target"]): r
        for r in dq_expectations_over(orders, lineitem, events).collect()
    }
    assert out[("not_null", "orders.o_custkey")]["failed"] == 1
    assert out[("accepted_values", "orders.o_orderstatus")]["failed"] == 1
    assert out[("non_negative", "orders.o_totalprice")]["failed"] == 1
    assert out[("unique", "orders.o_orderkey")]["failed"] == 1
    assert out[("range_0_0.1", "lineitem.l_discount")]["failed"] == 1
    assert out[("range_1_50", "lineitem.l_quantity")]["failed"] == 1
    assert out[("referential", "lineitem.l_orderkey->orders")]["failed"] == 1
    assert out[("freshness", "events.ts")]["failed"] == 1
    assert not any(r["passed"] for r in out.values())
    # pass_ppm carries the rate evidence
    assert out[("not_null", "orders.o_custkey")]["pass_ppm"] == 2 * 1_000_000 // 3


def test_dq_expectations_all_pass_on_clean_fixture(spark, sf_dir):
    from trafsys_data_transfer_spark.operators.quality import dq_expectations

    rows = dq_expectations(spark, sf_dir).collect()
    assert len(rows) == 8
    assert all(r["passed"] and r["failed"] == 0 for r in rows)
    assert all(r["pass_ppm"] == 1_000_000 for r in rows)


# ---------------------------------------------------------------------------
# retractable IVM
# ---------------------------------------------------------------------------


def test_delta_agg_retraction_drops_empty_groups_and_merges(spark):
    from trafsys_data_transfer_spark.operators.ivm import (
        delta_agg_with_retractions,
    )

    base = spark.createDataFrame(
        [("a", 2, 30), ("b", 1, 10)], "k string, cnt long, sum long"
    )
    delta = spark.createDataFrame(
        [
            ("a", -1, 20),   # retract one of a's rows
            ("b", -1, 10),   # retract b's ONLY row -> group must vanish
            ("c", 1, 7),     # brand-new group
        ],
        "k string, sign long, measure long",
    )
    got = {
        r["k"]: (r["cnt"], r["sum"])
        for r in delta_agg_with_retractions(base, delta, ["k"]).collect()
    }
    assert got == {"a": (1, 10), "c": (1, 7)}


# ---------------------------------------------------------------------------
# zone-map skipping
# ---------------------------------------------------------------------------


def test_zonemap_probe_reads_fewer_files_and_same_answer(spark, sf_dir):
    import datetime as dt

    from trafsys_data_transfer_spark.fsutil import process_staging_dir
    from trafsys_data_transfer_spark.operators.layout import (
        ZONEMAP_FILES,
        zonemap_build,
        zonemap_probe,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    path = process_staging_dir("test_zonemap")
    zm = zonemap_build(spark, events, path, "ts")
    assert len(zm) == ZONEMAP_FILES
    lo, hi = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 7)
    pruned, n_read = zonemap_probe(
        spark, zm, lo, hi, "event_id long, ts timestamp_ntz"
    )
    # the 2-day window must SKIP most of the month's range-clustered files
    assert 0 < n_read < ZONEMAP_FILES / 2
    got = pruned.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))).count()
    want = events.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))).count()
    assert got == want > 0
    # zones must actually bound their files (index honesty)
    for r in zm:
        assert r["zmin"] <= r["zmax"]


# ---------------------------------------------------------------------------
# exact prefix-filtered similarity join
# ---------------------------------------------------------------------------


def test_simjoin_exact_equals_bruteforce_on_planted_corpus(spark):
    """Prefix filtering must lose NOTHING: compare against the quadratic
    ground truth on a corpus planted with matching, borderline and
    non-matching pairs."""
    from trafsys_data_transfer_spark.operators.simjoin import simjoin_exact

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),      # J=4/6=0.667 with 1 -> in
        (3, "alpha beta gamma eta theta"),       # J=3/7 with 1 -> out
        (4, "iota kappa lam mu nu"),
        (5, "iota kappa lam mu nu"),             # J=1 with 4 -> in
        (6, "alpha beta gamma delta epsilon zeta eta"),  # J=5/7 with 1 -> in
        (7, "solo words only here"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"])
        for r in simjoin_exact(df, "id", "name").collect()
    }
    # brute force in python
    sets = {i: set(n.split()) for i, n in rows}
    want = {
        (a, b)
        for a in sets
        for b in sets
        if a < b
        and 5 * len(sets[a] & sets[b]) >= 3 * len(sets[a] | sets[b])
    }
    assert got == want
    assert (1, 2) in got and (4, 5) in got and (1, 6) in got
    assert (1, 3) not in got


def test_simjoin_prefix_is_strictly_smaller_than_token_join(spark, sf_dir):
    """The scale claim: the prefix explode must emit well under the full
    shingle count (that difference IS the candidate-bounding)."""
    from trafsys_data_transfer_spark.operators.dedup import shingles
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles(F.split(F.col("text"), " "), 3))
        ).alias("w"),
    )
    n_tokens = toks.count()
    # prefix length for J>=3/5 over size-s sets: s - ceil(3s/5) + 1
    sz = toks.groupBy("doc_id").count()
    n_prefix = sz.select(
        F.sum(
            F.col("count")
            + F.floor(F.lit(-3) * F.col("count") / 5)
            + 1
        )
    ).first()[0]
    assert n_prefix < 0.6 * n_tokens


def test_shingle_simjoin_finds_planted_neardups_only(spark):
    """A doc pair differing by one word inside long shared text matches;
    an unrelated doc does not."""
    from trafsys_data_transfer_spark.operators.simjoin import (
        simjoin_exact_shingles,
    )

    base = "the quick brown fox jumps over the lazy dog near the old red barn every single morning"
    edited = base.replace("lazy", "sleepy")
    other = "completely different words compose this particular document body with zero overlap whatsoever in it"
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, other)], "id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_ppm"]
        for r in simjoin_exact_shingles(df, "id", "text").collect()
    }
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] >= 600_000


# ---------------------------------------------------------------------------
# k-fold / weighted sample / decayed top-k
# ---------------------------------------------------------------------------


def test_kfold_partitions_corpus_disjoint_and_stable(spark, sf_dir):
    from trafsys_data_transfer_spark.operators.sampling import (
        KFOLD_K,
        kfold_column,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    with_fold = docs.withColumn("fold", kfold_column(F.col("doc_id")))
    per = with_fold.groupBy("fold").count().collect()
    assert {r["fold"] for r in per} == set(range(KFOLD_K))
    assert sum(r["count"] for r in per) == n  # partition: disjoint + cover
    # every fold lands in a sane band around n/K (hash uniformity)
    for r in per:
        assert 0.5 * n / KFOLD_K < r["count"] < 1.5 * n / KFOLD_K
    # stability: recompute = identical assignment
    again = docs.withColumn("fold", kfold_column(F.col("doc_id")))
    assert with_fold.exceptAll(again).count() == 0


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    from trafsys_data_transfer_spark.operators.sampling import (
        docs_weighted_sample,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    sampled = docs_weighted_sample(spark, sf_dir)
    joined = sampled.join(docs, "doc_id").select("n_chars")
    mean_sampled = joined.agg(F.avg("n_chars")).first()[0]
    mean_corpus = docs.agg(F.avg("n_chars")).first()[0]
    # weight = n_chars: the sample must skew heavy
    assert mean_sampled > mean_corpus
    # deterministic: same call, same rows
    a = sorted(map(tuple, sampled.collect()))
    b = sorted(map(tuple, docs_weighted_sample(spark, sf_dir).collect()))
    assert a == b


def test_decayed_topk_recency_beats_volume(spark):
    """A user with 8 events three days ago must rank BELOW a user with 3
    events today under a 1-day half-life (8·2^0 < 3·2^3), while raw
    counts would rank them the other way."""
    from trafsys_data_transfer_spark.operators import freq

    t = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for _ in range(8):  # old-heavy user 1 on day 0
        eid += 1
        rows.append(Row(event_id=eid, user_id=1, event_type="view",
                        ts=t, value=0.0, props="{}"))
    for _ in range(3):  # recent user 2 on day 3
        eid += 1
        rows.append(Row(event_id=eid, user_id=2, event_type="view",
                        ts=t + dt.timedelta(days=3), value=0.0, props="{}"))
    df = spark.createDataFrame(rows)
    orig = freq.load_table
    try:
        freq.load_table = lambda _s, _d, name: df
        out = freq.events_decayed_topk(spark, "unused").collect()
    finally:
        freq.load_table = orig
    ranked = [(r["user_id"], r["decayed_scaled"]) for r in out]
    assert ranked == [(2, 3 * 8), (1, 8)]


# ---------------------------------------------------------------------------
# table fingerprint / contribution capping
# ---------------------------------------------------------------------------


def test_table_fingerprint_order_insensitive_and_change_sensitive(spark):
    from trafsys_data_transfer_spark.operators.snapshot import (
        table_fingerprint,
    )

    rows = [(1, "a"), (2, "b"), (3, "c")]
    df = spark.createDataFrame(rows, "k long, v string")
    base = table_fingerprint(df, ["k", "v"]).first()
    # order / partitioning invariance
    shuffled = spark.createDataFrame(rows[::-1], "k long, v string").repartition(7)
    assert tuple(table_fingerprint(shuffled, ["k", "v"]).first()) == tuple(base)
    # single-value change moves the checksum
    changed = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c")], "k long, v string"
    )
    got = table_fingerprint(changed, ["k", "v"]).first()
    assert got["n_rows"] == base["n_rows"]
    assert got["fingerprint"] != base["fingerprint"]


def test_contribution_cap_bounds_every_user(spark):
    from trafsys_data_transfer_spark.operators import sampling

    t = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for uid, n in ((1, 12), (2, 3), (3, 7)):
        for i in range(n):
            eid += 1
            rows.append(Row(event_id=eid, user_id=uid, event_type="view",
                            ts=t + dt.timedelta(minutes=i), value=0.0,
                            props="{}"))
    df = spark.createDataFrame(rows)
    orig = sampling.load_table
    try:
        sampling.load_table = lambda _s, _d, name: df
        out = sampling.events_contribution_capped(spark, "unused").collect()
    finally:
        sampling.load_table = orig
    (r,) = out
    assert r["raw_events"] == 22
    # users 1 and 3 capped at 5, user 2 keeps 3
    assert r["capped_events"] == 5 + 3 + 5
    assert r["n_users"] == 3
    assert r["kept_ppm"] == 13 * 1_000_000 // 22


def test_streaming_decayed_topk_accumulates_across_batches(spark):
    """A user's weight split across micro-batches (maxFilesPerTrigger=1
    over 3 files) must sum in state: drained stream == batch operator."""
    from trafsys_data_transfer_spark.operators import freq
    from trafsys_data_transfer_spark.streaming import queries as sq

    t = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for uid, day, n in ((1, 0, 4), (1, 2, 3), (2, 2, 5), (3, 1, 2)):
        for i in range(n):
            eid += 1
            rows.append(Row(event_id=eid, user_id=uid, event_type="view",
                            ts=t + dt.timedelta(days=day, minutes=i),
                            value=0.0, props="{}"))
    df = spark.createDataFrame(rows)
    orig_f, orig_q = freq.load_table, sq.load_table
    try:
        freq.load_table = lambda _s, _d, name: df
        sq.load_table = lambda _s, _d, name: df
        batch = freq.events_decayed_topk(spark, "unused").collect()
        stream = sq.streaming_decayed_topk(spark, "unused").collect()
    finally:
        freq.load_table = orig_f
        sq.load_table = orig_q
    assert sorted(map(tuple, stream)) == sorted(map(tuple, batch))
    got = {r["user_id"]: r["decayed_scaled"] for r in stream}
    # user 1: 4·2^0 + 3·2^2 = 16; user 2: 5·2^2 = 20; user 3: 2·2^1 = 4
    assert got == {1: 16, 2: 20, 3: 4}


def test_merge_with_tombstones_four_branches(spark):
    from trafsys_data_transfer_spark.operators.merge import (
        merge_with_tombstones,
    )

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame(
        [
            (2, "B", False),   # matched update
            (3, None, True),   # matched delete
            (4, "d", False),   # unmatched insert
            (9, None, True),   # tombstone for absent key: no-op
        ],
        "k long, v string, is_delete boolean",
    )
    got = {
        r["k"]: r["v"]
        for r in merge_with_tombstones(target, updates, ["k"]).collect()
    }
    assert got == {1: "a", 2: "B", 4: "d"}


def test_bm25_incremental_append_equals_full_rebuild(spark, sf_dir):
    """The incrementally maintained index must score identically to a
    from-scratch rebuild over the same final corpus."""
    from trafsys_data_transfer_spark.fsutil import process_staging_dir
    from trafsys_data_transfer_spark.operators.dedup import (
        INCREMENTAL_BATCH_SOURCES,
    )
    from trafsys_data_transfer_spark.operators.retrieval import (
        bm25_index_append,
        bm25_index_probe,
        bm25_index_write,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    is_batch = F.col("source").isin(*INCREMENTAL_BATCH_SOURCES)
    inc_path = process_staging_dir("bm25_test_inc")
    full_path = process_staging_dir("bm25_test_full")
    bm25_index_write(docs.filter(~is_batch), inc_path)
    bm25_index_append(docs.filter(is_batch), inc_path)
    bm25_index_write(docs, full_path)
    inc = bm25_index_probe(spark, inc_path).collect()
    full = bm25_index_probe(spark, full_path).collect()
    assert [tuple(r) for r in inc] == [tuple(r) for r in full]
    assert inc  # non-empty probe


def test_bpe_encode_round_trips_to_original_text(spark):
    """Decoding the encoded ids (concat subtokens, strip the EOW marker)
    must reproduce every document's words exactly — the property that
    makes the encoding shippable to a trainer."""
    from trafsys_data_transfer_spark.operators.tokenizer import (
        EOW,
        bpe_encode_corpus,
        encode_word,
        train_bpe,
        word_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "low lower lowest", 16),
            (2, "new newer newest lowest", 22),
            (3, "low low low", 11),
        ],
        "doc_id long, text string, n_chars long",
    )
    out = {r["doc_id"]: r for r in bpe_encode_corpus(docs, 20).collect()}
    # rebuild the id -> token mapping exactly as the operator does
    counts = [
        (r["word"], r["n"]) for r in word_counts(docs).collect()
    ]
    merges = train_bpe(counts, 20)
    ranks = {p: i for i, p in enumerate(merges)}
    encoded = {w: encode_word(w, ranks) for w, _ in counts}
    vocab = sorted({t for ts in encoded.values() for t in ts})
    for doc_id, text, _n in docs.collect():
        toks = [vocab[i] for i in out[doc_id]["token_ids"]]
        decoded = "".join(toks).replace(EOW, " ").strip()
        assert decoded == text, (doc_id, decoded)
        assert out[doc_id]["n_tokens"] == len(out[doc_id]["token_ids"])


def test_gdpr_cascade_erasure_zero_residuals(spark, sf_dir):
    from trafsys_data_transfer_spark.operators.quality import (
        gdpr_erasure_audit,
    )

    rows = {r["table_name"]: r for r in gdpr_erasure_audit(spark, sf_dir).collect()}
    assert set(rows) == {"customer", "orders", "lineitem"}
    for r in rows.values():
        assert r["residual_rows"] == 0
        assert r["rows_before"] == r["rows_removed"] + r["rows_after"]
    assert rows["customer"]["rows_removed"] > 0  # the request set is non-empty
    # the cascade actually reaches depth 3
    assert rows["lineitem"]["rows_removed"] > 0


def test_gdpr_cascade_catches_planted_residual(spark):
    """If the lineitem erasure step is skipped, the audit's residual
    count must be non-zero — the audit is recomputed from post-state,
    not inferred from the deltas."""
    from trafsys_data_transfer_spark.operators.quality import (
        ERASE_MOD,
        ERASE_REM,
        cascade_erase_audit,
    )

    cust = spark.createDataFrame(
        [(ERASE_REM,), (1,)], "c_custkey long"
    )
    orders = spark.createDataFrame(
        [(100, ERASE_REM), (101, 1)], "o_orderkey long, o_custkey long"
    )
    # lineitem referencing the erased order
    line = spark.createDataFrame(
        [(100, 1), (101, 1)], "l_orderkey long, l_linenumber long"
    )
    out = {r["table_name"]: r for r in
           cascade_erase_audit(cust, orders, line).collect()}
    assert out["lineitem"]["rows_removed"] == 1
    assert out["lineitem"]["residual_rows"] == 0
    assert out["orders"]["rows_removed"] == 1


def test_coverage_gaps_merges_overlaps_and_finds_holes(spark):
    import datetime as d

    from trafsys_data_transfer_spark.plans.watermark import coverage_gaps

    D = d.date
    windows = spark.createDataFrame(
        [
            (D(2024, 1, 1), D(2024, 1, 3)),
            (D(2024, 1, 2), D(2024, 1, 5)),   # overlaps the first
            (D(2024, 1, 7), D(2024, 1, 8)),   # hole [5, 7)
            (D(2024, 1, 8), D(2024, 1, 9)),   # adjacent: NOT a hole
            (D(2024, 1, 12), D(2024, 1, 13)), # hole [9, 12)
        ],
        "FromDate date, ToDate date",
    )
    got = [(r["gap_start"], r["gap_end"]) for r in coverage_gaps(windows).collect()]
    assert got == [(D(2024, 1, 5), D(2024, 1, 7)), (D(2024, 1, 9), D(2024, 1, 12))]
    # fully covered log -> no gaps
    solid = spark.createDataFrame(
        [(D(2024, 1, 1), D(2024, 1, 5)), (D(2024, 1, 4), D(2024, 1, 9))],
        "FromDate date, ToDate date",
    )
    assert coverage_gaps(solid).count() == 0
