"""Session-5 operators (round 11): property tests beyond the driver hash
— identity checks, planted-row behaviour, and cross-query consistency for
the Pareto cover, duplicate-submission audit, bot screen, SLO burn rate,
temporal split, Jaccard retention, stickiness, Zipf fit, confusion
matrix, backlog ledger, and dedup cluster histogram."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.registry import all_queries
from trafsys_data_transfer_spark.sources.fixtures import load_table


def _q(name, spark, sf_dir):
    return all_queries()[name].build(spark, sf_dir)


def test_pareto_cover_is_minimal_and_sufficient(spark, sf_dir):
    """The reported top set reaches >= 80% of revenue, and removing its
    last (smallest) member drops below 80% — i.e. the cover is minimal."""
    row = _q("customer_pareto_8020", spark, sf_dir).collect()[0]
    assert 5 * row["top_cents"] >= 4 * row["total_cents"]
    assert 0 < row["n_top"] <= row["n_customers"]
    # recompute the (n_top-1)-prefix sum and check it falls short
    orders = load_table(spark, sf_dir, "orders")
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("c"))
        .orderBy(F.col("c").desc(), "o_custkey")
        .limit(row["n_top"] - 1)
        .agg(F.sum("c").alias("s"))
        .collect()[0]["s"]
    )
    assert 5 * (rev or 0) < 4 * row["total_cents"]


def test_duplicate_submission_pairs_share_user_and_amount(spark, sf_dir):
    out = _q("events_duplicate_submission_audit", spark, sf_dir)
    rows = out.collect()
    ev = {
        r["event_id"]: r
        for r in load_table(spark, sf_dir, "events").collect()
    }
    for r in rows:
        a, b = ev[r["event_a"]], ev[r["event_b"]]
        assert a["user_id"] == b["user_id"] == r["user_id"]
        assert round(a["value"], 2) == round(b["value"], 2) == r["amount"]
        assert 0 <= r["gap_days"] <= 7
        assert a["ts"] <= b["ts"]


def test_bot_detection_covers_every_user_with_exact_counts(spark, sf_dir):
    out = _q("events_bot_detection", spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    assert out.count() == events.select("user_id").distinct().count()
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()
    bad = out.filter(
        (F.col("n_distinct_gaps") >= F.col("n_events"))
        & (F.col("n_events") > 1)
    ).count()
    assert bad == 0  # n-1 gaps can never yield n distinct values


def test_slo_burn_rate_alert_implies_both_windows_burn(spark, sf_dir):
    rows = _q("events_slo_burn_rate", spark, sf_dir).collect()
    assert rows, "hourly series must be non-empty"
    for r in rows:
        assert r["err_1h"] <= r["total_1h"]
        assert r["err_6h"] <= r["total_6h"]
        expected = r["rate_1h_ppm"] > 250000 and r["rate_6h_ppm"] > 250000
        assert r["burn_alert"] == expected
    # the 6h window at any hour includes at least the 1h counts
    for r in rows:
        assert r["total_6h"] >= r["total_1h"]
        assert r["err_6h"] >= r["err_1h"]


def test_temporal_holdout_partitions_and_embargo(spark, sf_dir):
    rows = {r["split"]: r for r in _q("split_temporal_holdout", spark, sf_dir).collect()}
    events = load_table(spark, sf_dir, "events")
    n_splits = sum(r["n_rows"] for r in rows.values())
    assert n_splits == events.count()  # every row in exactly one split
    assert "train" in rows and "test" in rows
    # temporal ordering: train ends before embargo/test begin
    if "embargo" in rows:
        assert rows["train"]["max_day"] < rows["embargo"]["min_day"]
        assert rows["embargo"]["max_day"] < rows["test"]["min_day"]
        # embargo spans < 2 distinct days by construction
        span = (rows["embargo"]["max_day"] - rows["embargo"]["min_day"]).days
        assert span <= 1
    else:
        assert rows["train"]["max_day"] < rows["test"]["min_day"]
    assert rows["train"]["users_shared_with_train"] == rows["train"]["n_users"]


def test_daily_jaccard_retention_bounds(spark, sf_dir):
    rows = _q("events_daily_jaccard_retention", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_common"] <= min(r["n_day"], r["n_next"])
        union = r["n_day"] + r["n_next"] - r["n_common"]
        assert r["jaccard_ppm"] == 1_000_000 * r["n_common"] // union


def test_dau_mau_stickiness_bounds(spark, sf_dir):
    rows = _q("events_dau_mau_stickiness", spark, sf_dir).collect()
    assert rows
    for r in rows:
        # avg DAU can never exceed MAU → ratio ≤ 1e6 ppm; and with
        # activity on every counted day it is strictly positive
        assert 0 < r["stickiness_ppm"] <= 1_000_000
        assert r["dau_sum"] <= r["n_days"] * r["mau"]


def test_zipf_slope_is_negative_with_positive_fit(spark, sf_dir):
    row = _q("text_zipf_slope", spark, sf_dir).collect()[0]
    # sf0.001's vocabulary is smaller than the 100-term cap
    assert 0 < row["n_terms"] <= 100
    assert row["zipf_slope"] < 0  # frequency falls with rank, always
    assert 0 <= row["fit_r2"] <= 1


def test_confusion_matrix_row_shares_and_diagonal(spark, sf_dir):
    rows = _q("docs_language_confusion_matrix", spark, sf_dir).collect()
    docs_n = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n"] for r in rows) == docs_n
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r["labeled_lang"], []).append(r)
        assert r["is_correct"] == (r["labeled_lang"] == r["predicted_lang"])
    for label, cells in by_label.items():
        assert sum(c["n"] for c in cells) == cells[0]["n_labeled"]


def test_backlog_identity_and_terminal_level(spark, sf_dir):
    rows = _q("orders_backlog_timeseries", spark, sf_dir).collect()
    run = 0
    for r in rows:
        run += r["opened"] - r["closed"]
        assert r["backlog"] == run
    # terminal backlog == orders that never complete (no lineitems)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    never = (
        orders.join(
            li.select(F.col("l_orderkey").alias("o_orderkey")).distinct(),
            "o_orderkey",
            "left_anti",
        ).count()
    )
    assert rows[-1]["backlog"] == never


def test_cluster_histogram_accounts_for_every_doc(spark, sf_dir):
    rows = _q("dedup_cluster_size_histogram", spark, sf_dir).collect()
    docs_n = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == docs_n
    for r in rows:
        assert r["n_docs"] == r["size"] * r["n_clusters"]


def test_streaming_slo_equals_batch(spark, sf_dir):
    """The stored-partials streaming twin must produce exactly the batch
    answer — hours split across micro-batches merge via count sums."""
    batch = _q("events_slo_burn_rate", spark, sf_dir).collect()
    stream = _q("streaming_slo_burn_rate", spark, sf_dir).collect()
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]


def test_dsir_favors_target_language(spark, sf_dir):
    """Mean DSIR log-weight of target-domain (en) docs must exceed the
    rest's — the score must actually separate the distributions."""
    out = _q("docs_dsir_logweight", spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = out.join(docs, "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("dsir_logweight").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_bestfit_packing_invariants_and_assignment(spark, sf_dir):
    from trafsys_data_transfer_spark.operators.packing import (
        BESTFIT_CAPACITY,
        pack_bestfit_bins,
    )

    docs = load_table(spark, sf_dir, "documents")
    assigned = pack_bestfit_bins(docs)
    # every doc exactly once
    assert assigned.count() == docs.count()
    assert assigned.select("doc_id").distinct().count() == docs.count()
    fills = assigned.groupBy("group", "bin_idx").agg(
        F.sum("n_tokens").alias("fill")
    )
    assert fills.where(F.col("fill") > BESTFIT_CAPACITY).count() == 0
    # first-fit invariant: at most one <= half-full bin per group
    lax = (
        fills.where(F.col("fill") * 2 <= BESTFIT_CAPACITY)
        .groupBy("group")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert lax == 0
    cert = _q("docs_pack_bestfit", spark, sf_dir).collect()[0]
    assert cert["no_overflow"] and cert["fill_conserved"] and cert["halffull_bound"]
