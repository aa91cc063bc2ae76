from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.snapshot import snapshot_diff
from trafsys_data_transfer_spark.sources.fixtures import load_table


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_snapshot_diff_classifies_all_four_cases(spark):
    old = _snap(spark, [(1, "a"), (2, "b"), (3, "c")])
    new = _snap(spark, [(2, "b"), (3, "CHANGED"), (4, "d")])
    got = {r["doc_id"]: r["change"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_covers_union_of_keys_exactly_once(spark, sf_dir):
    from trafsys_data_transfer_spark.operators.snapshot import corpus_snapshot_diff

    res = corpus_snapshot_diff(spark, sf_dir)
    rows = res.collect()
    keys = [r["doc_id"] for r in rows]
    assert len(keys) == len(set(keys))  # one verdict per key
    # every delta class present on the fixture derivation
    classes = {r["change"] for r in rows}
    assert classes == {"added", "removed", "changed", "unchanged"}


def test_snapshot_diff_join_moves_fingerprints_not_text(spark):
    old = _snap(spark, [(1, "x" * 10)])
    new = _snap(spark, [(1, "x" * 10)])
    df = snapshot_diff(old, new)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the md5 fingerprint is computed BELOW the join (in the per-side
    # projections), so the join itself only carries (key, digest)
    join_pos = plan.index("Join")
    below_join = plan[join_pos:]
    assert "md5" in below_join
    # and the diff output schema carries no content column at all
    assert set(df.columns) == {"doc_id", "change"}


def test_snapshot_diff_of_identical_snapshots_is_all_unchanged(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    res = snapshot_diff(docs, docs)
    assert res.filter(F.col("change") != "unchanged").count() == 0


def test_snapshot_diff_is_symmetric_under_swap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 4 != 0)
    fwd = {r["doc_id"]: r["change"] for r in snapshot_diff(old, new).collect()}
    bwd = {r["doc_id"]: r["change"] for r in snapshot_diff(new, old).collect()}
    swap = {"added": "removed", "removed": "added"}
    assert fwd == {k: swap.get(v, v) for k, v in bwd.items()}


def test_fingerprint_diff_locates_exactly_corrupted_partitions(spark, sf_dir):
    """Identical replicas flag nothing; a planted corruption flags
    exactly the months holding a corrupted key."""
    from trafsys_data_transfer_spark.operators.snapshot import (
        fingerprint_by_group,
    )

    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
    orders = load_table(spark, sf_dir, "orders").select(*cols, "o_orderdate")
    mon = F.trunc(F.col("o_orderdate"), "month")
    a = fingerprint_by_group(orders, cols, mon, "mon")
    b = fingerprint_by_group(orders, cols, mon, "mon")
    clean = a.withColumnRenamed("fingerprint", "fa").join(
        b.withColumnRenamed("fingerprint", "fb"), "mon"
    ).filter(F.col("fa") != F.col("fb"))
    assert clean.count() == 0
    # planted: flagged months == months containing a corrupted key
    from trafsys_data_transfer_spark.operators.snapshot import (
        orders_fingerprint_diff_locate,
    )

    flagged = {
        r["mon"] for r in orders_fingerprint_diff_locate(spark, sf_dir).collect()
    }
    expected = {
        r["mon"]
        for r in orders.filter(F.col("o_orderkey") % 997 == 0)
        .select(mon.alias("mon"))
        .distinct()
        .collect()
    }
    assert flagged == expected and flagged


def test_antientropy_repair_reships_only_flagged_groups(spark):
    """Repair provenance: rows in clean groups must come from the REPLICA
    (untouched), rows in flagged groups from the TRUTH — asserted via a
    non-fingerprinted origin marker column."""
    from trafsys_data_transfer_spark.operators.snapshot import antientropy_repair

    truth = spark.createDataFrame(
        [(k, f"v{k}", k % 3, "t") for k in range(30)],
        "k long, payload string, grp_src int, origin string",
    )
    # replica: group 1 corrupted (payload flipped on one key), groups 0/2 clean
    replica = truth.withColumn("origin", F.lit("r")).withColumn(
        "payload",
        F.when(F.col("k") == 13, F.lit("CORRUPT")).otherwise(F.col("payload")),
    )
    out = antientropy_repair(
        truth, replica, ["k", "payload"], F.col("grp_src"), "g"
    ).collect()
    assert {(r.k, r.payload) for r in out} == {(k, f"v{k}") for k in range(30)}
    for r in out:
        assert r.origin == ("t" if r.grp_src == 1 else "r"), (r.k, r.origin)


def test_antientropy_repair_handles_missing_and_extra_groups(spark):
    from trafsys_data_transfer_spark.operators.snapshot import antientropy_repair

    truth = spark.createDataFrame(
        [(k, k % 4) for k in range(40)], "k long, g_src int"
    )
    # replica lost group 2 entirely and duplicated one row of group 3
    replica = truth.filter(F.col("g_src") != 2).unionByName(
        truth.filter(F.col("k") == 3)
    )
    out = antientropy_repair(truth, replica, ["k"], F.col("g_src"), "g")
    assert sorted(r.k for r in out.collect()) == list(range(40))
