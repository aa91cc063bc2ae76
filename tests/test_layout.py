"""Layout maintenance: compaction bin-packing and Z-order data skipping.

Assertions are physical, not just relational: file counts actually drop,
and post-Z-order footer min/max stats actually prune a multi-column box
predicate that the single-column layout cannot prune at all.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.layout import (
    compact_parquet,
    file_prune_fraction,
    zorder_by,
)
from trafsys_data_transfer_spark.sources.fixtures import load_table


def _checksum(df):
    cols = [F.col(c).cast("string") for c in sorted(df.columns)]
    return df.select(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).first()


def _parquet_files(path: str) -> list[str]:
    return glob.glob(f"{path}/**/*.parquet", recursive=True)


def test_compact_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    path = str(tmp_path / "fragmented")
    li = load_table(spark, sf_dir, "lineitem")
    li.repartition(50).write.parquet(path)  # micro-batch-sink aftermath
    assert len(_parquet_files(path)) == 50
    before = _checksum(spark.read.parquet(path))

    written = compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert written == len(_parquet_files(path)) == 1  # sf0.001 fits one file
    assert _checksum(spark.read.parquet(path)) == before

    # Idempotent: a second pass plans the same layout.
    assert compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024) == 1


def test_compact_partitioned_keeps_partition_dirs(spark, sf_dir, tmp_path):
    path = str(tmp_path / "by_flag")
    li = load_table(spark, sf_dir, "lineitem")
    li.repartition(20).write.partitionBy("l_returnflag").parquet(path)
    before = _checksum(spark.read.parquet(path))
    n_dirs_before = len(glob.glob(f"{path}/l_returnflag=*"))

    compact_parquet(
        spark, path, target_file_bytes=64 * 1024 * 1024, partition_col="l_returnflag"
    )
    assert len(glob.glob(f"{path}/l_returnflag=*")) == n_dirs_before
    assert _checksum(spark.read.parquet(path)) == before
    # ≤ a handful of files per partition instead of 20 slivers each.
    for d in glob.glob(f"{path}/l_returnflag=*"):
        assert len(glob.glob(f"{d}/*.parquet")) <= 2


@pytest.fixture(scope="module")
def zorder_layouts(spark, tmp_path_factory):
    """lineitem sf0.01 written two ways: sorted by one column (the naive
    'sorted table' layout) vs Z-ordered by (l_partkey, l_suppkey)."""
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    base = tmp_path_factory.mktemp("layouts")
    naive, zed = str(base / "naive"), str(base / "zorder")
    # 32 files: range-bound sampling is seeded by the RDD id (varies with
    # session history), so pruning fractions jitter run-to-run; finer
    # files keep the z-prune expectation comfortably above the assertion
    # threshold instead of on its edge (observed 0.43 @16 files once under
    # a loaded session vs 0.56 solo).
    li.repartitionByRange(32, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.parquet(naive)
    zorder_by(li, ["l_partkey", "l_suppkey"], n_files=32).write.parquet(zed)
    return li, naive, zed


def test_zorder_preserves_relation(spark, zorder_layouts):
    li, _naive, zed = zorder_layouts
    assert _checksum(spark.read.parquet(zed)) == _checksum(li)


def test_zorder_prunes_multicolumn_box(spark, zorder_layouts):
    li, naive, zed = zorder_layouts
    hi_p = li.agg(F.max("l_partkey")).first()[0]
    hi_s = li.agg(F.max("l_suppkey")).first()[0]
    # ~10%-wide box on BOTH clustered columns.
    box = {
        "l_partkey": (0.45 * hi_p, 0.55 * hi_p),
        "l_suppkey": (0.45 * hi_s, 0.55 * hi_s),
    }
    naive_prune = file_prune_fraction(naive, box)
    z_prune = file_prune_fraction(zed, box)
    # Ordering by l_orderkey leaves partkey/suppkey uniform per file — no
    # file can be skipped; the Z-layout confines each file to a small
    # hyper-box and skips most of them.
    assert naive_prune <= 0.1
    assert z_prune >= 0.5
    assert z_prune > naive_prune


def test_zorder_single_column_degenerates_to_sort(spark, zorder_layouts):
    li, _naive, _zed = zorder_layouts
    # With one column the Z-value is just the scaled column: ranges align.
    out = zorder_by(li.select("l_partkey"), ["l_partkey"], n_files=4)
    parts = out.withColumn("pid", F.spark_partition_id())
    bounds = (
        parts.groupBy("pid")
        .agg(F.min("l_partkey").alias("lo"), F.max("l_partkey").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for prev, nxt in zip(bounds, bounds[1:]):
        assert prev["hi"] <= nxt["lo"]


def test_dynamic_partition_overwrite_touches_only_changed_days(spark, tmp_path):
    """The restatement must be partition-granular: files under untouched
    day partitions survive byte-identical (same paths), and the restate
    leaves earlier partitions present (static overwrite would drop them)."""
    import os

    from pyspark.sql import functions as F

    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("A", "2024-01-01", 1), ("A", "2024-01-02", 2), ("A", "2024-01-03", 3)],
        "k string, day string, v long",
    ).withColumn("day", F.col("day").cast("date"))
    base.write.partitionBy("day").mode("overwrite").parquet(tgt)

    def files_under(day):
        d = os.path.join(tgt, f"day={day}")
        return sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        ), max(os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d) if f.endswith(".parquet"))

    before_files, before_mtime = files_under("2024-01-01")
    fix = spark.createDataFrame(
        [("A", "2024-01-03", 30)], "k string, day string, v long"
    ).withColumn("day", F.col("day").cast("date"))
    fix.write.partitionBy("day").mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).parquet(tgt)

    after_files, after_mtime = files_under("2024-01-01")
    assert after_files == before_files and after_mtime == before_mtime
    got = {
        (r.k, str(r.day)): r.v for r in spark.read.parquet(tgt).collect()
    }
    assert got == {
        ("A", "2024-01-01"): 1,
        ("A", "2024-01-02"): 2,
        ("A", "2024-01-03"): 30,
    }


def test_bloom_file_skip_reads_fewer_files_and_misses_nothing(spark, sf_dir):
    """The per-file Bloom index must (a) never skip a file containing
    the probed key and (b) actually skip files on a hash-scattered
    layout where min/max zones cannot."""
    import os as _os

    from trafsys_data_transfer_spark.operators.layout import (
        bloom_file_index_build,
        bloom_file_probe,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    path = str(tmp_dir := (__import__("tempfile").mkdtemp(prefix="bfskip_")))
    events.repartition(16, F.col("event_id")).write.mode("overwrite").parquet(
        path
    )
    index, m = bloom_file_index_build(spark, path, "user_id")
    probe_user = 7
    files, total = bloom_file_probe(spark, index, m, "user_id", probe_user)
    assert total == 16
    # (a) completeness: rows from candidate files == rows from full scan
    got = (
        spark.read.schema(events.schema).parquet(*files)
        .filter(F.col("user_id") == probe_user)
        .count()
        if files
        else 0
    )
    want = events.filter(F.col("user_id") == probe_user).count()
    assert got == want and want > 0
    # (b) a key living in ONE file (unique event_id) skips nearly all of
    # the layout (the tiny sf0.001 fixture has so few users that every
    # user hits every file — uniqueness is what exercises skipping here)
    idx2, m2 = bloom_file_index_build(spark, path, "event_id")
    probe_eid = events.agg(F.min("event_id")).first()[0]
    files_r, _ = bloom_file_probe(spark, idx2, m2, "event_id", probe_eid)
    assert 1 <= len(files_r) <= max(2, total // 4), len(files_r)
    got_r = (
        spark.read.schema(events.schema)
        .parquet(*files_r)
        .filter(F.col("event_id") == probe_eid)
        .count()
    )
    assert got_r == 1
    import shutil as _sh

    _sh.rmtree(tmp_dir, ignore_errors=True)


def test_bloom_index_append_equals_rebuild(spark, sf_dir):
    """Appending only the new files' bitsets must give bit-identical index
    CONTENT to rebuilding the whole index at the same m."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from trafsys_data_transfer_spark.operators.layout import (
        bloom_file_index_append,
        bloom_file_index_build,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    tmp = _tf.mkdtemp(prefix="t_bloom_inc_")
    events.filter(F.col("event_id") % 2 == 0).repartition(4).write.mode(
        "overwrite"
    ).parquet(tmp)
    index, m = bloom_file_index_build(spark, tmp, "user_id")
    index = index.localCheckpoint(eager=True)
    before = {n for n in _os.listdir(tmp) if n.endswith(".parquet")}
    events.filter(F.col("event_id") % 2 == 1).repartition(2).write.mode(
        "append"
    ).parquet(tmp)
    new_files = [
        _os.path.join(tmp, n)
        for n in _os.listdir(tmp)
        if n.endswith(".parquet") and n not in before
    ]
    appended = bloom_file_index_append(spark, tmp, "user_id", m, index, new_files)

    # rebuild at the SAME m over the full layout
    df = spark.read.parquet(tmp)
    bucket = F.pmod(F.xxhash64(F.col("user_id")), F.lit(m))
    rebuilt = (
        df.select(F.input_file_name().alias("file"), bucket.alias("b"))
        .groupBy("file", F.expr("b div 64").alias("word_idx"))
        .agg(F.expr("bit_or(shiftleft(1L, CAST(b % 64 AS INT)))").alias("bits"))
    )
    a = {(r.file, r.word_idx, r.bits) for r in appended.collect()}
    b = {(r.file, r.word_idx, r.bits) for r in rebuilt.collect()}
    assert a == b and len(a) > 0
    _sh.rmtree(tmp, ignore_errors=True)


def test_hilbert_locality_at_least_matches_zorder(spark, zorder_layouts, tmp_path_factory):
    """Same data, same file count, same probe box: the Hilbert layout's
    footer-stats pruning must at least match Z-order's (and both beat the
    single-column sort)."""
    from trafsys_data_transfer_spark.operators.layout import hilbert_order_by

    li, naive, zed = zorder_layouts
    hil = str(tmp_path_factory.mktemp("layouts_h") / "hilbert")
    hilbert_order_by(li, ["l_partkey", "l_suppkey"], n_files=32).write.parquet(hil)

    assert _checksum(spark.read.parquet(hil)) == _checksum(li)

    hi_p = li.agg(F.max("l_partkey")).first()[0]
    hi_s = li.agg(F.max("l_suppkey")).first()[0]
    box = {
        "l_partkey": (0.45 * hi_p, 0.55 * hi_p),
        "l_suppkey": (0.45 * hi_s, 0.55 * hi_s),
    }
    h_prune = file_prune_fraction(hil, box)
    z_prune = file_prune_fraction(zed, box)
    # range-bound sampling jitters both layouts a little; allow one file
    # of slack (1/32) below Z while requiring solid absolute pruning
    assert h_prune >= 0.5, (h_prune, z_prune)
    assert h_prune >= z_prune - 1 / 32, (h_prune, z_prune)


def test_hilbert_curve_is_a_bijection_with_unit_steps():
    from trafsys_data_transfer_spark.operators.layout import _hilbert_xy2d

    n = 16
    seen = {}
    for x in range(n):
        for y in range(n):
            seen[_hilbert_xy2d(n, x, y)] = (x, y)
    assert sorted(seen) == list(range(n * n))  # bijective
    # consecutive ranks are adjacent cells — the locality property Z lacks
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = seen[d], seen[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1
