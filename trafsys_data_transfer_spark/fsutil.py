"""Filesystem operations through Hadoop's ``FileSystem`` abstraction.

The MERGE and compaction sinks need exists-probe / atomic-swap / delete
primitives.  ``os.path`` / ``shutil`` only see the driver's local disk:
against an ``s3a://`` or ``hdfs://`` table the existence probe returns
False and the sink's CREATE branch silently overwrites the whole table
with one batch — total data loss dressed up as a successful run.

Going through ``Path.getFileSystem(hadoopConf)`` routes every operation
to whatever filesystem the URI names (local, HDFS, S3A, ABFS, ...), the
exact same resolution Spark's own readers and writers use, so the sinks
work wherever the table does.  The reference never faced this problem —
it writes to Oracle (/root/reference/script.js:184-214); our parquet
sinks own their storage and must not assume it is POSIX.

Rename-based swaps remain single-writer (SURVEY.md §7.4) and are atomic
on HDFS/local; on S3A a rename is a copy+delete, which is still correct
under the single-writer assumption, just not instantaneous — the
documented upgrade path for multi-writer object storage is a Delta /
Iceberg commit protocol, not more rename choreography.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path_str: str):
    """Resolve ``path_str`` to its (FileSystem, Path) pair via the session's
    Hadoop configuration — scheme-aware: file:, hdfs:, s3a:, bare paths."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def path_exists(spark: SparkSession, path_str: str) -> bool:
    fs, path = _fs_path(spark, path_str)
    return bool(fs.exists(path))


def delete_path(spark: SparkSession, path_str: str) -> bool:
    """Recursive delete; True if anything was removed."""
    fs, path = _fs_path(spark, path_str)
    return bool(fs.delete(path, True))


def rename_path(spark: SparkSession, src: str, dst: str) -> None:
    fs, src_p = _fs_path(spark, src)
    _, dst_p = _fs_path(spark, dst)
    if not fs.rename(src_p, dst_p):
        raise IOError(f"rename failed: {src} -> {dst}")


def swap_directories(
    spark: SparkSession, new_path: str, target_path: str, backup_path: str
) -> None:
    """Replace ``target_path`` with ``new_path`` via rename-out / rename-in,
    deleting the displaced directory.  If the second rename fails the
    original data still exists at ``backup_path`` — nothing is deleted
    until the new directory is in place."""
    rename_path(spark, target_path, backup_path)
    try:
        rename_path(spark, new_path, target_path)
    except Exception:
        # Roll the original back so the table is never left missing.
        rename_path(spark, backup_path, target_path)
        raise
    delete_path(spark, backup_path)


def list_data_files(spark: SparkSession, path_str: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file under ``path_str``, recursively,
    skipping hidden/metadata entries (``_SUCCESS``, ``.crc``, ...)."""
    fs, path = _fs_path(spark, path_str)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(path, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        out.append((status.getPath().toString(), int(status.getLen())))
    return out


def dir_data_bytes(spark: SparkSession, path_str: str) -> int:
    """Total bytes of data files under ``path_str`` (metadata excluded)."""
    return sum(size for _, size in list_data_files(spark, path_str))


_PROCESS_STAGING_BASE: str | None = None


def process_staging_dir(*parts: str) -> str:
    """A staging path unique to THIS process: ``mkdtemp`` base (0700,
    unguessable — concurrent sessions on the same fixture can't race each
    other's overwrites, and a well-known /tmp name can't be squatted;
    ADVICE r05 #3), created once per process and removed at exit so
    repeated invocations inside one bench/verify run reuse a single
    directory instead of leaking tmpdirs.  ``parts`` subdivide the base
    (e.g. ``("bm25", "sf0.01")``)."""
    global _PROCESS_STAGING_BASE
    import atexit
    import os
    import shutil
    import tempfile

    if _PROCESS_STAGING_BASE is None:
        _PROCESS_STAGING_BASE = tempfile.mkdtemp(prefix="tds_stage_")
        atexit.register(
            shutil.rmtree, _PROCESS_STAGING_BASE, ignore_errors=True
        )
    return os.path.join(_PROCESS_STAGING_BASE, *parts)
