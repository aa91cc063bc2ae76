"""Bucketed tables — shuffle-free co-located joins.

A repeated big-big equi-join (fact ⋈ fact on the same key, every night)
should not pay the shuffle every run: write both sides bucketed by the join
key once, and every subsequent join reads co-located buckets directly —
Catalyst sees `bucketSpec` on both scans and plans a SortMergeJoin with
**no Exchange** on either side.

This is the batch analogue of the reference's "push work to where the data
lives" instinct (its API-side filters, script.js:143-149), applied to the
join: at 100 TB the lineitem ⋈ orders shuffle is the single largest network
cost in the nightly pipeline, and bucketing amortises it to zero.

Bucketed writes go through ``saveAsTable`` (bucket metadata lives in the
session catalog — plain ``.parquet(path)`` cannot record it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key.
    Sorting within buckets lets the later SortMergeJoin skip its sort too —
    scan → zip-merge, nothing else."""
    cols = list(bucket_cols)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, cols[0], *cols[1:]
    )
    if sort_cols:
        sc = list(sort_cols)
        writer = writer.sortBy(sc[0], *sc[1:])
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
