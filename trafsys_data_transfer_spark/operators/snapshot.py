"""Corpus snapshot diff — CDC-style delta classification (§2.10).

A nightly corpus pipeline rarely rebuilds from scratch; it reconciles
today's snapshot against yesterday's and emits a change feed
(added / removed / changed / unchanged per document key).  That feed is
what drives incremental dedup, incremental embedding refresh, and the
MERGE into the serving copy — the corpus-scale analogue of the
reference's watermark-incremental upsert loop
(``/root/reference/script.js:54,195-200``: fetch-delta → last-write-wins
MERGE), generalised from "replay wins" to an explicit delta taxonomy.

Scale (100 TB): the join carries **fingerprints, not documents** — both
snapshots are projected to ``(key, md5)`` before the FULL OUTER join, so
the shuffle is two narrow passes keyed by ``doc_id`` regardless of
document size.  Content comparison is then a codegen'd string equality
on the 32-char digests.  Downstream consumers semi-join the 'changed' /
'added' keys back to the new snapshot to fetch payloads — only the
delta's text ever moves twice.

The fixture query derives both "snapshots" deterministically from the
one ``documents`` table (old = ``doc_id % 7 != 0`` with a reversed-text
mutation on ``doc_id % 5 == 0``; new = ``doc_id % 11 != 0``) so all four
delta classes are non-degenerate and the DuckDB oracle reproduces them
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Classify every key across two snapshots: added / removed / changed /
    unchanged.  Shuffles only ``(key, md5(content))`` projections."""
    o = old.select(F.col(key).alias("_ko"), F.md5(F.col(content_col)).alias("_fpo"))
    n = new.select(F.col(key).alias("_kn"), F.md5(F.col(content_col)).alias("_fpn"))
    return (
        o.join(n, o["_ko"] == n["_kn"], "full_outer")
        .select(
            F.coalesce(F.col("_ko"), F.col("_kn")).alias(key),
            F.when(F.col("_ko").isNull(), F.lit("added"))
            .when(F.col("_kn").isNull(), F.lit("removed"))
            .when(F.col("_fpo") != F.col("_fpn"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("change"),
        )
    )


@register(
    "corpus_snapshot_diff",
    oracle="""
    WITH old AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN reverse(text) ELSE text END AS text
        FROM documents WHERE doc_id % 7 != 0
    ),
    new AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 != 0)
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN md5(o.text) != md5(n.text) THEN 'changed'
                ELSE 'unchanged' END AS change
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    ORDER BY doc_id
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta feed between two deterministic snapshot views of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.reverse(F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    new = docs.filter(F.col("doc_id") % 11 != 0).select("doc_id", "text")
    return snapshot_diff(old, new).orderBy("doc_id")
