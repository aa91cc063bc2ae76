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


# ---------------------------------------------------------------------------
# order-insensitive table fingerprint (anti-entropy checksum)
# ---------------------------------------------------------------------------

#: Hex-digit alphabet shared with sampling.py's portable hash arithmetic.
_HEX_ALPHABET = "0123456789abcdef"


def table_fingerprint(df: DataFrame, cols: list[str]) -> DataFrame:
    """ONE-row order-insensitive checksum of a relation: per-row 24-bit
    digest from md5 over the '|'-joined columns, SUMMED (sum is
    commutative, so partitioning/ordering never changes the answer) plus
    the row count.

    This is the anti-entropy primitive for 100 TB replication: comparing
    two replicas (or a table before/after a migration, or engine A vs
    engine B) costs one narrow scan + an O(1) exchange per side, instead
    of shipping rows.  A mismatched fingerprint localises by re-running
    grouped by a partition column (same expression + one groupBy).  The
    digest is md5-based so the checksum is engine-portable — the oracle
    recomputes it in DuckDB, which is itself the operator's own use-case
    (cross-engine consistency) exercised as the correctness gate.

    Collision posture: 24 digest bits per row, summed over n rows —
    detection of a single changed row fails only if another change
    collides exactly (≈2⁻²⁴ per differing row, independent rows); widen
    to two summed lanes (chars 1-6 and 7-12) when auditing at higher
    assurance, same plan shape.
    """
    digest = F.expr(
        "CAST(conv(substring(md5(concat_ws('|', "
        + ", ".join(f"CAST({c} AS STRING)" for c in cols)
        + ")), 1, 6), 16, 10) AS BIGINT)"
    )
    return df.select(digest.alias("d")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("d").alias("fingerprint"),
    )


@register(
    "orders_table_fingerprint",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(
               (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576
             + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536
             + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096
             + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 256
             + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1)
           ) AS BIGINT) AS fingerprint
    FROM (
        SELECT md5(concat_ws('|',
                   CAST(o_orderkey AS VARCHAR),
                   CAST(o_custkey AS VARCHAR),
                   CAST(o_orderstatus AS VARCHAR))) AS h
        FROM orders
    )
    """,
)
def orders_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy checksum of the orders key columns — the value two
    engines computing independently must agree on, which the oracle gate
    checks by construction."""
    return table_fingerprint(
        load_table(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus"],
    )


#: Shared 24-bit row digest in DuckDB SQL (hex chars 1-6 of md5 → int),
#: the oracle-side twin of table_fingerprint's conv() expression.
_ORACLE_DIGEST = """
      (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576
    + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536
    + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096
    + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 256
    + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16
    + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1)
"""


def fingerprint_by_group(
    df: DataFrame, cols: list[str], group_expr, group_alias: str
) -> DataFrame:
    """Per-group anti-entropy checksums: the Merkle level below
    :func:`table_fingerprint`.  One narrow scan + one groupBy on the
    grouping expression; O(groups) output regardless of row count."""
    digest = F.expr(
        "CAST(conv(substring(md5(concat_ws('|', "
        + ", ".join(f"CAST({c} AS STRING)" for c in cols)
        + ")), 1, 6), 16, 10) AS BIGINT)"
    )
    return df.select(group_expr.alias(group_alias), digest.alias("d")).groupBy(
        group_alias
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("d").alias("fingerprint"),
    )


@register(
    "orders_fingerprint_diff_locate",
    # Replica B corrupts o_orderstatus on every 997th order key; the
    # month-level fingerprint join must flag EXACTLY the months holding
    # a corrupted order — O(partitions) comparison, no row shipping.
    oracle="""
    WITH replica AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 997 = 0 THEN 'X' ELSE o_orderstatus END
                   AS o_orderstatus,
               o_orderdate
        FROM orders
    ),
    fp_a AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
               CAST(COUNT(*) AS BIGINT) AS n_rows_a,
               CAST(SUM(""" + _ORACLE_DIGEST + """) AS BIGINT) AS fp_a
        FROM (
            SELECT o_orderdate,
                   md5(concat_ws('|', CAST(o_orderkey AS VARCHAR),
                       CAST(o_custkey AS VARCHAR),
                       CAST(o_orderstatus AS VARCHAR))) AS h
            FROM orders
        ) GROUP BY 1
    ),
    fp_b AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
               CAST(COUNT(*) AS BIGINT) AS n_rows_b,
               CAST(SUM(""" + _ORACLE_DIGEST + """) AS BIGINT) AS fp_b
        FROM (
            SELECT o_orderdate,
                   md5(concat_ws('|', CAST(o_orderkey AS VARCHAR),
                       CAST(o_custkey AS VARCHAR),
                       CAST(o_orderstatus AS VARCHAR))) AS h
            FROM replica
        ) GROUP BY 1
    )
    SELECT a.mon AS mon, a.n_rows_a, b.n_rows_b, a.fp_a, b.fp_b
    FROM fp_a a JOIN fp_b b ON a.mon = b.mon
    WHERE a.fp_a <> b.fp_b OR a.n_rows_a <> b.n_rows_b
    ORDER BY mon
    """,
)
def orders_fingerprint_diff_locate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style divergence LOCALIZATION: when two replicas' table
    fingerprints disagree, re-fingerprint each side grouped by a
    partition column and join — the differing groups are the partitions
    to repair.  Here replica B carries a deterministic corruption
    (status flipped on every 997th order key); the month-grained
    comparison flags exactly the months containing one, at O(months)
    comparison cost.

    At 100 TB this is the anti-entropy repair loop: level 0 is ONE
    number per replica (table_fingerprint), level 1 is this query
    (O(partitions) rows), and repair re-ships only flagged partitions —
    the Merkle/DynamoDB recipe expressed as two groupBys and a join,
    never a row-level diff."""
    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
    orders = load_table(spark, sf_dir, "orders").select(*cols, "o_orderdate")
    replica = orders.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 997 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    mon = F.trunc(F.col("o_orderdate"), "month")
    a = (
        fingerprint_by_group(orders, cols, mon, "mon")
        .withColumnRenamed("n_rows", "n_rows_a")
        .withColumnRenamed("fingerprint", "fp_a")
    )
    b = (
        fingerprint_by_group(replica, cols, mon, "mon")
        .withColumnRenamed("n_rows", "n_rows_b")
        .withColumnRenamed("fingerprint", "fp_b")
    )
    return (
        a.join(b, "mon")
        .filter(
            (F.col("fp_a") != F.col("fp_b"))
            | (F.col("n_rows_a") != F.col("n_rows_b"))
        )
        .select("mon", "n_rows_a", "n_rows_b", "fp_a", "fp_b")
        .orderBy("mon")
    )


def antientropy_repair(
    truth: DataFrame,
    replica: DataFrame,
    cols: list[str],
    group_expr,
    group_alias: str = "grp",
) -> DataFrame:
    """Level 2 of the Merkle repair loop: fingerprint both sides by
    partition (level 1), then rebuild the replica by keeping its clean
    partitions untouched and re-shipping ONLY the flagged partitions
    from the source of truth.

    The flagged-partition set is O(partitions) and broadcast to both
    legs, so the repair plan is: one anti semi-join keeping replica rows
    in clean partitions + one semi-join pulling truth rows in flagged
    partitions — on a partitioned layout both legs are partition-pruned
    scans, and the bytes re-shipped are proportional to the DIVERGENT
    data, never the table.  Count mismatches (rows missing from or
    duplicated in the replica) flag the partition the same way a content
    mismatch does, so deletion/duplication repair rides the same path."""
    t = fingerprint_by_group(truth, cols, group_expr, group_alias)
    r = fingerprint_by_group(replica, cols, group_expr, group_alias)
    flagged = (
        t.withColumnRenamed("n_rows", "_na").withColumnRenamed("fingerprint", "_fa")
        .join(
            r.withColumnRenamed("n_rows", "_nb").withColumnRenamed(
                "fingerprint", "_fb"
            ),
            group_alias,
            "full_outer",
        )
        .filter(
            (F.col("_fa") != F.col("_fb"))
            | (F.col("_na") != F.col("_nb"))
            | F.col("_fa").isNull()
            | F.col("_fb").isNull()
        )
        .select(group_alias)
    )
    clean = replica.withColumn(group_alias, group_expr).join(
        F.broadcast(flagged), group_alias, "left_anti"
    )
    reshipped = truth.withColumn(group_alias, group_expr).join(
        F.broadcast(flagged), group_alias, "left_semi"
    )
    return clean.unionByName(reshipped).drop(group_alias)


@register(
    "orders_fingerprint_repair",
    # The repaired replica must equal the source of truth exactly.
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate
    FROM orders ORDER BY o_orderkey
    """,
)
def orders_fingerprint_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full anti-entropy loop closed: replica B diverges from orders
    three ways — a corrupted status on every 997th key, every 1009th
    order DELETED, and one order duplicated — and
    :func:`antientropy_repair` must return a table that hash-matches the
    source of truth, having re-read only the flagged months.  Extends
    ``orders_fingerprint_diff_locate`` (localization) with the repair
    step the localization exists for."""
    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
    orders = load_table(spark, sf_dir, "orders").select(*cols, "o_orderdate")
    dup = orders.filter(F.col("o_orderkey") == 7)
    replica = (
        orders.filter(F.col("o_orderkey") % 1009 != 0)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 997 == 0, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .unionByName(dup)
    )
    repaired = antientropy_repair(
        orders, replica, cols, F.trunc(F.col("o_orderdate"), "month"), "mon"
    )
    # (trailing global sort dropped r11: order-insensitive driver compare.)
    return repaired
