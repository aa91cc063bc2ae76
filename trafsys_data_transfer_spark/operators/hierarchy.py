"""Recursive hierarchy rollup — the WITH RECURSIVE gap, Spark-first.

ANSI SQL (and DuckDB, Postgres, Oracle CONNECT BY) walks parent-child
hierarchies with a recursive CTE; Spark has NO recursive CTE, and the
reference's ecosystem (Oracle sink) very much does — so an engine
claiming query parity needs the capability re-expressed.  The Spark
idiom is the iterative DataFrame loop: seed the ancestor-descendant
closure with (node, node), climb one parent level per round
(equi-join on the parent table), and stop at a fixpoint — exactly the
``connected_components`` discipline (lazy ``localCheckpoint`` per round
to truncate lineage, a cheap count probe for termination, a loud error
if the loop hits the iteration cap, which on a DAG means a parent
CYCLE rather than slow convergence).

Scale shape: the closure has one row per (node, ancestor) pair —
O(n × depth), NOT O(n²) — and each round is one key-partitioned
equi-join on the frontier (rows whose climb hasn't terminated), which
SHRINKS as shallow branches finish.  Depth rounds (log-ish in fan-out
for balanced trees) of narrow shuffles; the rollup itself is one
groupBy over the closure.  100 TB posture: facts aggregate to per-node
values FIRST (one shuffle), the closure join runs on the node table
(dimensions, not facts).

The registered query derives a deterministic hierarchy from the fixture
(parent(c) = c // 10 over customer keys — a 10-ary forest rooted at
keys 1..9), rolls order revenue up every subtree, and hash-checks
against DuckDB's real ``WITH RECURSIVE`` — the engine-parity check in
its most literal form.  The OPERATOR itself treats the parent table as
opaque data (no closed-form shortcut): the loop is what's being proven.

The reference engine (/root/reference/script.js) has no hierarchy
operators; this extends the mandated analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table

#: Iteration cap ≙ maximum supported hierarchy depth.  A DAG deeper than
#: this (or a parent CYCLE, which never terminates) fails loudly.
MAX_DEPTH = 32


def ancestor_closure(
    parents: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """Ancestor-descendant closure of a parent-child forest:
    ``(node, anc, depth)`` for every node and every ancestor INCLUDING
    itself (depth 0).  ``parents`` lists each node's direct parent; roots
    either carry a NULL parent or reference a key absent from
    ``child_col`` (both terminate the climb).

    Iterative frontier walk — each round joins the still-climbing
    frontier to the parent table; rows whose parent is null/absent leave
    the frontier.  Equivalent to ANSI ``WITH RECURSIVE`` (the oracle of
    the registered query runs exactly that in DuckDB)."""
    p = parents.select(
        F.col(child_col).alias("c"), F.col(parent_col).alias("p")
    ).filter(F.col("p").isNotNull())
    nodes = parents.select(F.col(child_col).alias("node")).distinct()
    closure = nodes.select(
        "node", F.col("node").alias("anc"), F.lit(0).alias("depth")
    ).localCheckpoint(eager=False)
    # the frontier: (node, current top ancestor); a node leaves when its
    # top ancestor has no parent row
    frontier = nodes.select("node", F.col("node").alias("anc"))
    for depth in range(1, max_depth + 1):
        step = (
            frontier.join(p, frontier.anc == p.c)
            .select("node", F.col("p").alias("anc"))
            .localCheckpoint(eager=False)
        )
        n = step.count()
        if n == 0:
            return closure
        closure = closure.unionByName(
            step.withColumn("depth", F.lit(depth))
        ).localCheckpoint(eager=False)
        frontier = step
    raise RuntimeError(
        f"ancestor_closure exceeded max_depth={max_depth}: the parent "
        "relation is deeper than supported or contains a cycle"
    )


def hierarchy_rollup(
    parents: DataFrame,
    values: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    key_col: str = "key",
    value_col: str = "value",
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """Subtree aggregate per node: for every node, the SUM of ``values``
    over its whole subtree (descendants + self) and the descendant
    count — SQL's recursive-CTE rollup as one closure + one groupBy.

    ``values`` must be pre-aggregated per node key (the 100 TB shape:
    facts reduce to per-node values in one shuffle BEFORE the closure
    join, so the iterative walk only ever touches dimension-sized
    relations)."""
    closure = ancestor_closure(parents, child_col, parent_col, max_depth)
    v = values.select(
        F.col(key_col).alias("node"), F.col(value_col).alias("v")
    )
    return (
        closure.join(v, "node", "left")
        .groupBy(F.col("anc").alias(child_col))
        .agg(
            F.count(F.lit(1)).alias("n_subtree"),
            F.sum(F.coalesce(F.col("v"), F.lit(0))).alias("subtree_value"),
        )
    )


@register(
    "customer_hierarchy_rollup",
    # DuckDB runs the REAL recursive CTE the Spark loop re-expresses —
    # the most literal engine-parity check in the registry.
    oracle="""
    WITH RECURSIVE cust AS (
        SELECT c_custkey AS c,
               CASE WHEN c_custkey // 10 >= 1 THEN c_custkey // 10 END
                   AS parent
        FROM customer
    ),
    anc AS (
        SELECT c AS node, c AS anc FROM cust
        UNION ALL
        SELECT a.node, c.parent
        FROM anc a JOIN cust c ON a.anc = c.c
        WHERE c.parent IS NOT NULL
    ),
    rev AS (
        SELECT o_custkey AS c,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    )
    SELECT a.anc AS c_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_subtree,
           CAST(SUM(COALESCE(rev.cents, 0)) AS BIGINT) AS subtree_cents
    FROM anc a LEFT JOIN rev ON rev.c = a.node
    GROUP BY a.anc
    ORDER BY c_custkey
    """,
)
def customer_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy rollup over a deterministic 10-ary customer
    forest (parent(c) = c // 10, roots at keys 1-9): every customer's
    subtree revenue (order totals in cents) and subtree size, computed by
    the iterative closure loop and hash-checked against DuckDB's genuine
    ``WITH RECURSIVE`` — Spark's missing recursive CTE, re-expressed and
    verified against an engine that has one."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("child"),
        F.when(
            (F.col("c_custkey") / 10).cast("long") >= 1,
            (F.col("c_custkey") / 10).cast("long"),
        ).alias("parent"),
    )
    rev = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("key"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("key")
        .agg(F.sum("cents").alias("value"))
    )
    return (
        hierarchy_rollup(cust, rev)
        .select(
            F.col("child").alias("c_custkey"),
            "n_subtree",
            F.col("subtree_value").alias("subtree_cents"),
        )
        .orderBy("c_custkey")
    )
