"""Market-basket analysis and co-purchase graph statistics.

The co-purchase pair grain (parts appearing in the same order) drives two
classic analytics the relational/graph families don't cover yet:

* **Association rules** — support / confidence / lift per directed rule
  ``antecedent → consequent`` over pairs meeting a minimum support.  All
  three metrics are exact integer ppm (floor division), so the output
  hash-checks across engines.
* **Triangle census** — triangle count, wedge count and the global
  clustering coefficient of the support-filtered co-purchase graph, via
  the DEGREE-ORDERED orientation: each undirected edge points from its
  lower-(degree, id) endpoint to the higher one, so every triangle is
  counted exactly once and the wedge fan-out from any vertex is bounded
  by its out-degree — O(m^{3/2}) work on any graph (arboricity bound),
  where id-ordering alone can degenerate on skewed degree distributions
  (one hub with a million low-id neighbours builds a million-wide wedge
  set; degree-ordering caps it).

Scale notes (100 TB posture):
* Pair generation self-joins lineitem on ``l_orderkey`` — one key
  shuffle whose fan-out is quadratic in BASKET size (bounded: ≤13 items
  per order in the fixture, bounded small in any real basket model),
  never in table size.
* The support filter (``n_ab ≥ MINSUP``) prunes the pair table before
  any graph work; rule metrics join per-part order counts on the pair
  grain (broadcastable dimension at fixture scale; a plain key shuffle
  at 100 TB — both sides are already aggregates).
* Triangle counting joins the oriented edge list with itself twice on
  vertex keys — sort-merge joins on a support-pruned edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table

#: A pair must co-occur in at least this many orders to be reported.
MINSUP_ORDERS = 2

_PAIR_SQL = """
    SELECT DISTINCT a.l_orderkey AS okey,
                    a.l_partkey AS p1, b.l_partkey AS p2
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (order, part-pair) co-occurrences, p1 < p2."""
    from ..session import spread

    # r11: one okey-keyed spread feeds BOTH self-join sides — the alias-
    # aware projections preserve the partitioning, so the join adds no
    # further exchange and the two former single-partition scans collapse
    # into one reused shuffle (guide §2.4).
    li = spread(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        ),
        "l_orderkey",
    )
    a = li.toDF("okey", "p1")
    b = li.toDF("okey", "p2")
    return (
        a.join(b, "okey")
        .filter(F.col("p1") < F.col("p2"))
        .distinct()
    )


@register(
    "basket_association_rules",
    oracle=f"""
    WITH pair_occ AS ({_PAIR_SQL}),
    pair_n AS (
        SELECT p1, p2, COUNT(*) AS n_ab FROM pair_occ GROUP BY 1, 2
        HAVING COUNT(*) >= {MINSUP_ORDERS}
    ),
    part_n AS (
        SELECT l_partkey AS p, COUNT(DISTINCT l_orderkey) AS n_p
        FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    directed AS (
        SELECT p1 AS antecedent, p2 AS consequent, n_ab FROM pair_n
        UNION ALL
        SELECT p2, p1, n_ab FROM pair_n
    )
    SELECT d.antecedent, d.consequent,
           CAST(d.n_ab AS BIGINT) AS n_ab,
           CAST(d.n_ab * 1000000 // t.n_orders AS BIGINT) AS support_ppm,
           CAST(d.n_ab * 1000000 // na.n_p AS BIGINT) AS confidence_ppm,
           CAST(d.n_ab * t.n_orders * 1000000 // (na.n_p * nc.n_p) AS BIGINT)
               AS lift_ppm
    FROM directed d
    JOIN part_n na ON na.p = d.antecedent
    JOIN part_n nc ON nc.p = d.consequent
    CROSS JOIN tot t
    ORDER BY antecedent, consequent
    """,
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules over co-purchased part pairs with
    support ≥ MINSUP orders: exact ppm support, confidence
    (``n_ab / n_antecedent``) and lift
    (``n_ab · N / (n_a · n_b)``) — lift > 1e6 ppm means the pair
    co-occurs more than independence predicts.
    """
    # Referenced by BOTH union branches of the directed-rule expansion:
    # checkpoint lazily so the basket self-join runs once.
    pair_n = (
        _pairs(spark, sf_dir)
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= MINSUP_ORDERS)
        .localCheckpoint(eager=False)
    )
    li = load_table(spark, sf_dir, "lineitem")
    part_n = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.countDistinct("l_orderkey").alias("n_p")
    )
    tot = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    directed = pair_n.select(
        F.col("p1").alias("antecedent"), F.col("p2").alias("consequent"), "n_ab"
    ).unionAll(
        pair_n.select(
            F.col("p2").alias("antecedent"),
            F.col("p1").alias("consequent"),
            "n_ab",
        )
    )
    return (
        directed.join(
            part_n.toDF("antecedent", "n_a"), "antecedent"
        )
        .join(part_n.toDF("consequent", "n_c"), "consequent")
        .join(F.broadcast(tot))
        .select(
            "antecedent",
            "consequent",
            "n_ab",
            F.expr("n_ab * 1000000 div n_orders").alias("support_ppm"),
            F.expr("n_ab * 1000000 div n_a").alias("confidence_ppm"),
            F.expr("n_ab * n_orders * 1000000 div (n_a * n_c)").alias(
                "lift_ppm"
            ),
        )
        .orderBy("antecedent", "consequent")
    )


@register(
    "graph_triangle_census",
    oracle=f"""
    WITH pair_occ AS ({_PAIR_SQL}),
    edges AS (
        SELECT p1 AS u, p2 AS v FROM pair_occ GROUP BY 1, 2
        HAVING COUNT(*) >= {MINSUP_ORDERS}
    ),
    deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
        ) GROUP BY 1
    ),
    oriented AS (
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS t
        FROM edges e
        JOIN deg du ON du.node = e.u
        JOIN deg dv ON dv.node = e.v
    ),
    closing AS (
        SELECT LEAST(s, t) AS c1, GREATEST(s, t) AS c2 FROM oriented
    ),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM oriented e1
        JOIN oriented e2 ON e2.s = e1.s AND e2.t > e1.t
        JOIN closing e3 ON e3.c1 = LEAST(e1.t, e2.t)
                       AND e3.c2 = GREATEST(e1.t, e2.t)
    ),
    wedges AS (
        SELECT SUM(d * (d - 1) // 2) AS n_wedges FROM deg
    )
    SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST(t.n_triangles AS BIGINT) AS n_triangles,
           CAST(w.n_wedges AS BIGINT) AS n_wedges,
           CAST(CASE WHEN w.n_wedges > 0
                     THEN 3 * t.n_triangles * 1000000 // w.n_wedges
                     ELSE 0 END AS BIGINT) AS clustering_ppm
    FROM tri t, wedges w
    """,
)
def graph_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the support-filtered co-purchase graph: edge /
    node / triangle / wedge counts and the global clustering coefficient
    (``3·triangles / wedges``) in exact ppm.

    Degree-ordered orientation: every edge points from its lower
    (degree, id) endpoint, so each triangle has exactly one vertex with
    two out-edges — count wedges (s→t1, s→t2) and close them against the
    oriented edge between t1 and t2 (either direction, since (deg, id)
    ordering of t1/t2 is unknown at wedge time).
    """
    # The support-pruned edge list feeds degree, orientation, wedge AND
    # closing subtrees — lazily localCheckpoint it (the graph.py pattern)
    # so the basket self-join runs once, not once per reference.
    edges = (
        _pairs(spark, sf_dir)
        .groupBy(F.col("p1").alias("u"), F.col("p2").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MINSUP_ORDERS)
        .select("u", "v")
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select("v"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    oriented = (
        edges.join(deg.toDF("u", "du"), "u")
        .join(deg.toDF("v", "dv"), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
        .localCheckpoint(eager=False)
    )
    e1 = oriented.toDF("s", "t1")
    e2 = oriented.toDF("s", "t2")
    # wedge endpoints canonicalised to id-order so the close is ONE
    # equi-join (an OR of orientations would plan a nested-loop join).
    wedge = (
        e1.join(e2, "s")
        .filter(F.col("t2") > F.col("t1"))
        .select(F.col("t1").alias("c1"), F.col("t2").alias("c2"))
    )
    closing = oriented.select(
        F.least("s", "t").alias("c1"), F.greatest("s", "t").alias("c2")
    )
    tri_df = wedge.join(closing, ["c1", "c2"])
    n_tri = tri_df.agg(F.count(F.lit(1)).alias("n_triangles"))
    n_wedge = deg.agg(F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        n_edges.join(F.broadcast(n_nodes))
        .join(F.broadcast(n_tri))
        .join(F.broadcast(n_wedge))
        .select(
            "n_edges",
            "n_nodes",
            "n_triangles",
            "n_wedges",
            F.expr(
                "CASE WHEN n_wedges > 0"
                "     THEN 3 * n_triangles * 1000000 div n_wedges"
                "     ELSE CAST(0 AS BIGINT) END"
            ).alias("clustering_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# k-core decomposition (bounded-round peeling)
# ---------------------------------------------------------------------------

KCORE_K = 3
#: Peeling rounds.  Each round deletes every node of degree < k, which can
#: only lower other nodes' degrees — the fixpoint is reached when a round
#: deletes nothing.  tests assert the fixture converges strictly inside
#: this budget (round R-1 == round R), so the bounded unrolling IS the
#: exact k-core here; production wraps the same round body in a loop with
#: a convergence check (the connected-components localCheckpoint pattern).
KCORE_ROUNDS = 12


def _kcore_oracle(k: int, rounds: int) -> str:
    """Generate the peeling rounds as chained CTEs (DuckDB's recursive CTE
    forbids the per-round degree aggregate, so the bounded unrolling is
    the portable form)."""
    parts = [
        f"""
    WITH pair_occ AS ({_PAIR_SQL}),
    e0 AS MATERIALIZED (
        SELECT p1 AS u, p2 AS v FROM pair_occ GROUP BY 1, 2
        HAVING COUNT(*) >= {MINSUP_ORDERS}
    )"""
    ]
    prev = "e0"
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    d{i} AS MATERIALIZED (
        SELECT node FROM (
            SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev}
        ) GROUP BY node HAVING COUNT(*) >= {k}
    ),
    e{i} AS MATERIALIZED (
        SELECT e.u, e.v FROM {prev} e
        JOIN d{i} a ON a.node = e.u
        JOIN d{i} b ON b.node = e.v
    )"""
        )
        prev = f"e{i}"
    parts.append(
        f"""
    SELECT node, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM (SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev})
    GROUP BY node
    ORDER BY node
    """
    )
    return "".join(parts)


@register("graph_kcore_members", oracle=_kcore_oracle(KCORE_K, KCORE_ROUNDS))
def graph_kcore_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Members of the {k}-core of the support-filtered co-purchase graph
    (the maximal subgraph where every node keeps ≥ k neighbours), with
    each member's within-core degree — the standard cohesion filter before
    community detection or embedding training.

    Peeling is inherently iterative (deleting a node lowers neighbour
    degrees); each round is one degree aggregate + two semi-joins on the
    surviving edge set, lineage cut per round with ``localCheckpoint``
    (the connected-components pattern) so the plan stays round-sized.
    Early-converged rounds are no-ops, keeping the bounded unrolling
    exactly equal to the fixpoint (convergence asserted in tests).
    """
    edges = (
        _pairs(spark, sf_dir)
        .groupBy(F.col("p1").alias("u"), F.col("p2").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MINSUP_ORDERS)
        .select("u", "v")
        .localCheckpoint(eager=False)
    )
    e = edges
    # r11 (guide §1.2): peeling only DELETES edges, so an unchanged edge
    # count proves the round was a no-op and the fixpoint is reached —
    # every later round is identical.  The count doubles as the lazy
    # checkpoint's materialisation action (no extra pass), and early exit
    # skips the dead rounds' shuffles + plan-to-RDD conversions, which at
    # scale are full passes over the surviving edge set.  Result is
    # bit-identical: the bounded unrolling equals the fixpoint either way
    # (the oracle's no-op tail rounds reproduce the same set).
    prev_n = e.count()
    for _ in range(KCORE_ROUNDS):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select("v"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= KCORE_K)
            .select("node")
        )
        e = (
            e.join(deg.withColumnRenamed("node", "u"), "u")
            .join(deg.withColumnRenamed("node", "v"), "v")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        n = e.count()
        if n == prev_n:
            break
        prev_n = n
    return (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select("v"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# item-item collaborative filtering (co-occurrence cosine)
# ---------------------------------------------------------------------------

CF_TOP_N = 5


@register(
    "basket_item_similarity",
    oracle=f"""
    WITH pair_occ AS ({_PAIR_SQL}),
    pair_n AS (
        SELECT p1, p2, COUNT(*) AS n_ab FROM pair_occ GROUP BY 1, 2
        HAVING COUNT(*) >= {MINSUP_ORDERS}
    ),
    part_n AS (
        SELECT l_partkey AS p, COUNT(DISTINCT l_orderkey) AS n_p
        FROM lineitem GROUP BY 1
    ),
    directed AS (
        SELECT p1 AS item, p2 AS other, n_ab FROM pair_n
        UNION ALL
        SELECT p2, p1, n_ab FROM pair_n
    ),
    scored AS (
        SELECT d.item, d.other, CAST(d.n_ab AS BIGINT) AS n_ab,
               CAST(d.n_ab * d.n_ab * 1000000 // (na.n_p * nb.n_p) AS BIGINT)
                   AS cos2_ppm
        FROM directed d
        JOIN part_n na ON na.p = d.item
        JOIN part_n nb ON nb.p = d.other
    ),
    ranked AS (
        SELECT item, other, n_ab, cos2_ppm,
               ROW_NUMBER() OVER (PARTITION BY item
                                  ORDER BY cos2_ppm DESC, other) AS rnk
        FROM scored
    )
    SELECT item, CAST(rnk AS BIGINT) AS rnk, other, n_ab, cos2_ppm
    FROM ranked WHERE rnk <= {CF_TOP_N}
    ORDER BY item, rnk
    """,
)
def basket_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: top-5 most-similar parts per
    part by co-occurrence cosine — ranked via the EXACT rational
    ``cos² = n_ab² / (n_a·n_b)`` in integer ppm (cosine itself needs a
    sqrt; squaring is rank-equivalent and hashes), ties broken by item
    id.  The "customers who bought X also bought" primitive.

    Scale: reuses the support-filtered pair aggregate (basket-bounded
    self-join); per-item ranking is a WindowGroupLimit over the pair
    table — no new corpus pass.
    """
    pair_n = (
        _pairs(spark, sf_dir)
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= MINSUP_ORDERS)
        .localCheckpoint(eager=False)
    )
    li = load_table(spark, sf_dir, "lineitem")
    part_n = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.countDistinct("l_orderkey").alias("n_p")
    )
    directed = pair_n.select(
        F.col("p1").alias("item"), F.col("p2").alias("other"), "n_ab"
    ).unionAll(
        pair_n.select(
            F.col("p2").alias("item"), F.col("p1").alias("other"), "n_ab"
        )
    )
    scored = (
        directed.join(part_n.toDF("item", "n_a"), "item")
        .join(part_n.toDF("other", "n_b"), "other")
        .select(
            "item",
            "other",
            "n_ab",
            F.expr("n_ab * n_ab * 1000000 div (n_a * n_b)").alias(
                "cos2_ppm"
            ),
        )
    )
    w = Window.partitionBy("item").orderBy(F.col("cos2_ppm").desc(), "other")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= CF_TOP_N)
        .select("item", "rnk", "other", "n_ab", "cos2_ppm")
        .orderBy("item", "rnk")
    )
