"""Connected components — dedup-cluster resolution over candidate pairs.

Pair-producing dedup operators (MinHash LSH, SimHash, exact Jaccard) emit
*edges*; an actual dedup pipeline must then collapse transitively-connected
documents into one cluster and elect a canonical keeper (A~B and B~C must
put A and C in the same cluster even when A~C was never emitted as a pair).
That closure is connected components.

Spark-first realisation: **alternating large-star / small-star
contraction** (the MapReduce-era scheme; see the
:func:`connected_components` docstring for the per-round algebra and why
it replaced the earlier min-label + pointer-jumping loop in round 7).
Each round rewrites the edge set so every node points closer to its
component's minimum id — large-star hangs every neighbor larger than the
node off the node's current minimum, small-star contracts the rest —
and terminates when the edge set reaches a fixed point (an edge-set
stability probe, not a changed-label count).  O(log² n) rounds proven,
single-digit in practice, and crucially O(log n)-ish even on long
adversarially-ordered match chains where min-label propagation degrades
to O(diameter).  Each round is equi-joins plus a groupBy-min, all
key-partitioned; ``localCheckpoint`` truncates the plan between rounds so
the DAG doesn't grow with iterations (on a cluster use ``checkpoint`` to
HDFS/S3 for fault tolerance instead).

Scale shape: the edge set is LSH *candidate pairs* — orders of magnitude
smaller than the corpus (near-dup density × n, not n²), so cost is
O(E · rounds) with dup-cluster diameters that are almost always ≤ 2 hops
in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve connected components: returns ``(id, component)`` where
    ``component`` is the minimum node id reachable from ``id``.

    ``nodes`` must contain every vertex (singletons included — isolated
    documents are their own cluster); ``edges`` may be directed, sparse,
    and unsorted — it is symmetrized here.

    Algorithm: alternating LARGE-STAR / SMALL-STAR contraction (the
    MapReduce-era star-contraction scheme — O(log² n) rounds proven,
    single-digit rounds in practice).  Chosen over min-label
    propagation + pointer jumping after a round-7 profile showed the
    min-label frontier advancing O(1) hops per round on long
    sorted-neighborhood match chains (pointer jumps only shortcut paths
    the min has already traversed, so adversarial id orderings degrade
    to O(diameter) rounds — >100 on the sf0.1 ER graph, where
    star-contraction converges in 6).

    Per round (all joins on shrinking relations; no broadcast of
    node-scale tables — the star maps are hash-joined and AQE splits
    skew):
    * large-star: every node's neighbors ABOVE it re-attach to its
      current minimum — long chains fold in half;
    * small-star: every node and its neighbors BELOW it re-attach to
      the local minimum — stars flatten onto their roots.
    Fixpoint (edge set stable) leaves each component as a star rooted
    at its minimum id; labels read off as min(u, neighbors)."""
    e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    e = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _sym(pairs: DataFrame) -> DataFrame:
        p = pairs.filter(F.col("a") != F.col("b"))
        return (
            p.union(p.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .select(F.col("a").alias("u"), F.col("b").alias("v"))
            .distinct()
        )

    converged = False
    prev_sig = None
    for _ in range(max_iter):
        # large-star: m(u) = min(u, min neighbor); (v, m) for v > u
        m = e.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least("u", "mv").alias("m")
        )
        big = (
            e.filter(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        # lazy checkpoint (r8): eager=True cost one materialization JOB
        # per tier per round; eager=False folds the materialization into
        # the round's signature action — same lineage truncation, ~2
        # fewer job barriers per round (measured 11.3 -> 10.0 s on
        # er_golden_record at sf0.1, same-host best-of-2).  (r11 note: an
        # attempt to drop this checkpoint entirely and let e1's subtree
        # ride e2's lineage measured consistently ~1.2-1.4× WORSE on
        # er_golden_record in a paired A/B — the duplicated large-star
        # join does not fully dedupe via ReuseExchange — so the
        # per-tier checkpoint stays.)
        # r12 (guide §2.3, interleaved A/B 7.45 → 6.62 s best-of-3 on
        # er_golden_record, outputs bit-identical): big is already
        # CANONICAL — b = least(u, min neighbor) ≤ u < v = a for every
        # emitted pair — and the small-star step consumes only the
        # v < u direction, so the former _sym(big) symmetrized 2×|big|
        # rows through the distinct exchange only for the filter on the
        # next line to discard half of them.  Dedup the canonical
        # direction alone: same `down` relation, half the shuffle.
        e1 = (
            big.filter(F.col("a") != F.col("b"))
            .select(F.col("a").alias("u"), F.col("b").alias("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # small-star: m over the DOWN-neighborhood; (v, m) and (u, m)
        down = e1
        m2 = down.groupBy("u").agg(F.min("v").alias("m"))
        small = down.join(m2, "u").select(
            F.col("v").alias("a"), F.col("m").alias("b")
        ).union(m2.select(F.col("u").alias("a"), F.col("m").alias("b")))
        e2 = _sym(small).localCheckpoint(eager=False)
        # Stability probe, two tiers: a per-round order-insensitive
        # hash-sum signature (one cheap aggregate) pre-filters; only when
        # consecutive signatures MATCH does the exact two-sided set
        # comparison run — the hash never decides convergence by itself,
        # it only skips the expensive exact check on rounds that are
        # still visibly moving.
        sig = e2.agg(
            # decimal accumulator: ANSI mode faults a long-sum overflow
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            F.count(F.lit(1)),
        ).first()
        sig = (sig[0], sig[1])
        # One-sided exact check suffices (r11): sig == prev_sig already
        # proves |e2| == |e| (the signature carries the count), and both
        # are distinct-ed sets, so e2 \ e = ∅ with equal cardinality ⇒
        # e2 == e.  The former second exceptAll job re-proved the same
        # fact from the other side.
        if sig == prev_sig and e2.exceptAll(e).isEmpty():
            e = e2
            converged = True
            break
        if sig[1] == 0:  # empty edge set: all-singletons fixpoint
            e = e2
            converged = True
            break
        prev_sig = sig
        e = e2
    if not converged:
        # An unconverged star forest is silently WRONG (components split);
        # fail loudly rather than hand back plausible-looking clusters.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter"
        )
    # stars point children at the component minimum; isolated nodes (or
    # nodes whose whole component contracted away) label themselves
    root = e.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least("u", "mv").alias("label")
    )
    labels = (
        nodes.select(F.col(id_col).alias("u"))
        .join(root, "u", "left")
        .select("u", F.coalesce("label", F.col("u")).alias("label"))
    )
    return labels.select(F.col("u").alias(id_col), F.col("label").alias("component"))


# ---------------------------------------------------------------------------
# registered query: cluster the exact-Jaccard near-dup graph
# ---------------------------------------------------------------------------

#: Same bounded scope as dedup_ngram_jaccard; 0.015 keeps a mix of a large
#: multi-hop component and small/singleton clusters at sf0.01.
_SCOPE = 100
_THRESHOLD = 0.015


@register(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE scoped AS (
        SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
        FROM documents WHERE doc_id < {_SCOPE}
    ),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, greatest(len(w) - 1, 2))]) AS sh
        FROM scoped
    ),
    pairs AS (
        SELECT a.doc_id AS u, b.doc_id AS v FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh))) >= {_THRESHOLD}
    ),
    edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
    reach AS (
        SELECT doc_id AS id, doc_id AS r FROM scoped
        UNION
        SELECT e.v AS id, reach.r FROM reach JOIN edges e ON e.u = reach.id
    )
    SELECT id AS doc_id, MIN(r) AS component, id = MIN(r) AS is_keeper
    FROM reach GROUP BY id
    """,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster resolution: 3-gram Jaccard pairs (bounded scope) →
    connected components → canonical keeper = min doc_id per cluster.
    The oracle computes the same closure as a DuckDB recursive CTE."""
    from .dedup import normalize_text, shingles

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < _SCOPE)
    toks = F.split(normalize_text(F.col("text")), " ")
    sh = docs.select(F.col("doc_id").alias("id"), shingles(toks, 3).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    uni = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(inter.cast("double") / uni >= _THRESHOLD)
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    )
    comp = connected_components(docs.select(F.col("doc_id").alias("id")), pairs)
    return comp.select(
        F.col("id").alias("doc_id"),
        "component",
        (F.col("id") == F.col("component")).alias("is_keeper"),
    )


# ---------------------------------------------------------------------------
# PageRank — random-walk centrality, exact fixed-point arithmetic
# ---------------------------------------------------------------------------

#: Per-node initial mass in fixed-point units (1e9 = "parts per billion of
#: one node-share").  Integer ranks make every iteration order-free: float
#: PageRank sums drift by partition order; integer sums cannot.
PR_INIT = 1_000_000_000

#: Damping 0.85 as an exact rational (17/20) so the decay step is integer
#: multiply + integer divide, never a float.
PR_DAMP_NUM, PR_DAMP_DEN = 17, 20

PR_ITERS = 5
#: Lineage-cut cadence (rounds per localCheckpoint): 2 won the r7 sweep —
#: every-round pays a materialization barrier per round; every-3 lets the
#: uncheckpointed two-join lineage straggle at 10x volume (SCALE.md).
PR_CKPT_EVERY = 2


def pagerank_fixed(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Damped PageRank over directed ``(src, dst)`` edges, all-integer.

    Per iteration: each node sends ``rank div out_degree`` along each
    out-edge (exact integer; the truncated remainder is deliberately
    dropped — a deterministic, vanishing mass leak), and receives
    ``teleport + (17 · inflow) div 20``.  Dangling-node mass is dropped
    (the standard simplified variant).  The result is bit-identical
    across partitionings and engines.

    Scale shape: the edge set joins the rank table on ``src`` and
    re-aggregates on ``dst`` — two key shuffles per iteration on
    edge-bounded rows.  Degrees are attached to the edges ONCE before the
    loop (no per-iteration degree join); ``localCheckpoint`` truncates
    lineage EVERY SECOND round (VERDICT r06 task 6 cadence sweep: at
    sf0.1 every-round pays a per-round materialization barrier that
    cadence 2-3 removes [5.0 -> 4.3 -> 3.5 s], while at 10x volume
    cadence 2 has the best median [9.0 s vs 9.3 every-round] and
    cadence 3's longer uncheckpointed lineage shows straggler outliers
    up to 35 s — receipts in SCALE.md thirteenth sweep; results are
    bit-identical across cadences, re-pinned by the partitioning-
    invariance pytest).  The rank table is node-bounded; at web scale
    both sides stay distributed and the per-iteration cost is O(E)
    shuffle — the canonical Spark PageRank plan, minus the float
    nondeterminism.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)
    # r11: derive + materialise the node set FROM the checkpointed edge
    # relation: every iteration's left join references `nodes`, and an
    # unmaterialised node set re-ran the full scan+distinct subtree inside
    # every rank checkpoint job (~5 extra corpus passes over 5 iterations).
    # edges_deg carries every edge, so src ∪ dst is unchanged.
    nodes = (
        edges_deg.select(F.col("src").alias("node"))
        .union(edges_deg.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    teleport = PR_INIT * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    ranks = nodes.withColumn("rank", F.lit(PR_INIT).cast("long"))
    for i in range(iters):
        inflow = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["node"])
            .select(F.col("dst"), F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nodes.join(inflow, nodes["node"] == inflow["dst"], "left").select(
            "node",
            (
                F.lit(teleport)
                + F.expr(
                    f"({PR_DAMP_NUM} * coalesce(inflow, 0)) div {PR_DAMP_DEN}"
                )
            ).cast("long").alias("rank"),
        )
        if i % PR_CKPT_EVERY == PR_CKPT_EVERY - 1 or i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def _pagerank_oracle(iters: int = PR_ITERS) -> str:
    """DuckDB oracle for :func:`graph_pagerank_partsupp`: the fixed-point
    loop unrolled into ``iters`` chained CTEs (the graph_lpa_communities
    conversion pattern).  All-integer arithmetic makes every iteration
    bit-reproducible in any engine, so the strict hash compares the
    actual ranks — not just shapes."""
    teleport = PR_INIT * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    steps = []
    for i in range(iters):
        prev = f"r{i}"
        steps.append(
            f"""
            r{i + 1} AS (
              SELECT n.node,
                     CAST({teleport} + ({PR_DAMP_NUM} * COALESCE(i.inflow, 0))
                          // {PR_DAMP_DEN} AS BIGINT) AS rank
              FROM nodes n LEFT JOIN (
                SELECT e.dst, SUM(r.rank // e.deg) AS inflow
                FROM edges_deg e JOIN {prev} r ON r.node = e.src
                GROUP BY e.dst
              ) i ON n.node = i.dst
            )"""
        )
    return f"""
        WITH links AS (
          SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s
          FROM lineitem
        ),
        edges AS (
          SELECT p AS src, s AS dst FROM links
          UNION ALL
          SELECT s AS src, p AS dst FROM links
        ),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        edges_deg AS (
          SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON e.src = d.src
        ),
        r0 AS (SELECT node, CAST({PR_INIT} AS BIGINT) AS rank FROM nodes),
        {",".join(steps)}
        SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END
                 AS node_type,
               node // 2 AS node_id,
               rank AS rank_ppb
        FROM r{iters}
        ORDER BY rank_ppb DESC, node_type, node_id
        LIMIT 50
    """


@register("graph_pagerank_partsupp", oracle=_pagerank_oracle())
def graph_pagerank_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 nodes by random-walk centrality in the part–supplier
    bipartite graph (distinct lineitem (part, supplier) links, both
    directions).  Node encoding: part → 2·partkey, supplier → 2·suppkey+1.

    Upgraded from rows-only to STRICT: the all-integer damping
    (teleport + 17·inflow div 20) makes the 5-iteration fixed point
    bit-reproducible, so the DuckDB oracle simply unrolls the loop as
    chained CTEs and the driver hash-compares actual rank values.
    """
    li = load_table(spark, sf_dir, "lineitem")
    links = li.select(
        (F.col("l_partkey") * 2).alias("p"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
    ).distinct()
    edges = links.selectExpr("p as src", "s as dst").union(
        links.selectExpr("s as src", "p as dst")
    )
    ranks = pagerank_fixed(edges)
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, F.lit("part"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.expr("node div 2").alias("node_id"),
            F.col("rank").alias("rank_ppb"),
        )
        .orderBy(F.col("rank_ppb").desc(), "node_type", "node_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Label-propagation communities (deterministic synchronous LPA)
# ---------------------------------------------------------------------------

#: Fixed synchronous rounds: LPA converges in a few hops on short-diameter
#: graphs; a fixed count keeps the result bit-deterministic (asynchronous
#: LPA is famously order-dependent — this variant is not).
LPA_ROUNDS = 4


def lpa_communities(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = LPA_ROUNDS,
) -> DataFrame:
    """Synchronous label propagation: each round every node adopts the
    MODE of its neighbors' labels, ties broken to the smallest label —
    a pure function of the graph, so the answer is identical under any
    partitioning or executor count (unlike textbook asynchronous LPA,
    whose output depends on visit order).

    Communities differ from :func:`connected_components`: a bridge edge
    joins two cliques into one component, but label propagation keeps
    their dense cores in separate communities — the structure basket
    analysis and content-neighborhood curation actually want.

    Scale: per round one (node) shuffle of neighbor labels + an
    O(nodes) mode aggregate; labels localCheckpoint per round to cut
    the iterative lineage (the connected_components discipline).
    """
    from ..session import spread

    e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    e = e.localCheckpoint(eager=False)
    labels = nodes.select(F.col(id_col).alias("u"), F.col(id_col).alias("label"))
    for _ in range(rounds):
        # r12 (guide §2.4/§3.1, VERDICT r11 item 6; interleaved A/B
        # 3.47 → 3.13/3.02/3.08 s best-of-3, outputs bit-identical):
        # * hint shuffle_hash (was merge): the sort-merge join re-SORTED
        #   both sides every round; the hash join builds the node-bounded
        #   labels side per partition (O(nodes/N) rows of two longs — the
        #   documented never-broadcast labels posture is unchanged).
        # * spread the neighbor-label projection by the destination node
        #   before the mode aggregate: hash(u) satisfies BOTH the
        #   (u, label) count's and the mode groupBy(u)'s clustered
        #   distribution, so the former two aggregate exchanges collapse
        #   into this one keyed shuffle — the round's single unavoidable
        #   neighbor shuffle.
        nbr = (
            spread(
                e.join(labels.hint("shuffle_hash"), "u")
                .select(F.col("v").alias("u"), "label"),
                "u",
            )
            .groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        mode = nbr.groupBy("u").agg(
            F.max_by(
                "label",
                F.struct(F.col("cnt").alias("c"), (-F.col("label")).alias("t")),
            ).alias("new_label")
        )
        labels = (
            labels.join(mode, "u", "left")
            .select(
                "u",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
            # lazy (r8): the plan is truncated immediately either way;
            # deferring materialization removes the per-round job barrier
            # — the fixed round count has no convergence probe, so all
            # rounds collapse into the final action's single job
            .localCheckpoint(eager=False)
        )
    return labels.select(F.col("u").alias(id_col), F.col("label").alias("community"))


def _lpa_round_sql(prev: str, cur: str) -> str:
    """One synchronous LPA round as a DuckDB CTE: every node adopts the
    mode of its neighbors' labels from ``prev``, ties to the smallest
    label — the exact algebra of :func:`lpa_communities`' loop body."""
    return f"""
    {cur} AS (
        SELECT l.u, COALESCE(m.new_label, l.label) AS label
        FROM {prev} l LEFT JOIN (
            SELECT u, new_label FROM (
                SELECT e.v AS u, l.label AS new_label,
                       ROW_NUMBER() OVER (PARTITION BY e.v
                           ORDER BY COUNT(*) DESC, l.label ASC) AS rn
                FROM e JOIN {prev} l ON e.u = l.u
                GROUP BY e.v, l.label
            ) WHERE rn = 1
        ) m ON l.u = m.u
    )"""


def _lpa_oracle() -> str:
    from .basket import _PAIR_SQL, MINSUP_ORDERS

    rounds = "".join(
        "," + _lpa_round_sql(f"r{i}" if i else "l0", f"r{i + 1}")
        for i in range(LPA_ROUNDS)
    )
    return f"""
    WITH pair_occ AS ({_PAIR_SQL}),
    pair_n AS (
        SELECT p1, p2 FROM pair_occ
        GROUP BY p1, p2 HAVING COUNT(*) >= {MINSUP_ORDERS}
    ),
    e AS (
        SELECT p1 AS u, p2 AS v FROM pair_n
        UNION
        SELECT p2 AS u, p1 AS v FROM pair_n
    ),
    l0 AS (SELECT DISTINCT u, u AS label FROM e){rounds}
    SELECT u AS id, label AS community FROM r{LPA_ROUNDS} ORDER BY id
    """


@register(
    "graph_lpa_communities",
    # STRICT since r8: synchronous LPA with the smallest-label tie-break
    # is a pure function of the graph, so the oracle replays the exact
    # per-round mode algebra as chained CTEs — a hash mismatch catches a
    # wrong mode, tie-break, or round count anywhere in the iteration.
    oracle=_lpa_oracle(),
)
def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Communities of the support-filtered co-purchase graph (the same
    relation the triangle census measures): 4 synchronous LPA rounds,
    smallest-label tie-break.  Deterministic by construction — the
    oracle replays the rounds in SQL (strict hash check since r8);
    community quality (planted cliques separate across a bridge;
    components ≥ communities granularity) is pytest-pinned in
    tests/test_graph.py."""
    from .basket import MINSUP_ORDERS, _pairs

    edges = (
        _pairs(spark, sf_dir)
        .groupBy(F.col("p1").alias("src"), F.col("p2").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MINSUP_ORDERS)
        .select("src", "dst")
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select("dst"))
        .distinct()
    )
    # Trailing ORDER BY dropped (r11 sort-drop precedent): the driver
    # canonicalizes both sides before hashing; the oracle keeps its
    # ORDER BY — result SET unchanged, full-output range shuffle gone.
    return lpa_communities(nodes, edges)


def components_apply_edges(
    labels: DataFrame,
    new_edges: DataFrame,
    new_nodes: DataFrame | None = None,
) -> DataFrame:
    """INCREMENTAL component maintenance: fold a delta edge batch into an
    existing labeling without re-deriving the historical edge set.

    The insight that makes this cheap: a converged labeling IS a star
    forest — (id → component) edges carry exactly the connectivity the
    full graph had — so components(stars ∪ delta) equals components of
    the whole union, at O(nodes + delta) edges instead of O(all edges
    ever seen).  At 100 TB this is the nightly shape: pair generation
    (the expensive LSH/shingle stage) runs on the NEW batch only; the
    history participates as its forest.
    """
    stars = labels.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("src"), F.col("component").alias("dst")
    )
    nodes = labels.select("id").union(
        new_edges.select(F.col("src").alias("id"))
    ).union(new_edges.select(F.col("dst").alias("id")))
    if new_nodes is not None:
        # singleton arrivals (no delta pair) must still label themselves
        nodes = nodes.union(new_nodes.select(F.col("id")))
    return connected_components(nodes.distinct(), stars.unionByName(new_edges))


@register(
    "dedup_components_incremental",
    # identical oracle content to dedup_components: the incremental path
    # must land exactly where the one-shot closure lands
    oracle=f"""
    WITH RECURSIVE scoped AS (
        SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
        FROM documents WHERE doc_id < {_SCOPE}
    ),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, greatest(len(w) - 1, 2))]) AS sh
        FROM scoped
    ),
    pairs AS (
        SELECT a.doc_id AS u, b.doc_id AS v FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh))) >= {_THRESHOLD}
    ),
    edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
    reach AS (
        SELECT doc_id AS id, doc_id AS r FROM scoped
        UNION
        SELECT e.v AS id, reach.r FROM reach JOIN edges e ON e.u = reach.id
    )
    SELECT id AS doc_id, MIN(r) AS component, id = MIN(r) AS is_keeper
    FROM reach GROUP BY id
    """,
)
def dedup_components_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nightly-batch component maintenance: the first 70 docs' near-dup
    graph resolves to a star forest; the remaining 30 docs arrive as a
    DELTA whose pair generation runs against (new ∪ old) content but
    whose historical connectivity enters only as the stored forest —
    and the result must hash-match the ONE-SHOT closure over all 100
    (same oracle as dedup_components).  Certifies that incremental
    union-by-forest loses no transitive merges, including new edges that
    BRIDGE two old components."""
    from .dedup import normalize_text, shingles

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _SCOPE
    )
    toks = F.split(normalize_text(F.col("text")), " ")
    sh = docs.select(F.col("doc_id").alias("id"), shingles(toks, 3).alias("sh"))
    old_sh = sh.filter(F.col("id") < 70)
    a, b = old_sh.alias("a"), old_sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    uni = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    old_pairs = (
        a.crossJoin(b)
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(inter.cast("double") / uni >= _THRESHOLD)
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    )
    base = connected_components(
        old_sh.select("id"), old_pairs
    ).localCheckpoint()
    # delta pairs: any pair touching a NEW doc (new-new and new-old)
    new_sh = sh.filter(F.col("id") >= 70)
    na, nb = new_sh.alias("a"), sh.alias("b")
    ninter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    nuni = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    delta_pairs = (
        na.crossJoin(nb)
        .filter(F.col("a.id") != F.col("b.id"))
        .filter(ninter.cast("double") / nuni >= _THRESHOLD)
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    )
    comp = components_apply_edges(base, delta_pairs, new_sh.select("id"))
    return comp.select(
        F.col("id").alias("doc_id"),
        "component",
        (F.col("id") == F.col("component")).alias("is_keeper"),
    )


# ---------------------------------------------------------------------------
# BFS hop distances (bounded multi-source breadth-first search)
# ---------------------------------------------------------------------------

#: Bounded frontier expansion: K hops covers the useful blast-radius /
#: reachability questions (bipartite graphs alternate sides per hop) while
#: keeping the loop depth — and the oracle's recursion bound — fixed.
BFS_MAX_HOPS = 3


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = BFS_MAX_HOPS,
) -> DataFrame:
    """Minimum hop count from a SOURCE SET to every node reachable within
    ``max_hops``: ``(node, hops)``.  BFS's first-visit property makes the
    frontier loop compute exact minimum distances — a node joins the
    visited set the first round it appears and is anti-joined out of all
    later frontiers.

    Scale shape: per hop, one join of the CURRENT frontier (not the
    whole visited set) against the edge list + one distinct + one
    anti-join — all key shuffles on node ids, the standard distributed
    BFS.  The visited relation is node-bounded; ``localCheckpoint``
    truncates the per-hop lineage like the package's other iterative
    loops.  Cites /root/reference/script.js: none — the reference has no
    graph operators; this extends the SURVEY §2.10 surface.
    """
    # r11: materialise the edge relation once — every hop's frontier join
    # otherwise re-executes the caller's edge derivation (scan + distinct)
    # inside its eager checkpoint job, once per hop.
    edges = edges.localCheckpoint(eager=False)
    visited = sources.select("node", F.lit(0).alias("hops")).distinct()
    visited = visited.localCheckpoint(eager=True)
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            edges.join(frontier, edges["src"] == frontier["node"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h))
        )
        nxt = nxt.localCheckpoint(eager=True)
        visited = visited.union(nxt)
        frontier = nxt.select("node")
    return visited


@register(
    "graph_bfs_reach",
    # DuckDB's genuine WITH RECURSIVE walks the same bounded BFS; UNION
    # dedups (node, hops) pairs and MIN(hops) recovers first-visit depth
    oracle="""
    WITH RECURSIVE links AS (
        SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s
        FROM lineitem
    ),
    edges AS (
        SELECT p AS src, s AS dst FROM links
        UNION ALL
        SELECT s AS src, p AS dst FROM links
    ),
    sources AS (
        SELECT DISTINCT e.src AS node
        FROM edges e
        JOIN supplier su ON e.src = su.s_suppkey * 2 + 1
        WHERE su.s_nationkey < 5
    ),
    walk(node, hops) AS (
        SELECT node, 0 FROM sources
        UNION
        SELECT e.dst, w.hops + 1
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.hops < 3
    )
    SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END
               AS node_type,
           node // 2 AS node_id,
           CAST(MIN(hops) AS INT) AS hops
    FROM walk
    GROUP BY node
    ORDER BY hops, node_type, node_id
    """,
)
def graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blast-radius reachability: minimum hop distance from low-nation
    (s_nationkey < 5) suppliers through the part–supplier bipartite graph, bounded at
    3 hops (their parts → co-suppliers → the co-suppliers' parts) — the
    supply-chain exposure query.  The Spark frontier loop's first-visit
    BFS hash-matches DuckDB's genuine ``WITH RECURSIVE`` walk."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    links = li.select(
        (F.col("l_partkey") * 2).alias("p"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
    ).distinct()
    edges = links.selectExpr("p as src", "s as dst").union(
        links.selectExpr("s as src", "p as dst")
    )
    nation0 = supplier.filter(F.col("s_nationkey") < 5).select(
        (F.col("s_suppkey") * 2 + 1).alias("node")
    )
    sources = edges.select(F.col("src").alias("node")).distinct().join(
        F.broadcast(nation0), "node", "left_semi"
    )
    reach = bfs_hops(edges, sources, max_hops=BFS_MAX_HOPS)
    return (
        reach.select(
            F.when(F.col("node") % 2 == 0, F.lit("part"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.expr("node div 2").alias("node_id"),
            F.col("hops").cast("int").alias("hops"),
        )
        .orderBy("hops", "node_type", "node_id")
    )


# ---------------------------------------------------------------------------
# Bounded Bellman-Ford — weighted shortest paths from a source set
# ---------------------------------------------------------------------------

def bellman_ford_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = BFS_MAX_HOPS,
) -> DataFrame:
    """Minimum path COST from a source set to every node reachable within
    ``max_hops``, over weighted edges ``(src, dst, w)`` with integer
    weights: ``(node, cost)``.  The hop-bounded Bellman-Ford recurrence
    — dist_h(v) = min(dist_{h-1}(v), min over edges (dist_{h-1}(u) + w))
    — equals the minimum over all ≤h-hop paths, so the result is a pure
    function of the graph (and hash-comparable against a recursive-CTE
    path enumeration).

    Unlike BFS, a longer path can be CHEAPER, so every round relaxes the
    FULL distance table, not a frontier; cost per round is one
    edges⋈dist join + a min aggregate — O(E) shuffles on node ids, the
    textbook distributed Bellman-Ford.  All-integer costs make the
    fixed point bit-deterministic across engines and partitionings."""
    # r11: materialise the edge relation once (same reasoning as bfs_hops —
    # each relaxation round's checkpoint otherwise re-runs the caller's
    # edge derivation).
    edges = edges.localCheckpoint(eager=False)
    dist = sources.select("node", F.lit(0).cast("long").alias("cost")).distinct()
    dist = dist.localCheckpoint(eager=True)
    for _ in range(max_hops):
        relaxed = (
            edges.join(dist, edges["src"] == dist["node"])
            .select(F.col("dst").alias("node"), (F.col("cost") + F.col("w")).alias("cost"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
        dist = dist.localCheckpoint(eager=True)
    return dist


@register(
    "graph_cheapest_route",
    # DuckDB's WITH RECURSIVE enumerates all <=3-hop paths; MIN(cost)
    # per node is exactly the hop-bounded Bellman-Ford fixed point
    oracle="""
    WITH RECURSIVE links AS (
        SELECT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s,
               MIN(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS w
        FROM lineitem WHERE l_partkey % 5 = 0
        GROUP BY l_partkey, l_suppkey
    ),
    edges AS (
        SELECT p AS src, s AS dst, w FROM links
        UNION ALL
        SELECT s AS src, p AS dst, w FROM links
    ),
    sources AS (
        SELECT DISTINCT e.src AS node FROM edges e
        JOIN supplier su ON e.src = su.s_suppkey * 2 + 1
        WHERE su.s_nationkey < 5
    ),
    walk(node, cost, hops) AS (
        SELECT node, CAST(0 AS BIGINT), 0 FROM sources
        UNION
        SELECT e.dst, w.cost + e.w, w.hops + 1
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.hops < 3
    )
    SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END
               AS node_type,
           node // 2 AS node_id,
           CAST(MIN(cost) AS BIGINT) AS min_cost_cents
    FROM walk GROUP BY node ORDER BY node_type, node_id
    """,
)
def graph_cheapest_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest supply route: minimum path cost (integer cents, min
    extendedprice per link) from low-nation suppliers through the
    part–supplier graph, bounded at 3 hops — weighted shortest paths
    where :func:`graph_bfs_reach` counts hops.  The Spark Bellman-Ford
    fixed point hash-matches DuckDB's recursive path enumeration; the
    ``l_partkey % 5`` scope keeps the oracle's path explosion bounded
    while the Spark plan is O(E·hops) at any density."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 5 == 0
    )
    supplier = load_table(spark, sf_dir, "supplier")
    links = li.groupBy(
        (F.col("l_partkey") * 2).alias("p"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
    ).agg(
        F.min(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("w")
    )
    edges = links.selectExpr("p as src", "s as dst", "w").union(
        links.selectExpr("s as src", "p as dst", "w")
    )
    nation_lo = supplier.filter(F.col("s_nationkey") < 5).select(
        (F.col("s_suppkey") * 2 + 1).alias("node")
    )
    sources = edges.select(F.col("src").alias("node")).distinct().join(
        F.broadcast(nation_lo), "node", "left_semi"
    )
    dist = bellman_ford_hops(edges, sources, max_hops=3)
    return (
        dist.select(
            F.when(F.col("node") % 2 == 0, F.lit("part"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.expr("node div 2").alias("node_id"),
            F.col("cost").alias("min_cost_cents"),
        )
        .orderBy("node_type", "node_id")
    )


# --- HITS (hubs & authorities) on the part-supplier bipartite graph -------

#: HITS fixed-point iterations (each = two join-aggregate half-steps)
HITS_ITERS = 3
#: integer rescale ceiling after each half-step — keeps every sum far
#: inside int64 at ANY degree distribution while staying bit-reproducible
#: (scores are ``s * SCALE // max(s)``, pure integer ops)
HITS_SCALE = 1000


def _hits_oracle(iters: int = HITS_ITERS) -> str:
    """DuckDB oracle for :func:`graph_hits_bipartite`: the mutual
    reinforcement loop unrolled into chained CTEs (the
    graph_pagerank_partsupp conversion pattern).  All-integer arithmetic
    — sums of previous scores, then ``* SCALE // max`` rescaling — makes
    every iteration bit-reproducible in any engine."""
    steps = []
    prev_h = "h0"
    for i in range(1, iters + 1):
        steps.append(
            f"""
            a{i}r AS (
              SELECT e.p, CAST(SUM(h.h) AS BIGINT) AS a
              FROM edges e JOIN {prev_h} h ON h.s = e.s
              GROUP BY e.p
            ),
            a{i} AS (
              SELECT p, a * {HITS_SCALE} // (SELECT MAX(a) FROM a{i}r) AS a
              FROM a{i}r
            ),
            h{i}r AS (
              SELECT e.s, CAST(SUM(a.a) AS BIGINT) AS h
              FROM edges e JOIN a{i} a ON a.p = e.p
              GROUP BY e.s
            ),
            h{i} AS (
              SELECT s, h * {HITS_SCALE} // (SELECT MAX(h) FROM h{i}r) AS h
              FROM h{i}r
            )"""
        )
        prev_h = f"h{i}"
    return f"""
        WITH edges AS (
          SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        h0 AS (
          SELECT DISTINCT s, CAST({HITS_SCALE} AS BIGINT) AS h FROM edges
        ),
        {",".join(steps)}
        SELECT kind, key, CAST(score AS BIGINT) AS score
        FROM (
          SELECT 'authority' AS kind, p AS key, a AS score FROM a{iters}
          UNION ALL
          SELECT 'hub' AS kind, s AS key, h AS score FROM h{iters}
        )
        ORDER BY kind, key
    """


@register("graph_hits_bipartite", oracle=_hits_oracle())
def graph_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hub/authority scores on the part–supplier bipartite graph
    (distinct lineitem links): parts accumulate authority from the hub
    scores of their suppliers, suppliers accumulate hub score from the
    authority of their parts — {HITS_ITERS} mutual-reinforcement rounds.

    Strict by the graph_pagerank_partsupp discipline: integer sums with
    a ``· SCALE // max`` integer rescale after each half-step (bounding
    magnitudes at ANY degree distribution), so the DuckDB oracle unrolls
    the loop as chained CTEs and the driver hash-compares actual scores.
    Each half-step is one equi-join + groupBy on the edge relation —
    shuffles on the bipartite keys, O(iters · |E|) total; the rescale
    max is a broadcast scalar."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
        )
        .distinct()
        # the edge relation feeds all 2·HITS_ITERS half-step joins:
        # materialize the distinct once instead of re-scanning lineitem
        .localCheckpoint(eager=False)
    )
    h = edges.select("s").distinct().withColumn(
        "h", F.lit(HITS_SCALE).cast("long")
    )
    a = None
    for _ in range(HITS_ITERS):
        a_raw = (
            edges.join(h, "s")
            .groupBy("p")
            .agg(F.sum("h").cast("long").alias("a"))
        )
        a_max = a_raw.agg(F.max("a").alias("m"))
        a = a_raw.crossJoin(F.broadcast(a_max)).select(
            "p", F.expr(f"a * {HITS_SCALE} div m").alias("a")
        )
        h_raw = (
            edges.join(a, "p")
            .groupBy("s")
            .agg(F.sum("a").cast("long").alias("h"))
        )
        h_max = h_raw.agg(F.max("h").alias("m"))
        h = h_raw.crossJoin(F.broadcast(h_max)).select(
            "s", F.expr(f"h * {HITS_SCALE} div m").alias("h")
        )
        # truncate lineage per round — without this each iteration
        # re-executes every earlier one (the max-aggregate forks the DAG
        # twice per half-step: 24 s -> ~3 s at sf0.1).  r11: checkpoint
        # only h — each localCheckpoint(eager=False) pays a full
        # plan→RDD (Catalyst) conversion on the driver, and the r11
        # profile showed those conversions, not execution, dominate the
        # query (wall 3.8 s vs 0.19 s exec).  h's lineage then contains
        # the a half-step (a_raw evaluated twice via the max fork), a
        # bounded O(nodes) re-execution per round, in exchange for
        # halving the driver-side conversions.
        h = h.localCheckpoint(eager=False)
    out = (
        a.select(
            F.lit("authority").alias("kind"),
            F.col("p").alias("key"),
            F.col("a").alias("score"),
        )
        .unionByName(
            h.select(
                F.lit("hub").alias("kind"),
                F.col("s").alias("key"),
                F.col("h").alias("score"),
            )
        )
        .orderBy("kind", "key")
    )
    return out


# ---------------------------------------------------------------------------
# Time-respecting reachability (temporal graph earliest-arrival)
# ---------------------------------------------------------------------------

#: Relaxation rounds: earliest-arrival over non-decreasing-time paths has
#: optimal substructure, so |nodes|-1 rounds suffice; the event-type graph
#: has 5 nodes and 6 rounds adds slack.  Both engines replay the SAME
#: round count, so the comparison is exact even before convergence.
TEMPORAL_ROUNDS = 6

TEMPORAL_SEED = "signup"

#: arr value meaning "reachable from the start" for the seed node.
_EPOCH0 = "1970-01-01 00:00:00"


def temporal_earliest_arrival(
    events: DataFrame, seed: str = TEMPORAL_SEED, rounds: int = TEMPORAL_ROUNDS
) -> DataFrame:
    """Earliest time each event type becomes reachable from ``seed`` via a
    TIME-RESPECTING path of per-user behavioural transitions.

    A static transition graph answers "does any path exist"; real
    influence/contagion questions need edge times to be non-decreasing
    along the path (an edge used at 09:00 cannot feed one at 08:00).
    Edges here are consecutive same-user events — (prev_type → type) at
    the later event's timestamp — and ``arr(v)`` is the minimum arrival
    time over all temporal paths from the seed.

    Returns (event_type, reachable, arr_ts) for every node.

    Scale shape: each relaxation round is one join of the edge relation
    against the O(|node|)-row arrival table (broadcast) + a min-aggregate
    — a linear scan per round, never a per-pair time-list
    materialisation.  Edge construction is one user-keyed window (the
    sessionize shuffle).  Bounded rounds, lineage cut per round like the
    package's other iterative loops."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        events.select("user_id", "event_id", "ts", "event_type")
        .withColumn("u", F.lag("event_type").over(w))
        .filter(F.col("u").isNotNull())
        .select("u", F.col("event_type").alias("v"), F.col("ts").alias("t"))
    )
    edges = edges.localCheckpoint(eager=True)
    nodes = events.select(F.col("event_type").alias("v")).distinct()
    arr = nodes.filter(F.col("v") == seed).select(
        "v", F.lit(_EPOCH0).cast("timestamp").alias("arr")
    )
    for _ in range(rounds):
        relaxed = (
            edges.alias("e")
            .join(F.broadcast(arr.alias("a")), F.col("e.u") == F.col("a.v"))
            .filter(F.col("e.t") >= F.col("a.arr"))
            .select(F.col("e.v").alias("v"), F.col("e.t").alias("arr"))
        )
        arr = (
            arr.unionByName(relaxed)
            .groupBy("v")
            .agg(F.min("arr").alias("arr"))
            .localCheckpoint(eager=False)
        )
    return (
        nodes.join(arr, "v", "left")
        .select(
            F.col("v").alias("event_type"),
            F.col("arr").isNotNull().alias("reachable"),
            F.col("arr").alias("arr_ts"),
        )
        .orderBy("event_type")
    )


def _temporal_oracle() -> str:
    """Unrolled fixed-round relaxation (DuckDB's WITH RECURSIVE dedups on
    full rows, which breaks min-folding semantics — the explicit unroll
    replays the builder's exact rounds instead)."""
    prev = "arr0"
    ctes = [
        f"""arr0 AS (
        SELECT '{TEMPORAL_SEED}' AS v, TIMESTAMP '{_EPOCH0}' AS arr
    )"""
    ]
    for k in range(1, TEMPORAL_ROUNDS + 1):
        ctes.append(
            f"""arr{k} AS (
        SELECT v, MIN(arr) AS arr FROM (
            SELECT v, arr FROM {prev}
            UNION ALL
            SELECT e.v, e.t AS arr
            FROM edges e JOIN {prev} a ON a.v = e.u AND e.t >= a.arr
        ) GROUP BY v
    )"""
        )
        prev = f"arr{k}"
    return (
        """
    WITH seq AS (
        SELECT user_id, event_id, ts, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS u
        FROM events
    ),
    edges AS (
        SELECT u, event_type AS v, ts AS t FROM seq WHERE u IS NOT NULL
    ),
    nodes AS (SELECT DISTINCT event_type AS v FROM events),
    """
        + ",\n    ".join(ctes)
        + f"""
    SELECT n.v AS event_type, a.arr IS NOT NULL AS reachable,
           a.arr AS arr_ts
    FROM nodes n LEFT JOIN {prev} a USING (v)
    ORDER BY n.v
    """
    )


@register("graph_temporal_reach", oracle=_temporal_oracle())
def graph_temporal_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest time-respecting arrival at each event type from 'signup'."""
    return temporal_earliest_arrival(load_table(spark, sf_dir, "events"))
