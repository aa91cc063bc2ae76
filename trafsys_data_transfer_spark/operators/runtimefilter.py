"""Bloom-filter semi-join pruning (runtime-filter / semi-join reduction).

The classic big-join optimization the reference never needs (one table)
but a 100 TB star join lives on: before shuffling the FACT table for a
join, probe a compact Bloom filter built from the DIM side's join keys
and drop fact rows that cannot match.  False positives only waste
shuffle (the exact join still runs after), so results are bit-exact;
true negatives never leave the scan stage.

Spark has this built in as an optimizer rule
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, on by default —
``bloom_filter_agg`` / ``might_contain`` are internal expressions the
rule injects), but it only fires under creation-side selectivity and
size thresholds the user cannot see.  This operator is the EXPLICIT,
deterministic version on public engine primitives — every step stays in
whole-stage codegen, no UDF anywhere:

* build: ``pmod(xxhash64(key), m)`` buckets, packed 64-per-row into a
  bitset table ``(word_idx, bits)`` via ``bit_or(shiftleft(1, bucket %
  64))`` — one aggregation, ≤ m/64 rows total (word rows with no set
  bit never exist).
* probe: the fact side computes the same bucket, INNER-joins the
  broadcast bitset on ``word_idx`` (a missing word is a definite miss),
  and keeps rows whose bit is set — one broadcast hash join + one
  bitwise AND per row.

Sizing: k=1 hash with ``m = BITS_PER_KEY × n`` bits gives
fpp ≈ 1 − e^(−n/m) ≈ 1/BITS_PER_KEY (64 → ~1.5 %).  The broadcast is
at most n packed words = 16 bytes/key — a 1 M-key dim ships ~16 MB,
the same order as a broadcast semi-join on the raw keys but with the
fact-side probe reduced to integer ops (and at higher BITS_PER_KEY the
word table stays sparse: only words containing a set bit exist).  For
dims too big to broadcast even packed, the answer is Spark's own
shuffle-stage runtime filter or a pre-partitioned semi join — this
operator covers the broadcastable-dim regime, which is where star-join
fact pruning lives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table

#: Bits per dim key (k=1 hash): 64 → false-positive rate ≈ 1.5 %.
BLOOM_BITS_PER_KEY = 64


def bloom_build(
    dim_keys: DataFrame, key_col: str, bits_per_key: int = BLOOM_BITS_PER_KEY
) -> tuple[DataFrame, int]:
    """Build the packed-word Bloom bitset over ``dim_keys[key_col]``.

    Returns ``(words, m)`` where ``words`` is a ``(word_idx, bits)``
    DataFrame (one row per 64-bit word with at least one set bit) and
    ``m`` is the filter's bit width — the probe must reuse the same
    ``m``.  One distributed aggregation; the result is O(distinct keys)
    rows at most, independent of fact size."""
    n = max(1, dim_keys.select(key_col).distinct().count())
    m = 1
    while m < n * bits_per_key:
        m *= 2
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(m))
    words = (
        dim_keys.select(bucket.alias("b"))
        .groupBy(F.expr("b div 64").alias("word_idx"))
        .agg(
            F.expr(
                "bit_or(shiftleft(1L, CAST(b % 64 AS INT)))"
            ).alias("bits")
        )
    )
    return words, m


def bloom_prefilter(
    fact: DataFrame, fact_key: str, words: DataFrame, m: int
) -> DataFrame:
    """Fact rows whose key MIGHT be in the filter (exact misses dropped
    before any shuffle).  Pure codegen: hash, broadcast word join,
    bitwise AND — no UDF, no state."""
    bucket = F.pmod(F.xxhash64(F.col(fact_key)), F.lit(m))
    return (
        fact.withColumn("__b", bucket)
        .withColumn("__w", F.expr("__b div 64"))
        .join(
            F.broadcast(words.withColumnRenamed("word_idx", "__w")), "__w"
        )
        .filter(
            F.expr("bits & shiftleft(1L, CAST(__b % 64 AS INT))") != 0
        )
        .drop("__b", "__w", "bits")
    )


@register(
    "bloom_prefilter_join",
    oracle="""
    SELECT s.s_suppkey, s.s_name,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY s.s_suppkey
    """,
)
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join fact pruning: revenue per NATION_7 supplier, with the
    lineitem scan pre-filtered through an explicit Bloom filter built
    from the qualifying suppliers' keys BEFORE the join.  The exact join
    still runs (false positives are dropped there), so the result
    hash-matches the plain three-way join oracle; the pytest pins that
    the pre-filter really pruned (≈ 24/25 of fact rows dropped pre-join
    at TPC-H nation selectivity) and that the whole path is
    codegen-only (no Python eval in the plan)."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    dim = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_7")),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", "s_name")
    words, m = bloom_build(dim, "s_suppkey")
    pruned = bloom_prefilter(lineitem, "l_suppkey", words, m)
    return (
        pruned.join(
            F.broadcast(dim), pruned["l_suppkey"] == dim["s_suppkey"]
        )
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("s_suppkey")
    )
