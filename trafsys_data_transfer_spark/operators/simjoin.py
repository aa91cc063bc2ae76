"""Exact set-similarity self-join via prefix filtering (PPJoin-lite).

The dedup family's MinHash tier is probabilistic — recall < 1 by design.
This operator is its EXACT complement for the similarity-join shape
itself: all pairs of records whose token sets have Jaccard ≥ t, with a
completeness guarantee and no verification misses, using the prefix
filtering principle (Chaudhuri et al., "A Primitive Operator for
Similarity Joins"; Xiao et al., PPJoin):

* order each record's distinct tokens by GLOBAL frequency, rarest first
  (the canonical ordering that makes prefixes discriminating);
* a record of size s keeps a prefix of ``s − ceil(t·s) + 1`` tokens —
  any pair with J ≥ t MUST share at least one prefix token (pigeonhole:
  fewer shared tokens than that forces J < t), so joining on prefix
  tokens loses nothing;
* length filter: J ≥ t ⇒ min(sa,sb) ≥ t·max(sa,sb) — applied on the
  candidate join before verification;
* positional filter (the PPJoin refinement): at a pair's FIRST shared
  prefix token, total overlap is bounded by 1 + min(remaining tokens
  each side); pairs whose bound can't reach α = ⌈t(sa+sb)/(1+t)⌉ are
  dropped before the verify (sf0.1: 193k → 69k candidates);
* verify with the exact integer test ``5·|∩| ≥ 3·|∪|`` (t = 3/5), no
  floats anywhere, so the oracle hash-matches bit for bit.

Scale: the token-frequency table is O(vocab) (broadcastable); the
candidate join is on PREFIX tokens only — rare by construction, so
bucket sizes stay small where a naive token join explodes on stop
words.  No all-pairs stage exists at any scale; the verify join carries
two token arrays per candidate only.  This is the plan shape Spark
would need at 100 TB: one vocab aggregate, one prefix explode
(~3 tokens/record), one skew-resistant join, candidate-bounded verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from ..session import spread
from ..sources.fixtures import load_table

#: Jaccard threshold as an exact rational (3/5).
SIMJOIN_T_NUM, SIMJOIN_T_DEN = 3, 5


def simjoin_exact(records: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """All (id_a < id_b) pairs with word-set Jaccard ≥ 3/5 — exact."""
    # spread BEFORE the token-set projection so the per-row set build runs
    # cluster-wide even off a single-file source (guide §2; r11).
    return _simjoin_from_sets(
        spread(records, id_col).select(
            F.col(id_col).alias("id"),
            F.array_distinct(F.split(F.col(text_col), " ")).alias("toks"),
        )
    )


def simjoin_exact_shingles(
    records: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """All (id_a < id_b) pairs with 3-gram-SHINGLE-set Jaccard ≥ 3/5 —
    the exact tier of the near-dup family (MinHash-LSH finds these with
    recall < 1; this finds ALL of them).  Shingles, not words: the
    fixtures' word vocabulary is tiny (word-set Jaccard marks >half of
    all pairs "similar"), while 3-gram shingles discriminate — the same
    reason the MinHash tier signs shingles."""
    from .dedup import shingles

    shingled = spread(records, id_col).select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            shingles(F.split(F.col(text_col), " "), 3)
        ).alias("toks"),
    ).filter(F.size("toks") > 0)
    return _simjoin_from_sets(shingled)


def _simjoin_from_sets(sets_df: DataFrame) -> DataFrame:
    """Prefix-filtered exact join over a precomputed (id, toks:array).

    ONE scan of the input: the skinny (id, token-set, size) table feeds
    every downstream branch (frequency, prefixes, both verify sides) via
    a lazy checkpoint instead of re-reading the base per branch."""
    sets = sets_df.select(
        "id", F.col("toks").alias("ws"), F.size("toks").alias("sz")
        # eager (r12): `sets` feeds four sibling branches whose stages run
        # concurrently (frequency, prefixes, both verify sides) — a lazy
        # checkpoint raced them into recomputing the base projection (the
        # minhash sh_df finding; A/B docs_exact_neardup_join 4.51 → 4.42 s).
    ).localCheckpoint(eager=True)
    toks = sets.select("id", "sz", F.explode("ws").alias("w"))
    freq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    ordered = toks.join(freq, "w").withColumn(
        "rn",
        F.row_number().over(W.partitionBy("id").orderBy("df", "w")),
    )
    prefix = ordered.filter(
        F.col("rn")
        <= F.col("sz")
        + F.floor(F.lit(-SIMJOIN_T_NUM) * F.col("sz") / SIMJOIN_T_DEN)
        + 1
    ).select("id", "w", "sz", "rn")
    a = prefix.toDF("id_a", "w", "sz_a", "rn_a")
    b = prefix.toDF("id_b", "w", "sz_b", "rn_b")
    # POSITIONAL filter (PPJoin): at the pair's FIRST shared prefix token
    # (minimal rn in the shared canonical order — tokens before it are
    # disjoint by construction), total overlap is bounded by
    # 1 + min(remaining tokens on each side); require that bound to reach
    # the overlap threshold α = ⌈t·(sa+sb)/(1+t)⌉ (o ≥ α ⇔ J ≥ t).  The
    # groupBy replaces the plain distinct — same shuffle, far fewer
    # survivors reaching the array-intersect verify.
    cand = (
        a.join(b, "w")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter: min ≥ t·max, exactly
        .filter(
            SIMJOIN_T_DEN * F.least("sz_a", "sz_b")
            >= SIMJOIN_T_NUM * F.greatest("sz_a", "sz_b")
        )
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.min(F.struct("rn_a", "rn_b")).alias("fm"))
        .filter(
            1
            + F.least(
                F.col("sz_a") - F.col("fm.rn_a"),
                F.col("sz_b") - F.col("fm.rn_b"),
            )
            >= -F.floor(
                F.lit(-SIMJOIN_T_NUM)
                * (F.col("sz_a") + F.col("sz_b"))
                / (SIMJOIN_T_NUM + SIMJOIN_T_DEN)
            )
        )
        .select("id_a", "id_b")
    )
    verified = (
        cand.join(sets.select(F.col("id").alias("id_a"), F.col("ws").alias("ws_a"), F.col("sz").alias("sza")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"), F.col("ws").alias("ws_b"), F.col("sz").alias("szb")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("ws_a", "ws_b")))
        .withColumn("uni", F.col("sza") + F.col("szb") - F.col("inter"))
        .filter(
            SIMJOIN_T_DEN * F.col("inter") >= SIMJOIN_T_NUM * F.col("uni")
        )
    )
    return verified.select(
        "id_a",
        "id_b",
        F.col("inter").cast("long").alias("inter"),
        F.col("uni").cast("long").alias("uni"),
        F.expr("inter * 1000000 div uni").alias("jaccard_ppm"),
    ).orderBy("id_a", "id_b")


@register(
    "docs_exact_neardup_join",
    # Ground truth is the definition itself: the full quadratic self-join
    # in DuckDB (fine at oracle scale; the Spark side must produce the
    # IDENTICAL pair set from the prefix-filtered plan — a missed pair is
    # a completeness bug, an extra pair a verification bug).
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS id, string_split(text, ' ') AS tk FROM documents
    ),
    s AS (
        SELECT id,
               list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                              for i in generate_series(1, len(tk) - 2)])
                   AS ws
        FROM toks WHERE len(tk) >= 3
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS inter,
           CAST(len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))
                AS BIGINT) AS uni,
           CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) * 1000000
               // (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws)))
               AS jaccard_ppm
    FROM s a JOIN s b ON a.id < b.id
    WHERE {SIMJOIN_T_DEN} * len(list_intersect(a.ws, b.ws))
          >= {SIMJOIN_T_NUM} * (len(a.ws) + len(b.ws)
                                - len(list_intersect(a.ws, b.ws)))
    ORDER BY id_a, id_b
    """,
)
def docs_exact_neardup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-duplicate join over the documents corpus at shingle
    Jaccard ≥ 0.6 — the prefix-filtered plan against the oracle's
    quadratic ground truth, over the FULL corpus (no bounded audit)."""
    from .dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    # spread before the shingle projection: the per-doc shingle-set build
    # dominated the r11 probe (4.6 s exec on one core off the single-file
    # scan); the narrow (id, text) exchange buys 32-way map parallelism.
    shingled = spread(docs, "doc_id").select(
        F.col("doc_id").alias("id"),
        F.array_distinct(
            shingles(F.split(F.col("text"), " "), 3)
        ).alias("toks"),
    ).filter(F.size("toks") > 0)
    return _simjoin_from_sets(shingled)
