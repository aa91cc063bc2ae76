"""Corpus-LM cross-entropy quality scoring (north star §2.10).

The CCNet / RedPajama / Gopher pipelines all score documents with a language
model trained on a reference corpus and filter on per-token cross-entropy
(Wenzek et al. 2020 use a KenLM 5-gram; the filtering signal is the same at
bigram order).  This operator fits an **interpolated bigram LM on the corpus
itself** and scores every document under it — the held-in formulation that
needs no external model artifact, which is what makes it oracle-checkable.

Model (Jelinek-Mercer interpolation, add-one unigram floor)::

    p(w_i | w_{i-1}) = 0.75 * c(w_{i-1} w_i) / c(w_{i-1})
                     + 0.25 * (c(w_i) + 1) / (T + V)

with T = total corpus tokens, V = vocabulary size.  Both mixture weights are
exactly representable doubles and every count is an exact integer, so
``p`` is a fixed sequence of correctly-rounded IEEE operations — bit-identical
between Spark and the DuckDB oracle.

Exactness strategy: per-position negative log-likelihoods are floats, and a
``SUM`` over an unordered group is not reproducible across engines.  So each
term is quantized ONCE (``floor(-ln(p) * 1e6 + 0.5)`` — micro-nats, a
BIGINT) and the per-document aggregate is an **exact integer sum**,
order-free by construction (the BM25 fixed-order trick, generalised to
unbounded vocabularies).  The one cross-engine float hazard left is a
sub-ulp ``ln`` divergence landing exactly on a rounding boundary
(~1e-10 probability per distinct count-triple).

Scale design (100 TB):

* Per-document bigram term frequencies aggregate FIRST (map-side combine on
  ``(doc_id, w1, w2)``), so repeated bigrams inside a document are scored
  once and weighted by ``tf`` — the token stream shuffles once, pre-reduced.
* Corpus bigram counts derive from that same ``tf`` relation (no second
  corpus scan); the join back to it is the one gram-key shuffle — the
  decontamination shape, except the model table is data-derived.
* Unigram counts and ``(T, V)`` are vocabulary-bounded aggregates joined via
  **broadcast**: the fact stream never shuffles for them.  At 100 TB the
  unigram table is still O(V) ≈ millions of rows — broadcastable; if the
  bigram table outgrows memory it stays a shuffle join (AQE decides).

The reference engine (/root/reference/script.js) has no text operators; this
extends the mandated LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table

#: Jelinek-Mercer bigram weight.  0.75 and 0.25 are exact doubles, so the
#: interpolation itself introduces no representation error.
LM_LAMBDA = 0.75


def lm_score_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document micro-nat cross-entropy under the corpus bigram LM.

    Returns (doc_id, n_scored, nll_micro, avg_nll_micro): ``n_scored``
    bigram positions, ``nll_micro`` the exact integer sum of quantized
    per-position NLLs, ``avg_nll_micro`` their exact integer division —
    per-position cross-entropy in micro-nats.  (A float average was tried
    first and hit a ROUND half-tie at sf0.1 — 47682229/14 lands exactly on
    .5 at the 6th decimal, where Spark's and DuckDB's rounding diverge —
    so every reported value stays integral.)
    """
    from ..session import spread

    # r11: spread once at the head — both the bigram-pair branch and the
    # unigram branch below do per-row explode work that otherwise runs on
    # the source's partitioning (one task off a single-file scan).
    docs = spread(docs, "doc_id")
    toks = F.split(F.col(text_col), " ")
    sz = F.size(toks)
    # Adjacent-pair structs, one per bigram position.  zip_with keeps the
    # pairing inside codegen — no posexplode self-join.
    pairs = F.zip_with(
        F.slice(toks, F.lit(1), sz - F.lit(1)),
        F.slice(toks, F.lit(2), sz - F.lit(1)),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    base = (
        docs.filter(sz >= 2)
        .select(
            "doc_id",
            (sz - F.lit(1)).cast("long").alias("n_scored"),
            F.explode(pairs).alias("p"),
        )
        .select("doc_id", "n_scored", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    # Pre-reduced per-doc term frequencies: the ONLY full-width shuffle.
    tf = base.groupBy("doc_id", "n_scored", "w1", "w2").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # Corpus model tables, derived without rescanning the corpus.
    cb = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("cb"))
    uni = (
        docs.filter(sz >= 1)
        .select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    totals = uni.agg(
        F.sum("cu").alias("t_tokens"), F.count(F.lit(1)).alias("v_size")
    )

    p = (
        F.lit(LM_LAMBDA) * F.col("cb") / F.col("cu")
        + F.lit(1.0 - LM_LAMBDA)
        * (F.col("cw") + F.lit(1))
        / (F.col("t_tokens") + F.col("v_size"))
    )
    nll_micro_term = F.floor(-F.log(p) * F.lit(1000000.0) + F.lit(0.5))

    scored = (
        tf.join(cb, ["w1", "w2"])
        .join(F.broadcast(uni), tf["w1"] == uni["w"])
        .drop("w")
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2_"), F.col("cu").alias("cw"))),
            F.col("w2") == F.col("w2_"),
        )
        .join(F.broadcast(totals))
        .withColumn("nm", nll_micro_term)
    )
    out = scored.groupBy("doc_id", "n_scored").agg(
        F.sum(F.col("tf") * F.col("nm")).alias("nll_micro")
    )
    return out.select(
        "doc_id",
        "n_scored",
        "nll_micro",
        F.expr("nll_micro div n_scored").alias("avg_nll_micro"),
    ).orderBy("doc_id")


def lm_core_ctes(src: str = "documents") -> str:
    """Shared CTE core (corpus bigram LM → per-position micro-nat NLLs)
    over any (doc_id, text) relation — reused by the per-doc perplexity
    oracle, the per-source mixture oracle, and the pretrain funnel's
    LM-filter stage so all replay the identical model."""
    return f"""toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM {src}
),
bi AS (
    SELECT doc_id, len(t) - 1 AS n_scored,
           unnest(list_transform(list_zip(t[1:len(t)-1], t[2:len(t)]),
                  s -> {{'w1': s[1], 'w2': s[2]}})) AS p
    FROM toks WHERE len(t) >= 2
),
base AS (
    SELECT doc_id, n_scored, p.w1 AS w1, p.w2 AS w2 FROM bi
),
tf AS (
    SELECT doc_id, n_scored, w1, w2, COUNT(*) AS tf
    FROM base GROUP BY doc_id, n_scored, w1, w2
),
cb AS (
    SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS cb FROM tf GROUP BY w1, w2
),
uni AS (
    SELECT unnest(t) AS w FROM toks
),
cu AS (
    SELECT w, COUNT(*) AS cu FROM uni GROUP BY w
),
totals AS (
    SELECT CAST(SUM(cu) AS BIGINT) AS t_tokens, COUNT(*) AS v_size FROM cu
),
scored AS (
    SELECT tf.doc_id, tf.n_scored, tf.tf,
           CAST(FLOOR(-ln({LM_LAMBDA} * cb / u1.cu
                          + {1.0 - LM_LAMBDA} * (u2.cu + 1)
                            / (t_tokens + v_size)) * 1000000.0 + 0.5)
                AS BIGINT) AS nm
    FROM tf
    JOIN cb USING (w1, w2)
    JOIN cu u1 ON tf.w1 = u1.w
    JOIN cu u2 ON tf.w2 = u2.w
    CROSS JOIN totals
)"""


#: The default (whole ``documents`` table) instantiation.
_LM_CORE_CTES = lm_core_ctes()

_LM_ORACLE = f"""
WITH {_LM_CORE_CTES}
SELECT doc_id, n_scored,
       CAST(SUM(tf * nm) AS BIGINT) AS nll_micro,
       CAST(CAST(SUM(tf * nm) AS BIGINT) // n_scored AS BIGINT) AS avg_nll_micro
FROM scored
GROUP BY doc_id, n_scored
ORDER BY doc_id
"""


@register("text_lm_perplexity", oracle=_LM_ORACLE)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-in corpus bigram-LM cross-entropy per document (micro-nats)."""
    return lm_score_docs(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# domain mixture weights (DoReMi-style excess loss)
# ---------------------------------------------------------------------------


def domain_mixture_weights(docs: DataFrame) -> DataFrame:
    """Per-source mixture weights proportional to EXCESS LOSS — the
    DoReMi recipe (Xie et al. 2023) reduced to its measurable core: a
    domain whose documents the reference LM finds harder than the easiest
    domain gets proportionally more sampling weight; the easiest domain
    gets zero.

    All arithmetic stays exact integers until one final division: per-doc
    NLLs are the quantized micro-nat sums from :func:`lm_score_docs`,
    per-source means use integer division (``div``), excess = mean −
    min(mean) is an integer, and weight = excess / Σ excess is the single
    double op — so the result is bit-deterministic across partitionings
    and engines (the float-sum ordering trap the per-doc scorer hit in
    round 3).

    Scale: the per-doc scorer is the cost; this adds one broadcast join
    doc→source and two O(sources) aggregates.  The source table (20 rows
    here, maybe thousands at 100 TB) is guarded-tiny for the global
    min/sum, done via a cross-joined single-row aggregate, not a window.
    """
    per_doc = lm_score_docs(docs)
    src = docs.select("doc_id", "source")
    # The O(sources) rollup forks into FOUR consumers (the floor min, the
    # excess join, the excess total, the final select); without a lineage
    # cut each fork re-executes the whole LM-scoring subtree — the first
    # plan audit showed 33 shuffles / 24 scans for what is one LM pass
    # plus tiny arithmetic.  A lazy localCheckpoint on the 20-row rollup
    # runs the expensive pipeline exactly once.
    per_src = (
        per_doc.join(F.broadcast(src), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nll_micro").alias("nll_sum"),
            F.sum("n_scored").alias("n_positions"),
        )
        .withColumn("mean_nll_micro", F.expr("nll_sum div n_positions"))
        .localCheckpoint(eager=False)
    )
    floor_tot = per_src.agg(
        F.min("mean_nll_micro").alias("floor_nll"),
    )
    with_excess = per_src.join(F.broadcast(floor_tot)).withColumn(
        "excess", F.col("mean_nll_micro") - F.col("floor_nll")
    )
    tot = with_excess.agg(F.sum("excess").alias("total_excess"))
    return (
        with_excess.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_positions",
            "mean_nll_micro",
            "excess",
            F.round(
                F.col("excess").cast("double") / F.col("total_excess"), 6
            ).alias("weight"),
        )
        .orderBy("source")
    )


_DOMAIN_MIX_ORACLE = f"""
WITH {_LM_CORE_CTES},
per_doc AS (
    SELECT doc_id, n_scored, CAST(SUM(tf * nm) AS BIGINT) AS nll_micro
    FROM scored GROUP BY doc_id, n_scored
),
per_src AS (
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(p.nll_micro) AS BIGINT) AS nll_sum,
           CAST(SUM(p.n_scored) AS BIGINT) AS n_positions
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.source
),
m AS (
    SELECT *, CAST(nll_sum // n_positions AS BIGINT) AS mean_nll_micro
    FROM per_src
),
e AS (
    SELECT *,
           mean_nll_micro - (SELECT MIN(mean_nll_micro) FROM m) AS excess
    FROM m
)
SELECT source, n_docs, n_positions, mean_nll_micro,
       CAST(excess AS BIGINT) AS excess,
       ROUND(CAST(excess AS DOUBLE) / (SELECT SUM(excess) FROM e), 6)
           AS weight
FROM e
ORDER BY source
"""


@register("docs_domain_mixture_weights", oracle=_DOMAIN_MIX_ORACLE)
def docs_domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-loss mixture weights over the 20 fixture sources under the
    shared corpus bigram LM."""
    return domain_mixture_weights(load_table(spark, sf_dir, "documents"))
