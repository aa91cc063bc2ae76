"""Distributed text classification: NB training + linear-model inference.

Two classifier-shaped operators every corpus-curation pipeline runs at
scale, both expressed as pure DataFrame plans:

* **Naive Bayes language-id** — TRAIN a multinomial NB model on the
  labeled corpus (token sufficient statistics are one groupBy — the
  canonical MapReduce ML fit), then APPLY it to a held-out split and emit
  the confusion matrix.  Where ``docs_language_confusion_matrix``
  evaluates a *fixed heuristic*, this op evaluates a *corpus-trained
  model*: the statistics it learns from are themselves a distributed
  aggregation over the training split.
* **Hashed linear scorer** — fastText-style quality classification at
  inference time: each token hashes into a weight bucket and the document
  score is the bucket-weight mean.  The weight table here is a
  deterministic function of the bucket hash (a stand-in for trained
  weights — the injection seam is the ``weight_of`` expression), which
  keeps the oracle exact while preserving the real plan shape: a
  **zero-shuffle, map-only** pass, the way a trained filter model is
  actually applied to 100 TB.

Numeric discipline: every log-probability is quantized ONCE to integer
micro-nats (``floor(-ln(p) * 1e6 + 0.5)``, the lm.py pattern) and summed
as integers, so engine summation order cannot perturb the argmin.

The reference engine (/root/reference/script.js) has no classifier
operators; this extends the mandated LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table
from .dedup import PORTABLE_HASH60_SQL, portable_hash60

#: Held-out split: every 5th document is test, the rest train.
TEST_MOD = 5

#: Laplace smoothing pseudo-count (classic add-one).
NB_ALPHA = 1


def _q_micro_nll(p):  # Column -> Column
    """Quantize a probability to integer micro-nats of NLL (lm.py rule)."""
    return F.floor(-F.log(p) * F.lit(1000000.0) + F.lit(0.5)).cast("long")


def nb_langid_confusion(docs: DataFrame) -> DataFrame:
    """Train multinomial NB on the train split, score the test split,
    return the (labeled, predicted) confusion matrix.

    Model: ``P(lang) * prod_tok P(tok|lang)^tf`` with add-one smoothing
    over the train vocabulary; prediction is the micro-nat NLL argmin
    (ties broken lang-ascending — deterministic).

    Scale design (100 TB):

    * Training IS one groupBy: per-(lang, token) term frequencies with
      map-side combine; model size is O(vocab × langs) — a broadcast
      relation, like any production fastText/NB filter model.
    * Scoring joins each test document's token counts against the
      broadcast model and integer-sums — no shuffle wider than the
      per-doc token aggregation.
    * The 1-row corpus aggregates (vocab size, split totals) ride a
      broadcast cross join, never a driver collect.
    """
    toks = docs.select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("t")
    )
    train = toks.filter(F.col("doc_id") % TEST_MOD != 0)
    test = toks.filter(F.col("doc_id") % TEST_MOD == 0)

    tf = (
        train.select("lang", F.explode("t").alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    lang_tot = tf.groupBy("lang").agg(F.sum("tf").alias("n_tok"))
    vocab = tf.agg(F.countDistinct("tok").alias("v"))
    priors = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(train.agg(F.count(F.lit(1)).alias("n_all"))))
        .select(
            "lang",
            _q_micro_nll(F.col("n_docs") / F.col("n_all")).alias("prior_q"),
        )
    )
    model = (
        tf.join(lang_tot, "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "tok",
            _q_micro_nll(
                (F.col("tf") + F.lit(NB_ALPHA))
                / (F.col("n_tok") + F.col("v") * F.lit(NB_ALPHA))
            ).alias("nll_q"),
        )
    )
    # Unseen-token NLL differs per lang (same Laplace numerator of 1).
    unseen = (
        lang_tot.crossJoin(F.broadcast(vocab))
        .select(
            F.col("lang").alias("cand_lang"),
            _q_micro_nll(
                F.lit(NB_ALPHA)
                / (F.col("n_tok") + F.col("v") * F.lit(NB_ALPHA))
            ).alias("unseen_q"),
        )
    )

    test_tf = (
        test.select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            F.explode("t").alias("tok"),
        )
        .groupBy("doc_id", "labeled_lang", "tok")
        .agg(F.count(F.lit(1)).alias("tfd"))
    )
    langs = priors.select(F.col("lang").alias("cand_lang"), "prior_q")
    scored = (
        test_tf.crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(model),
            (F.col("cand_lang") == F.col("lang"))
            & (test_tf["tok"] == model["tok"]),
            "left",
        )
        .join(F.broadcast(unseen), "cand_lang")
        .select(
            "doc_id",
            "labeled_lang",
            "cand_lang",
            "prior_q",
            (
                F.col("tfd") * F.coalesce(F.col("nll_q"), F.col("unseen_q"))
            ).alias("term"),
        )
        .groupBy("doc_id", "labeled_lang", "cand_lang", "prior_q")
        .agg(F.sum("term").alias("tok_nll"))
        .select(
            "doc_id",
            "labeled_lang",
            "cand_lang",
            (F.col("prior_q") + F.col("tok_nll")).alias("nll"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("nll").asc(), F.col("cand_lang").asc()
    )
    pred = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("labeled_lang", F.col("cand_lang").alias("predicted_lang"))
    )
    cells = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_lab = Window.partitionBy("labeled_lang")
    return (
        cells.select(
            "labeled_lang",
            "predicted_lang",
            "n",
            F.sum("n").over(w_lab).alias("n_labeled"),
            F.expr(
                "1000000 * n div sum(n) over (partition by labeled_lang)"
            ).alias("row_share_ppm"),
            (F.col("labeled_lang") == F.col("predicted_lang")).alias(
                "is_correct"
            ),
        )
        .orderBy("labeled_lang", "predicted_lang")
    )


_NB_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
),
train_tok AS (
    SELECT lang, unnest(t) AS tok FROM toks WHERE doc_id % {TEST_MOD} != 0
),
tf AS (
    SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS tf
    FROM train_tok GROUP BY lang, tok
),
lang_tot AS (
    SELECT lang, CAST(SUM(tf) AS BIGINT) AS n_tok FROM tf GROUP BY lang
),
vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM tf),
train_docs AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM toks WHERE doc_id % {TEST_MOD} != 0 GROUP BY lang
),
priors AS (
    SELECT lang,
           CAST(FLOOR(-ln(n_docs / n_all) * 1000000 + 0.5) AS BIGINT)
               AS prior_q
    FROM train_docs,
         (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM toks
          WHERE doc_id % {TEST_MOD} != 0)
),
model AS (
    SELECT f.lang, f.tok,
           CAST(FLOOR(-ln((f.tf + {NB_ALPHA})
                          / (lt.n_tok + vc.v * {NB_ALPHA}))
                      * 1000000 + 0.5) AS BIGINT) AS nll_q
    FROM tf f JOIN lang_tot lt USING (lang), vocab vc
),
unseen AS (
    SELECT lt.lang AS cand_lang,
           CAST(FLOOR(-ln({NB_ALPHA}
                          / (lt.n_tok + vc.v * {NB_ALPHA}))
                      * 1000000 + 0.5) AS BIGINT) AS unseen_q
    FROM lang_tot lt, vocab vc
),
test_tf AS (
    SELECT doc_id, lang AS labeled_lang, unnest(t) AS tok
    FROM toks WHERE doc_id % {TEST_MOD} = 0
),
test_counts AS (
    SELECT doc_id, labeled_lang, tok, CAST(COUNT(*) AS BIGINT) AS tfd
    FROM test_tf GROUP BY doc_id, labeled_lang, tok
),
scored AS (
    SELECT tc.doc_id, tc.labeled_lang, u.cand_lang,
           p.prior_q
               + CAST(SUM(tc.tfd * COALESCE(m.nll_q, u.unseen_q)) AS BIGINT)
               AS nll
    FROM test_counts tc
    CROSS JOIN unseen u
    JOIN priors p ON p.lang = u.cand_lang
    LEFT JOIN model m ON m.lang = u.cand_lang AND m.tok = tc.tok
    GROUP BY tc.doc_id, tc.labeled_lang, u.cand_lang, p.prior_q
),
pred AS (
    SELECT labeled_lang, cand_lang AS predicted_lang
    FROM (
        SELECT labeled_lang, cand_lang,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY nll ASC, cand_lang ASC) AS rk
        FROM scored
    ) WHERE rk = 1
),
cells AS (
    SELECT labeled_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY labeled_lang, predicted_lang
)
SELECT labeled_lang, predicted_lang, n,
       CAST(SUM(n) OVER (PARTITION BY labeled_lang) AS BIGINT) AS n_labeled,
       CAST(1000000 * n // SUM(n) OVER (PARTITION BY labeled_lang)
            AS BIGINT) AS row_share_ppm,
       labeled_lang = predicted_lang AS is_correct
FROM cells
ORDER BY labeled_lang, predicted_lang
"""


@register("text_nb_langid_eval", oracle=_NB_ORACLE)
def text_nb_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained multinomial NB language-id, evaluated on a held-out
    split (confusion matrix with per-label recall)."""
    return nb_langid_confusion(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# hashed linear scorer (fastText-style inference, map-only)
# ---------------------------------------------------------------------------

#: Weight buckets: hash60(token) % N_BUCKETS, weights centered on zero.
N_WEIGHT_BUCKETS = 2001


def weight_of(tok):  # Column -> Column
    """Deterministic bucket weight in [-1000, 1000] for a token.

    Stands in for a trained model's hash-bucketed weight table: swap this
    expression for a lookup against a broadcast weights relation and the
    plan shape is unchanged."""
    return portable_hash60(tok) % F.lit(N_WEIGHT_BUCKETS) - F.lit(
        (N_WEIGHT_BUCKETS - 1) // 2
    )


def linear_quality_scores(docs: DataFrame) -> DataFrame:
    """Per-document hashed-linear-model score and keep decision.

    The entire computation is a single projection — ``aggregate`` over
    the token array inside whole-stage codegen.  **Zero shuffles, zero
    Python**: this is the plan a trained quality filter should compile to
    when applied to 100 TB (embarrassingly parallel over input splits;
    the only cost is the scan itself).

    Returns (doc_id, n_tokens, score_sum, keep) with integer arithmetic
    throughout.  ``keep`` is the mean-weight sign test, decided on the
    integer SUM (n_tokens > 0, so mean > 0 ⟺ sum > 0) — no division at
    all, sidestepping the Spark-truncates / DuckDB-floors divergence on
    negative integer division.
    """
    toks = F.split(F.col("text"), " ")
    score = F.aggregate(
        F.transform(toks, weight_of),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        score.alias("score_sum"),
        (score > 0).alias("keep"),
    ).orderBy("doc_id")


_LINEAR_ORACLE = f"""
WITH scored AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(list_sum(list_transform(
               string_split(text, ' '),
               tok -> {PORTABLE_HASH60_SQL.format(s='tok')}
                      % {N_WEIGHT_BUCKETS} - {(N_WEIGHT_BUCKETS - 1) // 2}
           )) AS BIGINT) AS score_sum
    FROM documents
)
SELECT doc_id, n_tokens, score_sum, score_sum > 0 AS keep
FROM scored
ORDER BY doc_id
"""


@register("docs_quality_linear_classifier", oracle=_LINEAR_ORACLE)
def docs_quality_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear quality scoring, map-only inference."""
    return linear_quality_scores(load_table(spark, sf_dir, "documents"))
