"""Deterministic sampling & splitting for training-data pipelines.

``df.sample``/``randomSplit`` are seed-dependent **and partitioning-
dependent** — the same row can land in different splits when the file
layout changes, which silently leaks test data into training sets across
pipeline re-runs.  The production-safe form is *content-hash bucketing*:
a row's split is a pure function of its key, stable across runs, engines,
partitionings, and cluster sizes.

The bucket is the first 8 hex chars of ``md5(key)`` compared as a string
threshold — md5 is bit-identical in every engine (unlike xxhash64 seeds or
``rand()``), which is what makes these operators oracle-checkable and,
operationally, what makes a split reproducible years later.

All operators are narrow (no shuffle): split assignment is a per-row
projection; at 100 TB that is the difference between a sampling pass and a
sampling *job*.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table

#: 16^8 hex space; a fraction f maps to the threshold hex string.
_HEX_SPACE = 16**8


def _hex_threshold(frac: float) -> str:
    """Hex threshold string for a keep-fraction, safe at the boundaries.

    ``frac >= 1.0`` must keep EVERY row.  ``format(16**8, "08x")`` would be
    the nine-char string ``'100000000'``, which compares lexicographically
    *below* any 8-char hash starting with '1'..'f' — silently keeping only
    ~6.25% of rows.  Instead return ``'g'``: every 8-hex-char bucket starts
    with '0'..'f' < 'g', so ``bucket < 'g'`` is uniformly true, in Spark and
    DuckDB alike (both compare strings bytewise).
    """
    if frac >= 1.0:
        return "g"
    if frac <= 0.0:
        return "00000000"
    return format(int(frac * _HEX_SPACE), "08x")


def hash_bucket(key: Column) -> Column:
    """Stable 8-hex-char bucket for a key column (uniform over [0, 16^8))."""
    return F.substring(F.md5(key.cast("string")), 1, 8)


def split_column(key: Column, train_frac: float = 0.8) -> Column:
    """'train' / 'test' assignment as a pure function of the key."""
    return F.when(
        hash_bucket(key) < F.lit(_hex_threshold(train_frac)), F.lit("train")
    ).otherwise(F.lit("test"))


def deterministic_sample(df: DataFrame, key: Column, frac: float) -> DataFrame:
    """Keep ~frac of rows, chosen by key hash — the same rows every run."""
    if frac >= 1.0:
        return df  # keep-all: no filter, no hash evaluation
    return df.filter(hash_bucket(key) < F.lit(_hex_threshold(frac)))


def stratified_sample(
    df: DataFrame, key: Column, stratum: Column, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` without the seed
    fragility): each stratum value gets its own hash threshold."""
    thr = None
    for value, frac in fractions.items():
        branch = (stratum == value, F.lit(_hex_threshold(frac)))
        thr = F.when(*branch) if thr is None else thr.when(*branch)
    thr = thr.otherwise(F.lit("00000000"))  # unlisted strata: drop
    return df.filter(hash_bucket(key) < thr)


@register(
    "split_train_test",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_hex_threshold(0.8)}'
                THEN 'train' ELSE 'test' END AS split
    FROM documents
    ORDER BY doc_id
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 content-hash train/test split of the documents corpus —
    reproducible across engines and partitionings (same md5, same split)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", split_column(F.col("doc_id"), 0.8).alias("split")
    ).orderBy("doc_id")


@register(
    "stratified_event_sample",
    oracle=f"""
    SELECT event_id, event_type
    FROM events
    WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 8) <
          CASE event_type
               WHEN 'view' THEN '{_hex_threshold(0.1)}'
               WHEN 'click' THEN '{_hex_threshold(0.5)}'
               ELSE '{_hex_threshold(1.0)}'
          END
    ORDER BY event_id
    """,
)
def stratified_event_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling: keep 10% of views, 50% of clicks, all rare
    events — the class-rebalancing pass of a training pipeline, as a
    narrow deterministic filter."""
    events = load_table(spark, sf_dir, "events")
    return (
        stratified_sample(
            events,
            key=F.col("event_id"),
            stratum=F.col("event_type"),
            fractions={
                "view": 0.1,
                "click": 0.5,
                "signup": 1.0,
                "purchase": 1.0,
                "error": 1.0,
            },
        )
        .select("event_id", "event_type")
        .orderBy("event_id")
    )
