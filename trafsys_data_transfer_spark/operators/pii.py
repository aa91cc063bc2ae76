"""PII detection / redaction over the ``documents`` table (north star
§2.10) — the curation stage every public-web training pipeline runs
before release: find emails / phone numbers / IPv4 addresses, count them
per document, and emit redacted text.

Spark shape: one narrow pass of builtin ``regexp_count`` /
``regexp_replace`` expressions — whole-stage codegen, zero shuffle, zero
Python; at 100 TB this is scan-bound exactly like the quality/lang-ID
passes.  Patterns use the conservative regex subset that Java
(``java.util.regex``) and RE2 (the DuckDB oracle) interpret identically:
character classes, bounded quantifiers, ``\\b`` anchors, non-capturing
groups — no lookaround, no backreferences.

The fixture corpus contains no real PII, so the registered query plants
deterministic pseudo-PII derived from ``doc_id`` (same derivation in the
Spark builder and the oracle SQL, the ``traffic_raw_from_events``
convention) — the scrub is then hash-checked against the planted truth.

Reference basis: the reference engine (``/root/reference/script.js``) has
no text operators; this extends the mandated north-star surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table

#: (name, pattern, replacement token).  Order matters and is part of the
#: contract: earlier redactions run first and later patterns see their
#: tokens (none of these tokens can match a later pattern).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
)


def pii_counts(col: Column) -> list[Column]:
    """One ``regexp_count`` per pattern — narrow, codegen'd."""
    return [
        F.regexp_count(col, F.lit(pat)).cast("bigint").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def redact(col: Column) -> Column:
    """Sequential redaction in PII_PATTERNS order."""
    out = col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def scrub_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII profile + redacted-text digest.

    The digest (md5 of the redacted text) rather than the text itself
    keeps the output narrow for auditing/oracle comparison; production
    writes the redacted column back to the corpus table instead.
    """
    c = F.col(text_col)
    return df.select(
        "doc_id",
        *pii_counts(c),
        F.md5(redact(c)).alias("clean_md5"),
    )


#: Deterministic pseudo-PII planting (builder + oracle must agree).
def _plant_dirty_text(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    dirty = F.concat(
        F.col("text"),
        F.when(
            d % 5 == 0,
            F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(
            d % 7 == 0,
            F.concat(F.lit(" call 555-"), F.lpad((d % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            d % 3 == 0,
            F.concat(F.lit(" from 10."), (d % 256).cast("string"), F.lit(".0.1")),
        ).otherwise(F.lit("")),
    )
    return docs.select("doc_id", dirty.alias("text"))


@register(
    "text_pii_scrub",
    oracle=r"""
    WITH dirty AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 5 = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                       ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                       THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END
               || CASE WHEN doc_id % 3 = 0
                       THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
                       ELSE '' END AS text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(text, '\b[0-9]{3}-[0-9]{4}\b')) AS BIGINT) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
               '\b[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g')) AS clean_md5
    FROM dirty
    ORDER BY doc_id
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus with planted pseudo-PII: per-doc
    email/IP/phone counts plus the md5 of the fully redacted text — a
    hash mismatch catches a single missed or mangled redaction anywhere
    in the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return scrub_documents(_plant_dirty_text(docs)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity audit
# ---------------------------------------------------------------------------

#: Privacy thresholds for the release audit: a quasi-identifier group is
#: re-identifiable below K occupants, and attribute-disclosable below L
#: distinct sensitive values (Sweeney 2002; Machanavajjhala 2007).
K_ANONYMITY = 5
L_DIVERSITY = 3


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = K_ANONYMITY,
    l: int = L_DIVERSITY,
) -> DataFrame:
    """Per-QI-group privacy audit: group size (k-anonymity) and distinct
    sensitive values (l-diversity) for every quasi-identifier combination.

    The pre-release check a training-data pipeline runs before publishing
    any per-user aggregate: a group smaller than ``k`` re-identifies its
    members by QI alone; a group whose sensitive attribute takes fewer
    than ``l`` values discloses that attribute even without
    re-identification.

    Scale: one shuffle on the QI key with map-side partial aggregation;
    the sensitive-distinct count rides the same exchange (Spark plans the
    count-distinct as a two-phase expand over the already-partitioned
    groups).  No windows, no collects — O(groups) output."""
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).alias("group_n"),
            F.countDistinct(sensitive_col).alias("l_distinct"),
        )
        .select(
            *qi_cols,
            "group_n",
            (F.col("group_n") >= k).alias("k_anonymous"),
            "l_distinct",
            (F.col("l_distinct") >= l).alias("l_diverse"),
        )
    )


@register(
    "customers_k_anonymity",
    oracle=f"""
    WITH banded AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band
        FROM customer
    )
    SELECT c_nationkey, c_mktsegment,
           COUNT(*) AS group_n,
           COUNT(*) >= {K_ANONYMITY} AS k_anonymous,
           CAST(COUNT(DISTINCT bal_band) AS BIGINT) AS l_distinct,
           COUNT(DISTINCT bal_band) >= {L_DIVERSITY} AS l_diverse
    FROM banded
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def customers_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of the customer table: QI =
    (nation, market segment), sensitive attribute = the account-balance
    band (floor(acctbal/1000) — a VALUE band, not a rank decile, so the
    banding is a narrow per-row expression with no global sort at any
    scale)."""
    cust = load_table(spark, sf_dir, "customer")
    banded = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    return k_anonymity_audit(
        banded, ["c_nationkey", "c_mktsegment"], "bal_band"
    )


# ---------------------------------------------------------------------------
# Luhn checksum audit (payment-card-number detection with validation)
# ---------------------------------------------------------------------------

#: A known Luhn-valid PAN-shaped literal (standard test number) planted
#: so the fixture always contains at least one VALID candidate.
LUHN_VALID_SAMPLE = "4532015112830366"


def _plant_card_numbers(docs: DataFrame) -> DataFrame:
    """Deterministic card-shaped digit strings: every 7th document gets a
    pseudo-random 16-digit candidate (Luhn-valid ~10% of the time), every
    11th the known-valid test PAN — so both verdicts always occur."""
    d = F.col("doc_id")
    dirty = F.concat(
        F.col("text"),
        F.when(
            d % 7 == 0,
            F.concat(
                F.lit(" card "),
                F.lpad(((d * 48271) % F.lit(10**16)).cast("string"), 16, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 11 == 0, F.concat(F.lit(" pay "), F.lit(LUHN_VALID_SAMPLE))
        ).otherwise(F.lit("")),
    )
    return docs.select("doc_id", dirty.alias("text"))


def luhn_valid(cand: Column) -> Column:
    """Luhn (mod-10) checksum over a 16-digit string, as a pure integer
    expression: from the right, every second digit doubles (minus 9 when
    the double exceeds 9); valid iff the total is ≡ 0 (mod 10).

    Regex finds card-SHAPED strings; the checksum separates real PANs
    from phone numbers / order ids with 16 digits — the precision step
    that keeps a corpus-wide PII scrub from redacting half the numeric
    tokens at 100 TB.  Zero shuffle, zero Python: ``aggregate`` over a
    16-element digit array inside codegen."""
    total = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda p: F.when(
                (F.lit(17) - p) % 2 == 0,
                F.when(
                    (F.ascii(F.substring(cand, p, F.lit(1))) - 48) * 2 > 9,
                    (F.ascii(F.substring(cand, p, F.lit(1))) - 48) * 2 - 9,
                ).otherwise(
                    (F.ascii(F.substring(cand, p, F.lit(1))) - 48) * 2
                ),
            ).otherwise(F.ascii(F.substring(cand, p, F.lit(1))) - 48),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return total % 10 == 0


def luhn_audit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All 16-digit candidates in the corpus with their Luhn verdict:
    (doc_id, candidate, is_luhn_valid), one row per occurrence."""
    cands = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(r"\b[0-9]{16}\b"), idx=0
            )
        ).alias("candidate"),
    )
    return cands.select(
        "doc_id",
        "candidate",
        luhn_valid(F.col("candidate")).alias("is_luhn_valid"),
    ).orderBy("doc_id", "candidate")


_LUHN_ORACLE = rf"""
WITH dirty AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 7 = 0
                   THEN ' card ' || lpad(CAST((doc_id * 48271) %
                        10000000000000000 AS VARCHAR), 16, '0')
                   ELSE '' END
           || CASE WHEN doc_id % 11 = 0
                   THEN ' pay {LUHN_VALID_SAMPLE}'
                   ELSE '' END AS text
    FROM documents
),
cands AS (
    SELECT doc_id,
           unnest(regexp_extract_all(text, '\b[0-9]{{16}}\b')) AS candidate
    FROM dirty
)
SELECT doc_id, candidate,
       CAST(list_sum(list_transform(
           generate_series(1, 16),
           p -> CASE WHEN (17 - p) % 2 = 0
                     THEN CASE WHEN (ascii(substr(candidate, CAST(p AS INT), 1)) - 48) * 2 > 9
                               THEN (ascii(substr(candidate, CAST(p AS INT), 1)) - 48) * 2 - 9
                               ELSE (ascii(substr(candidate, CAST(p AS INT), 1)) - 48) * 2 END
                     ELSE ascii(substr(candidate, CAST(p AS INT), 1)) - 48 END
       )) AS BIGINT) % 10 = 0 AS is_luhn_valid
FROM cands
ORDER BY doc_id, candidate
"""


@register("pii_luhn_audit", oracle=_LUHN_ORACLE)
def pii_luhn_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-validated card-number detection over planted candidates."""
    docs = load_table(spark, sf_dir, "documents")
    return luhn_audit(_plant_card_numbers(docs))
