"""PII scrub semantics on constructed documents with known PII."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.pii import redact, scrub_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts_and_redaction_known_values(spark):
    docs = _docs(
        spark,
        [
            (1, "mail a.b+c@ex-a.co.uk and d@e.io, ip 192.168.0.1, call 555-0199"),
            (2, "clean text with numbers 12345 and 1.5 and a dash 12-34"),
            (3, "two ips 10.0.0.1 8.8.8.8"),
        ],
    )
    rows = {r["doc_id"]: r for r in scrub_documents(docs).collect()}
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_phone"]) == (2, 1, 1)
    assert (rows[2]["n_email"], rows[2]["n_ipv4"], rows[2]["n_phone"]) == (0, 0, 0)
    assert (rows[3]["n_email"], rows[3]["n_ipv4"], rows[3]["n_phone"]) == (0, 2, 0)


def test_redacted_text_content(spark):
    docs = _docs(spark, [(1, "write x@y.org from 10.0.0.7 or 555-1234")])
    got = docs.select(redact(F.col("text")).alias("t")).collect()[0]["t"]
    assert got == "write <EMAIL> from <IP> or <PHONE>"


def test_clean_doc_digest_unchanged(spark):
    """Redaction must be the identity on PII-free text — the digest equals
    the raw md5, so the scrub can run over the whole corpus safely."""
    docs = _docs(spark, [(1, "perfectly ordinary sentence")])
    out = scrub_documents(docs).collect()[0]
    want = docs.select(F.md5("text").alias("m")).collect()[0]["m"]
    assert out["clean_md5"] == want


def test_redaction_is_idempotent(spark):
    """redact(redact(x)) == redact(x): no replacement token can match a
    later (or earlier) pattern, so a double-scrubbed corpus is unchanged —
    the property that makes re-running the scrub safe in a pipeline."""
    import random

    rng = random.Random(11)
    frags = [
        "plain words", "a@b.io", "10.1.2.3", "555-0100", "x.y+z@mail.example.com",
        "1.2.3.4.5", "999-99999", "trailing@dot.", "<EMAIL>", "<IP>", "<PHONE>",
    ]
    rows = [
        (i, " ".join(rng.choice(frags) for _ in range(rng.randint(1, 8))))
        for i in range(200)
    ]
    docs = _docs(spark, rows)
    once = docs.select("doc_id", redact(F.col("text")).alias("t"))
    twice = once.select("doc_id", redact(F.col("t")).alias("t"))
    assert once.collect() == twice.collect()


def test_plan_is_narrow_codegen(spark):
    """The scrub is a scan-bound projection: no exchange, no Python eval."""
    docs = _docs(spark, [(1, "a@b.co")])
    plan = scrub_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
