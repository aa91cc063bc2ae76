

def test_vocab_drift_flags_planted_half_exclusive_term(spark):
    """A term exclusive to half A must get a strongly positive log-odds,
    a balanced term ~0, and counts must be exact."""
    import tempfile as _tf

    from trafsys_data_transfer_spark.registry import all_queries

    rows = []
    for i in range(40):
        # balanced filler in every doc; "driftword" only in even docs
        text = "common filler words here " * 3
        if i % 2 == 0:
            text += "driftword " * 5
        rows.append((i, text.strip(), "en", "src", len(text)))
    d = _tf.mkdtemp(prefix="t_vdrift_")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {
        r.term: r
        for r in all_queries()["text_vocab_drift"].build(spark, d).collect()
    }
    drift = out["driftword"]
    assert drift.cnt_a == 100 and drift.cnt_b == 0
    assert drift.log_odds > 3.0
    bal = out["common"]
    assert bal.cnt_a == bal.cnt_b == 60
    # equal counts but unequal half sizes: expected log-odds is exactly
    # ln((cnt+1)(Nb+V) / (cnt+1)(Na+V)) with Na=340, Nb=240, V=5
    import math

    assert bal.log_odds == round(math.log((61 * 245) / (61 * 345.0)), 6)
