"""Multi-format landing reader: round-trips, FAILFAST, quarantine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from trafsys_data_transfer_spark.plans.traffic_queries import traffic_raw_from_events
from trafsys_data_transfer_spark.schemas import TRAFFIC_RAW_SCHEMA
from trafsys_data_transfer_spark.sources.fixtures import load_table
from trafsys_data_transfer_spark.sources.formats import (
    read_landed_any,
    read_landed_quarantine,
)


@pytest.fixture(scope="module")
def raw(spark, sf_dir):
    return traffic_raw_from_events(load_table(spark, sf_dir, "events"))


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["json", "csv", "parquet", "orc"])
def test_roundtrip_every_format(spark, raw, tmp_path, fmt):
    path = str(tmp_path / fmt)
    raw.write.format(fmt).option("header", "true").save(path)
    back = read_landed_any(spark, path, TRAFFIC_RAW_SCHEMA, fmt=fmt)
    assert back.schema == TRAFFIC_RAW_SCHEMA
    assert _sorted_rows(back) == _sorted_rows(raw)


def test_unsupported_format_rejected(spark):
    with pytest.raises(ValueError, match="unsupported"):
        read_landed_any(spark, "/nonexistent", TRAFFIC_RAW_SCHEMA, fmt="avro")
    with pytest.raises(ValueError, match="text format"):
        read_landed_quarantine(spark, "/nonexistent", TRAFFIC_RAW_SCHEMA, fmt="parquet")


def test_csv_quarantine_splits_bad_rows(spark, raw, tmp_path):
    path = str(tmp_path / "csvq")
    raw.limit(10).write.format("csv").option("header", "true").save(path)
    # Corrupt drop: wrong arity / non-numeric counts.
    bad = tmp_path / "csvq" / "bad-part.csv"
    bad.write_text(
        "SiteCode,Location,IsInternal,PeriodEnding,Ins,Outs\n"
        "S1,lobby,false,2024-01-01T10:00:00,notanumber,7\n"
        "S2,door\n"
    )
    clean, corrupt = read_landed_quarantine(
        spark, path, TRAFFIC_RAW_SCHEMA, fmt="csv"
    )
    assert clean.count() == 10
    assert corrupt.count() == 2
    assert {r["_corrupt_record"] is not None for r in corrupt.collect()} == {True}


def test_json_quarantine_matches_existing_contract(spark, raw, tmp_path):
    path = str(tmp_path / "jsonq")
    raw.limit(5).write.format("json").save(path)
    (tmp_path / "jsonq" / "bad-part.json").write_text('{"SiteCode": [1,2,\n')
    clean, corrupt = read_landed_quarantine(spark, path, TRAFFIC_RAW_SCHEMA, fmt="json")
    assert clean.count() == 5
    assert corrupt.count() == 1


def test_jsonl_ingest_quality_splits_exactly(spark):
    """Planted truncation: every doc_id % 50 == 0 doc contributes exactly
    one quarantined line; clean counts match the source table; no corrupt
    line leaks into the clean side (VERDICT r09 task 8 discipline row)."""
    import tempfile as _tf

    from trafsys_data_transfer_spark.registry import all_queries

    rows = [
        (
            i,
            f'text "with quotes" and \\ backslash {i}',
            "en",
            f"src{i % 3}",
            30,
        )
        for i in range(100)
    ]
    d = _tf.mkdtemp(prefix="t_jsonl_")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {
        r.source: r
        for r in all_queries()["docs_jsonl_ingest_quality"]
        .build(spark, d)
        .collect()
    }
    # sources: src0 gets ids 0,3,...  -> 34; src1 33; src2 33
    assert {s: r.n_good for s, r in out.items()} == {
        "src0": 34,
        "src1": 33,
        "src2": 33,
    }
    # corrupt: ids 0 and 50 -> 2, same on every row
    assert {r.n_corrupt_global for r in out.values()} == {2}
