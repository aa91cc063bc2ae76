"""Sequence-packing prefix sum: correctness and distribution invariance.

The load-bearing property: the two-phase distributed prefix sum must be
*bit-identical* to the sequential cumulative sum, for every bucket count
— bucket boundaries are an implementation detail that may never leak
into offsets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.packing import pack_offsets


def _docs(spark, lengths, start_id=0, id_step=1):
    rows = [(start_id + i * id_step, n) for i, n in enumerate(lengths)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def _sequential(lengths, ids, chunk):
    out, off = {}, 0
    for i, n in sorted(zip(ids, lengths)):
        out[i] = (n, off, off // chunk, (off + n - 1) // chunk)
        off += n
    return out


@pytest.mark.parametrize("n_buckets", [1, 3, 7, 32])
def test_pack_offsets_match_sequential_cumsum_any_bucketing(spark, n_buckets):
    lengths = [5, 100, 1, 512, 511, 2, 513, 64, 64, 64]
    df = _docs(spark, lengths)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["start_off"],
            r["first_chunk"],
            r["last_chunk"],
        )
        for r in pack_offsets(df, chunk_tokens=512, n_buckets=n_buckets).collect()
    }
    assert got == _sequential(lengths, range(10), 512)


def test_pack_offsets_sparse_noncontiguous_keys(spark):
    """Bucketing is key-range-based; gaps and offsets in the id space must
    not disturb the stream order or the offsets."""
    lengths = [10, 20, 30, 40]
    df = _docs(spark, lengths, start_id=1000, id_step=37)
    ids = [1000 + 37 * i for i in range(4)]
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_off"], r["first_chunk"], r["last_chunk"])
        for r in pack_offsets(df, chunk_tokens=16, n_buckets=3).collect()
    }
    assert got == _sequential(lengths, ids, 16)


def test_pack_chunk_boundaries(spark):
    """A doc starting exactly on a chunk boundary occupies only its own
    chunk; a doc straddling one spans both."""
    df = _docs(spark, [512, 512, 100, 500])
    rows = {r["doc_id"]: r for r in pack_offsets(df, chunk_tokens=512).collect()}
    assert (rows[0]["first_chunk"], rows[0]["last_chunk"]) == (0, 0)
    assert (rows[1]["first_chunk"], rows[1]["last_chunk"]) == (1, 1)
    assert (rows[2]["first_chunk"], rows[2]["last_chunk"]) == (2, 2)
    # doc 3: [1124, 1624) → chunks 2..3
    assert (rows[3]["first_chunk"], rows[3]["last_chunk"]) == (2, 3)


def test_pack_offsets_total_stream_length(spark):
    df = _docs(spark, [7, 11, 13])
    out = pack_offsets(df).orderBy("doc_id").collect()
    assert out[-1]["start_off"] + out[-1]["n_tokens"] == 7 + 11 + 13


def test_pack_plan_has_no_global_window(spark):
    """The whole point: no single-partition exchange anywhere in the plan
    (the naive global window would show 'Exchange SinglePartition')."""
    df = _docs(spark, list(range(1, 40)))
    plan = (
        pack_offsets(df, n_buckets=8)._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
