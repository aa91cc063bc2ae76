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
from trafsys_data_transfer_spark.sources.fixtures import load_table


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


def test_chunk_manifest_spans_reassemble_documents(spark, sf_dir):
    from trafsys_data_transfer_spark.operators.packing import (
        CHUNK_TOKENS,
        docs_chunk_manifest,
    )

    m = docs_chunk_manifest(spark, sf_dir)
    rows = m.collect()
    # per-document: slice lengths sum to the doc's token count and starts
    # are contiguous (each chunk picks up exactly where the previous ended)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split(F.col("text"), " ")).alias("n")
        ).collect()
    }
    for doc_id, parts in per_doc.items():
        parts.sort(key=lambda r: r["chunk_id"])
        assert sum(p["n_tok"] for p in parts) == n_tokens[doc_id]
        pos = parts[0]["doc_tok_start"]
        assert pos == 0  # a doc's first covered token is its token 0
        for p in parts:
            assert p["doc_tok_start"] == pos
            pos += p["n_tok"]
    # per-chunk: every chunk except the last is exactly full
    per_chunk = {}
    for r in rows:
        per_chunk[r["chunk_id"]] = per_chunk.get(r["chunk_id"], 0) + r["n_tok"]
    last = max(per_chunk)
    for cid, tot in per_chunk.items():
        assert tot == CHUNK_TOKENS or cid == last


def test_overlap_chunks_cover_every_token_with_stride_overlap(spark, sf_dir):
    from trafsys_data_transfer_spark.operators.packing import (
        RAG_STRIDE,
        RAG_WINDOW,
        docs_overlap_chunks,
    )

    rows = docs_overlap_chunks(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split(F.col("text"), " ")).alias("n")
        ).collect()
    }
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert set(per_doc) == set(n_tokens)
    for doc_id, parts in per_doc.items():
        parts.sort(key=lambda r: r["chunk_idx"])
        n = n_tokens[doc_id]
        # starts advance by exactly the stride, first at 0
        assert [p["tok_start"] for p in parts] == [
            i * RAG_STRIDE for i in range(len(parts))
        ]
        # last chunk reaches the end; none overruns; all non-empty
        last = parts[-1]
        assert last["tok_start"] + last["n_tok"] == n
        for p in parts:
            assert 1 <= p["n_tok"] <= RAG_WINDOW
            assert p["tok_start"] + p["n_tok"] <= n
        # full coverage: next chunk starts inside (or at end of) the
        # previous chunk's window
        for a, b in zip(parts, parts[1:]):
            assert b["tok_start"] <= a["tok_start"] + a["n_tok"]
