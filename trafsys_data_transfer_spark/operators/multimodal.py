"""Multimodal columns: binary payloads + typed metadata (north star §2.10).

Model: media lives in opaque ``BinaryType`` columns next to typed metadata
(media_type, byte_length, digest); decode / feature-extract / frame-sample
run as Arrow-batched Pandas UDFs over ``mapInPandas`` so bytes cross the
JVM↔Python boundary in columnar batches, never row-at-a-time.

The actual image/audio codecs are not in this container, so the decode
step is STUBBED: :func:`decode_media` raises ``NotImplementedError`` unless
a real decoder is injected, and the pipeline demos use a deterministic fake
decoder.  Everything Spark-side — schema, partitioning, UDF signatures,
batch shapes — is real and oracle-tested.

Scale posture: payload columns make parquet row groups large — keep
``spark.sql.files.maxPartitionBytes`` at default 128 MB so a partition is
a bounded number of payloads, and push projections so metadata-only
queries never deserialize bytes (columnar pruning does this for free).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table

#: Media types cycled deterministically over the fixture corpus.
MEDIA_TYPES = ("image/png", "audio/wav", "video/mp4")

META_SCHEMA = (
    "doc_id long, media_type string, byte_length long, content_md5 string, "
    "fake_width int, fake_height int"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string, frame_bytes long"

FEATURE_SCHEMA = "doc_id long, feature array<float>"


def multimodal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture-derived multimodal table: text bytes as the opaque payload
    (stand-in for real media), media_type from doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
        ).alias("media_type"),
    )


def decode_media(payload: bytes, media_type: str):
    """Decode stub — the real implementation needs PIL/ffmpeg/soundfile,
    which this environment doesn't ship.  Kept as the single injection
    point so a production deployment swaps in real codecs without touching
    the Spark plumbing."""
    raise NotImplementedError(
        f"no decoder available for {media_type}; install codecs and inject"
    )


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per-payload metadata, vectorised per batch."""
    for pdf in batches:
        lengths = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "byte_length": lengths,
                "content_md5": pdf["payload"].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
                "fake_width": (lengths % 640).astype("int32"),
                "fake_height": (lengths * 7 % 480).astype("int32"),
            }
        )


def extract_metadata(mm: DataFrame) -> DataFrame:
    """Payload → typed metadata via Arrow-batched mapInPandas."""
    return mm.mapInPandas(_meta_batches, schema=META_SCHEMA)


def _frame_batches(n_frames: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_md5": [], "frame_bytes": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    chunk = b[i * step : (i + 1) * step] if i < n_frames - 1 else b[(n_frames - 1) * step :]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
                    out["frame_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return gen


def frame_sample(mm: DataFrame, n_frames: int = 4) -> DataFrame:
    """'Video' frame sampling: 1 payload row → n_frames rows (row-expanding
    mapInPandas — the shape a real keyframe sampler has)."""
    return mm.mapInPandas(_frame_batches(n_frames), schema=FRAME_SCHEMA)


def _feature_batches(dim: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                # Deterministic fake embedding: md5-seeded, unit-normalised —
                # stands in for a real vision/audio encoder.
                seed = int.from_bytes(hashlib.md5(b).digest()[:8], "big")
                rng = np.random.default_rng(seed)
                v = rng.standard_normal(dim).astype("float32")
                feats.append((v / np.linalg.norm(v)).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return gen


def extract_features(mm: DataFrame, dim: int = 64) -> DataFrame:
    """Payload → fake embedding (deterministic stand-in for a real encoder);
    output feeds straight into the similarity operators."""
    return mm.mapInPandas(_feature_batches(dim), schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


@register(
    "multimodal_meta",
    oracle=f"""
    SELECT doc_id,
           ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_length,
           md5(text) AS content_md5,
           CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
           CAST(octet_length(encode(text)) * 7 % 480 AS INT) AS fake_height
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → typed metadata through the Pandas-UDF path; the
    oracle recomputes the same facts SQL-side, proving the Arrow batch
    plumbing (schema, types, values) end to end."""
    return extract_metadata(multimodal_table(spark, sf_dir))


@register(
    "multimodal_frame_sample",
    oracle="""
    -- fixture text is ASCII, so VARCHAR substrings slice the same bytes the
    -- Pandas UDF slices (DuckDB has no BLOB substring)
    WITH f AS (
        SELECT doc_id, text AS b, length(text) AS n,
               greatest(length(text) // 4, 1) AS step
        FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           md5(CASE WHEN i < 3 THEN substring(b, i*step + 1, step)
                    ELSE substring(b, 3*step + 1, greatest(n - 3*step, 0)) END) AS frame_md5,
           CAST(CASE WHEN i < 3 THEN least(step, greatest(n - i*step, 0))
                     ELSE greatest(n - 3*step, 0) END AS BIGINT) AS frame_bytes
    FROM f, UNNEST([0, 1, 2, 3]) AS t(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding frame sampler (4 'frames' per payload) through
    mapInPandas, oracle-checked byte-for-byte via md5 per chunk."""
    return frame_sample(multimodal_table(spark, sf_dir), n_frames=4)


@register("multimodal_features")  # rows-only: fake encoder isn't ANSI-SQL
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload → deterministic fake embedding (the real encoder slot);
    demonstrates the binary→vector bridge into the similarity stack."""
    return extract_features(multimodal_table(spark, sf_dir))


def read_media_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Ingest a directory of raw media files as a multimodal table via
    Spark's ``binaryFile`` source: one row per file with (path, length,
    modificationTime, content).  The natural on-ramp from an object-store
    media dump into the payload/metadata model above — pair with
    :func:`extract_metadata` / :func:`extract_features` downstream.

    At scale: ``binaryFile`` splits by file, so millions of small media
    files want a compaction pass (this table written back as parquet with
    the payload column) before repeated processing."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        F.col("path"),
        F.col("length").alias("byte_length"),
        F.col("content").alias("payload"),
        F.element_at(F.split(F.col("path"), "\\."), -1).alias("extension"),
    )
