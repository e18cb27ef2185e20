"""Multimodal columns (SURVEY.md §2.10 X5): text + vector modalities
joined on id, and binary-payload plumbing for image/audio-style data.

The reference is scalar-columns-only (music_db.sql:6-110 — verified
absence of any blob/array column), so X5 exists for the LLM-pipeline
north star: a training-data row at 100 TB is (text, embedding, media
bytes, typed metadata) and the engine must move those through joins,
filters and Python feature extractors without ever shuffling payloads
it doesn't need.

Design notes for scale:
* ``x_doc_join`` projects ONLY the scalar stats it outputs — column
  pruning keeps the 256-byte embedding and the document body out of the
  shuffle entirely (ReadSchema in .explain shows the pruned scan).
* The binary path treats media as an opaque ``binary`` column with a
  typed metadata struct alongside. The decode/feature step is an
  Arrow-batched ``mapInPandas`` — the sanctioned Python slow path —
  sized by Arrow batch, not per-row. Real image/audio codecs are not in
  this container, so the decoder is a clearly-marked deterministic
  stand-in (byte-level stats) with the Spark-side plumbing (schema,
  batching, partitioning) fully real.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.relational import _t
from ..registry import register


@register(
    "x_doc_join",
    tags=("EXT", "X5", "J1"),
    oracle="""
        SELECT lang, label,
               COUNT(*) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(len(embedding)) AS BIGINT) AS total_dims
        FROM documents JOIN embeddings ON doc_id = vec_id
        GROUP BY lang, label ORDER BY lang, label
    """,
)
def x_doc_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text modality ⋈ vector modality on doc_id = vec_id, summarized per
    (lang, label). Both tables share the id space (TESTDATA fixtures), so
    this is the canonical multimodal-row assembly join."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum(F.size("embedding")).cast("bigint").alias("total_dims"),
        )
        .orderBy("lang", "label")
    )


def decode_media(payload: bytes) -> dict:
    """Stand-in media decoder. A real deployment would decode image/audio
    bytes here (PIL / soundfile are not installed in this container); this
    deterministic byte-stats fake keeps the distributed plumbing testable.
    Marked stub per the build contract."""
    if payload is None or len(payload) == 0:
        return {"n_bytes": 0, "mean_byte": 0.0, "max_byte": 0}
    return {
        "n_bytes": len(payload),
        "mean_byte": float(sum(payload)) / len(payload),
        "max_byte": int(max(payload)),
    }


def _media_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over the opaque binary column."""
    for pdf in batches:
        feats = [decode_media(p) for p in pdf["media"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [f["n_bytes"] for f in feats],
                "mean_byte": [round(f["mean_byte"], 6) for f in feats],
                "max_byte": [f["max_byte"] for f in feats],
            }
        )


def with_media_column(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct to each doc.

    Stands in for reading real media blobs (parquet binary / raw files at
    scale); payload bytes are the utf-8 of the text so results stay
    deterministic across engines and runs.
    """
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, F.lit("image/png"))
            .otherwise(F.lit("audio/wav"))
            .alias("mime"),
            F.col("n_chars").cast("long").alias("declared_size"),
        ).alias("media_meta"),
    ).withColumn("media_type", F.col("media_meta.mime"))


def resize_media(payload: bytes, target: int = 64) -> bytes:
    """Stand-in media resize: deterministic stride subsampling of the byte
    stream to <= target bytes (a real deployment would decode and resize
    pixels/samples here — codec libs absent in this container). Stub per
    the build contract; the distributed plumbing is real."""
    if payload is None or len(payload) <= target:
        return payload or b""
    stride = len(payload) // target
    return payload[::stride][:target]


def sample_frames(payload: bytes, n_frames: int = 4) -> list[bytes]:
    """Stand-in frame sampling: split the payload into n_frames equal
    chunks and keep each chunk's head — the shape of video keyframe
    extraction, deterministic on bytes."""
    if payload is None or len(payload) == 0:
        return []
    step = max(1, len(payload) // n_frames)
    return [payload[i * step : i * step + min(16, step)] for i in range(n_frames)]


def _media_transform_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched resize + frame-sample over the binary column."""
    for pdf in batches:
        resized = [resize_media(p) for p in pdf["media"]]
        frames = [sample_frames(p) for p in pdf["media"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "resized_bytes": [len(r) for r in resized],
                "n_frames": [len(f) for f in frames],
                "frame_bytes": [sum(len(x) for x in f) for f in frames],
            }
        )


@register(
    "x_multimodal_transform",
    tags=("EXT", "X5", "D1"),
    oracle="""
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(LEAST(octet_length(encode(text)), 64)) AS BIGINT) AS total_resized,
               CAST(SUM(CASE WHEN octet_length(encode(text)) > 0 THEN 4 ELSE 0 END) AS BIGINT)
                   AS total_frames
        FROM documents
    """,
)
def x_multimodal_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize + frame-sample over the binary modality (north-star ops):
    Arrow-batched mapInPandas, aggregated to corpus totals. The oracle
    pins the invariants the stand-in transforms guarantee (resized size =
    min(len, 64); 4 frames per non-empty payload); per-frame byte counts
    ride along unchecked."""
    docs = _t(spark, sf_dir, "documents")
    media = with_media_column(docs)
    out = media.select("doc_id", "media").mapInPandas(
        _media_transform_batches,
        "doc_id bigint, resized_bytes bigint, n_frames int, frame_bytes bigint",
    )
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("resized_bytes").cast("bigint").alias("total_resized"),
        F.sum(F.col("n_frames").cast("bigint")).cast("bigint").alias("total_frames"),
    )


@register(
    "x_multimodal_features",
    tags=("EXT", "X5", "D1"),
    oracle="""
        SELECT CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
               COUNT(*) AS n,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
        FROM documents
        GROUP BY media_type ORDER BY media_type
    """,
)
def x_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: attach payload + typed metadata, extract
    features via Arrow-batched mapInPandas, aggregate per media type. The
    oracle checks the byte-count plumbing (deterministic on both engines);
    mean/max byte stats ride along through the same UDF."""
    docs = _t(spark, sf_dir, "documents")
    media = with_media_column(docs)
    feats = media.select("doc_id", "media", "media_type").mapInPandas(
        _media_feature_batches,
        "doc_id bigint, media_type string, n_bytes bigint, mean_byte double, max_byte int",
    )
    return (
        feats.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.max("n_bytes").cast("bigint").alias("max_bytes"),
        )
        .orderBy("media_type")
    )
