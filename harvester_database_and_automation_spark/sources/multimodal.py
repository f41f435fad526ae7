"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct — the
pattern a 100TB training-data pipeline needs: Spark moves and filters the
bytes, partition sizing keeps blobs off the driver, and all per-item
compute runs as Arrow-batched ``mapInPandas`` stages.

The actual codecs (PIL/ffmpeg/librosa) are NOT available in this
container, so the decode step is STUBBED: ``decode_media`` raises
NotImplementedError unless ``fake=True`` selects the deterministic fake
decoder (byte statistics standing in for pixels/samples). The Spark-side
contract — schemas, batch iteration, explode shapes, partitioning — is
real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, byte_sum long, mean_byte double,"
    " content_sha256 string"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = "media_id long, features array<double>"


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary media to per-item statistics.

    Real decoding requires codec libraries that are not present in this
    environment — calling with ``fake=False`` raises NotImplementedError.
    ``fake=True`` runs the deterministic fake decoder (byte length, mean
    byte value, sha256) through the SAME mapInPandas plumbing the real
    decoder would use.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this environment; "
            "pass fake=True for the deterministic fake decoder"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # a null payload is a dirty row, not a stage-killer: decode it
            # to empty-content stats (schema columns stay non-null)
            content = pdf["content"].map(lambda b: b if b is not None else b"")
            # byte_sum is the exact integer; mean_byte the derived double —
            # exact ints let downstream aggregates stay drift-free
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(len),
                    "byte_sum": content.map(sum),
                    "mean_byte": content.map(
                        lambda b: (sum(b) / len(b)) if len(b) else 0.0
                    ),
                    "content_sha256": content.map(lambda b: hashlib.sha256(b).hexdigest()),
                }
            )

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Deterministic pseudo-embedding per media item (sha256-seeded), via
    mapInPandas — the exact shape a real CLIP/wav2vec feature stage has:
    binary in, fixed-width float vector out, no shuffle."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [b / 255.0 for b in hashlib.sha256(content or b"").digest()[:dim]]
                for content in pdf["content"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(_features, schema=FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for videos: one output row per kept frame index,
    derived from metadata only (n_frames) — the decode of each kept frame
    is a later mapInPandas stage. Pure relational explode; no UDF.

    Zero-frame videos are filtered first: they sample to nothing, and
    Spark's ``sequence(0, -1, step)`` raises on the inverted bounds rather
    than returning an empty array."""
    return (
        df.filter((F.col("kind") == "video") & (F.col("meta.n_frames") > 0))
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def resize_images(df: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize image rows to ``width`` x ``height``: same schema out,
    ``content`` replaced by the resized bytes, meta.width/height updated,
    non-image rows passed through untouched.

    Real resampling requires PIL/opencv, which are not present in this
    environment — ``fake=False`` raises NotImplementedError. ``fake=True``
    runs a deterministic stand-in (stride-sampling the source bytes to
    width*height) through the SAME Arrow-batched mapInPandas stage, nested
    meta struct and all, so the plumbing is fully exercised.
    """
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL/opencv, which are not available in "
            "this environment; pass fake=True for the deterministic stand-in"
        )
    n_out = width * height

    def _stride_sample(b: bytes) -> bytes:
        if not b:
            return b""
        step = max(len(b) // n_out, 1)
        return bytes(b[(i * step) % len(b)] for i in range(n_out))

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["kind"] == "image"
            content = [
                _stride_sample(b or b"") if img else b
                for img, b in zip(is_img, pdf["content"])
            ]
            meta = [
                {**m, "width": width, "height": height} if (img and m is not None) else m
                for img, m in zip(is_img, pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": content,
                    "meta": meta,
                }
            )

    return df.mapInPandas(_resize, schema=MEDIA_SCHEMA)
