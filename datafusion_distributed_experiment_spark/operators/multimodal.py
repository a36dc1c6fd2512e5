"""Multimodal (image/audio/video) column handling.

Design for 100 TB media pipelines:

- Media payloads are opaque ``binary`` columns with a typed metadata struct —
  the parquet row stays self-describing and column-prunable (a metadata-only
  query never touches the bytes).
- Decode / feature-extraction / resize / frame-sampling run as Arrow-batched
  ``mapInPandas`` stages: executors stream ~``arrow.maxRecordsPerBatch`` rows
  per pandas batch, so peak memory is bounded regardless of table size, and
  the stage is map-only (no shuffle).
- Real codecs (PIL/torchvision/ffmpeg) are not available in this container:
  the byte->pixels step is STUBBED. ``decode_image`` raises
  ``NotImplementedError`` unless a codec is importable; the feature pipeline
  uses a clearly-marked deterministic fake (md5-derived) so the Spark-side
  plumbing — schema, batch shape, partitioning, UDF signatures — is real and
  testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("sample_rate", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

FEATURE_DIM = 8


def _codec_available() -> bool:
    try:  # pragma: no cover - container has no PIL
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(content: bytes):
    """Byte -> pixel decode. STUB: no image codec in this environment."""
    if not _codec_available():
        raise NotImplementedError(
            "image decode requires an image codec (e.g. PIL); not available "
            "in this container — feature extraction uses fake_embed() instead"
        )
    raise NotImplementedError("real decode path intentionally unimplemented")


def fake_embed(content: bytes | None) -> list[float]:
    """DETERMINISTIC FAKE decode+embed: md5(content) -> FEATURE_DIM floats in
    [0, 1). Stands in for codec+model inference; same batch shape and dtype
    as the real thing."""
    if content is None:
        return [0.0] * FEATURE_DIM
    digest = hashlib.md5(bytes(content)).digest()
    return [b / 256.0 for b in digest[:FEATURE_DIM]]


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: streams Arrow batches through Python,
    emits (media_id, modality, n_bytes, feature[FEATURE_DIM])."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(
                        lambda c: len(c) if c is not None else 0
                    ).astype("int64"),
                    "feature": pdf["content"].map(fake_embed),
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: plumbing (signature, schema, meta rewrite) is real; the
    pixel transform substitutes a deterministic content digest re-hash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["content"] = out["content"].map(
                lambda c: hashlib.md5(bytes(c) + f"{width}x{height}".encode()).digest()
                if c is not None
                else None
            )
            out["meta"] = out["meta"].map(
                lambda m: {
                    "width": width,
                    "height": height,
                    "sample_rate": (m or {}).get("sample_rate"),
                    "duration_ms": (m or {}).get("duration_ms"),
                }
            )
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling stub: one synthetic 'frame' row per every_ms of
    duration (fan-out inside mapInPandas — rows out != rows in, the shape a
    real frame sampler has)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                duration = (r["meta"] or {}).get("duration_ms")
                # Arrow->pandas turns nullable ints into float NaN; normalize.
                duration = int(duration) if duration is not None and duration == duration else 0
                for i in range(max(duration // every_ms, 0)):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "modality": "image",
                            "content": hashlib.md5(
                                bytes(r["content"] or b"") + i.to_bytes(4, "big")
                            ).digest(),
                            "meta": r["meta"],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "modality", "content", "meta"])

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)
