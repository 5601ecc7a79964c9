"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata
struct; decode / feature-extraction runs as Arrow-batched pandas
functions via `mapInPandas` — the Spark-side plumbing (schema,
partitioning, batch shape) is real and tested, while the actual media
decoding is STUBBED (`decode_image` raises NotImplementedError: the
image/audio libraries are not in this container) with a deterministic
fake used by `extract_features` so pipelines are end-to-end runnable.

Scale: mapInPandas streams Arrow batches through Python — one
serialization boundary per batch, not per row. Payload-heavy tables
should be repartitioned by size (`spark.sql.files.maxPartitionBytes`)
before feature extraction so one task never holds more than a few
hundred MB of payload.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, modality string, feature array<float>"
)


def to_binary_payload(
    df: DataFrame, id_col: str, payload_col: str, modality: str = "text"
) -> DataFrame:
    """Wrap a column as an opaque binary payload + typed metadata
    (the storage shape a 100 TB multimodal table would use: payload
    binary, metadata queryable without touching the payload)."""
    payload = F.encode(F.col(payload_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit(modality).alias("modality"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Decode an image payload to pixels. STUB: the decode libraries
    (PIL/opencv) are not available in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv which are not installed; "
        "extract_features uses a deterministic fake instead"
    )


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: byte
    histogram moments over FEATURE_DIM equal-width buckets."""
    if not payload:
        return [0.0] * FEATURE_DIM
    counts = [0] * FEATURE_DIM
    for b in payload:
        counts[b * FEATURE_DIM // 256] += 1
    total = float(len(payload))
    return [c / total for c in counts]


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta).

    Real media would call `decode_image`/resample/frame-sample here; the
    batch shape, schema, and partition behavior are identical with the
    deterministic fake."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "feature": [_fake_feature(p) for p in pdf["payload"]],
                }
            )

    return binary_df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload. STUB: decode/encode libraries are not
    available in this container; the Spark-side pipeline shape is
    demonstrated by `sample_frames`/`extract_features`."""
    raise NotImplementedError(
        "image resize requires PIL/opencv which are not installed"
    )


N_FRAMES = 4

FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_offset int, feature array<float>"
)


def sample_frames(binary_df: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """Frame sampling over opaque video-like payloads: each payload yields
    `n_frames` evenly-spaced frames, each with its own feature vector —
    the 1:N row explosion shape a video pipeline needs (one input row ->
    n_frames output rows, still one Arrow batch boundary per partition).

    The frame decode is the deterministic fake (byte-histogram over the
    frame's byte slice); a real pipeline swaps `_fake_feature` for the
    codec call, nothing else changes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "feature": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = max(1, len(payload))
                for k in range(n_frames):
                    off = k * n // n_frames
                    end = (k + 1) * n // n_frames
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(k)
                    out["frame_offset"].append(off)
                    out["feature"].append(_fake_feature(payload[off:end]))
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(batches, schema=FRAME_SCHEMA)
