"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata
struct; decode / feature-extraction runs as Arrow-batched pandas
functions via `mapInPandas` — one serialization boundary per batch,
not per row.

Decode support is two-tier:
- REAL, library-free decoders for uncompressed raster formats — binary
  PPM (P6) and 24-bit uncompressed BMP — implemented with struct/numpy
  only (`decode_image`, `resize_image`, `encode_ppm`). These run
  end-to-end in this container and are round-trip tested.
- Compressed formats (JPEG/PNG/...) require PIL/opencv, which are NOT
  in this container: `decode_image` raises NotImplementedError for
  them, and `extract_features` falls back to a deterministic
  byte-histogram feature so pipelines stay runnable on arbitrary
  payloads.

Scale: payload-heavy tables should be repartitioned by size
(`spark.sql.files.maxPartitionBytes`) before feature extraction so one
task never holds more than a few hundred MB of payload.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
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


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6) — the simplest
    real raster container; pure bytes, no libraries."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _decode_ppm(payload: bytes) -> np.ndarray:
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> raster
    parts = payload.split(maxsplit=4)
    if len(parts) < 5 or parts[0] != b"P6":
        raise ValueError("not a binary PPM")
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    raster = parts[4]
    if len(raster) < w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster[: w * h * 3], dtype=np.uint8).reshape(h, w, 3)


def _decode_bmp(payload: bytes) -> np.ndarray:
    # BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER; 24bpp uncompressed
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = []
    for r in range(h):
        start = off + r * stride
        row = np.frombuffer(payload[start : start + w * 3], dtype=np.uint8)
        rows.append(row.reshape(w, 3)[:, ::-1])  # BGR -> RGB
    img = np.stack(rows)
    return img[::-1] if flip else img  # bottom-up storage when h > 0


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (h, w, 3) uint8 RGB array.

    REAL decode for binary PPM (P6) and 24-bit uncompressed BMP —
    struct/numpy only, no imaging libraries. Compressed formats
    (JPEG/PNG) would need PIL/opencv, absent from this container."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "compressed image decode (JPEG/PNG/...) requires PIL/opencv which "
        "are not installed; PPM(P6)/BMP(24-bit) decode natively"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize a decodable image payload with nearest-neighbor resampling
    (pure numpy index math) and re-encode as PPM. Real for PPM/BMP
    inputs; compressed formats raise as in `decode_image`."""
    img = decode_image(payload)
    h, w = img.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return encode_ppm(img[ys][:, xs])


def _pixel_feature(img: np.ndarray) -> list[float]:
    """FEATURE_DIM pixel-statistic vector from a decoded image:
    [h/256, w/256, mean_r, mean_g, mean_b, std_r, std_g, std_b] with
    channel stats scaled to [0, 1]."""
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3).astype(np.float64)
    means = flat.mean(axis=0) / 255.0
    stds = flat.std(axis=0) / 255.0
    return [h / 256.0, w / 256.0, *means.tolist(), *stds.tolist()]


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic fallback for undecodable payloads: byte histogram
    over FEATURE_DIM equal-width buckets."""
    if not payload:
        return [0.0] * FEATURE_DIM
    counts = [0] * FEATURE_DIM
    for b in payload:
        counts[b * FEATURE_DIM // 256] += 1
    total = float(len(payload))
    return [c / total for c in counts]


def _feature(payload: bytes) -> list[float]:
    # struct.error: a payload starting with b"BM" but shorter than the
    # 34-byte BMP header makes struct.unpack_from raise — such payloads
    # must hit the histogram fallback, not kill the mapInPandas task.
    try:
        return _pixel_feature(decode_image(payload))
    except (NotImplementedError, ValueError, IndexError, struct.error):
        return _fake_feature(payload)


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta).

    Decodable payloads (PPM/BMP) get REAL pixel-statistic features;
    anything else gets the deterministic byte-histogram fallback — the
    batch shape, schema, and partition behavior are identical either
    way."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "feature": [_feature(p) for p in pdf["payload"]],
                }
            )

    return binary_df.mapInPandas(batches, schema=FEATURE_SCHEMA)


N_FRAMES = 4

FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_offset int, feature array<float>"
)


def sample_frames(binary_df: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """Frame sampling over opaque video-like payloads: each payload yields
    `n_frames` evenly-spaced frames, each with its own feature vector —
    the 1:N row explosion shape a video pipeline needs (one input row ->
    n_frames output rows, still one Arrow batch boundary per partition).

    Frames are byte slices featurized with the histogram fallback; a
    real pipeline swaps the slice for the codec's frame decode, nothing
    else changes."""

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


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode mono int16 PCM samples as a RIFF/WAVE payload — struct
    only, no audio libraries (the WAV container is 44 bytes of header
    around raw little-endian PCM)."""
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE payload to (mono int16 samples, sample_rate).
    REAL chunk-walking decode (fmt may be preceded/followed by LIST etc.);
    PCM16 mono only — compressed audio (MP3/AAC) would need a codec
    library, absent here, and raises NotImplementedError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    "only PCM16 mono WAV decodes natively; compressed "
                    "audio requires codec libraries not in this container"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return np.frombuffer(data, dtype="<i2"), rate


def audio_stats(payload: bytes) -> dict:
    """Exact integer/rational audio statistics from a WAV payload:
    n_samples, sample_rate, peak (max |v|), zcr (count of >=0 / <0 class
    flips), and rms computed from an EXACT integer sum of squares (so
    two engines replaying the math bit-agree; int16^2 sums stay far
    inside float64's 2^53 integer range for any realistic clip)."""
    samples, rate = decode_wav(payload)
    v = samples.astype(np.int64)
    n = int(v.size)
    if n == 0:
        return {"n_samples": 0, "rate": rate, "peak": 0, "zcr": 0, "rms": 0.0}
    nonneg = v >= 0
    zcr = int((nonneg[1:] != nonneg[:-1]).sum())
    sum_sq = int((v * v).sum())
    return {
        "n_samples": n,
        "rate": rate,
        "peak": int(np.abs(v).max()),
        "zcr": zcr,
        "rms": float(sum_sq / n) ** 0.5,
    }
