"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode/feature/resize/frame-sample as Arrow-batched UDFs.

Decode is REAL for the uncompressed formats a pure-numpy runtime can
handle — binary PPM/PGM images (netpbm P6/P5) and PCM-16 WAV audio —
implemented here with no external media libs. Compressed formats
(JPEG/PNG/MP4) need PIL/ffmpeg, which are NOT in this container; those
stay behind a clearly-marked seam (``_HAVE_PIL`` guard /
``NotImplementedError``) with a deterministic fake fallback so the
Spark plumbing is exercised end-to-end either way.

Media rows are heavy (MBs); the table design keeps metadata columns
separate from payloads so metadata-only queries never read the blobs
(parquet column pruning), and payload stages run ``mapInPandas`` with
iterator-of-batches streaming to bound executor memory.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)

WAV_RATE = 4000  # synth sample rate (Hz)


# ------------------------------------------------- real numpy codecs
def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (netpbm P6)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM/PGM (P6/P5, maxval 255) -> uint8 array
    (h, w, 3) or (h, w). Real parser: header tokens then raster."""
    if data[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header = magic + 3 ascii ints separated by whitespace (comments
    # with '#' allowed per spec), then ONE whitespace byte, then raster
    tokens: list[int] = []
    i, n = 2, len(data)
    while len(tokens) < 3:
        while i < n and data[i : i + 1].isspace():
            i += 1
        if i >= n:
            raise ValueError("truncated PPM/PGM header")
        if data[i : i + 1] == b"#":
            while i < n and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not data[j : j + 1].isspace():
            j += 1
        if j >= n:
            raise ValueError("truncated PPM/PGM header")
        tokens.append(int(data[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    depth = 3 if data[:2] == b"P6" else 1
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * depth, offset=i)
    return raster.reshape((h, w, 3)) if depth == 3 else raster.reshape((h, w))


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Real nearest-neighbor resize (pure numpy index mapping)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[rows][:, cols]


def encode_wav_pcm16(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """float [-1, 1] mono -> RIFF/WAVE PCM-16 bytes (real WAV header)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(pcm),
    )
    return hdr + pcm


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 mono -> (float32 samples in [-1, 1], rate).
    Real chunk walker (fmt may be followed by other chunks)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, raw = 12, None, None
    while i + 8 <= len(data):
        cid, size = data[i : i + 4], struct.unpack("<I", data[i + 4 : i + 8])[0]
        body = data[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if (fmt, channels, bits) != (1, 1, 16):
                raise ValueError("only PCM-16 mono supported")
        elif cid == b"data":
            raw = body
        i += 8 + size + (size & 1)
    if rate is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32767.0, rate


# ----------------------------------------------------------- synthesis
def _synth_image(media_id: int, w: int, h: int) -> bytes:
    """Deterministic real PPM: per-id seeded gradient + noise pattern."""
    rng = np.random.default_rng(media_id)
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    return encode_ppm(np.stack([r, g, b], axis=-1).astype(np.uint8))


def _synth_audio(media_id: int, duration_ms: int) -> bytes:
    """Deterministic real WAV: per-id frequency sine + seeded noise."""
    n = WAV_RATE * duration_ms // 1000
    t = np.arange(n, dtype=np.float64) / WAV_RATE
    freq = 110.0 * (1 + media_id % 16)
    rng = np.random.default_rng(media_id)
    sig = 0.7 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(n)
    return encode_wav_pcm16(sig)


def _synth_video(media_id: int) -> bytes:
    """Fake container bytes (no pure-numpy video format exists); the
    frame-sample plan consumes only metadata, so this payload is only
    ever touched by the decode seam."""
    rng = np.random.default_rng(media_id)
    return b"FAKEMP4" + rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()


def synth_media(spark: SparkSession, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic media table with REAL payloads where a pure-numpy
    codec exists: images are valid binary PPMs, audio is valid PCM-16
    WAV (both decodable by any standard tool); video payloads are fake
    behind the ffmpeg seam. Metadata (width/height/duration) is exactly
    consistent with the payload bytes."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                kind = ("image", "audio", "video")[mid % 3]
                w = (mid % 16 + 1) * 16
                h = (mid % 9 + 1) * 16
                dur = (mid % 30 + 1) * 1000
                if kind == "image":
                    payload, mime, dur = _synth_image(mid, w, h), "image/x-portable-pixmap", 0
                elif kind == "audio":
                    payload, mime, w, h = _synth_audio(mid, dur), "audio/wav", 0, 0
                else:
                    payload, mime = _synth_video(mid), "video/x-fake"
                rows.append((mid, kind, payload, mime, w, h, dur))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "mime",
                    "width", "height", "duration_ms",
                ],
            )

    return spark.range(0, n, 1, numPartitions=partitions).mapInPandas(
        _gen, MEDIA_SCHEMA
    )


# -------------------------------------------------------------- decode
def _decode_real(payload: bytes, kind: str) -> np.ndarray:  # pragma: no cover
    raise NotImplementedError(
        "compressed media decode (JPEG/PNG/MP4) requires PIL/ffmpeg, not "
        "present in this container; PPM/PGM/WAV decode IS real (numpy)"
    )


def _decode_fake(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for the compressed-format seam: payload
    bytes -> fixed-length float 'signal'."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    if len(arr) < 32:
        arr = np.pad(arr, (0, 32 - len(arr)))
    return arr[:32] / 255.0


def decode_media(payload: bytes, kind: str) -> np.ndarray:
    """Magic-byte dispatch: real numpy decode for PPM/PGM/WAV, the
    PIL/ffmpeg seam (or its deterministic fake) for everything else.
    Returns an image array (h, w[, 3]) or a 1-D sample signal."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:4] == b"RIFF":
        return decode_wav_pcm16(payload)[0]
    return (_decode_real if _HAVE_PIL else _decode_fake)(payload, kind)


# ------------------------------------------------------------- features
def _image_feature(img: np.ndarray) -> np.ndarray:
    """8-dim real image feature: RGB channel means (3) + overall std (1)
    + 2x2 grayscale grid means (4), all in [0, 1]."""
    pix = img.astype(np.float32) / 255.0
    if pix.ndim == 2:
        pix = np.stack([pix] * 3, axis=-1)
    means = pix.mean(axis=(0, 1))
    std = pix.std()
    gray = pix.mean(axis=2)
    grid = resize_nearest(gray, 2, 2).reshape(4)
    return np.concatenate([means, [std], grid]).astype(np.float32)


def _audio_feature(sig: np.ndarray) -> np.ndarray:
    """8-dim real audio feature: RMS, zero-crossing rate, and 6
    log-spaced FFT band energies (normalized)."""
    rms = float(np.sqrt(np.mean(sig**2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(sig).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(sig))
    edges = np.unique(
        np.logspace(0, np.log10(max(len(spec) - 1, 2)), 7).astype(int)
    )
    while len(edges) < 7:
        edges = np.append(edges, edges[-1] + 1)
    bands = [float(spec[a:b].sum()) for a, b in zip(edges[:-1], edges[1:])]
    total = sum(bands) or 1.0
    return np.array([rms, zcr] + [b / total for b in bands], dtype=np.float32)


def extract_features(df: DataFrame, batch_rows: int = 256) -> DataFrame:
    """mapInPandas feature extraction: real decode (PPM/WAV) -> real
    8-dim feature; compressed/fake payloads -> pooled byte signal.

    The iterator-of-batches form lets one task stream many small Arrow
    batches instead of materializing the partition — mandatory when rows
    are megabytes of media.
    """

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p, k in zip(pdf["payload"], pdf["kind"]):
                data = bytes(p)
                decoded = decode_media(data, k)
                if decoded.ndim >= 2:
                    feats.append(_image_feature(decoded))
                elif len(decoded) == 32:  # fake-seam signal
                    feats.append(decoded.reshape(8, 4).mean(axis=1))
                else:
                    feats.append(_audio_feature(decoded))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [f.astype(np.float32) for f in feats],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        _features, FEATURE_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(df: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Real image resize stage: decode PPM -> nearest-neighbor resample
    -> re-encode PPM, streaming Arrow batches. Non-PPM payloads pass
    through the decode seam's error (fail loud, like the reference's
    unknown-input handling)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                img = decode_ppm(bytes(p))
                if img.ndim == 2:
                    img = np.stack([img] * 3, axis=-1)
                out.append(
                    (mid, encode_ppm(resize_nearest(img, out_h, out_w)), out_w, out_h)
                )
            yield pd.DataFrame(
                out, columns=["media_id", "payload", "width", "height"]
            )

    return (
        df.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(_resize, RESIZED_SCHEMA)
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode
    (media_id, frame_ts_ms). The explode happens JVM-side from metadata
    only — no payload is touched until the decode stage consumes the
    plan, so planning 10^9 frames costs metadata-scan time."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("duration_ms") - 1,
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
