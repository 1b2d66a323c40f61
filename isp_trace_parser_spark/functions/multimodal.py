"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode/feature/resize/frame-sample as Arrow-batched UDFs.

The actual media libs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode kernels are deterministic fakes behind a clearly-marked
seam (``_HAVE_PIL`` guard / ``NotImplementedError``). Everything
Spark-side — schemas, batch shapes, partitioning, UDF signatures — is
real and tested, so swapping in a real decoder is a one-function change.

Media rows are heavy (MBs); the table design keeps metadata columns
separate from payloads so metadata-only queries never read the blobs
(parquet column pruning), and payload stages run ``mapInPandas`` with a
small ``maxRecordsPerBatch`` to bound executor memory.
"""

from __future__ import annotations

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


def synth_media(spark: SparkSession, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-random
    bytes; metadata consistent with the payload generator)."""
    df = spark.range(0, n, 1, numPartitions=partitions)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    payload = F.sha2(F.col("id").cast("string"), 256).cast("binary")
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        ((F.col("id") % 16 + 1) * 64).cast("int").alias("width"),
        ((F.col("id") % 9 + 1) * 64).cast("int").alias("height"),
        ((F.col("id") % 30 + 1) * 1000).cast("int").alias("duration_ms"),
    )


def _decode_real(payload: bytes, kind: str) -> np.ndarray:  # pragma: no cover
    raise NotImplementedError(
        "real media decode requires PIL/ffmpeg, not present in this "
        "container; the deterministic fake below exercises the same "
        "Spark plumbing"
    )


def _decode_fake(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes -> fixed-length
    float 'signal'. Same signature/shape a real decoder would produce."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    if len(arr) < 32:
        arr = np.pad(arr, (0, 32 - len(arr)))
    return arr[:32] / 255.0


def extract_features(df: DataFrame, batch_rows: int = 256) -> DataFrame:
    """mapInPandas feature extraction: decode -> 8-dim pooled feature.

    The iterator-of-batches form lets one task stream many small Arrow
    batches instead of materializing the partition — mandatory when rows
    are megabytes of media.
    """

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _decode_real if _HAVE_PIL else _decode_fake
        for pdf in batches:
            sig = [decode(bytes(p), k) for p, k in zip(pdf["payload"], pdf["kind"])]
            mat = np.stack(sig)  # (batch, 32)
            pooled = mat.reshape(len(mat), 8, 4).mean(axis=2)  # (batch, 8)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [row.astype(np.float32) for row in pooled],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        _features, FEATURE_SCHEMA
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
