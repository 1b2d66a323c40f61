"""Streaming exact deduplication for live-crawl ingest.

Batch dedup (operators/dedup.py) assumes a complete corpus; a live
crawl needs duplicates suppressed AS ROWS ARRIVE with bounded state.
``streaming_exact_dedup`` keys state on the same 128-bit content key as
the batch operator (two independently-seeded xxhash64 lanes — collision
analysis in operators/dedup.py) and bounds it with a watermark:
``dropDuplicatesWithinWatermark`` keeps a key's state only until the
event-time watermark passes it, so state is O(docs per watermark
horizon), not O(corpus) — the only viable shape at a 10^12-doc design
point.

Semantics: the FIRST arrival of a content key within the horizon is
emitted; re-crawls of the same bytes inside the horizon are dropped;
a re-crawl after the horizon re-emits (by design — at that point the
batch dedup of the landed table is the source of truth).

Batch/stream parity is tested in tests/test_streaming.py: the streamed
output over a memory source equals the batch first-per-key result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins exact dedup with watermark-bounded state."""
    text = F.col(text_col)
    keyed = stream.withColumn(
        "content_hash", F.xxhash64(text)
    ).withColumn(
        "content_hash2", F.xxhash64(F.lit("xxh-lane-2"), text)
    ).withColumn("_ts_ltz", F.col(ts_col).cast("timestamp_ltz"))
    return (
        keyed.withWatermark("_ts_ltz", watermark)
        .dropDuplicatesWithinWatermark(["content_hash", "content_hash2"])
        .drop("_ts_ltz")
    )
