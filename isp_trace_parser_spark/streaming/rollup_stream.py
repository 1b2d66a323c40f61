"""Structured-Streaming surface for the 30-minute tier.

The reference is pure batch (SURVEY §2.11); this is the incremental
variant for live crawls: the same end-of-interval 30m aggregation as
``operators.rollup.rollup_raw``, expressed as a watermarked streaming
aggregation. Late rows inside the watermark update their bucket; rows
later than the watermark are dropped (the reference has no late-data
semantics to honor — it assumes complete input).

Batch/stream parity is tested by feeding the same rows through both
paths (tests/test_streaming.py): the streaming result in complete/append
mode must equal the batch rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sum(value_col: str, sum_cast: str | None):
    c = F.col(value_col)
    return F.sum(c.cast(sum_cast) if sum_cast else c)


def streaming_rollup_30m(
    stream: DataFrame,
    series_col: str = "url",
    ts_col: str = "warc_ts",
    value_col: str = "value",
    watermark: str = "1 hour",
    sum_cast: str | None = None,
) -> DataFrame:
    """Streaming 30m tier: tumbling window + watermark.

    Uses ``F.window`` (streaming state requires the built-in window
    column for retention); the bucket label is the window END —
    identical labels to the batch tier's ``bucket_end``.
    """
    # watermarks require TIMESTAMP (ltz); UTC session makes the ntz<->ltz
    # casts wall-clock identity, and the label is cast back to the
    # engine-standard ntz below
    return (
        stream.withColumn("_ts_ltz", F.col(ts_col).cast("timestamp_ltz"))
        .withWatermark("_ts_ltz", watermark)
        .groupBy(
            F.col(series_col).alias("series"),
            F.window(
                # shift 1us back so points exactly on a boundary label
                # their own bucket (end-of-interval (start, end]), then
                # take the window END as the label
                F.col("_ts_ltz") - F.expr("INTERVAL 1 MICROSECOND"),
                "30 minutes",
            ),
        )
        .agg(
            # sum_cast (e.g. decimal) mirrors operators.rollup._sum_expr:
            # exact order-independent sums so streamed partials hash
            # identically to batch/oracle results
            (_sum(value_col, sum_cast).cast("double") / F.count(value_col)).alias(
                "avg_value"
            ),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
            _sum(value_col, sum_cast).alias("sum_value"),
            F.count(value_col).alias("cnt_value"),
        )
        .select(
            "series",
            F.col("window.end").cast("timestamp_ntz").alias("bucket_ts"),
            "avg_value",
            "min_value",
            "max_value",
            "sum_value",
            "cnt_value",
        )
    )


def streaming_histogram_30m(
    stream: DataFrame,
    series_col: str = "url",
    ts_col: str = "warc_ts",
    value_col: str = "value",
    watermark: str = "1 hour",
    bin_width: float = 0.5,
) -> DataFrame:
    """Streaming 30m HISTOGRAM tier: the distribution analog of
    :func:`streaming_rollup_30m`, maintaining the same mergeable
    (series, bucket, bin) -> count sketch the batch
    ``rollup.histogram_tier`` builds — a live crawl keeps percentile
    dashboards current without re-scanning raw data. Counts are exact
    integers, so streamed state equals the batch tier bit-for-bit, and
    the output can be landed into ``hist_30m`` and cascaded/served by
    the same TierStore.percentile path.
    """
    return (
        stream.withColumn("_ts_ltz", F.col(ts_col).cast("timestamp_ltz"))
        .withWatermark("_ts_ltz", watermark)
        .groupBy(
            F.col(series_col).alias("series"),
            F.window(
                F.col("_ts_ltz") - F.expr("INTERVAL 1 MICROSECOND"),
                "30 minutes",
            ),
            F.floor(F.col(value_col) / F.lit(bin_width))
            .cast("long")
            .alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "series",
            F.col("window.end").cast("timestamp_ntz").alias("bucket_ts"),
            "bin",
            "cnt",
        )
    )
