"""Streaming sessionization on Spark's NATIVE session windows.

``F.session_window(ts, gap)`` is the Structured-Streaming-first way to
sessionize: state is managed by the engine (merging windows, watermark
eviction), not by custom code — at 100 TB of clickstream this is the
operator you want before reaching for applyInPandasWithState (which
this repo uses only where built-ins can't express the semantics,
streaming/stateful_ffill.py).

Semantics note (empirically pinned by the boundary test in
tests/test_streaming.py): a session window ``[first_ts, last_ts + gap]``
merges with the next event when the intervals overlap OR TOUCH — an
event arriving exactly ``gap`` after the previous one stays in the SAME
session. That matches the batch lag+cumsum sessionizer's
``gap > threshold`` rule (__spark_entry__ ``sessionize``), so both
operators share one oracle form.

Finite-input testing pitfall (documented for reuse): in append mode a
session is emitted only once the WATERMARK passes its end, and an
availableNow run stops when the source is drained — so the last session
of the globally-latest user is never emitted unless something advances
the watermark past it. The contract query feeds a far-future SENTINEL
row as a second microbatch (maxFilesPerTrigger=1) to flush every real
session, then filters the sentinel user out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessionize(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Watermarked session-window aggregation:
    ``(user, session_start, session_end, n_events, sum_value)`` where
    ``session_end = last event + gap`` (Spark session-window bound).

    ``sum_value`` accumulates as decimal so the result is independent of
    microbatch arrival order (same trick as the streaming rollup).

    The engine stores NTZ timestamps but watermarks require LTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE): cast in, cast the window
    bounds back out — a wall-clock identity under the engine's pinned
    UTC session."""
    ltz = stream.withColumn("_wts", F.col(ts_col).cast("timestamp_ltz"))
    return (
        ltz.withWatermark("_wts", watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col("_wts"), gap),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(20,4)")).alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.col("session_window.start")
            .cast("timestamp_ntz")
            .alias("session_start"),
            F.col("session_window.end")
            .cast("timestamp_ntz")
            .alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
