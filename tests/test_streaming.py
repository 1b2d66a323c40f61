"""Streaming 30m tier == batch 30m tier on the same rows."""

from __future__ import annotations

import pandas as pd

from isp_trace_parser_spark import synth
from isp_trace_parser_spark.operators.rollup import rollup_raw
from isp_trace_parser_spark.streaming.rollup_stream import streaming_rollup_30m


def test_stream_matches_batch(spark, tmp_path):
    pdf = synth.pages_pandas(n_urls=4, n_slots=48 * 2, gap_pct=10)[
        ["url", "warc_ts", "value"]
    ]
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(pdf).repartition(4).write.parquet(src)

    batch = (
        rollup_raw(spark.read.parquet(src))
        .toPandas()
        .sort_values(["series", "bucket_ts"])
        .reset_index(drop=True)
    )

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    agg = streaming_rollup_30m(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("t30_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from t30_stream")
        .toPandas()
        .sort_values(["series", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(batch)
    pd.testing.assert_series_equal(got["bucket_ts"], batch["bucket_ts"])
    assert (got["avg_value"].to_numpy() == batch["avg_value"].to_numpy()).all()
    assert (got["cnt_value"].to_numpy() == batch["cnt_value"].to_numpy()).all()


def test_streaming_exact_dedup_first_arrival_wins(spark, tmp_path):
    """Streamed dedup emits exactly one row per distinct text (the
    batch distinct-key count) and drops in-horizon re-crawls."""
    from isp_trace_parser_spark.streaming.dedup_stream import (
        streaming_exact_dedup,
    )

    ts = pd.date_range("2024-01-01", periods=12, freq="1min")
    pdf = pd.DataFrame(
        {
            "doc_id": range(12),
            "warc_ts": ts.astype("datetime64[us]"),
            # 4 distinct texts, each crawled 3 times inside the horizon
            "text": [f"doc body {i % 4}" for i in range(12)],
        }
    )
    src = str(tmp_path / "dedup_src")
    spark.createDataFrame(pdf).repartition(3).write.parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = streaming_exact_dedup(stream, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_stream").toPandas()
    assert len(got) == 4
    assert sorted(got["text"]) == sorted(f"doc body {i}" for i in range(4))
    # the streamed key columns must equal the batch operator's key
    from isp_trace_parser_spark.operators import dedup

    batch = dedup.exact_dedup(spark.read.parquet(src)).toPandas()
    assert set(got["content_hash"]) == set(batch["content_hash"])
    assert set(got["content_hash2"]) == set(batch["content_hash2"])
