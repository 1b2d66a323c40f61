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
