"""Stateful streaming gap-fill: output over multiple micro-batches ==
batch gap-fill on the same rows (state carries across batches)."""

from __future__ import annotations

import pandas as pd

from isp_trace_parser_spark import synth
from isp_trace_parser_spark.operators.gapfill import gap_fill
from isp_trace_parser_spark.operators.rollup import rollup_raw
from isp_trace_parser_spark.streaming.stateful_ffill import stateful_gap_fill_stream


def test_stateful_stream_matches_batch_gapfill(spark, tmp_path):
    pages = synth.pages(spark, n_urls=4, n_slots=48 * 3, gap_pct=20)
    t30 = rollup_raw(pages).selectExpr(
        "series", "bucket_ts", "avg_value as value"
    )
    pdf = t30.toPandas().sort_values(["series", "bucket_ts"])

    # two micro-batches: first half of each series' points, then the rest
    # (file source, one file per batch, maxFilesPerTrigger=1)
    src = tmp_path / "src"
    src.mkdir()
    first = pdf.groupby("series").head(40)
    rest = pdf[~pdf.index.isin(first.index)]
    spark.createDataFrame(first).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(rest).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(t30.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        stateful_gap_fill_stream(stream)
        .writeStream.format("memory")
        .queryName("ffill_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = (
        spark.sql("select * from ffill_stream")
        .toPandas()
        .sort_values(["series", "bucket_ts"])
        .reset_index(drop=True)
    )
    want = (
        gap_fill(t30, value_cols=["value"])
        .toPandas()
        .sort_values(["series", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    pd.testing.assert_series_equal(got["bucket_ts"], want["bucket_ts"])
    assert (got["value"].to_numpy() == want["value"].to_numpy()).all()
    assert (got["is_filled"].to_numpy() == want["is_filled"].to_numpy()).all()
    # gaps were actually present (the test is vacuous otherwise)
    assert got["is_filled"].sum() > 0
