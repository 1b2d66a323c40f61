"""Synthetic pages generator: Spark and numpy mirrors must agree
bit-for-bit — the numpy side is the oracle for every downstream test."""

from __future__ import annotations

import pandas as pd

from isp_trace_parser_spark import synth


def test_spark_matches_pandas_mirror(spark):
    n_urls, n_slots = 12, 48 * 3
    sdf = (
        synth.pages(spark, n_urls=n_urls, n_slots=n_slots, gap_pct=0)
        .orderBy("url", "warc_ts")
        .toPandas()
    )
    pdf = (
        synth.pages_pandas(n_urls=n_urls, n_slots=n_slots, gap_pct=0)
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    assert len(sdf) == n_urls * n_slots
    pd.testing.assert_series_equal(sdf["url"], pdf["url"])
    pd.testing.assert_series_equal(sdf["warc_ts"], pdf["warc_ts"])
    pd.testing.assert_series_equal(sdf["text"], pdf["text"])
    pd.testing.assert_series_equal(sdf["lang"], pdf["lang"])
    # values must be bit-identical (no transcendental fns used)
    assert (sdf["value"].to_numpy() == pdf["value"].to_numpy()).all()
    assert [bytes(b) for b in sdf["html"]] == [bytes(b) for b in pdf["html"]]


def test_gaps_are_deterministic(spark):
    sdf = synth.pages(spark, n_urls=8, n_slots=96, gap_pct=20)
    pdf = synth.pages_pandas(n_urls=8, n_slots=96, gap_pct=20)
    assert sdf.count() == len(pdf)
    assert sdf.count() < 8 * 96


def test_skew_produces_hot_domains(spark):
    df = synth.pages(spark, n_urls=200, n_slots=4, skew=3.0, n_domains=20)
    from pyspark.sql import functions as F

    counts = (
        df.select(F.regexp_extract("url", r"https://(site\d+)", 1).alias("dom"))
        .groupBy("dom")
        .count()
        .orderBy(F.desc("count"))
        .toPandas()
    )
    # hot domain should dominate: top domain >> median
    assert counts["count"].iloc[0] > 4 * counts["count"].median()
