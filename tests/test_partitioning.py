"""Partitioning keys + skew handling (north_rule: explicit time-bucket +
url-hash keys, salting for hot domains)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from isp_trace_parser_spark import synth
from isp_trace_parser_spark.plans import partitioning as P


def test_url_bucket_stable_and_bounded(spark):
    df = synth.pages(spark, n_urls=50, n_slots=4)
    b = df.select(P.url_bucket("url", 16).alias("b"))
    stats = b.agg(F.min("b"), F.max("b"), F.countDistinct("b")).collect()[0]
    assert stats[0] >= 0 and stats[1] < 16
    # same url -> same bucket across calls (deterministic)
    b2 = df.select(P.url_bucket("url", 16).alias("b"))
    assert b.exceptAll(b2).count() == 0


def test_day_bucket_end_of_interval(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "warc_ts": pd.to_datetime(
                ["2024-01-01 00:30:00", "2024-01-02 00:00:00", "2024-01-02 00:30:00"]
            )
        }
    )
    out = (
        spark.createDataFrame(pdf)
        .select(P.day_bucket("warc_ts").alias("d"))
        .toPandas()["d"]
        .astype(str)
        .tolist()
    )
    # 00:00 end-of-day label belongs to the PREVIOUS day's partition
    assert out == ["2024-01-01", "2024-01-01", "2024-01-02"]


def test_two_phase_avg_equals_plain_avg_under_skew(spark):
    # hot-domain skew: one domain holds most rows; salted two-phase agg
    # must produce identical results to the plain agg
    df = synth.pages(spark, n_urls=300, n_slots=48, skew=4.0, n_domains=10).select(
        F.regexp_extract("url", r"https://(site\d+)", 1).alias("domain"), "value"
    )
    plain = (
        df.groupBy("domain")
        .agg(F.avg("value").alias("avg_value"), F.count("value").alias("cnt_value"))
        .toPandas()
        .sort_values("domain")
        .reset_index(drop=True)
    )
    salted = (
        P.two_phase_avg(df, ["domain"], "value", n_salts=16, sum_cast=None)
        .toPandas()
        .sort_values("domain")
        .reset_index(drop=True)
    )
    assert salted["cnt_value"].tolist() == plain["cnt_value"].tolist()
    np.testing.assert_allclose(salted["avg_value"], plain["avg_value"], rtol=1e-12)
    # skew sanity: top domain really is hot
    assert plain["cnt_value"].max() > 4 * plain["cnt_value"].median()


def test_salted_partials_spread_hot_key(spark):
    df = synth.pages(spark, n_urls=200, n_slots=8, skew=4.0, n_domains=5).select(
        F.regexp_extract("url", r"https://(site\d+)", 1).alias("domain"), "value"
    )
    parts = (
        P.salted(df, "domain", n_salts=8)
        .groupBy("domain", "salt")
        .count()
        .groupBy("domain")
        .agg(F.countDistinct("salt").alias("n_salts"))
        .toPandas()
    )
    hot = parts.sort_values("n_salts", ascending=False).iloc[0]
    assert hot["n_salts"] >= 6  # hot key spread over most salt buckets


def test_skew_report_flags_hot_key(spark):
    import pandas as pd

    from isp_trace_parser_spark.plans.partitioning import skew_report

    # one key with 80% of rows, 20 cold keys sharing the rest
    rows = [("hot",)] * 800 + [(f"cold{i % 20}",) for i in range(200)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k"]))
    out = skew_report(df, ["k"], parallelism=10, top_k=3).collect()
    assert out[0]["k"] == "hot" and out[0]["key_rows"] == 800
    # hot key needs ~ 800 / (1000/10) = 8 salts; cold keys need 1
    assert out[0]["suggested_salts"] == 8
    assert all(r["suggested_salts"] == 1 for r in out[1:])
    assert abs(out[0]["row_share"] - 0.8) < 1e-12
