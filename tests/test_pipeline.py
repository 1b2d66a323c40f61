"""Catalog + pipeline: partitioned layout, snapshot lineage,
checkpoint/resume skipping, retention expiry."""

from __future__ import annotations

import datetime
import os

import pytest

from isp_trace_parser_spark import synth
from isp_trace_parser_spark.operators.retention import RetentionPolicy
from isp_trace_parser_spark.pipeline import ingest_pages, run_rollup_pipeline
from isp_trace_parser_spark.sources.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "warehouse"))


def test_ingest_layout(spark, cat):
    pages = synth.pages(spark, n_urls=8, n_slots=48 * 3)
    snap = ingest_pages(cat, pages, n_buckets=4)
    assert snap["operation"] == "write:overwrite"
    days = cat.list_partitions("pages", "day_bucket")
    assert days == ["2024-01-01", "2024-01-02", "2024-01-03"]
    # nested url_bucket dirs exist
    p0 = os.path.join(cat.table_path("pages"), "day_bucket=2024-01-01")
    assert any(e.startswith("url_bucket=") for e in os.listdir(p0))
    # read back with partition pruning columns intact
    df = cat.read("pages")
    assert "day_bucket" in df.columns and "url_bucket" in df.columns
    assert df.count() == 8 * 48 * 3


def test_pipeline_tiers_and_resume(spark, cat):
    pages = synth.pages(spark, n_urls=6, n_slots=48 * 35, gap_pct=5)
    ingest_pages(cat, pages, n_buckets=4)

    res1 = run_rollup_pipeline(spark, cat)
    assert res1.stages_run == ["agg_30m", "agg_1d", "agg_1mo", "blocks_30m"]
    assert res1.metrics["blocks_30m"]["compression_ratio"] > 1.0

    t30 = cat.read("agg_30m")
    t1d = cat.read("agg_1d")
    t1mo = cat.read("agg_1mo")
    assert t30.count() > t1d.count() > t1mo.count() > 0
    # tier exactness: daily sum == 30m sum
    assert (
        abs(
            t1d.groupBy().sum("sum_value").collect()[0][0]
            - t30.groupBy().sum("sum_value").collect()[0][0]
        )
        < 1e-6
    )

    # resume: identical input watermark -> all stages skipped
    res2 = run_rollup_pipeline(spark, cat)
    assert res2.stages_run == []
    assert res2.stages_skipped == ["agg_30m", "agg_1d", "agg_1mo", "blocks_30m"]

    # snapshots carry lineage: the input-partition fingerprint map
    last = cat.last_snapshot("agg_30m")
    assert last["lineage"]["stage"] == "agg_30m"
    assert last["lineage"]["input_state"]
    assert last["partitions"]  # per-partition bytes/files/sig recorded
    assert all("sig" in m for m in last["partitions"].values())


def test_retention_expires_old_partitions(spark, cat):
    pages = synth.pages(spark, n_urls=4, n_slots=48 * 10)
    ingest_pages(cat, pages, n_buckets=2)
    run_rollup_pipeline(spark, cat, encode_blocks=False)

    days = cat.list_partitions("agg_30m", "day_bucket")
    assert len(days) == 10
    # keep 3 days of raw + 30m as of the day after the data ends
    now = datetime.datetime(2024, 1, 11)
    policy = RetentionPolicy(raw_keep_days=3, t30_keep_days=5, t1d_keep_months=36)
    res = run_rollup_pipeline(spark, cat, policy=policy, now=now, encode_blocks=False)
    rep = res.metrics["retention"]
    assert rep["pages"] == [f"2024-01-0{i}" for i in range(1, 8)]
    assert rep["agg_30m"] == [f"2024-01-0{i}" for i in range(1, 6)]
    assert cat.list_partitions("agg_30m", "day_bucket") == [
        "2024-01-06", "2024-01-07", "2024-01-08", "2024-01-09", "2024-01-10",
    ]
    # coarser tiers still hold the full history (downsample before expire)
    assert cat.read("agg_1d").count() == 4 * 10
    # expiry recorded as a snapshot
    ops = [s["operation"] for s in cat.snapshots("agg_30m")]
    assert "expire" in ops

    # a retention pass must NOT force tier recomputation: re-running the
    # pipeline after expiry skips every stage (regression: expire
    # snapshots used to mask the write watermark, and the rebuild then
    # truncated agg_30m to the surviving raw days)
    res2 = run_rollup_pipeline(spark, cat, encode_blocks=False)
    assert res2.stages_run == []
    assert cat.list_partitions("agg_30m", "day_bucket")[0] == "2024-01-06"


def test_incremental_append_preserves_history(spark, cat):
    import pyspark.sql.functions as F

    # days 1-10 land, tiers built, raw expired down to days 9-10
    pages = synth.pages(spark, n_urls=4, n_slots=48 * 10)
    ingest_pages(cat, pages, n_buckets=2)
    run_rollup_pipeline(spark, cat, encode_blocks=False)
    now = datetime.datetime(2024, 1, 11)
    run_rollup_pipeline(
        spark, cat,
        policy=RetentionPolicy(raw_keep_days=2, t30_keep_days=365),
        now=now, encode_blocks=False,
    )
    assert cat.list_partitions("pages", "day_bucket") == ["2024-01-09", "2024-01-10"]

    # a new crawl increment lands days 11-12 (shift the synth by 10 days)
    inc = synth.pages(spark, n_urls=4, n_slots=48 * 2).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 10 DAYS")
    )
    ingest_pages(cat, inc, n_buckets=2, mode="dynamic")
    res = run_rollup_pipeline(spark, cat, encode_blocks=False)
    assert "agg_30m" in res.stages_run

    # 30m tier: full 12 days retained — incremental recompute touched
    # only day >= the previous watermark's day, not the expired history
    days = cat.list_partitions("agg_30m", "day_bucket")
    assert days == [f"2024-01-{d:02d}" for d in range(1, 13)]
    t30 = cat.read("agg_30m")
    assert t30.count() == 4 * 48 * 12
    # daily tier covers all 12 days too
    assert cat.read("agg_1d").count() == 4 * 12


def test_bucketed_tiers_parity_and_plan(spark, tmp_path):
    """bucketed_tiers=True must produce byte-identical tier contents to
    the default layout, keep incremental dynamic overwrite + resume
    semantics, and make downstream series-keyed reads exchange-free."""
    import pandas as pd
    from pyspark.sql import functions as F

    from isp_trace_parser_spark.operators import rollup

    pages = synth.pages(spark, n_urls=6, n_slots=48 * 5, gap_pct=5)
    cat_a = Catalog(spark, str(tmp_path / "wh_plain"))
    cat_b = Catalog(spark, str(tmp_path / "wh_bucketed"))
    for c in (cat_a, cat_b):
        ingest_pages(c, pages, n_buckets=4)
    run_rollup_pipeline(spark, cat_a)
    res_b = run_rollup_pipeline(spark, cat_b, bucketed_tiers=True, tier_buckets=4)
    assert res_b.stages_run[:2] == ["agg_30m", "agg_1d"]

    cols = ["series", "bucket_ts", "avg_value", "sum_value", "cnt_value"]
    a = cat_a.read("agg_30m").select(cols).toPandas().sort_values(
        ["series", "bucket_ts"]).reset_index(drop=True)
    b = cat_b.read("agg_30m").select(cols).toPandas().sort_values(
        ["series", "bucket_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # downstream cascade from the bucketed tier: zero exchanges
    t1d = rollup.rollup_cascade(
        cat_b.read("agg_30m").drop("day_bucket"), rollup.TIER_SECONDS["1d"]
    )
    assert t1d._jdf.queryExecution().executedPlan().toString().count("Exchange") == 0

    # resume semantics intact
    res_resume = run_rollup_pipeline(spark, cat_b, bucketed_tiers=True,
                                     tier_buckets=4)
    assert res_resume.stages_run == []

    # incremental append: only the new day recomputes, bucketing kept
    extra = synth.pages(spark, n_urls=6, n_slots=48, gap_pct=5).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 5 DAYS")
    )
    ingest_pages(cat_b, extra, n_buckets=4, mode="dynamic")
    res_inc = run_rollup_pipeline(spark, cat_b, bucketed_tiers=True,
                                  tier_buckets=4)
    assert "agg_30m" in res_inc.stages_run
    days = cat_b.list_partitions("agg_30m", "day_bucket")
    assert "2024-01-06" in days
    # untouched history is preserved exactly through the dynamic
    # bucketed overwrite (buckets end labels at 00:00 of the NEXT day,
    # so compare via the partition column, not bucket_ts prefixes)
    day1 = (
        cat_b.read("agg_30m").where("day_bucket = '2024-01-01'")
        .select(cols).toPandas()
        .sort_values(["series", "bucket_ts"]).reset_index(drop=True)
    )
    day1_before = (
        a.merge(day1[["series", "bucket_ts"]], on=["series", "bucket_ts"])
        .sort_values(["series", "bucket_ts"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(day1, day1_before)


def test_partitioned_bucketed_reregister(spark, tmp_path):
    """Fresh-session recovery of a PARTITIONED + BUCKETED tier table:
    read() must recreate it via CREATE ... PARTITIONED BY ... CLUSTERED
    BY ... LOCATION + MSCK REPAIR, with row parity and 0-exchange
    series aggregation."""
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "wh_rr"))
    ingest_pages(
        cat, synth.pages(spark, n_urls=10, n_slots=48 * 3, gap_pct=0),
        n_buckets=2,
    )
    run_rollup_pipeline(spark, cat, bucketed_tiers=True, tier_buckets=4,
                        encode_blocks=False)
    n1 = cat.read("agg_30m").count()
    spark.sql(f"DROP TABLE {cat._ident('agg_30m')}")  # fresh-session sim
    back = cat.read("agg_30m")
    assert back.count() == n1
    agg = back.groupBy("series").agg(F.sum("cnt_value").alias("n"))
    assert agg._jdf.queryExecution().executedPlan().toString().count("Exchange") == 0


def test_retention_plan_is_dry_run(spark, tmp_path):
    """retention_plan reports exactly what apply_retention would drop,
    and drops nothing itself."""
    import datetime

    from isp_trace_parser_spark import synth
    from isp_trace_parser_spark.operators.retention import (
        RetentionPolicy,
        apply_retention,
        retention_plan,
    )
    from isp_trace_parser_spark.pipeline import (
        ingest_pages,
        run_rollup_pipeline,
    )
    from isp_trace_parser_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    pages = synth.pages(spark, n_urls=4, n_slots=48 * 10, gap_pct=0).select(
        "url", "warc_ts", "value"
    )
    ingest_pages(cat, pages)
    run_rollup_pipeline(spark, cat, encode_blocks=False)
    now = pages.agg({"warc_ts": "max"}).collect()[0][0]
    policy = RetentionPolicy(raw_keep_days=3, t30_keep_days=6)
    plan = retention_plan(cat, policy, now)
    n_raw_before = len(cat.list_partitions("pages", "day_bucket"))
    assert len(plan["pages"]) > 0  # something would expire
    # dry run dropped nothing
    assert len(cat.list_partitions("pages", "day_bucket")) == n_raw_before
    # the real pass drops exactly the planned set
    dropped = apply_retention(cat, policy, now)
    assert dropped == plan
    assert len(cat.list_partitions("pages", "day_bucket")) == (
        n_raw_before - len(plan["pages"])
    )
