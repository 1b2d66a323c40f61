"""Catalog shim invariants."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from isp_trace_parser_spark.sources.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def _df(spark, n=1000):
    pdf = pd.DataFrame(
        {
            "k": [f"p{i % 3}" for i in range(n)],
            "ts": pd.date_range("2024-01-01", periods=n, freq="7min"),
            "v": range(n),
        }
    )
    return spark.createDataFrame(pdf.sample(frac=1.0, random_state=7))


def test_sort_within_partition_files(spark, cat):
    # regression: FileFormatWriter injects a sort by partition cols when
    # they don't prefix the requested ordering, scrambling the files
    cat.write(_df(spark), "t", partition_by=["k"], sort_within=["ts"])
    pdir = os.path.join(cat.table_path("t"), "k=p0")
    files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
    for f in files:
        part = pd.read_parquet(os.path.join(pdir, f))
        assert part["ts"].is_monotonic_increasing


def test_write_fans_hot_partition_across_tasks(spark, cat):
    """A hot partition value must not serialize through one reducer:
    with the default salted distribution, each partition value's rows
    fan out across >1 task (>1 file); dist_buckets=None restores the
    one-file-per-value layout."""
    pdf = pd.DataFrame(
        {
            "k": [f"p{i % 2}" for i in range(4000)],
            "series": [f"s{i % 64}" for i in range(4000)],
            "ts": pd.date_range("2024-01-01", periods=4000, freq="1min"),
            "v": range(4000),
        }
    )
    df = spark.createDataFrame(pdf)
    # AQE would coalesce this 4000-row shuffle into one partition; at
    # scale a hot day exceeds the advisory size and keeps its buckets.
    # Disable coalescing so the salt's fan-out is observable at test size.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        cat.write(df, "hot", partition_by=["k"], sort_within=["series", "ts"])
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    for part in ("k=p0", "k=p1"):
        pdir = os.path.join(cat.table_path("hot"), part)
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        assert len(files) > 1, f"{part} wrote through a single task"
        for f in files:  # each file still (series, ts)-sorted
            data = pd.read_parquet(os.path.join(pdir, f))
            assert not data.sort_values(["series", "ts"]).reset_index(
                drop=True
            ).compare(data.reset_index(drop=True)).size
    cat.write(
        df, "cold", partition_by=["k"], sort_within=["series", "ts"],
        dist_buckets=None,
    )
    for part in ("k=p0", "k=p1"):
        pdir = os.path.join(cat.table_path("cold"), part)
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        assert len(files) == 1


def test_dynamic_overwrite_preserves_other_partitions(spark, cat):
    cat.write(_df(spark), "t", partition_by=["k"])
    before = cat.read("t").where("k = 'p1'").count()
    only_p0 = _df(spark).where("k = 'p0'")
    cat.write(only_p0, "t", partition_by=["k"], mode="dynamic")
    assert cat.read("t").where("k = 'p1'").count() == before


def test_snapshot_log_and_sigs(spark, cat):
    cat.write(_df(spark), "t", partition_by=["k"])
    s1 = cat.last_snapshot("t")
    assert set(s1["partitions"]) == {"k=p0", "k=p1", "k=p2"}
    sigs1 = {k: v["sig"] for k, v in s1["partitions"].items()}
    # rewrite only p0 -> only p0's fingerprint changes
    cat.write(_df(spark).where("k = 'p0'"), "t", partition_by=["k"], mode="dynamic")
    sigs2 = {k: v["sig"] for k, v in cat.last_snapshot("t")["partitions"].items()}
    assert sigs1["k=p1"] == sigs2["k=p1"]
    assert sigs1["k=p2"] == sigs2["k=p2"]
    assert sigs1["k=p0"] != sigs2["k=p0"]


def test_compact_small_files(spark, cat):
    import glob

    # accrete small files via repeated appends
    for _ in range(4):
        cat.write(_df(spark, 400), "t", mode="append", repartition=False)
    files_before = glob.glob(os.path.join(cat.table_path("t"), "*.parquet"))
    rows_before = cat.read("t").count()
    assert len(files_before) > 8

    cat.compact("t", target_rows_per_file=10_000)
    files_after = glob.glob(os.path.join(cat.table_path("t"), "*.parquet"))
    assert len(files_after) < len(files_before)
    assert cat.read("t").count() == rows_before
    assert cat.last_snapshot("t")["operation"] == "compact"


def test_expire_partitions(spark, cat):
    cat.write(_df(spark), "t", partition_by=["k"])
    cat.expire_partitions("t", "k", ["p0"])
    assert cat.list_partitions("t", "k") == ["p1", "p2"]
    ops = [s["operation"] for s in cat.snapshots("t")]
    assert ops[-1] == "expire"
