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


def test_commit_snapshot_incremental_walks_only_touched(spark, cat, monkeypatch):
    """A dynamic single-partition write must stat only that partition's
    subtree — O(partitions touched), never a full-table walk
    (VERDICT r2 #1)."""
    from isp_trace_parser_spark.sources import catalog as catmod

    cat.write(_df(spark), "t", partition_by=["k"])
    full = cat.last_snapshot("t")["partitions"]

    walked = []
    real_walk = os.walk

    def counting_walk(path, *a, **kw):
        walked.append(os.path.basename(str(path).rstrip("/")))
        return real_walk(path, *a, **kw)

    monkeypatch.setattr(catmod.os, "walk", counting_walk)
    cat.write(
        _df(spark).where("k = 'p0'"), "t", partition_by=["k"], mode="dynamic"
    )
    # only the touched partition dir was walked — not the table root
    assert walked == ["k=p0"]
    snap = cat.last_snapshot("t")["partitions"]
    # carried-forward metrics are byte-identical to a fresh full stat
    assert snap == cat._stat_tree(cat.table_path("t"))
    assert snap["k=p1"] == full["k=p1"] and snap["k=p2"] == full["k=p2"]
    assert snap["k=p0"]["sig"] != full["k=p0"]["sig"]


def test_expire_commit_is_incremental(spark, cat, monkeypatch):
    from isp_trace_parser_spark.sources import catalog as catmod

    cat.write(_df(spark), "t", partition_by=["k"])
    before = cat.last_snapshot("t")["partitions"]
    monkeypatch.setattr(
        catmod.os, "walk",
        lambda *a, **kw: (_ for _ in ()).throw(AssertionError("walked")),
    )
    snap = cat.expire_partitions("t", "k", ["p0"])
    assert set(snap["partitions"]) == {"k=p1", "k=p2"}
    assert snap["partitions"]["k=p1"] == before["k=p1"]
    assert snap["bytes"] == sum(
        m["bytes"] for r, m in before.items() if r != "k=p0"
    )


def test_compact_partition_scoped_and_atomic(spark, cat):
    """Only partitions whose file count exceeds the bytes-derived target
    are rewritten; untouched partitions' files stay byte-identical; a
    stray crash-leftover tmp dir is invisible to reads (VERDICT r2 #3)."""
    import glob

    # p0 accretes small files via dynamic appends; p1/p2 stay single-file
    cat.write(_df(spark), "t", partition_by=["k"], dist_buckets=None)
    for _ in range(3):
        cat.write(
            _df(spark, 300).where("k = 'p0'"), "t",
            partition_by=["k"], mode="append", repartition=False,
        )
    path = cat.table_path("t")
    p1_files = {
        f: os.path.getsize(os.path.join(path, "k=p1", f))
        for f in os.listdir(os.path.join(path, "k=p1"))
    }
    rows_before = cat.read("t").count()
    assert len(glob.glob(os.path.join(path, "k=p0", "*.parquet"))) > 1

    # simulate a crash leftover from an earlier interrupted compaction
    junk = os.path.join(path, ".k=p9.compact_tmp")
    os.makedirs(junk, exist_ok=True)
    with open(os.path.join(junk, "part-junk.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    assert cat.read("t").count() == rows_before  # hidden dir ignored

    snap = cat.compact("t", sort_within=["ts"])
    assert snap["lineage"]["compacted_partitions"] == ["k=p0"]
    assert len(glob.glob(os.path.join(path, "k=p0", "*.parquet"))) == 1
    assert cat.read("t").count() == rows_before
    # untouched partition files not rewritten (same names and sizes)
    p1_after = {
        f: os.path.getsize(os.path.join(path, "k=p1", f))
        for f in os.listdir(os.path.join(path, "k=p1"))
    }
    assert p1_after == p1_files
    # snapshot metrics match a fresh full stat after the swap
    assert snap["partitions"] == cat._stat_tree(path)


def test_compact_refuses_bucketed_tables(spark, cat):
    df = _df(spark, 200)
    cat.write_bucketed(df, "b", bucket_by=["k"], n_buckets=4)
    with pytest.raises(ValueError, match="bucket"):
        cat.compact("b")


def test_hive_partition_rel_escaping():
    from isp_trace_parser_spark.sources.catalog import hive_partition_rel

    assert hive_partition_rel(["k"], ["p0"]) == "k=p0"
    assert hive_partition_rel(["a", "b"], ["x", 3]) == "a=x/b=3"
    assert hive_partition_rel(["k"], [None]) == "k=__HIVE_DEFAULT_PARTITION__"
    assert hive_partition_rel(["k"], ["a:b/c"]) == "k=a%3Ab%2Fc"
    assert hive_partition_rel(["k"], [True]) == "k=true"


def test_compact_recovery_all_interleavings(spark, cat):
    """Every crash window of compact() must be recoverable by the next
    compact() run with zero data loss (code-review r3 finding)."""
    import glob

    cat.write(_df(spark), "t", partition_by=["k"], dist_buckets=None)
    path = cat.table_path("t")
    rows = cat.read("t").count()

    # crash between the two renames: partition parked at .compact_old,
    # live dir missing
    os.rename(os.path.join(path, "k=p0"), os.path.join(path, ".k=p0.compact_old"))
    cat.compact("t")  # recovery sweep runs first
    assert cat.read("t").count() == rows
    assert os.path.isdir(os.path.join(path, "k=p0"))
    assert not os.path.exists(os.path.join(path, ".k=p0.compact_old"))

    # crash after swap, before cleanup: live dir present AND old parked
    import shutil as _sh

    _sh.copytree(os.path.join(path, "k=p1"), os.path.join(path, ".k=p1.compact_old"))
    cat.compact("t")
    assert cat.read("t").count() == rows
    assert not os.path.exists(os.path.join(path, ".k=p1.compact_old"))


def test_compact_root_recovery_mid_move_in(spark, cat):
    """Unpartitioned root: crash after parking originals (marker set)
    and moving SOME replacements in — recovery must restore the
    originals exactly, dropping partial replacements."""
    cat.write(_df(spark, 500), "t", repartition=False)
    path = cat.table_path("t")
    rows = cat.read("t").count()
    old = os.path.join(path, ".root.compact_old")
    os.makedirs(old)
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            os.rename(os.path.join(path, f), os.path.join(old, f))
    open(os.path.join(old, ".parked"), "w").close()
    # a partial replacement file appears live
    with open(os.path.join(path, "part-partial.parquet"), "wb") as fh:
        fh.write(b"garbage")
    cat.compact("t")
    assert cat.read("t").count() == rows
    assert not os.path.exists(old)
    assert not os.path.exists(os.path.join(path, "part-partial.parquet"))


def test_compact_unknown_partition_raises(spark, cat):
    cat.write(_df(spark), "t", partition_by=["k"])
    with pytest.raises(ValueError, match="not in t's snapshot"):
        cat.compact("t", partitions=["k=p9"])
    # and nothing was rewritten
    assert cat.last_snapshot("t")["operation"] == "write:overwrite"


def test_read_at_snapshot_time_travel_across_appends(spark, cat):
    """read_at() reconstructs the table as of each append snapshot from
    its file manifest; a later dynamic overwrite invalidates earlier
    snapshots LOUDLY (single-copy storage, not silent partial data)."""
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"k": ["p0"] * 4 + ["p1"] * 4, "v": range(8)})
    )
    s1 = cat.write(df.where("v < 4"), "tt", partition_by=["k"])
    s2 = cat.write(
        df.where("v >= 4"), "tt", partition_by=["k"], mode="append"
    )
    assert cat.read_at("tt", s1["snapshot_id"]).count() == 4
    assert cat.read_at("tt", s2["snapshot_id"]).count() == 8
    # partition column survives the file-list read
    got = cat.read_at("tt", s1["snapshot_id"]).select("k").distinct().collect()
    assert {r["k"] for r in got} == {"p0"}
    # latest snapshot == live read
    assert cat.read("tt").count() == 8

    # rewrite partition p0 -> snapshots that referenced its old files
    # must now fail loud
    cat.write(
        df.where("v < 4").withColumn("v", F.col("v") + 100),
        "tt", partition_by=["k"], mode="dynamic",
    )
    with pytest.raises(ValueError, match="no longer readable"):
        cat.read_at("tt", s1["snapshot_id"])

    # unknown id is a clear error too
    with pytest.raises(ValueError, match="unknown snapshot"):
        cat.read_at("tt", "deadbeef")


def test_read_merge_schema_additive_evolution(spark, cat):
    """Additive schema evolution: a later tranche lands an extra column;
    merge_schema=True surfaces it (NULL for old files), default read
    keeps the original schema untouched."""
    import pandas as pd

    t1 = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "b"], "v": [1.0, 2.0]})
    )
    t2 = spark.createDataFrame(
        pd.DataFrame({"k": ["c"], "v": [3.0], "quality": [0.9]})
    )
    cat.write(t1, "evo", partition_by=["k"])
    cat.write(t2, "evo", partition_by=["k"], mode="append")

    merged = cat.read("evo", merge_schema=True)
    assert "quality" in merged.columns
    rows = {r["k"]: r for r in merged.collect()}
    assert rows["c"]["quality"] == 0.9
    assert rows["a"]["quality"] is None


def test_narrow_projection_prunes_scan_columns(spark, cat):
    """Column pruning reaches the parquet scan: selecting one data
    column must not read the others (ReadSchema in the physical plan)."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a", "b"], "v": [1.0, 2.0], "w": [3.0, 4.0],
             "payload": ["x" * 10, "y" * 10]}
        )
    )
    cat.write(df, "narrow", partition_by=["k"])
    plan = (
        cat.read("narrow")
        .select("v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "v:double" in rs[0] and "payload" not in rs[0], plan


def test_vacuum_removes_orphans_keeps_live(spark, cat):
    """vacuum() deletes parquet files the last manifest doesn't
    reference (crash leftovers) and stray compaction dirs, and never
    touches live data."""
    import os

    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"k": ["a", "b"], "v": [1, 2]}))
    cat.write(df, "vac", partition_by=["k"])
    path = cat.table_path("vac")
    orphan = os.path.join(path, "k=a", "part-orphan-junk.parquet")
    spark.createDataFrame(pd.DataFrame({"v": [99]})).toPandas().to_parquet(orphan)
    os.makedirs(os.path.join(path, ".k=zz.compact_tmp"))
    before = cat.read("vac").count()  # dir-scan read WOULD see the orphan
    snap = cat.vacuum("vac")
    assert "k=a/part-orphan-junk.parquet" in snap["lineage"]["removed_files"]
    assert not os.path.exists(orphan)
    assert not os.path.exists(os.path.join(path, ".k=zz.compact_tmp"))
    assert cat.read("vac").count() == 2
    assert snap["operation"] == "vacuum"
    assert before >= 2  # sanity: orphan was visible pre-vacuum


def test_rollback_restores_earlier_snapshot(spark, cat):
    """rollback() to an append-history snapshot removes the later
    tranche's files and the live read equals the old state; rolling
    back past a rewrite fails loud."""
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a"] * 3 + ["b"] * 3, "v": range(6)})
    )
    s1 = cat.write(df.where("v < 3"), "rb", partition_by=["k"])
    cat.write(df.where("v >= 3"), "rb", partition_by=["k"], mode="append")
    assert cat.read("rb").count() == 6
    snap = cat.rollback("rb", s1["snapshot_id"])
    assert cat.read("rb").count() == 3
    assert snap["lineage"]["rolled_back_to"] == s1["snapshot_id"]
    assert snap["rows"] == 3  # footer-derived row metric reflects rollback

    # dynamic overwrite rewrites k=a; old snapshot unreachable
    s3 = cat.last_snapshot("rb")
    cat.write(
        df.where("v < 3").withColumn("v", F.col("v") + 10),
        "rb", partition_by=["k"], mode="dynamic",
    )
    with pytest.raises(ValueError, match="no longer exist"):
        cat.rollback("rb", s1["snapshot_id"])


def test_rollback_never_touches_recovery_dirs(spark, cat):
    """rollback() must not descend into hidden '.'/'_'-prefixed dirs
    (compaction recovery areas): their parquet files are not the
    manifest's to GC (ADVICE r3 — the bottom-up walk ignored the
    dirname filter)."""
    import os

    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a"] * 2 + ["b"] * 2, "v": range(4)})
    )
    s1 = cat.write(df.where("v < 2"), "rbh", partition_by=["k"])
    cat.write(df.where("v >= 2"), "rbh", partition_by=["k"], mode="append")
    path = cat.table_path("rbh")
    hidden = os.path.join(path, "k=a", ".compact_old")
    os.makedirs(hidden)
    stash = os.path.join(hidden, "part-stash.parquet")
    with open(stash, "wb") as f:
        f.write(b"not a real parquet, just bytes to preserve")
    cat.rollback("rbh", s1["snapshot_id"])
    assert os.path.exists(stash), "rollback deleted a recovery-dir file"
    assert cat.read("rbh").count() == 2
