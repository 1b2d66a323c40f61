"""End-to-end rollup + retention pipeline with snapshot checkpointing
and per-partition lineage.

Stage DAG (one raw scan total, reference §3.1 collapsed into declarative
Spark per SURVEY §7.4):

    pages (raw, day_bucket x url_bucket partitions)
      └─ stage "agg_30m": groupBy(url, 30m bucket) -> write partitioned
           └─ stage "agg_1d": re-agg partials -> write
                └─ stage "agg_1mo": re-agg partials -> write
           └─ stage "blocks_30m": Gorilla-encode per (url, day) block
      └─ stage "retention": expire partitions past each tier's horizon

Checkpoint/resume: each stage commits a snapshot whose lineage records
the INPUT day-partition watermark it covered. On restart, stages whose
snapshot watermark already covers the input are skipped (idempotent
re-run), mirroring Iceberg snapshot-based incremental processing. The
driver does no per-partition looping — skipping happens at stage
granularity, and within a stage Spark's own scheduler owns parallelism.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from isp_trace_parser_spark.operators import codec, rollup
from isp_trace_parser_spark.operators.retention import RetentionPolicy, apply_retention
from isp_trace_parser_spark.plans.partitioning import (
    DEFAULT_URL_BUCKETS,
    month_bucket,
    with_partition_keys,
)
from isp_trace_parser_spark.sources.catalog import Catalog


@dataclass
class PipelineResult:
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)
    metrics: dict[str, Any] = field(default_factory=dict)


def _watermark(df: DataFrame, ts_col: str) -> str | None:
    row = df.agg(F.max(ts_col).alias("wm")).collect()[0]
    return str(row["wm"]) if row["wm"] is not None else None


def _last_write_watermark(cat: Catalog, table: str) -> str | None:
    """Watermark of the last WRITE snapshot — expire/retention snapshots
    carry no input_watermark and must not mask it (a retention pass must
    never force recomputation of a tier)."""
    for snap in reversed(cat.snapshots(table)):
        wm = snap.get("lineage", {}).get("input_watermark")
        if wm is not None:
            return wm
    return None


def _already_done(cat: Catalog, table: str, watermark: str | None) -> bool:
    return watermark is not None and _last_write_watermark(cat, table) == watermark


def ingest_pages(
    cat: Catalog,
    pages: DataFrame,
    table: str = "pages",
    n_buckets: int = DEFAULT_URL_BUCKETS,
    mode: str = "overwrite",
) -> dict[str, Any]:
    """Land the raw table partitioned by (day_bucket, url_bucket) and
    sorted by warc_ts within partitions — the layout every downstream
    stage and query pruning relies on. ``mode='dynamic'`` lands a new
    crawl increment, replacing only the day partitions it covers."""
    keyed = with_partition_keys(pages, n_buckets=n_buckets)
    return cat.write(
        keyed,
        table,
        partition_by=["day_bucket", "url_bucket"],
        sort_within=["url", "warc_ts"],
        mode=mode,
        lineage={"stage": "ingest"},
    )


def run_rollup_pipeline(
    spark: SparkSession,
    cat: Catalog,
    raw_table: str = "pages",
    policy: RetentionPolicy | None = None,
    now: datetime.datetime | None = None,
    encode_blocks: bool = True,
) -> PipelineResult:
    res = PipelineResult()
    raw = cat.read(raw_table)
    wm = _watermark(raw, "warc_ts")

    def _cutoff_date(prev_wm: str | None) -> datetime.date | None:
        """First day partition that may contain data newer than the
        previous run: the (end-of-interval) day of the old watermark."""
        if prev_wm is None:
            return None
        dt = datetime.datetime.fromisoformat(prev_wm)
        return (dt - datetime.timedelta(seconds=1)).date()

    # -- tier 30m (the one raw scan; incremental over day partitions) ----
    if _already_done(cat, "agg_30m", wm):
        res.stages_skipped.append("agg_30m")
    else:
        cutoff = _cutoff_date(_last_write_watermark(cat, "agg_30m"))
        src = raw if cutoff is None else raw.where(F.col("day_bucket") >= F.lit(cutoff))
        t30 = rollup.rollup_raw(src, "url", "warc_ts", "value").withColumn(
            "day_bucket", F.to_date(F.col("bucket_ts") - F.expr("INTERVAL 1 SECOND"))
        )
        # dynamic partition overwrite: only recomputed day partitions are
        # replaced — tier history retained past raw expiry is untouched
        snap = cat.write(
            t30,
            "agg_30m",
            partition_by=["day_bucket"],
            sort_within=["series", "bucket_ts"],
            mode="dynamic",
            lineage={"stage": "agg_30m", "input_watermark": wm,
                     "incremental_from": str(cutoff) if cutoff else None},
        )
        res.metrics["agg_30m"] = {"files": snap["files"], "bytes": snap["bytes"]}
        res.stages_run.append("agg_30m")

    # -- tier 1d from 30m partials (incremental over month partitions) ---
    if _already_done(cat, "agg_1d", wm):
        res.stages_skipped.append("agg_1d")
    else:
        cutoff = _cutoff_date(_last_write_watermark(cat, "agg_1d"))
        t30_stored = cat.read("agg_30m")
        if cutoff is not None:
            # recompute affected months in full (agg_30m retains >= 1
            # month of history by policy construction)
            month_start = cutoff.replace(day=1)
            t30_stored = t30_stored.where(F.col("day_bucket") >= F.lit(month_start))
        t1d = rollup.rollup_cascade(
            t30_stored.drop("day_bucket"), rollup.TIER_SECONDS["1d"]
        ).withColumn("month_bucket", month_bucket("bucket_ts"))
        snap = cat.write(
            t1d,
            "agg_1d",
            partition_by=["month_bucket"],
            sort_within=["series", "bucket_ts"],
            mode="dynamic",
            lineage={"stage": "agg_1d", "input_watermark": wm,
                     "incremental_from": str(cutoff) if cutoff else None},
        )
        res.metrics["agg_1d"] = {"files": snap["files"], "bytes": snap["bytes"]}
        res.stages_run.append("agg_1d")

    # -- tier 1mo from 1d partials (tiny table: full rewrite) -------------
    if _already_done(cat, "agg_1mo", wm):
        res.stages_skipped.append("agg_1mo")
    else:
        t1d_stored = cat.read("agg_1d").drop("month_bucket")
        t1mo = rollup.monthly_from_daily(t1d_stored)
        snap = cat.write(
            t1mo,
            "agg_1mo",
            sort_within=["series", "bucket_ts"],
            mode="overwrite",
            lineage={"stage": "agg_1mo", "input_watermark": wm},
        )
        res.metrics["agg_1mo"] = {"files": snap["files"], "bytes": snap["bytes"]}
        res.stages_run.append("agg_1mo")

    # -- Gorilla blocks over the 30m tier (incremental like agg_30m) ------
    if encode_blocks:
        if _already_done(cat, "blocks_30m", wm):
            res.stages_skipped.append("blocks_30m")
        else:
            cutoff = _cutoff_date(_last_write_watermark(cat, "blocks_30m"))
            t30_stored = cat.read("agg_30m")
            if cutoff is not None:
                t30_stored = t30_stored.where(F.col("day_bucket") >= F.lit(cutoff))
            blocks = codec.encode_blocks(
                t30_stored, "series", "bucket_ts", "avg_value", block="1 day"
            ).withColumn("day_bucket", F.to_date("block_start"))
            snap = cat.write(
                blocks,
                "blocks_30m",
                partition_by=["day_bucket"],
                sort_within=["series"],
                mode="dynamic",
                lineage={"stage": "blocks_30m", "input_watermark": wm,
                         "incremental_from": str(cutoff) if cutoff else None},
            )
            ratio = (
                cat.read("blocks_30m")
                .agg((F.sum("raw_bytes") / F.sum("enc_bytes")).alias("r"))
                .collect()[0]["r"]
            )
            res.metrics["blocks_30m"] = {
                "files": snap["files"],
                "bytes": snap["bytes"],
                "compression_ratio": ratio,
            }
            res.stages_run.append("blocks_30m")

    # -- retention ------------------------------------------------------
    if policy is not None and now is not None:
        res.metrics["retention"] = apply_retention(cat, policy, now, raw_table)
        res.stages_run.append("retention")

    return res
