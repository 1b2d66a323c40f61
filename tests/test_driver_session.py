"""Driver-environment robustness: entry()/queries() must work on a
SparkSession the DRIVER built — default confs, no engine session
factory, possibly a non-UTC timezone — because _prep() is the only hook
the contract gives us.

Runs in a subprocess so the session-scoped test SparkSession (with our
confs) can't leak in.
"""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# a deliberately hostile driver session: non-UTC tz, default timestampType
spark = (
    SparkSession.builder.master("local[4]")
    .appName("driver-sim")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as em
import duckdb

assert em.entry(spark).count() > 0

con = duckdb.connect()
for t in ["events", "documents", "embeddings", "lineitem"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')"
    )

oracles = em.oracle_sql()
queries = em.queries()
for name in ["rollup_30m", "rollup_1mo", "window_fy", "gapfill_30m",
             "gorilla_codec_roundtrip", "lag_delta", "text_stats",
             # session-sensitive round-2 rows: CSV make_timestamp (tz),
             # streaming ltz casts, sink date_format, CC iteration,
             # filename decode
             "parse_csv_to_long", "streaming_rollup_30m",
             "partitioned_sink_roundtrip", "dedup_clusters",
             "legacy_v1_read", "topk_per_group",
             # session-sensitive round-3 rows: session-window watermark
             # ltz casts, interval-join micros bucketing, time-RANGE
             # window frame, tier pipeline + serving window literals,
             # asof nearest gap arithmetic, demand CSV make_timestamp
             "streaming_sessionize", "interval_join_windows",
             "rolling_mean_1h", "tier_serving_2h", "asof_join_nearest",
             "parse_demand_csv",
             # session-sensitive continuation rows: retention cutoff
             # date math through the pipeline, streaming watermark ltz
             # + timestamp_seconds, unix_micros bucket/weight math in
             # the irregular-series ops, sequence-spine interpolation
             "tiered_retention", "streaming_dedup", "time_weighted_avg",
             "m4_downsample", "counter_rate", "gapfill_interpolate",
             # round-4: full-vocabulary demand cross (make_timestamp),
             # gap inventory + crawl plan (timestamp_micros ntz casts)
             "parse_demand_cross", "gap_report", "crawl_schedule",
             "ewma_smooth",
             # round-5: histogram-tier percentile serving (bucket +
             # partition-prune date math), sparse-series TWA (LOCF
             # clip at bucket boundaries via unix_micros), sketch-tier
             # cardinality serving, auto-resolution routing
             "tier_serving_p95", "twa_raw_sparse",
             "tier_serving_distinct", "tier_serving_auto"]:
    got = queries[name](spark, "/root/testdata/sf0.01").toPandas()
    want = con.execute(oracles[name]).df()
    assert len(got) == len(want), (name, len(got), len(want))
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    w = want[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    for c in cols:
        gv, wv = g[c], w[c]
        if gv.dtype.kind == "f":
            import numpy as np
            nan = gv.isna() & wv.isna()
            assert (nan | (gv == wv)).all(), (name, c)
        else:
            assert gv.astype(str).tolist() == wv.astype(str).tolist(), (name, c)
print("DRIVER-SIM-OK")
spark.stop()
"""


def test_entry_contract_under_default_driver_session():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, timeout=1500
    )
    assert "DRIVER-SIM-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-3000:]
