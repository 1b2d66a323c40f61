"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "rollup_rows_per_sec": ..., "compression_ratio": ...}

The rollup_rows_per_sec + compression_ratio fields speak to the
BASELINE.json north metric directly (rollup throughput across 3 tiers +
Gorilla ratio); per-query seconds cover the get_data-parity and
training-data operators. bench/scaling.py reruns the rollup job at two
parallelism levels for the N-vs-4N scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Fixed-work CPU reference: min-of-6 of the calibration loop measured
# on this sandbox while otherwise idle (2026-08-17, round 4, 0.5842s
# floor over repeated idle runs). contention_factor
# = calib_sec / CALIB_REF_SEC; >1 means the sandbox was slower than the
# reference moment (co-tenant load), and *_normalized fields divide it
# out so round-over-round comparisons measure the CODE, not the tenant
# schedule (VERDICT r3: three rounds of driver-bench drift needed a
# contention-calibrated baseline).
CALIB_REF_SEC = 0.584


def _calibrate(reps: int = 3) -> float:
    """Deterministic single-thread numpy work (vectorized LCG over 2M
    uint64, 300 passes): no BLAS threading, no allocation churn — the
    same instructions every round, so its wall time moves only with the
    machine. Returns min over ``reps`` runs."""
    import numpy as np

    best = float("inf")
    for _ in range(reps):
        x = np.arange(2_000_000, dtype=np.uint64)
        t0 = time.perf_counter()
        for _ in range(300):
            x = x * np.uint64(2862933555777941757) + np.uint64(3037000493)
        assert int(x.sum()) % 997 == 535  # fixed work, fixed answer
        best = min(best, time.perf_counter() - t0)
    return best

HEADLINE = [
    "rollup_30m",
    "rollup_1d",
    "rollup_1mo",
    "gapfill_30m",
    "gorilla_codec_roundtrip",
    "window_fy",
    "tpch_q1_pricing_summary",
    "region_revenue_broadcast",
    "dedup_exact",
    "minhash_lsh_pairs",
    "cosine_topk",
    "text_stats",
    # round-3 additions: as-of composition + per-source text aggregation
    "asof_join_nearest",
    "source_quality_report",
    # round-3 continuation: URL canonicalization + irregular-series TWA
    # + the interpreted-array-lambda curation path
    "domain_stats",
    "time_weighted_avg",
    "repetition_filters",
    # round-4 additions: gap inventory, distribution-tier serving,
    # sequential-recurrence escape hatch, crawl planning
    "gap_report",
    "histogram_p95",
    "ewma_smooth",
    "crawl_schedule",
    # round-5 additions: mergeable cardinality tier, trailing-window
    # anomaly scoring, weekly seasonality reduction, decontamination
    "distinct_rollup_1d",
    "zscore_anomalies",
    "seasonal_profile",
    "contamination_report",
]


def main() -> None:
    from isp_trace_parser_spark.session import get_spark
    from isp_trace_parser_spark import synth
    from isp_trace_parser_spark.operators import codec, rollup

    import __spark_entry__ as entrymod

    calib_start = _calibrate()
    print(f"# cpu_calibration {calib_start:.4f}s (ref {CALIB_REF_SEC}s, "
          f"factor {calib_start / CALIB_REF_SEC:.3f})", file=sys.stderr)

    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS * 2, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    results: dict[str, float] = {}

    # warm the JVM + parquet footers once (not measured), and spin up
    # the Python UDF workers (numpy/pandas import + Arrow init across
    # all cores — a one-time session cost, not operator throughput)
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    from pyspark.sql import functions as F

    from isp_trace_parser_spark.operators.dedup import minhash_signatures

    _tiny = spark.range(CPUS * 4).repartition(CPUS).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("text")
    )
    minhash_signatures(_tiny, num_perm=8).count()

    # per query: one COLD run (comparable with prior rounds' numbers,
    # includes plan compile + any first-touch Python-worker cost) plus
    # >=3 warm iterations whose MIN is the steady-state signal — round
    # over round deltas compare warm-to-warm, immune to one-off import
    # costs and most co-tenant noise (VERDICT r2 #5)
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    warm_min: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()  # force full execution without driver collect cost
        dt = time.perf_counter() - t0
        results[name] = round(dt, 3)
        total += dt
        warm = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            warm.append(time.perf_counter() - t0)
        if warm:  # ITERS=0 => cold-only run, no warm numbers
            warm_min[name] = round(min(warm), 3)
        print(
            f"# {name}: cold {dt:.3f}s"
            + (f" warm_min {min(warm):.3f}s" if warm else "")
            + f" rows={n}",
            file=sys.stderr,
        )

    # --- EWMA production path: the registry's ewma_smooth row runs the
    # opt-in exact_shape oracle-parity loop; the line below times the
    # PRODUCTION vectorized closed form on the same tier input so the
    # round-over-round record tracks what ships (VERDICT r4 #2)
    from pyspark.sql import functions as F

    from isp_trace_parser_spark.operators.timeseries import ewma as _ewma

    def _ewma_prod():
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        t30 = ev.groupBy(
            F.col("user_id").alias("series"),
            rollup.bucket_end(F.col("ts"), 1800).alias("bucket_ts"),
        ).agg(
            (
                F.sum(F.col("value").cast("decimal(20,4)")).cast("double")
                / F.count("value")
            ).alias("value")
        )
        return _ewma(t30, "series", "bucket_ts", "value", "bucket_ts",
                     alpha=0.1)

    t0 = time.perf_counter()
    _ewma_prod().count()
    dt = time.perf_counter() - t0
    results["ewma_vectorized"] = round(dt, 3)
    total += dt
    warm = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ewma_prod().count()
        warm.append(time.perf_counter() - t0)
    if warm:
        warm_min["ewma_vectorized"] = round(min(warm), 3)
    print(
        f"# ewma_vectorized: cold {dt:.3f}s"
        + (f" warm_min {min(warm):.3f}s" if warm else ""),
        file=sys.stderr,
    )

    # --- north-metric job: 3-tier rollup + codec over synthetic pages,
    # through the real catalog-backed pipeline (one raw scan, tiers
    # cascaded from stored partials, partitioned writes) ---
    import tempfile

    from isp_trace_parser_spark.pipeline import ingest_pages, run_rollup_pipeline
    from isp_trace_parser_spark.sources.catalog import Catalog

    n_urls = int(os.environ.get("SPARK_GRAFT_BENCH_URLS", "2000"))
    n_slots = int(os.environ.get("SPARK_GRAFT_BENCH_SLOTS", str(48 * 30)))
    pages = synth.pages(
        spark, n_urls=n_urls, n_slots=n_slots, gap_pct=5,
        partitions=max(CPUS * 2, 32),
    ).select("url", "warc_ts", "value")
    n_rows = n_urls * n_slots  # upper bound; gaps remove ~5%
    n_days = max(1, n_slots // 48)
    buckets = max(1, min(64, (n_rows // n_days) // 250_000))
    pages.cache().count()  # materialize synth outside every timed window

    # cold + warm iterations, each into a FRESH warehouse — a rerun on
    # the same warehouse would snapshot-diff-skip every stage and
    # measure nothing. warm-min is the headline (VERDICT r3 #2: the
    # cold-only pipeline line was contention-hostage three rounds
    # running).
    pipe_iters = int(os.environ.get("SPARK_GRAFT_BENCH_PIPE_ITERS", "2"))
    ingest_dt = rollup_dt = None
    pipe_warm: list[float] = []
    points = ratio = None
    for i in range(1 + pipe_iters):
        cat = Catalog(spark, tempfile.mkdtemp(prefix="bench_wh_") + "/wh")
        t0 = time.perf_counter()
        ingest_pages(cat, pages, n_buckets=buckets)
        ing = time.perf_counter() - t0
        t1 = time.perf_counter()
        run_rollup_pipeline(spark, cat)
        rol = time.perf_counter() - t1
        if i == 0:
            ingest_dt, rollup_dt = ing, rol
            stats = codec.compression_report(
                cat.read("blocks_30m")
            ).collect()[0]
            points = int(stats["points"])
            ratio = float(stats["ratio"])
        else:
            pipe_warm.append(rol)
    pages.unpersist()
    results["ingest_pages"] = round(ingest_dt, 3)
    results["rollup_pipeline"] = round(rollup_dt, 3)
    if pipe_warm:
        warm_min["rollup_pipeline"] = round(min(pipe_warm), 3)
    total += ingest_dt + rollup_dt
    print(
        f"# ingest {ingest_dt:.3f}s + rollup_pipeline {rollup_dt:.3f}s"
        + (f" warm_min {min(pipe_warm):.3f}s" if pipe_warm else "")
        + f" points={points} (of {n_rows} synth rows) ratio={ratio:.3f}",
        file=sys.stderr,
    )

    # --- HTML extraction throughput (the raw-scan-path CPU dominant):
    # vectorized Series .str passes, byte-identical to the reference
    # extractor (functions/extract.py) ---
    from pyspark.sql import functions as F

    from isp_trace_parser_spark.functions.extract import with_extracted_text

    ext_urls = int(os.environ.get("SPARK_GRAFT_BENCH_EXTRACT_URLS", "500"))
    ext_slots = int(os.environ.get("SPARK_GRAFT_BENCH_EXTRACT_SLOTS", "400"))
    html_df = synth.pages(
        spark, n_urls=ext_urls, n_slots=ext_slots, gap_pct=0,
        partitions=max(CPUS * 2, 32),
    ).select("url", "html")
    html_df.cache().count()  # materialize synth outside the timed window
    ext_times: list[float] = []
    ext_bytes = 0
    for _ in range(1 + iters):
        t2 = time.perf_counter()
        ext_bytes = (
            with_extracted_text(html_df)
            .select(F.sum(F.length("extracted_text")).alias("b"))
            .collect()[0]["b"]
        )
        ext_times.append(time.perf_counter() - t2)
    html_df.unpersist()
    extract_dt = ext_times[0]
    n_docs = ext_urls * ext_slots
    results["html_extract"] = round(extract_dt, 3)
    if len(ext_times) > 1:
        warm_min["html_extract"] = round(min(ext_times[1:]), 3)
    total += extract_dt
    extract_best = min(ext_times)
    print(
        f"# html_extract {extract_dt:.3f}s"
        + (f" warm_min {min(ext_times[1:]):.3f}s" if len(ext_times) > 1 else "")
        + f" docs={n_docs} ({n_docs / extract_best:,.0f} docs/s warm, "
        f"{ext_bytes} text bytes)",
        file=sys.stderr,
    )

    calib_end = _calibrate()
    calib = min(calib_start, calib_end)
    contention = calib / CALIB_REF_SEC
    total_warm = sum(warm_min.values())
    pipe_best = min(pipe_warm) if pipe_warm else rollup_dt
    out = {
        "metric": "headline suite wall time (3-tier rollup+codec, gapfill, "
        "get_data-parity windows, dedup/ANN/text) at sf",
        "value": round(total, 3),
        "unit": "sec",
        "queries": results,
        "queries_warm_min": warm_min,
        "total_warm_min": round(total_warm, 3),
        # fixed-work CPU probe: round-over-round drift here is sandbox
        # contention, not code; divide suite numbers by the factor to
        # compare rounds like-for-like
        "calib_sec": round(calib, 4),
        "calib_ref_sec": CALIB_REF_SEC,
        "contention_factor": round(contention, 3),
        "total_warm_min_normalized": round(total_warm / contention, 3),
        "bench_iters": iters,
        "sf": SF_DIR,
        "cpus": CPUS,
        "rollup_rows_per_sec": round(points / rollup_dt, 1),
        "rollup_rows_per_sec_warm": round(points / pipe_best, 1),
        "compression_ratio": round(ratio, 4),
        "extract_docs_per_sec": round(n_docs / extract_dt, 1),
        "extract_docs_per_sec_warm": round(n_docs / extract_best, 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
