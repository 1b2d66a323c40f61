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
]


def main() -> None:
    from isp_trace_parser_spark.session import get_spark
    from isp_trace_parser_spark import synth
    from isp_trace_parser_spark.operators import codec, rollup

    import __spark_entry__ as entrymod

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
    cat = Catalog(spark, tempfile.mkdtemp(prefix="bench_wh_") + "/wh")
    n_days = max(1, n_slots // 48)
    buckets = max(1, min(64, (n_rows // n_days) // 250_000))
    t0 = time.perf_counter()
    ingest_pages(cat, pages, n_buckets=buckets)
    ingest_dt = time.perf_counter() - t0
    t1 = time.perf_counter()
    res = run_rollup_pipeline(spark, cat)
    rollup_dt = time.perf_counter() - t1
    stats = codec.compression_report(cat.read("blocks_30m")).collect()[0]
    points = int(stats["points"])
    ratio = float(stats["ratio"])
    results["ingest_pages"] = round(ingest_dt, 3)
    results["rollup_pipeline"] = round(rollup_dt, 3)
    total += ingest_dt + rollup_dt
    print(
        f"# ingest {ingest_dt:.3f}s + rollup_pipeline {rollup_dt:.3f}s "
        f"points={points} (of {n_rows} synth rows) ratio={ratio:.3f}",
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
    html_df.count()  # materialize synth inputs outside the timed window
    t2 = time.perf_counter()
    ext_bytes = (
        with_extracted_text(html_df)
        .select(F.sum(F.length("extracted_text")).alias("b"))
        .collect()[0]["b"]
    )
    extract_dt = time.perf_counter() - t2
    n_docs = ext_urls * ext_slots
    results["html_extract"] = round(extract_dt, 3)
    total += extract_dt
    print(
        f"# html_extract {extract_dt:.3f}s docs={n_docs} "
        f"({n_docs / extract_dt:,.0f} docs/s, {ext_bytes} text bytes)",
        file=sys.stderr,
    )

    out = {
        "metric": "headline suite wall time (3-tier rollup+codec, gapfill, "
        "get_data-parity windows, dedup/ANN/text) at sf",
        "value": round(total, 3),
        "unit": "sec",
        "queries": results,
        "queries_warm_min": warm_min,
        "bench_iters": iters,
        "sf": SF_DIR,
        "cpus": CPUS,
        "rollup_rows_per_sec": round(points / rollup_dt, 1),
        "compression_ratio": round(ratio, 4),
        "extract_docs_per_sec": round(n_docs / extract_dt, 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
