"""Per-query isolation harness for optimization work (guide §1.4).

NOT part of the frozen measurement contract — ``bench.py`` stays the
driver's timing surface. This file exists so optimization rounds can:

- time one named query with a ``noop`` sink (computes every column of
  every row, no count-pruning) and with the same ``.count()`` the bench
  uses, interleaved A/B-style;
- dump ``.explain("formatted")`` for a query to ``plans/<tag>/<q>.txt``.

Usage::

    python bench_extra.py time <query> [<query> ...]   # noop + count timing
    python bench_extra.py plan <tag> <query> [...]     # write plans/<tag>/<q>_<suffix>.txt
    python bench_extra.py all-plans <tag>              # plans for every headline query

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_ITERS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ITERS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))


def _spark():
    from isp_trace_parser_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS * 2, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _warm(spark):
    from pyspark.sql import functions as F

    from isp_trace_parser_spark.operators.dedup import minhash_signatures

    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    tiny = spark.range(CPUS * 4).repartition(CPUS).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("text")
    )
    minhash_signatures(tiny, num_perm=8).count()


def cmd_time(names: list[str]) -> None:
    import __spark_entry__ as entrymod

    spark = _spark()
    _warm(spark)
    queries = entrymod.queries()
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"{name}: noop")
        noop, cnt = [], []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            noop.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(f"{name}: count")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            cnt.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: noop_min {min(noop):.3f}s count_min {min(cnt):.3f}s "
            f"noop {['%.2f' % t for t in noop]} count {['%.2f' % t for t in cnt]}",
            flush=True,
        )
    spark.stop()


def cmd_plan(tag: str, names: list[str], suffix: str = "") -> None:
    import __spark_entry__ as entrymod

    spark = _spark()
    queries = entrymod.queries()
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        fn = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(fn, "w") as f:
            f.write(plan)
        print(f"wrote {fn}", flush=True)
    spark.stop()


def main() -> None:
    cmd = sys.argv[1]
    if cmd == "time":
        cmd_time(sys.argv[2:])
    elif cmd == "plan":
        tag = sys.argv[2]
        suffix = os.environ.get("PLAN_SUFFIX", "")
        cmd_plan(tag, sys.argv[3:], suffix)
    elif cmd == "all-plans":
        import bench as benchmod

        cmd_plan(sys.argv[2], benchmod.HEADLINE, os.environ.get("PLAN_SUFFIX", ""))
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
