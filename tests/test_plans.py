"""Physical-plan quality gates: the optimizations SURVEY §4 relies on
must actually appear in the executed plans (pushdown reaching the scan,
broadcast joins for dims, two-phase partial aggregation, top-k without a
global sort). A plan regression here is a 100x cost at 100 TB even when
results stay correct."""

from __future__ import annotations

import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = em.queries()[name](spark, SF)
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString() + qe.optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "window_fy")
    assert "PushedFilters: [" in plan
    # the time-range predicate must be pushed, not just evaluated post-scan
    assert "GreaterThan(ts" in plan and "LessThanOrEqual(ts" in plan
    # plan toString truncates long filter lists; match the prefix
    assert "In(event_" in plan


def test_projection_pruning(spark):
    # window query selects 3 of 6 event columns -> scan schema pruned
    df = em.queries()["window_fy"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    read = [line for line in plan.splitlines() if "ReadSchema" in line][0]
    assert "props" not in read and "user_id" not in read


def test_dim_joins_broadcast(spark):
    plan = _plan(spark, "region_revenue_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_two_phase_hash_agg(spark):
    for q in ("rollup_30m", "tpch_q1_pricing_summary"):
        plan = _plan(spark, q)
        assert "partial_" in plan, q  # map-side combine present


def test_semi_join_stays_semi(spark):
    assert "LeftSemi" in _plan(spark, "part_semi_join")


def test_topk_avoids_global_sort(spark):
    assert "TakeOrderedAndProject" in _plan(spark, "cosine_topk")


def test_no_python_udf_in_jvm_queries(spark):
    # every non-codec, non-media query must stay JVM-side: no
    # BatchEvalPython (row-wise) or ArrowEvalPython (pandas) nodes
    jvm_only = [
        "rollup_30m", "rollup_1d", "rollup_1mo", "window_fy", "gapfill_30m",
        "tpch_q1_pricing_summary", "region_revenue_broadcast", "dedup_exact",
        "ngram_jaccard_pairs", "simhash_fingerprints", "cosine_topk",
        "text_stats", "lang_id", "doc_fingerprints", "lag_delta",
    ]
    for q in jvm_only:
        plan = _plan(spark, q)
        assert "BatchEvalPython" not in plan, q
        assert "ArrowEvalPython" not in plan, q


def test_bucketed_table_cascade_is_shuffle_free(spark, tmp_path):
    """Storage-partitioned execution: a tier table bucketed by series
    must feed the next cascade level, the gap-fill window, and a
    same-bucketing join with ZERO exchanges — at 100 TB this removes
    the dominant shuffle of every downstream stage."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from isp_trace_parser_spark import synth
    from isp_trace_parser_spark.operators import rollup
    from isp_trace_parser_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    pages = synth.pages(spark, n_urls=50, n_slots=48 * 7, gap_pct=0).select(
        "url", "warc_ts", "value"
    )
    t30 = rollup.rollup_raw(pages, "url", "warc_ts", "value")
    cat.write_bucketed(t30, "agg_30m_b", bucket_by=["series"], n_buckets=8,
                       sort_by=["series", "bucket_ts"])
    back = cat.read("agg_30m_b")

    def n_exchanges(df):
        return df._jdf.queryExecution().executedPlan().toString().count("Exchange")

    t1d = rollup.rollup_cascade(back, rollup.TIER_SECONDS["1d"])
    assert n_exchanges(t1d) == 0
    assert t1d.count() == 50 * 7  # and it actually computes

    w = Window.partitionBy("series").orderBy("bucket_ts")
    assert n_exchanges(back.withColumn("p", F.lag("avg_value").over(w))) == 0

    # same-spec bucketed join: both sides pre-hashed -> no shuffle
    cat.write_bucketed(
        t30.groupBy("series").agg(F.count("*").alias("n")),
        "series_dim_b", bucket_by=["series"], n_buckets=8,
    )
    joined = back.join(cat.read("series_dim_b").hint("shuffle_merge"), "series")
    assert n_exchanges(joined) == 0

    # unbucketed baseline pays the exchange
    t30.write.mode("overwrite").parquet(str(tmp_path / "plain"))
    plain = spark.read.parquet(str(tmp_path / "plain"))
    assert n_exchanges(rollup.rollup_cascade(plain, rollup.TIER_SECONDS["1d"])) >= 1


def test_bucketed_table_survives_fresh_session(spark, tmp_path):
    """Dropping the session-catalog entry (= a new SparkSession) must
    not lose bucketing: read() re-registers from the snapshot's bucket
    spec and plans stay exchange-free."""
    from pyspark.sql import functions as F

    from isp_trace_parser_spark import synth
    from isp_trace_parser_spark.operators import rollup
    from isp_trace_parser_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh2"))
    pages = synth.pages(spark, n_urls=20, n_slots=48, gap_pct=0).select(
        "url", "warc_ts", "value"
    )
    t30 = rollup.rollup_raw(pages, "url", "warc_ts", "value")
    cat.write_bucketed(t30, "t", bucket_by=["series"], n_buckets=4,
                       sort_by=["series", "bucket_ts"])
    spark.sql(f"DROP TABLE {cat._ident('t')}")  # simulate a new session
    back = cat.read("t")  # re-registers via CLUSTERED BY ... LOCATION DDL
    agg = back.groupBy("series").agg(F.sum("cnt_value").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0
    assert agg.count() == 20


def test_serving_routes_prune_at_scan(spark):
    """Every TierStore route (avg, percentile, distinct, auto) must
    reach the parquet scan with BOTH partition pruning (day_bucket
    PartitionFilters) and data filters (bucket_ts PushedFilters) — a
    serving read that lists the whole table is wrong at any scale."""
    import datetime

    import __spark_entry__ as em
    from isp_trace_parser_spark.serving import TierStore
    from isp_trace_parser_spark.sources.catalog import Catalog

    sf = "/root/testdata/sf0.001"
    start = datetime.datetime(2024, 1, 2)
    end = datetime.datetime(2024, 1, 4)
    hot = TierStore(Catalog(spark, em._pipelined_wh(spark, sf)))
    dist = TierStore(Catalog(spark, em._distinct_wh(spark, sf)))
    routes = {
        "series": hot.series(start=start, end=end, resolution="2h"),
        "percentile": hot.percentile(0.95, start=start, end=end,
                                     resolution="2h"),
        "auto": hot.series_auto(start, end, max_points=50)[0],
        "distinct": dist.distinct(start=start, end=end, resolution="2h"),
    }
    for name, df in routes.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "day_bucket" in plan, (
            name, plan[:800])
        assert "PushedFilters: [IsNotNull(bucket_ts)" in plan, name
