"""Continuous-aggregate tier cascade: raw -> 30min -> 1day -> 1month.

The reference's only aggregation kernel is mean-by-timestamp
(reference: src/isp_trace_parser/trace_restructure_helper_functions.py:32-37);
its half-hourly data is already the finest tier. The north_rule extends
this to a 3-tier rollup engine. Design:

- Each tier carries ``(series key, bucket_ts, avg/min/max/sum/count)``.
- Coarser tiers are computed FROM the previous tier's partials
  (sum+count re-aggregated), never by re-scanning raw data — at 10^12
  rows the raw scan is the dominant cost and must happen once.
  avg is re-derived as sum/count at every tier (exact, no avg-of-avgs).
- ``bucket_ts`` labels the END of the bucket, matching the reference's
  end-of-interval convention (trace_formatter.py:12-15): the 30-min
  bucket ending at 00:30 covers (00:00, 00:30].
- Aggregation is a plain ``groupBy`` -> Catalyst two-phase hash agg
  (map-side partial combine), the optimal distributed plan. The shuffle
  keys are (series, bucket), which is exactly the storage partitioning
  (time-bucket + url-hash bucket), so the downstream partitioned write
  needs no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TIER_SECONDS = {"30m": 1800, "1d": 86400}

AGG_COLS = ["avg_value", "min_value", "max_value", "sum_value", "cnt_value"]

# Optional exact partial sums: float summation is order-dependent, so a
# re-run (or another engine) can disagree in the last ulp — visible
# after rounding. Passing ``sum_cast="decimal(20,4)"`` sums exactly
# (associative), with avg derived as sum/count — identical everywhere.
# Only correct when the source values have <= 4 fractional digits (the
# cast would silently round otherwise), so it is OPT-IN; the default
# keeps full double precision for arbitrary float traces.
DEC = "decimal(20,4)"


def _sum_expr(value_col: str, sum_cast: str | None):
    c = F.col(value_col)
    return F.sum(c.cast(sum_cast) if sum_cast else c)


def bucket_end(ts: Column, seconds: int) -> Column:
    """END-of-interval bucket label: smallest multiple of ``seconds``
    >= ts (half-open (start, end] semantics, reference get_data.py:80-82
    and trace_formatter end-of-period convention).

    Exact integer math on microseconds — ``unix_timestamp`` truncates
    sub-second precision and float ceil rounds at boundaries, both of
    which mis-bucket points epsilon past a bucket edge."""
    b = seconds * 1_000_000
    # session TZ is pinned UTC, so the tz<->ntz casts are wall-clock
    # identity; unix_micros requires TIMESTAMP, the engine standard is NTZ
    # explicit _ltz: with spark.sql.timestampType=TIMESTAMP_NTZ, the
    # plain "timestamp" cast string resolves to NTZ
    e = F.unix_micros(ts.cast("timestamp_ltz")) + (b - 1)
    return F.timestamp_micros(e - F.pmod(e, F.lit(b))).cast("timestamp_ntz")


def rollup_raw(
    df: DataFrame,
    series_col: str = "url",
    ts_col: str = "warc_ts",
    value_col: str = "value",
    tier_seconds: int = 1800,
    sum_cast: str | None = None,
) -> DataFrame:
    """Finest tier: raw points -> per-(series, bucket) aggregates."""
    return (
        df.groupBy(
            F.col(series_col).alias("series"),
            bucket_end(F.col(ts_col), tier_seconds).alias("bucket_ts"),
        )
        .agg(
            (
                _sum_expr(value_col, sum_cast).cast("double")
                / F.count(value_col)
            ).alias("avg_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
            _sum_expr(value_col, sum_cast).alias("sum_value"),
            F.count(value_col).alias("cnt_value"),
        )
    )


def rollup_cascade(tier: DataFrame, coarser_seconds: int) -> DataFrame:
    """Coarser tier FROM a finer tier: re-aggregate the partials.

    sum/count add exactly; min/max nest; avg = total sum / total count —
    identical to aggregating the raw data, at a fraction of the scan.
    """
    return (
        tier.groupBy(
            "series",
            bucket_end(F.col("bucket_ts") - F.expr("INTERVAL 1 SECOND"), coarser_seconds).alias(
                "bucket_ts"
            ),
        )
        .agg(
            (F.sum("sum_value").cast("double") / F.sum("cnt_value")).alias(
                "avg_value"
            ),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.sum("sum_value").alias("sum_value"),
            F.sum("cnt_value").alias("cnt_value"),
        )
    )


def monthly_from_daily(daily: DataFrame) -> DataFrame:
    """Month tier (calendar months are irregular — no fixed seconds).

    Bucket label = first instant of the NEXT month (end-of-interval,
    consistent with the other tiers): the bucket ending 2024-02-01 00:00
    covers (2024-01-01 00:00, 2024-02-01 00:00].
    """
    # Daily bucket_ts is the END of the day; shift back 1s to find the
    # month it belongs to, then label with the start of the next month.
    month_start = F.date_trunc("month", F.col("bucket_ts") - F.expr("INTERVAL 1 SECOND"))
    month_end = F.to_timestamp(F.add_months(month_start, 1))
    return (
        daily.groupBy("series", month_end.alias("bucket_ts"))
        .agg(
            (F.sum("sum_value").cast("double") / F.sum("cnt_value")).alias(
                "avg_value"
            ),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.sum("sum_value").alias("sum_value"),
            F.sum("cnt_value").alias("cnt_value"),
        )
    )


def build_tiers(
    df: DataFrame,
    series_col: str = "url",
    ts_col: str = "warc_ts",
    value_col: str = "value",
    sum_cast: str | None = None,
    pre_partition_series: bool = True,
) -> dict[str, DataFrame]:
    """The full cascade raw -> 30m -> 1d -> 1mo. One raw scan total.

    ``pre_partition_series`` hash-partitions the input on the series key
    ONCE up front: HashPartitioning(series) satisfies the clustered
    distribution of every tier's groupBy (series, bucket) AND of the
    per-series gap-fill window, so the whole cascade runs on a single
    shuffle instead of one per tier (~35% faster at bench scale;
    storage-side equivalent: Catalog.write_bucketed). Tradeoff: the
    partial (map-side combine) pre-aggregation of the first tier is
    skipped — a win when series are numerous and slots-per-series
    modest (the 10^12-doc web-table shape), a loss only when a few
    series dominate the row count; set False there."""
    base = df.repartition(F.col(series_col)) if pre_partition_series else df
    t30 = rollup_raw(base, series_col, ts_col, value_col, TIER_SECONDS["30m"], sum_cast)
    t1d = rollup_cascade(t30, TIER_SECONDS["1d"])
    t1mo = monthly_from_daily(t1d)
    return {"agg_30m": t30, "agg_1d": t1d, "agg_1mo": t1mo}


def mean_merge(traces: list[DataFrame], ts_col: str = "datetime", value_col: str = "value") -> DataFrame:
    """Reference A1: union N traces of one entity and mean by timestamp
    (trace_restructure_helper_functions.py:32-37 — e.g. Snowtown S2 =
    mean of SNOWSTH1 + SNOWNTH1). We sort deterministically afterwards;
    the reference leaves hash order (documented divergence, SURVEY §2.5).
    """
    from functools import reduce

    unioned = reduce(DataFrame.unionByName, traces)
    return (
        unioned.groupBy(ts_col)
        .agg(F.avg(value_col).alias(value_col))
        .orderBy(ts_col)
    )


def histogram_tier(
    df: DataFrame,
    series_col: str = "url",
    ts_col: str = "warc_ts",
    value_col: str = "value",
    bucket_seconds: int = 1800,
    bin_width: float = 0.5,
) -> DataFrame:
    """Mergeable histogram tier: per (series, end-labeled bucket, bin)
    the observation count, with ``bin = floor(value / bin_width)``.

    The distribution analog of the avg/min/max tiers: counts are an
    exact, order-independent, MERGEABLE sketch — any coarser resolution
    is a plain sum of finer-tier counts (:func:`histogram_cascade`),
    so percentile/shape dashboards read tiers, never raw data. Pure
    two-phase groupBy (map-side combined); no UDF, no window.
    """
    return (
        df.groupBy(
            F.col(series_col).alias("series"),
            bucket_end(F.col(ts_col), bucket_seconds).alias("bucket_ts"),
            F.floor(F.col(value_col) / F.lit(bin_width)).cast("long").alias(
                "bin"
            ),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_cascade(
    tier: DataFrame, coarser_seconds: int
) -> DataFrame:
    """Coarser histogram tier from a finer one: counts just add.
    Exactly equal to building the coarser histogram from raw data
    (the continuous-aggregate invariant, pinned by the
    ``histogram_rollup`` contract row)."""
    return (
        tier.groupBy(
            "series",
            bucket_end(F.col("bucket_ts"), coarser_seconds).alias(
                "bucket_ts"
            ),
            "bin",
        )
        .agg(F.sum("cnt").alias("cnt"))
    )


def histogram_percentile(
    tier: DataFrame, q: float, bin_width: float = 0.5
) -> DataFrame:
    """Percentile estimate per (series, bucket) straight from the
    histogram tier — the serving-side consumer of
    :func:`histogram_tier`: a dashboard's p95 reads tier bins, never
    raw rows.

    Deterministic rule (exact integer math, oracle-able): the answer
    bin is the smallest bin whose cumulative count reaches
    ``ceil(q * total)``; the estimate is that bin's midpoint. One
    window over (series, bucket) ordered by bin (running cumsum +
    whole-partition total share the sort) and a groupBy on the same
    keys — EnsureRequirements reuses the window's clustering, so the
    whole plan is a single exchange.
    """
    part = Window.partitionBy("series", "bucket_ts")
    w = part.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum("cnt").over(w)
    total = F.sum("cnt").over(part)
    hit = tier.select(
        "series",
        "bucket_ts",
        "bin",
        (cum >= F.ceil(F.lit(q) * total)).alias("_hit"),
    ).where("_hit")
    return hit.groupBy("series", "bucket_ts").agg(
        F.min("bin").alias("bin"),
        ((F.min("bin") + F.lit(0.5)) * F.lit(bin_width)).alias("estimate"),
    )


def distinct_tier(
    df: DataFrame,
    series_col: str = "url",
    ts_col: str = "warc_ts",
    key_col: str = "user_id",
    bucket_seconds: int = 1800,
    lgk: int = 14,
) -> DataFrame:
    """Mergeable distinct-count tier: per (series, end-labeled bucket)
    a Datasketches HLL sketch (binary) of ``key_col`` — the
    cardinality analog of the avg/histogram tiers ("distinct visitors
    per URL per bucket" over a crawl stream).

    DISTINCT does not merge through plain aggregation (you cannot sum
    per-bucket distinct counts into a day), so the tier stores the
    sketch itself; any coarser resolution is a sketch UNION
    (:func:`distinct_cascade`), both JVM-side Catalyst aggregates
    (``hll_sketch_agg`` / ``hll_union_agg``, map-side combined, no
    UDF). Estimates are EXACT while a sketch is still in sparse mode
    (small per-bucket cardinalities; the ``distinct_rollup_1d``
    contract row pins estimate == exact at test scale, lgk=14 holds
    hundreds of keys exactly) and ~±1.6%/sqrt(2^lgk) beyond — the
    standard trade every 100 TB cardinality pipeline makes.
    """
    return df.groupBy(
        F.col(series_col).alias("series"),
        bucket_end(F.col(ts_col), bucket_seconds).alias("bucket_ts"),
    ).agg(F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("hll"))


def distinct_cascade(tier: DataFrame, coarser_seconds: int) -> DataFrame:
    """Coarser distinct tier from a finer one: sketch union (lossless —
    exactly the sketch that would have been built from raw)."""
    return tier.groupBy(
        "series",
        bucket_end(F.col("bucket_ts"), coarser_seconds).alias("bucket_ts"),
    ).agg(F.hll_union_agg("hll").alias("hll"))


def distinct_estimate(tier: DataFrame) -> DataFrame:
    """Serving-side readout of a distinct tier: estimated cardinality
    per (series, bucket)."""
    return tier.select(
        "series",
        "bucket_ts",
        F.hll_sketch_estimate("hll").alias("n_distinct"),
    )


def histogram_percentiles(
    tier: DataFrame, qs: list[float], bin_width: float = 0.5
) -> DataFrame:
    """Several percentiles per (series, bucket) in ONE pass over the
    histogram tier — p50/p95/p99 dashboards share the cumulative
    window instead of re-running :func:`histogram_percentile` per q.

    Same deterministic rule per q (smallest bin whose cumulative count
    reaches ``ceil(q*total)``, midpoint estimate); the per-q answers
    are conditional ``min`` aggregates over the SAME (series, bucket)
    grouping the window clusters on, so the whole plan keeps the
    single exchange; the long (series, bucket_ts, q, bin, estimate)
    output is a post-agg ``stack`` projection.
    """
    part = Window.partitionBy("series", "bucket_ts")
    w = part.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum("cnt").over(w)
    total = F.sum("cnt").over(part)
    flagged = tier.select(
        "series",
        "bucket_ts",
        "bin",
        *[
            (cum >= F.ceil(F.lit(q) * total)).alias(f"_hit_{i}")
            for i, q in enumerate(qs)
        ],
    )
    agged = flagged.groupBy("series", "bucket_ts").agg(
        *[
            F.min(F.when(F.col(f"_hit_{i}"), F.col("bin"))).alias(
                f"_bin_{i}"
            )
            for i in range(len(qs))
        ]
    )
    stack_args = ", ".join(
        f"CAST({q!r} AS DOUBLE), _bin_{i}" for i, q in enumerate(qs)
    )
    return agged.select(
        "series",
        "bucket_ts",
        F.expr(f"stack({len(qs)}, {stack_args}) AS (q, bin)"),
    ).select(
        "series",
        "bucket_ts",
        "q",
        "bin",
        ((F.col("bin") + F.lit(0.5)) * F.lit(bin_width)).alias("estimate"),
    )
