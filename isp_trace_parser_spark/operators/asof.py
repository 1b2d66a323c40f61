"""As-of join: for each left row, the most recent right row at-or-before
its timestamp, per series key.

The reference has no joins at all (SURVEY §2.4); this is the canonical
time-series operator its users reach for next (align a trace against
irregular events: prices vs trades, weather vs output). Spark has no
ASOF JOIN physical operator, so it is composed from primitives in a way
that stays shuffle-minimal:

    union(left tagged, right tagged)
      -> window per series ordered by (ts, side) :
         last(right_value, ignorenulls) carries the latest right value
      -> keep left rows

ONE shuffle on the series key, no range-join explosion, no driver logic
— the union+window trick turns an inequality join into a linear scan of
the merged, per-series-sorted stream (the same plan a native ASOF
operator would execute). Tolerance (max staleness) is applied as a
post-filter on the carried right timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "series",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row: the latest right row with
    ``right.ts <= left.ts`` in the same ``on`` group.

    Returns left columns + ``<value><suffix>`` for each of
    ``right_values`` + ``ts<suffix>`` (the matched right timestamp,
    NULL when no right row precedes the left row or the match is older
    than ``tolerance_seconds``).
    """
    right_values = right_values or [
        c for c in right.columns if c not in (on, right_ts)
    ]

    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias(f"ts{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_values],
    )
    # align schemas for the union
    for c in left.columns:
        if c not in (on, left_ts):
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    lt2 = lt.withColumn(f"ts{suffix}", F.lit(None).cast("timestamp_ntz"))
    for c in right_values:
        lt2 = lt2.withColumn(f"{c}{suffix}", F.lit(None).cast(dict(right.dtypes)[c]))

    merged = lt2.unionByName(rt.select(*lt2.columns))

    # right rows sort BEFORE left rows at equal ts (_side 0 < 1), so a
    # right row exactly at the left ts is eligible (<= semantics)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        F.last(f"ts{suffix}", ignorenulls=True).over(w).alias("_m_ts"),
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in right_values
        ],
    )
    out = carried.where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        fresh = (
            F.unix_micros(F.col(left_ts).cast("timestamp_ltz"))
            - F.unix_micros(F.col("_m_ts").cast("timestamp_ltz"))
        ) <= tolerance_seconds * 1_000_000
        out = out.withColumn("_fresh", fresh)
    else:
        out = out.withColumn("_fresh", F.lit(True))

    keep = [c for c in left.columns]
    sel = out.select(
        *keep,
        F.when(F.col("_fresh"), F.col("_m_ts")).alias(f"ts{suffix}"),
        *[
            F.when(F.col("_fresh"), F.col(f"_m_{c}")).alias(f"{c}{suffix}")
            for c in right_values
        ],
    )
    return sel
