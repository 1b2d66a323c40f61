"""Interval (range) join: match point events to the keyed time
intervals containing them.

Spark has no range-join physical operator: a plain
``l.ts >= r.start AND l.ts < r.end`` join plans as
BroadcastNestedLoopJoin (or a cartesian product) — O(n*m) per key and a
guaranteed executor OOM at 100 TB. The standard scale recipe (what
Databricks' range-join hint and KDB/QuestDB interval indexes do under
the hood) is implemented here with plain DataFrame ops:

    bucket time into fixed cells
      -> explode each interval to the cells it covers
      -> equi-join on (key, cell)            [co-partitioned shuffle]
      -> exact containment filter            [cheap, post-join]

Each event lives in exactly ONE cell, so a (key, cell) match pairs it
with each covering interval at most once — no dedup pass needed. Cost
is O(n + m * cells_per_interval); pick ``bucket_seconds`` near the
typical interval length so the explode factor stays ~1-2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _micros(c: Column) -> Column:
    return F.unix_micros(c.cast("timestamp_ltz"))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "series",
    left_ts: str = "ts",
    right_start: str = "start",
    right_end: str = "end",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to every right interval with the same ``on``
    key satisfying ``start <= ts < end`` (half-open, the time-range
    convention everywhere else in this engine).

    ``how='inner'`` keeps matched rows; ``'left'`` keeps unmatched left
    rows with NULL right columns (implemented as a second anti-join
    union so the hot path stays a plain equi-join).

    Empty or inverted intervals (``end <= start``) match nothing.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    b = bucket_seconds * 1_000_000
    cell = F.floor(_micros(F.col(left_ts)) / b)
    lcol = left.withColumn("_cell", cell)
    rcells = F.sequence(
        F.floor(_micros(F.col(right_start)) / b),
        F.floor((_micros(F.col(right_end)) - 1) / b),
    )
    rexp = (
        right.where(F.col(right_end) > F.col(right_start))
        .withColumn("_cell", F.explode(rcells))
    )
    contained = (F.col(left_ts) >= F.col(right_start)) & (
        F.col(left_ts) < F.col(right_end)
    )
    joined = (
        lcol.join(rexp, [on, "_cell"], "inner").where(contained).drop("_cell")
    )
    if how == "inner":
        return joined
    right_cols = [c for c in right.columns if c != on]
    matched_keys = joined.select(on, left_ts).distinct()
    unmatched = lcol.drop("_cell").join(
        matched_keys, [on, left_ts], "left_anti"
    )
    for c in right_cols:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    return joined.unionByName(unmatched)
