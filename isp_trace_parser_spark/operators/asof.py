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
    direction: str = "backward",
) -> DataFrame:
    """For every left row: the matching right row in the same ``on``
    group, by ``direction`` (pandas merge_asof semantics):

    - ``backward`` (default): latest right with ``right.ts <= left.ts``;
    - ``forward``: earliest right with ``right.ts >= left.ts`` (the same
      union+window plan with the scan order reversed);
    - ``nearest``: whichever of the two is closer in time (tie ->
      backward). Composed from both directional passes — still one
      shuffle: both windows share the same partitioning, so Catalyst
      reuses the exchange.

    Returns left columns + ``<value><suffix>`` for each of
    ``right_values`` + ``ts<suffix>`` (the matched right timestamp,
    NULL when no right row matches in-direction or the match violates
    ``tolerance_seconds``).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, left_ts, right_ts, right_values,
            tolerance_seconds, suffix,
        )
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
    # right row exactly at the left ts is eligible (<=/>= semantics);
    # forward direction = the same linear scan over the reversed stream
    ts_order = (
        F.col(left_ts).asc() if direction == "backward" else F.col(left_ts).desc()
    )
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("_side").asc())
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
    # a NULL key or NULL timestamp has no defined as-of position: such
    # left rows pass through with NULL match columns, identically in
    # every direction (pandas merge_asof rejects them outright)
    definable = F.col(on).isNotNull() & F.col(left_ts).isNotNull()
    if tolerance_seconds is not None:
        # matched ts is on the correct side by construction, so the
        # absolute gap works for both directions
        fresh = F.abs(
            F.unix_micros(F.col(left_ts).cast("timestamp_ltz"))
            - F.unix_micros(F.col("_m_ts").cast("timestamp_ltz"))
        ) <= tolerance_seconds * 1_000_000
        out = out.withColumn("_fresh", definable & fresh)
    else:
        out = out.withColumn("_fresh", definable)

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


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str] | None,
    tolerance_seconds: int | None,
    suffix: str,
) -> DataFrame:
    """nearest = min(|gap|) of the backward and forward matches, tie ->
    backward. Joined back on the left row identity (on, left_ts) plus a
    per-duplicate disambiguator is unnecessary: both passes preserve the
    left rows 1:1, so a positional combine via the same key columns and
    a row_number within duplicates keeps exact row multiplicity."""
    right_values = right_values or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    b = asof_join(
        left, right, on, left_ts, right_ts, right_values,
        tolerance_seconds, suffix, direction="backward",
    )
    f = asof_join(
        left, right, on, left_ts, right_ts, right_values,
        tolerance_seconds, suffix, direction="forward",
    )
    extra_cols = [c for c in left.columns if c not in (on, left_ts)]
    # a (key, ts)-only left frame still needs a valid (constant) order:
    # duplicate rows are then interchangeable, so any pairing is correct
    order_cols = [F.col(c) for c in extra_cols] or [F.lit(1)]
    w = Window.partitionBy(on, left_ts).orderBy(*order_cols)
    bk = b.withColumn("_rn", F.row_number().over(w))
    fw = f.withColumn("_rn", F.row_number().over(w)).select(
        F.col(on).alias("_on"),
        F.col(left_ts).alias("_lts"),
        F.col("_rn").alias("_rn2"),
        F.col(f"ts{suffix}").alias("_f_ts"),
        *[F.col(f"{c}{suffix}").alias(f"_f_{c}") for c in right_values],
    )
    # null-safe equality: left rows with NULL key or NULL timestamp must
    # survive nearest exactly as they do in backward/forward (with NULL
    # match columns), not be dropped by the recombine join
    j = bk.join(
        fw,
        F.col(on).eqNullSafe(F.col("_on"))
        & F.col(left_ts).eqNullSafe(F.col("_lts"))
        & (F.col("_rn") == F.col("_rn2")),
    )
    lgap = F.abs(
        F.unix_micros(F.col(left_ts).cast("timestamp_ltz"))
        - F.unix_micros(F.col(f"ts{suffix}").cast("timestamp_ltz"))
    )
    rgap = F.abs(
        F.unix_micros(F.col(left_ts).cast("timestamp_ltz"))
        - F.unix_micros(F.col("_f_ts").cast("timestamp_ltz"))
    )
    use_fwd = F.col(f"ts{suffix}").isNull() | (
        F.col("_f_ts").isNotNull() & (rgap < lgap)
    )
    return j.select(
        *left.columns,
        F.when(use_fwd, F.col("_f_ts")).otherwise(F.col(f"ts{suffix}")).alias(
            f"ts{suffix}"
        ),
        *[
            F.when(use_fwd, F.col(f"_f_{c}")).otherwise(F.col(f"{c}{suffix}")).alias(
                f"{c}{suffix}"
            )
            for c in right_values
        ],
    )
