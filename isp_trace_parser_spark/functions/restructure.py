"""Wide (AEMO) -> long trace restructuring — the reference's signature
operator, re-expressed as pure Catalyst column expressions.

Reference semantics (src/isp_trace_parser/trace_formatter.py:8-103):

- Input: one row per day with ``Year, Month, Day`` (int64) plus 48 value
  columns labeled ``'01'..'48'`` (zero-padded) or ``'1'..'9'`` (unpadded —
  AEMO ships both; trace_formatter.py:57-59 accepts either).
- Output: ``(datetime, value)`` where ``datetime`` is the END of each
  half-hour period: label L on day D maps to
  ``D 00:00 + (L // 2) hours + (L % 2) * 30 minutes``; label 48 therefore
  lands on day D+1 00:00 (trace_formatter.py:68-72).
- Sorted ascending by datetime (trace_formatter.py:100).

The reference implements the label -> offset step with a row-wise Python
UDF (``map_elements``, trace_formatter.py:74-81) — its only known hot
spot. Here the entire transform is ``stack()`` + integer arithmetic +
``make_timestamp``: whole-stage-codegen'd JVM work, no Python on the data
path, so it scales to arbitrary input partitions with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALL_LABELS = [f"{i:02d}" for i in range(1, 49)] + [str(i) for i in range(1, 10)]


def period_end_timestamp(year: Column, month: Column, day: Column, label: Column) -> Column:
    """END-of-period timestamp for a half-hour label (1..48) on a date.

    Pure column arithmetic replacement for the reference's map_elements
    UDF (trace_formatter.py:68-81): midnight of (Y, M, D) plus
    ``label * 30`` minutes.
    """
    # Session TZ is pinned UTC (session.py), so TimestampType here is
    # semantically the reference's naive Datetime[us].
    midnight = F.make_timestamp(year, month, day, F.lit(0), F.lit(0), F.lit(0))
    minutes = label.cast("int") * 30
    return midnight + F.make_dt_interval(F.lit(0), F.lit(0), minutes, F.lit(0))


def trace_formatter(wide: DataFrame, sort: bool = True) -> DataFrame:
    """AEMO wide day-rows -> long ``(datetime, value)`` trace.

    Accepts any subset of the 48 labels, zero-padded or not, exactly like
    the reference (trace_formatter.py:57-59). Extra non-label columns are
    carried through untouched (the reference drops them; callers that
    want reference-exact output should select Year/Month/Day + labels
    first).
    """
    labels = [c for c in ALL_LABELS if c in wide.columns]
    if not labels:
        raise ValueError("no half-hour label columns ('01'..'48' / '1'..'9') found")
    passthrough = [
        c for c in wide.columns if c not in labels and c not in ("Year", "Month", "Day")
    ]

    # stack(n, label1, col1, ...) — unpivot without touching Python.
    stack_args = ", ".join(f"'{lab}', `{lab}`" for lab in labels)
    stacked = wide.select(
        "Year",
        "Month",
        "Day",
        *passthrough,
        F.expr(f"stack({len(labels)}, {stack_args}) as (time_label, value)"),
    )
    out = stacked.select(
        period_end_timestamp(
            F.col("Year"), F.col("Month"), F.col("Day"), F.col("time_label")
        ).alias("datetime"),
        F.col("value"),
        *passthrough,
    )
    if sort:
        out = out.orderBy("datetime")
    return out


def inverse_trace_formatter(long_df: DataFrame) -> DataFrame:
    """Long ``(datetime, value)`` -> wide AEMO format (round-trip check).

    Mirrors the reference's test-only inverse transform
    (tests/test_trace_formatter.py:18-58): shift each END-of-period
    timestamp back 1 second so label-48 rows return to their source day,
    then pivot on the period label.
    """
    shifted = long_df.withColumn(
        "_t", F.col("datetime") - F.expr("INTERVAL 1 SECOND")
    )
    # int64 to match the declared ingest schema (reference:
    # trace_restructure_helper_functions.py:17-20, [Int64]*3).
    with_label = shifted.select(
        F.year("_t").cast("long").alias("Year"),
        F.month("_t").cast("long").alias("Month"),
        F.dayofmonth("_t").cast("long").alias("Day"),
        (F.hour("_t") * 2 + (F.minute("_t") / 30).cast("int") + 1).alias("period"),
        "value",
    )
    labels = list(range(1, 49))
    wide = (
        with_label.groupBy("Year", "Month", "Day")
        .pivot("period", labels)
        .agg(F.first("value"))
    )
    renamed = wide.select(
        "Year",
        "Month",
        "Day",
        *[F.col(str(i)).alias(f"{i:02d}") for i in labels],
    )
    return renamed.orderBy("Year", "Month", "Day")
