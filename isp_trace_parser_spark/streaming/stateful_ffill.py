"""Stateful streaming gap-fill: applyInPandasWithState.

The batch gap-fill (operators/gapfill.py) densifies with a join +
window; incrementally that requires remembering, per series, the last
emitted grid slot and last observed value across micro-batches — exactly
what ``applyInPandasWithState`` provides (GroupState per series key).

Semantics per series (mirrors the batch operator):
- emit one row per 30-minute grid slot from the first observation on;
- missing slots carry the last observed value with ``is_filled=true``;
- state = (last_emitted_slot_epoch, last_value), persisted by the
  streaming engine between micro-batches and recoverable from the
  checkpoint — the engine's execution model does the hard part.

Timeout/finalization: grid emission happens up to each batch's max
observed slot per series; an idle series emits nothing until it speaks
again (no wall-clock reads — deterministic, testable).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

HALF_HOUR_US = 1800 * 1_000_000

OUTPUT_SCHEMA = StructType(
    [
        StructField("series", StringType()),
        StructField("bucket_ts", TimestampNTZType()),
        StructField("value", DoubleType()),
        StructField("is_filled", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_slot_us", LongType()),
        StructField("last_value", DoubleType()),
    ]
)


def _ffill_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    series = key[0]
    rows = pd.concat(list(pdfs), ignore_index=True)
    if rows.empty:
        return
    rows = rows.sort_values("bucket_ts")
    slots = rows["bucket_ts"].to_numpy().astype("datetime64[us]").astype("int64")
    vals = rows["value"].to_numpy(dtype=float)

    if state.exists:
        last_slot, last_val = state.get
    else:
        last_slot, last_val = int(slots[0]) - HALF_HOUR_US, float("nan")

    out_slots, out_vals, out_filled = [], [], []
    for s, v in zip(slots, vals):
        gap = last_slot + HALF_HOUR_US
        while gap < s:  # fill missing grid slots with the last value
            out_slots.append(gap)
            out_vals.append(last_val)
            out_filled.append(True)
            gap += HALF_HOUR_US
        out_slots.append(int(s))
        out_vals.append(float(v))
        out_filled.append(False)
        last_slot, last_val = int(s), float(v)

    state.update((last_slot, last_val))
    yield pd.DataFrame(
        {
            "series": series,
            "bucket_ts": pd.Series(out_slots, dtype="int64").astype("datetime64[us]"),
            "value": out_vals,
            "is_filled": out_filled,
        }
    )


def stateful_gap_fill_stream(points: DataFrame) -> DataFrame:
    """``points``: streaming DataFrame (series: string, bucket_ts: ntz
    timestamp, value: double) -> densified forward-filled stream."""
    return points.groupBy("series").applyInPandasWithState(
        _ffill_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
