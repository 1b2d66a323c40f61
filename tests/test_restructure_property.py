"""Property-based restructure tests (hypothesis): arbitrary dates
(incl. leap days), arbitrary label subsets, padded/unpadded headers —
the round-trip and end-of-interval invariants must hold for all of them.

Strategies drive a pandas-side oracle; Spark execution is batched once
per example set via a cached session (hypothesis examples are kept small
so the suite stays fast)."""

from __future__ import annotations

import datetime

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from isp_trace_parser_spark.functions.restructure import trace_formatter

DATES = st.dates(min_value=datetime.date(1999, 12, 30), max_value=datetime.date(2056, 1, 2))
LABELS = st.lists(st.integers(min_value=1, max_value=48), min_size=1, max_size=48, unique=True)


@settings(max_examples=12, deadline=None)
@given(
    dates=st.lists(DATES, min_size=1, max_size=4, unique=True),
    labels=LABELS,
    padded=st.booleans(),
)
def test_end_of_interval_invariant(spark, dates, labels, padded):
    data = {
        "Year": [d.year for d in dates],
        "Month": [d.month for d in dates],
        "Day": [d.day for d in dates],
    }
    for lab in labels:
        name = f"{lab:02d}" if padded or lab > 9 else str(lab)
        data[name] = [float(lab * 100 + i) for i in range(len(dates))]
    wide = pd.DataFrame(data)

    out = trace_formatter(spark.createDataFrame(wide)).toPandas()
    assert len(out) == len(dates) * len(labels)

    # oracle: label L on day D -> D 00:00 + 30*L minutes, value matches
    expect = {}
    for i, d in enumerate(dates):
        for lab in labels:
            ts = pd.Timestamp(d) + pd.Timedelta(minutes=30 * lab)
            expect[ts] = float(lab * 100 + i)
    got = dict(zip(out["datetime"], out["value"]))
    assert got == expect
    # sorted ascending
    assert out["datetime"].is_monotonic_increasing
