"""Round-trip property + semantics tests for the restructure operator,
mirroring the reference's strongest spec (tests/test_trace_formatter.py:7-60)."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest

from isp_trace_parser_spark.functions.restructure import (
    inverse_trace_formatter,
    trace_formatter,
)


def _wide_frame(n_days: int = 10, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    dates = pd.date_range("2024-05-28", periods=n_days, freq="D")
    data = {
        "Year": dates.year.astype("int64"),
        "Month": dates.month.astype("int64"),
        "Day": dates.day.astype("int64"),
    }
    for i in range(1, 49):
        data[f"{i:02d}"] = rng.random(n_days)
    return pd.DataFrame(data)


def test_round_trip_identity(spark):
    wide = _wide_frame()
    sdf = spark.createDataFrame(wide)
    back = inverse_trace_formatter(trace_formatter(sdf)).toPandas()
    pd.testing.assert_frame_equal(back, wide.sort_values(["Year", "Month", "Day"]).reset_index(drop=True))


def test_end_of_period_semantics(spark):
    # Reference doctest (trace_formatter.py:20-45): label 01 -> 00:30,
    # label 48 of day D -> day D+1 00:00.
    wide = pd.DataFrame(
        {
            "Year": [2024, 2024],
            "Month": [6, 6],
            "Day": [1, 2],
            "01": [11.2, 15.3],
            "02": [30.7, 20.4],
            "48": [17.1, 18.9],
        }
    )
    out = trace_formatter(spark.createDataFrame(wide)).toPandas()
    expect = pd.DataFrame(
        {
            "datetime": pd.to_datetime(
                [
                    "2024-06-01 00:30:00",
                    "2024-06-01 01:00:00",
                    "2024-06-02 00:00:00",
                    "2024-06-02 00:30:00",
                    "2024-06-02 01:00:00",
                    "2024-06-03 00:00:00",
                ]
            ),
            "value": [11.2, 30.7, 17.1, 15.3, 20.4, 18.9],
        }
    )
    pd.testing.assert_frame_equal(out, expect)


def test_unpadded_labels_accepted(spark):
    # AEMO ships both '01' and '1' headers (trace_formatter.py:57-59).
    wide = pd.DataFrame(
        {"Year": [2024], "Month": [1], "Day": [1], "1": [5.0], "10": [6.0]}
    )
    out = trace_formatter(spark.createDataFrame(wide)).toPandas()
    assert list(out["datetime"]) == [
        datetime.datetime(2024, 1, 1, 0, 30),
        datetime.datetime(2024, 1, 1, 5, 0),
    ]
    assert list(out["value"]) == [5.0, 6.0]


def test_no_label_columns_raises(spark):
    wide = pd.DataFrame({"Year": [2024], "Month": [1], "Day": [1]})
    with pytest.raises(ValueError):
        trace_formatter(spark.createDataFrame(wide))
