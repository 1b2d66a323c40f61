"""Query-API parity tests: FY windows, half-open interval edges, filter
semantics, column-selection policy, multi-refyear concat order —
mirroring the reference's get_data golden tests (tests/test_get_data.py)."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from isp_trace_parser_spark import api
from isp_trace_parser_spark.plans.windows import (
    construct_reference_year_mapping,
    year_range_to_dt_range,
)


def test_year_range_fy():
    # reference doctest get_data.py:28-34
    assert year_range_to_dt_range(2022, 2024, "fy") == (
        datetime.datetime(2021, 7, 1),
        datetime.datetime(2024, 7, 1),
    )


def test_year_range_calendar():
    assert year_range_to_dt_range(2022, 2024, "calendar") == (
        datetime.datetime(2022, 1, 1),
        datetime.datetime(2025, 1, 1),
    )


def test_reference_year_mapping_cycles():
    # reference construct_reference_year_mapping.py doctest
    assert construct_reference_year_mapping(2030, 2035, [2011, 2012, 2013]) == {
        2030: 2011,
        2031: 2012,
        2032: 2013,
        2033: 2011,
        2034: 2012,
        2035: 2013,
    }


@pytest.fixture(scope="module")
def trace_df(spark):
    # half-hourly trace spanning FY2022-FY2024 for two projects x 2 refyears
    rows = []
    for ref_year in (2011, 2012):
        for project in ("alpha", "beta"):
            ts = pd.date_range(
                "2021-07-01 00:30:00", "2024-07-01 00:00:00", freq="30min"
            )
            rows.append(
                pd.DataFrame(
                    {
                        "datetime": ts,
                        "value": [
                            float(i % 48) + (10000.0 if ref_year == 2012 else 0.0)
                            for i in range(len(ts))
                        ],
                        "project": project,
                        "reference_year": ref_year,
                        "resource_type": "solar",
                    }
                )
            )
    pdf = pd.concat(rows, ignore_index=True)
    sdf = spark.createDataFrame(pdf)
    return sdf, pdf


def _oracle_single(pdf, sy, ey, ry, filters=None, select_columns=None, year_type="fy"):
    start, end = year_range_to_dt_range(sy, ey, year_type)
    m = (pdf["reference_year"] == ry) & (pdf["datetime"] > start) & (pdf["datetime"] <= end)
    if filters:
        for c, v in filters.items():
            m &= pdf[c].isin(v) if isinstance(v, list) else (pdf[c] == v)
    cols = api._columns_to_select(list(pdf.columns), filters, select_columns)
    return (
        pdf[m][cols]
        .sort_values("datetime", kind="stable")
        .reset_index(drop=True)
    )


def test_half_open_window_edges(spark, trace_df):
    sdf, pdf = trace_df
    out = api.query_single_reference_year(
        sdf, 2022, 2022, 2011, filters={"project": "alpha"}
    ).toPandas()
    # (2021-07-01, 2022-07-01]: excludes start boundary, includes end
    assert out["datetime"].min() == pd.Timestamp("2021-07-01 00:30:00")
    assert out["datetime"].max() == pd.Timestamp("2022-07-01 00:00:00")
    assert len(out) == 365 * 48  # FY2022 has 365 days


def test_filter_and_projection_policy(spark, trace_df):
    sdf, pdf = trace_df
    # scalar filter -> only (datetime, value)
    out = api.query_single_reference_year(
        sdf, 2022, 2022, 2011, filters={"project": "alpha"}
    )
    assert out.columns == ["datetime", "value"]
    # multi-value list filter -> filter column included
    out2 = api.query_single_reference_year(
        sdf, 2022, 2022, 2011, filters={"project": ["alpha", "beta"]}
    )
    assert out2.columns == ["datetime", "value", "project"]
    # single-value list -> NOT included (len > 1 rule, get_data.py:96-101)
    out3 = api.query_single_reference_year(
        sdf, 2022, 2022, 2011, filters={"project": ["alpha"]}
    )
    assert out3.columns == ["datetime", "value"]
    # no filters -> all columns
    out4 = api.query_single_reference_year(sdf, 2022, 2022, 2011)
    assert out4.columns == list(pdf.columns)
    # explicit select wins
    out5 = api.query_single_reference_year(
        sdf, 2022, 2022, 2011, select_columns=["datetime", "project"]
    )
    assert out5.columns == ["datetime", "project"]


@pytest.mark.parametrize("year_type", ["fy", "calendar"])
def test_values_match_pandas_oracle(spark, trace_df, year_type):
    sdf, pdf = trace_df
    got = api.query_single_reference_year(
        sdf, 2022, 2023, 2012, filters={"project": ["alpha", "beta"]}, year_type=year_type
    ).toPandas()
    want = _oracle_single(
        pdf, 2022, 2023, 2012, filters={"project": ["alpha", "beta"]}, year_type=year_type
    )
    assert len(got) == len(want)
    # sorted only by datetime; ties across projects unspecified -> compare
    # with a deterministic secondary sort on both sides
    g = got.sort_values(["datetime", "project"], kind="stable").reset_index(drop=True)
    w = want.sort_values(["datetime", "project"], kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w)


def test_multi_reference_year_concat_order(spark, trace_df):
    sdf, pdf = trace_df
    mapping = {2023: 2012, 2022: 2011}  # deliberately non-ascending
    got = api.query_multiple_reference_years(
        sdf, mapping, filters={"project": "alpha"}
    ).toPandas()
    sub_2023 = _oracle_single(pdf, 2023, 2023, 2012, filters={"project": "alpha"})
    sub_2022 = _oracle_single(pdf, 2022, 2022, 2011, filters={"project": "alpha"})
    want = pd.concat([sub_2023, sub_2022]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # mapping order preserved: first block is FY2023 (values offset +10000)
    assert got.iloc[0]["value"] >= 10000.0
