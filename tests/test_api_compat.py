"""Drop-in API surface: same names/signatures as the reference's 16
get_data entry points, same projection/window semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from isp_trace_parser_spark import api_compat as C


@pytest.fixture(scope="module")
def project_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("projects")
    rows = []
    for ry in (2011, 2012):
        for project in ("Bango", "Bodangora"):
            ts = pd.date_range("2021-07-01 00:30:00", periods=48 * 740, freq="30min")
            rows.append(
                pd.DataFrame(
                    {
                        "datetime": ts,
                        "value": np.linspace(0, 1, len(ts)) + ry,
                        "project": project,
                        "reference_year": np.int32(ry),
                        "resource_type": "wind",
                    }
                )
            )
    pdf = pd.concat(rows, ignore_index=True)
    spark.createDataFrame(pdf).write.parquet(str(base / "p"))
    return str(base / "p")


@pytest.fixture(scope="module")
def demand_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("demand")
    ts = pd.date_range("2021-07-01 00:30:00", periods=48 * 370, freq="30min")
    rows = []
    for scenario in ("Step Change", "Green Energy Exports"):
        for poe in ("POE10", "POE50"):
            rows.append(
                pd.DataFrame(
                    {
                        "datetime": ts,
                        "value": np.arange(len(ts), dtype=float),
                        "subregion": "CNSW",
                        "reference_year": np.int32(2011),
                        "scenario": scenario,
                        "poe": poe,
                        "demand_type": "OPSO_MODELLING",
                    }
                )
            )
    spark.createDataFrame(pd.concat(rows, ignore_index=True)).write.parquet(
        str(base / "d")
    )
    return str(base / "d")


def test_project_single(spark, project_dir):
    out = C.get_project_single_reference_year(
        2022, 2022, 2011, "Bango", project_dir
    )
    assert list(out.columns) == ["datetime", "value"]
    assert len(out) == 365 * 48
    assert out["datetime"].is_monotonic_increasing


def test_project_multi_value_filter_adds_column(spark, project_dir):
    out = C.get_project_single_reference_year(
        2022, 2022, 2011, ["Bango", "Bodangora"], project_dir
    )
    assert list(out.columns) == ["datetime", "value", "project"]
    assert len(out) == 2 * 365 * 48


def test_project_multiple_reference_years(spark, project_dir):
    out = C.get_project_multiple_reference_years(
        {2022: 2011, 2023: 2012}, "Bango", project_dir
    )
    # concat in mapping order, not re-sorted across years
    assert len(out) == 2 * 365 * 48
    assert out.iloc[0]["value"] < 2012  # first block is refyear 2011


def test_demand_single_all_scalar(spark, demand_dir):
    out = C.get_demand_single_reference_year(
        2022, 2022, 2011, "Step Change", "CNSW", "OPSO_MODELLING", "POE10",
        demand_dir,
    )
    assert list(out.columns) == ["datetime", "value"]
    assert len(out) == 365 * 48


def test_demand_multi_poe_column_policy(spark, demand_dir):
    out = C.get_demand_single_reference_year(
        2022, 2022, 2011, "Step Change", "CNSW", "OPSO_MODELLING",
        ["POE10", "POE50"], demand_dir,
    )
    assert list(out.columns) == ["datetime", "value", "poe"]


@pytest.fixture(scope="module")
def zone_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zones")
    ts = pd.date_range("2021-07-01 00:30:00", periods=48 * 740, freq="30min")
    rows = []
    for zone in ("N1", "Q1"):
        for rt in ("SAT", "WH"):
            rows.append(
                pd.DataFrame(
                    {
                        "datetime": ts,
                        "value": np.linspace(0, 1, len(ts))
                        + (10.0 if rt == "SAT" else 20.0),
                        "zone": zone,
                        "reference_year": np.int32(2011),
                        "resource_type": rt,
                    }
                )
            )
    spark.createDataFrame(pd.concat(rows, ignore_index=True)).write.parquet(
        str(base / "z")
    )
    return str(base / "z")


def test_zone_single_filters_resource_type(spark, zone_dir):
    out = C.get_zone_single_reference_year(
        2022, 2022, 2011, "Q1", "SAT", zone_dir
    )
    assert list(out.columns) == ["datetime", "value"]
    assert len(out) == 365 * 48
    assert (out["value"] < 20).all()  # WH rows (value>=20) excluded


def test_zone_multi_resource_type_adds_column(spark, zone_dir):
    out = C.get_zone_single_reference_year(
        2022, 2022, 2011, "Q1", ["SAT", "WH"], zone_dir
    )
    assert list(out.columns) == ["datetime", "value", "resource_type"]
    assert len(out) == 2 * 365 * 48


def test_zone_multiple_reference_years_resource_type(spark, zone_dir):
    out = C.get_zone_multiple_reference_years(
        {2022: 2011}, "N1", "WH", zone_dir
    )
    assert len(out) == 365 * 48
    assert (out["value"] >= 20).all()


def test_area_passthroughs_map_to_resource_type(spark, zone_dir):
    a = C.solar_area_single_reference_year(
        2022, 2022, 2011, "Q1", "SAT", zone_dir
    )
    b = C.get_zone_single_reference_year(2022, 2022, 2011, "Q1", "SAT", zone_dir)
    pd.testing.assert_frame_equal(a, b)
    w = C.wind_area_single_reference_year(
        2022, 2022, 2011, "Q1", "WH", zone_dir
    )
    assert (w["value"] >= 20).all()
    # legacy keyword name `reference_years` (reference get_data.py:985,1233)
    m = C.solar_area_multiple_reference_years(
        reference_years={2022: 2011}, area="Q1", technology="SAT",
        directory=zone_dir,
    )
    assert len(m) == 365 * 48
    mw = C.wind_area_multiple_reference_years(
        reference_years={2022: 2011}, area="Q1", resource_quality="WH",
        directory=zone_dir,
    )
    assert (mw["value"] >= 20).all()


def test_legacy_passthroughs(spark, project_dir):
    a = C.solar_project_single_reference_year(2022, 2022, 2011, "Bango", project_dir)
    b = C.wind_project_single_reference_year(2022, 2022, 2011, "Bango", project_dir)
    pd.testing.assert_frame_equal(a, b)
    c = C.get_project_single_reference_year(2022, 2022, 2011, "Bango", project_dir)
    pd.testing.assert_frame_equal(a, c)
