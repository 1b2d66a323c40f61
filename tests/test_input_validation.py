"""Input-validation parity with the reference's 262-line suite
(reference tests/test_input_validation.py): filter-model vocabularies,
path/directory validators, year ordering, plus the Spark-specific
frame-schema checks that replace pydantic's closed models on an open
parquet schema."""

from __future__ import annotations

import pandas as pd
import pytest

from isp_trace_parser_spark import input_validation as V
from isp_trace_parser_spark import api

if V.HAS_PYDANTIC:
    from pydantic import ValidationError as FilterError
else:
    FilterError = ValueError


# ------------------------------------------------------- filter models
@pytest.mark.parametrize(
    "kwargs",
    [
        {"name": ["A", "B"]},
        {"file_type": ["zone"]},
        {"resource_type": ["SAT", "FFP"]},
        {"reference_year": [2011, 2012]},
        {},
    ],
)
def test_solar_filter_valid(kwargs):
    V.SolarMetadataFilter(**kwargs)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"file_type": ["region"]},          # not zone|project
        {"resource_type": ["WH"]},           # wind code in solar filter
        {"resource_type": ["sat"]},          # case matters
    ],
)
def test_solar_filter_invalid(kwargs):
    with pytest.raises(FilterError):
        V.SolarMetadataFilter(**kwargs)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"resource_type": ["WH", "WM", "WL", "WX", "wind"]},
        {"file_type": ["project", "zone"]},
    ],
)
def test_wind_filter_valid(kwargs):
    V.WindMetadataFilter(**kwargs)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"resource_type": ["SAT"]},          # solar code in wind filter
        {"file_type": ["area"]},
    ],
)
def test_wind_filter_invalid(kwargs):
    with pytest.raises(FilterError):
        V.WindMetadataFilter(**kwargs)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"scenario": ["Step Change", "Green Energy Exports"]},
        {"poe": ["POE10"]},
        {"demand_type": ["OPSO_MODELLING", "PV_TOT"]},
        {"subregion": ["CNSW"]},
    ],
)
def test_demand_filter_valid(kwargs):
    V.DemandMetadataFilter(**kwargs)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"scenario": ["STEP_CHANGE"]},       # raw code, not display name
        {"poe": ["POE90"]},
        {"demand_type": ["OPSO"]},
    ],
)
def test_demand_filter_invalid(kwargs):
    with pytest.raises(FilterError):
        V.DemandMetadataFilter(**kwargs)


def test_filter_model_to_parse_dims():
    f = V.SolarMetadataFilter(name=["N1"], file_type=["zone"])
    assert V.metadata_filter_to_parse_dims(f) == {
        "entity": ["N1"], "entity_type": ["zone"],
    }


# -------------------------------------------------------------- paths
def test_input_directory(tmp_path):
    assert V.input_directory(tmp_path) == tmp_path
    with pytest.raises(ValueError, match="Directory .* does not exist"):
        V.input_directory(tmp_path / "nope")


def test_parsed_directory_valid(tmp_path):
    assert V.parsed_directory(str(tmp_path)) == tmp_path
    assert V.parsed_directory("relative/path") is not None


def test_is_valid_path_invalid():
    with pytest.raises(ValueError, match="Invalid parsed directory path"):
        V.is_valid_path(123)


# -------------------------------------------------------------- years
@pytest.mark.parametrize("start,end", [(2020, 2020), (2020, 2024)])
def test_year_order_valid(start, end):
    V.start_year_before_end_year(start, end)


def test_year_order_invalid():
    with pytest.raises(ValueError, match="Start year .* < end year"):
        V.start_year_before_end_year(2024, 2020)


def test_year_type():
    V.validate_year_type("fy")
    V.validate_year_type("calendar")
    with pytest.raises(ValueError, match="year_type"):
        V.validate_year_type("financial")


def test_construct_reference_year_mapping_validation():
    from isp_trace_parser_spark.plans.windows import (
        construct_reference_year_mapping,
    )

    assert construct_reference_year_mapping(2030, 2032, [2011, 2013]) == {
        2030: 2011, 2031: 2013, 2032: 2011,
    }
    with pytest.raises(ValueError, match="Start year"):
        construct_reference_year_mapping(2032, 2030, [2011])
    with pytest.raises(ValueError, match="non-empty list of ints"):
        construct_reference_year_mapping(2030, 2032, [])
    with pytest.raises(ValueError, match="non-empty list of ints"):
        construct_reference_year_mapping(2030, 2032, ["2011"])


def test_reference_year_mapping():
    V.validate_reference_year_mapping({2024: 2011})
    with pytest.raises(ValueError, match="non-empty"):
        V.validate_reference_year_mapping({})
    with pytest.raises(ValueError, match="not an int"):
        V.validate_reference_year_mapping({"2024": 2011})
    with pytest.raises(ValueError, match="not an int"):
        V.validate_reference_year_mapping({2024: "2011"})


# ------------------------------------------- query-surface integration
@pytest.fixture(scope="module")
def frame(spark):
    pdf = pd.DataFrame(
        {
            "datetime": pd.date_range("2021-07-01 00:30", periods=10, freq="30min"),
            "value": range(10),
            "project": "Bango",
            "reference_year": 2011,
        }
    )
    return spark.createDataFrame(pdf)


def test_query_rejects_typoed_filter_column(frame):
    with pytest.raises(ValueError, match="filter column 'projct'"):
        api.query_single_reference_year(
            frame, 2022, 2022, 2011, filters={"projct": "Bango"}
        )


def test_query_rejects_typoed_select_column(frame):
    with pytest.raises(ValueError, match="select column 'valu'"):
        api.query_single_reference_year(
            frame, 2022, 2022, 2011, select_columns=["datetime", "valu"]
        )


def test_query_rejects_bad_year_order(frame):
    with pytest.raises(ValueError, match="Start year"):
        api.query_single_reference_year(frame, 2024, 2022, 2011)


def test_query_rejects_bad_year_type(frame):
    with pytest.raises(ValueError, match="year_type"):
        api.query_single_reference_year(
            frame, 2022, 2022, 2011, year_type="financial"
        )


def test_query_multi_rejects_bad_mapping(frame):
    with pytest.raises(ValueError, match="not an int"):
        api.query_multiple_reference_years(frame, {"2024": 2011})
