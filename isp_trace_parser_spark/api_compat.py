"""Drop-in public API: the reference's 6 canonical + 10 legacy get_data
entry points (reference get_data.py:143-1362), same signatures and
semantics, backed by the Spark kernel in :mod:`isp_trace_parser_spark.api`.

A user of the reference can switch imports and keep their call sites:

    from isp_trace_parser_spark.api_compat import get_project_single_reference_year

Directories are any parquet dataset (flat or hive-partitioned — Spark's
partition discovery handles both layouts, matching the reference's
pre/post-``optimise_parquet`` compatibility). Results are pandas frames
sorted by datetime (reference's pandas egress, get_data.py:106-113).

A SparkSession is resolved from the active session (or created via
:func:`isp_trace_parser_spark.session.get_spark`), mirroring how the
reference keeps its engine implicit.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, List, Literal

import pandas as pd
from pyspark.sql import SparkSession

from isp_trace_parser_spark import api
from isp_trace_parser_spark import input_validation as validation
from isp_trace_parser_spark.session import get_spark

YearType = Literal["fy", "calendar"]


def _spark() -> SparkSession:
    return SparkSession.getActiveSession() or get_spark()


def _query_single(
    start_year: int,
    end_year: int,
    reference_year: int,
    directory: str | Path,
    filters: dict[str, Any],
    year_type: YearType = "fy",
    select_columns: list[str] | None = None,
) -> pd.DataFrame:
    spark = _spark()
    df = spark.read.parquet(str(validation.parsed_directory(directory)))
    return api.query_single_reference_year(
        df,
        start_year=start_year,
        end_year=end_year,
        reference_year=reference_year,
        filters=filters,
        select_columns=select_columns,
        year_type=year_type,
    ).toPandas()


def _query_multi(
    reference_year_mapping: dict[int, int],
    directory: str | Path,
    filters: dict[str, Any],
    year_type: YearType = "fy",
    select_columns: list[str] | None = None,
) -> pd.DataFrame:
    spark = _spark()
    df = spark.read.parquet(str(validation.parsed_directory(directory)))
    return api.query_multiple_reference_years(
        df,
        reference_year_mapping=reference_year_mapping,
        filters=filters,
        select_columns=select_columns,
        year_type=year_type,
    ).toPandas()


# ----------------------------------------------------------- canonical 6
def get_project_single_reference_year(
    start_year: int,
    end_year: int,
    reference_year: int,
    project: str | List,
    directory: str | Path,
    year_type: YearType = "fy",
    select_columns: list[str] | None = None,
) -> pd.DataFrame:
    """Reference get_data.py:144-232."""
    return _query_single(
        start_year, end_year, reference_year, directory,
        filters={"project": project}, year_type=year_type,
        select_columns=select_columns,
    )


def get_zone_single_reference_year(
    start_year: int,
    end_year: int,
    reference_year: int,
    zone: str | List,
    resource_type: str | List,
    directory: str | Path,
    year_type: YearType = "fy",
    select_columns: list[str] | None = None,
) -> pd.DataFrame:
    """Reference get_data.py:236-328."""
    return _query_single(
        start_year, end_year, reference_year, directory,
        filters={"zone": zone, "resource_type": resource_type},
        year_type=year_type,
        select_columns=select_columns,
    )


def get_demand_single_reference_year(
    start_year: int,
    end_year: int,
    reference_year: int,
    scenario: str | List,
    subregion: str | List,
    demand_type: str | List,
    poe: str | List,
    directory: str | Path,
    year_type: YearType = "fy",
    select_columns: list[str] | None = None,
) -> pd.DataFrame:
    """Reference get_data.py:332-438."""
    return _query_single(
        start_year, end_year, reference_year, directory,
        filters={
            "scenario": scenario,
            "subregion": subregion,
            "demand_type": demand_type,
            "poe": poe,
        },
        year_type=year_type,
        select_columns=select_columns,
    )


def get_project_multiple_reference_years(
    reference_year_mapping: dict[int, int],
    project: str | List,
    directory: str | Path,
    year_type: YearType = "fy",
    select_columns: list[str] | None = None,
) -> pd.DataFrame:
    """Reference get_data.py:442-527."""
    return _query_multi(
        reference_year_mapping, directory, {"project": project},
        year_type, select_columns,
    )


def get_zone_multiple_reference_years(
    reference_year_mapping: dict[int, int],
    zone: str | List,
    resource_type: str | List,
    directory: str | Path,
    year_type: YearType = "fy",
    select_columns: list[str] | None = None,
) -> pd.DataFrame:
    """Reference get_data.py:531-620."""
    return _query_multi(
        reference_year_mapping, directory,
        {"zone": zone, "resource_type": resource_type},
        year_type, select_columns,
    )


def get_demand_multiple_reference_years(
    reference_year_mapping: dict[int, int],
    scenario: str | List,
    subregion: str | List,
    demand_type: str | List,
    poe: str | List,
    directory: str | Path,
    year_type: YearType = "fy",
    select_columns: list[str] | None = None,
) -> pd.DataFrame:
    """Reference get_data.py:624-727."""
    return _query_multi(
        reference_year_mapping, directory,
        {
            "scenario": scenario,
            "subregion": subregion,
            "demand_type": demand_type,
            "poe": poe,
        },
        year_type, select_columns,
    )


# -------------------------------------------------- legacy passthroughs
def solar_project_single_reference_year(
    start_year: int, end_year: int, reference_year: int, project: str,
    directory: str | Path, year_type: YearType = "fy",
) -> pd.DataFrame:
    """Reference get_data.py:740-798 (legacy v1 API)."""
    return get_project_single_reference_year(
        start_year, end_year, reference_year, project, directory, year_type
    )


def wind_project_single_reference_year(
    start_year: int, end_year: int, reference_year: int, project: str,
    directory: str | Path, year_type: YearType = "fy",
) -> pd.DataFrame:
    """Reference get_data.py:802-858."""
    return get_project_single_reference_year(
        start_year, end_year, reference_year, project, directory, year_type
    )


def solar_project_multiple_reference_years(
    reference_years: dict[int, int], project: str,
    directory: str | Path, year_type: YearType = "fy",
) -> pd.DataFrame:
    """Reference get_data.py:862-914 (legacy keyword name ``reference_years``)."""
    return get_project_multiple_reference_years(
        reference_years, project, directory, year_type
    )


def solar_area_single_reference_year(
    start_year: int, end_year: int, reference_year: int, area: str,
    technology: str, directory: str | Path, year_type: YearType = "fy",
) -> pd.DataFrame:
    """Reference get_data.py:917-981 ('area' is the zone column;
    'technology' maps to resource_type, get_data.py:978)."""
    return get_zone_single_reference_year(
        start_year, end_year, reference_year, area, technology,
        directory, year_type,
    )


def solar_area_multiple_reference_years(
    reference_years: dict[int, int], area: str, technology: str,
    directory: str | Path, year_type: YearType = "fy",
) -> pd.DataFrame:
    """Reference get_data.py:985-1041 ('technology' -> resource_type,
    get_data.py:1038)."""
    return get_zone_multiple_reference_years(
        reference_years, area, technology, directory, year_type
    )


def wind_project_multiple_reference_years(
    reference_years: dict[int, int], project: str,
    directory: str | Path, year_type: YearType = "fy",
) -> pd.DataFrame:
    """Reference get_data.py:1045-1097."""
    return get_project_multiple_reference_years(
        reference_years, project, directory, year_type
    )


def wind_area_single_reference_year(
    start_year: int, end_year: int, reference_year: int, area: str,
    resource_quality: str, directory: str | Path,
    year_type: YearType = "fy",
) -> pd.DataFrame:
    """Reference get_data.py:1101-1163 ('resource_quality' ->
    resource_type, get_data.py:1160)."""
    return get_zone_single_reference_year(
        start_year, end_year, reference_year, area, resource_quality,
        directory, year_type,
    )


def wind_area_multiple_reference_years(
    reference_years: dict[int, int], area: str, resource_quality: str,
    directory: str | Path, year_type: YearType = "fy",
) -> pd.DataFrame:
    """Reference get_data.py:1233-1287 ('resource_quality' ->
    resource_type, get_data.py:1284)."""
    return get_zone_multiple_reference_years(
        reference_years, area, resource_quality, directory, year_type
    )


def demand_single_reference_year(
    start_year: int, end_year: int, reference_year: int, subregion: str,
    scenario: str, poe: str, demand_type: str, directory: str | Path,
    year_type: YearType = "fy",
) -> pd.DataFrame:
    """Reference get_data.py:1291-1362."""
    return get_demand_single_reference_year(
        start_year, end_year, reference_year, scenario, subregion,
        demand_type, poe, directory, year_type,
    )


def demand_multiple_reference_years(
    reference_years: dict[int, int], subregion: str, scenario: str,
    poe: str, demand_type: str, directory: str | Path,
    year_type: YearType = "fy",
) -> pd.DataFrame:
    """Reference get_data.py:1166-1229 (legacy keyword name
    ``reference_years``)."""
    return get_demand_multiple_reference_years(
        reference_years, scenario, subregion, demand_type, poe,
        directory, year_type,
    )
