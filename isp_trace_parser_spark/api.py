"""get_data-equivalent query surface.

Reimplements the reference's query kernel
(``_query_parquet_single_reference_year``, get_data.py:46-113) and its
multi-reference-year variant (get_data.py:116-140) on Spark DataFrames,
preserving the API-surface semantics exactly:

- half-open time window: ``datetime > start AND datetime <= end``
  (get_data.py:80-82);
- FY year-ending convention (get_data.py:35-38);
- filter dict: scalar -> ``==``, list -> ``isin`` (get_data.py:85-90);
- column-selection policy (get_data.py:92-104): explicit
  ``select_columns`` wins; else with filters -> ``[datetime, value]`` +
  every filter column whose value is a list of len > 1; else all columns;
- result sorted ONLY by datetime (ties unspecified, get_data.py:109);
- multi-reference-year: one sub-query per (year -> reference_year) pair,
  concatenated in mapping order, NOT re-sorted across years
  (get_data.py:116-140).

Everything is a single declarative plan per sub-query: Catalyst pushes
the conjunctive predicate and the projection into the parquet/Iceberg
scan (PushedFilters + partition pruning on reference_year), so at 100 TB
only the matching partitions and columns are read.
"""

from __future__ import annotations

import datetime
from functools import reduce
from typing import Any, Literal

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from isp_trace_parser_spark import input_validation as validation
from isp_trace_parser_spark.plans.windows import year_range_to_dt_range


def _apply_filters(
    df: DataFrame,
    start_dt: datetime.datetime,
    end_dt: datetime.datetime,
    reference_year: int | None,
    filters: dict[str, Any] | None,
    ts_col: str = "datetime",
) -> DataFrame:
    cond = (F.col(ts_col) > F.lit(start_dt)) & (F.col(ts_col) <= F.lit(end_dt))
    if reference_year is not None:
        cond = (F.col("reference_year") == F.lit(reference_year)) & cond
    if filters:
        for col, value in filters.items():
            if isinstance(value, list):
                cond = cond & F.col(col).isin(value)
            else:
                cond = cond & (F.col(col) == F.lit(value))
    return df.where(cond)


def _columns_to_select(
    all_columns: list[str],
    filters: dict[str, Any] | None,
    select_columns: list[str] | None,
    ts_col: str = "datetime",
) -> list[str]:
    """Reference projection policy, get_data.py:92-104."""
    if select_columns is not None:
        return select_columns
    if filters:
        cols = [ts_col, "value"]
        for col, value in filters.items():
            if isinstance(value, list) and len(value) > 1:
                cols.append(col)
        return cols
    return list(all_columns)


def query_single_reference_year(
    df: DataFrame,
    start_year: int,
    end_year: int,
    reference_year: int | None,
    filters: dict[str, Any] | None = None,
    select_columns: list[str] | None = None,
    year_type: Literal["fy", "calendar"] = "fy",
    ts_col: str = "datetime",
) -> DataFrame:
    """The reference kernel as one declarative Spark plan. Returns a
    DataFrame (call .toPandas() for the reference's pandas egress,
    get_data.py:113)."""
    validation.start_year_before_end_year(start_year, end_year)
    validation.validate_year_type(year_type)
    validation.validate_filter_columns(df.columns, filters, select_columns, ts_col)
    start_dt, end_dt = year_range_to_dt_range(start_year, end_year, year_type)
    filtered = _apply_filters(df, start_dt, end_dt, reference_year, filters, ts_col)
    cols = _columns_to_select(df.columns, filters, select_columns, ts_col)
    return filtered.select(*cols).orderBy(ts_col)


def query_multiple_reference_years(
    df: DataFrame,
    reference_year_mapping: dict[int, int],
    filters: dict[str, Any] | None = None,
    select_columns: list[str] | None = None,
    year_type: Literal["fy", "calendar"] = "fy",
    ts_col: str = "datetime",
) -> DataFrame:
    """Multi-refyear query (get_data.py:116-140): per-year sub-plans
    unioned in mapping order. Each sub-plan is sorted by datetime within
    its year; the union is NOT re-sorted (reference concatenates pandas
    frames). Since year windows are disjoint and ascending in practice,
    the result order matches the reference's.
    """
    validation.validate_reference_year_mapping(reference_year_mapping)
    subs = [
        query_single_reference_year(
            df,
            start_year=year,
            end_year=year,
            reference_year=ref_year,
            filters=filters,
            select_columns=select_columns,
            year_type=year_type,
            ts_col=ts_col,
        )
        for year, ref_year in reference_year_mapping.items()
    ]
    return reduce(DataFrame.unionByName, subs)


class TraceStore:
    """Convenience handle over a parsed-trace dataset directory or table
    (the reference's per-trace-type parquet directories,
    README.md:92-101), exposing the 6 canonical get_data entry points
    (get_data.py:143-727)."""

    def __init__(self, spark: SparkSession, path_or_table: str):
        self.spark = spark
        if "/" in path_or_table:
            self.df = spark.read.parquet(path_or_table)
        else:
            self.df = spark.read.table(path_or_table)

    def single_reference_year(self, **kwargs) -> pd.DataFrame:
        return query_single_reference_year(self.df, **kwargs).toPandas()

    def multiple_reference_years(self, **kwargs) -> pd.DataFrame:
        return query_multiple_reference_years(self.df, **kwargs).toPandas()
