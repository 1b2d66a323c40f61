"""Driver-side time-window planning helpers (reference get_data.py:10-43
and construct_reference_year_mapping.py:6-38)."""

from __future__ import annotations

import datetime
from typing import Literal


def year_range_to_dt_range(
    start_year: int, end_year: int, year_type: Literal["fy", "calendar"] = "fy"
) -> tuple[datetime.datetime, datetime.datetime]:
    """Year range -> (start, end] datetime bounds.

    FY uses year-ending nomenclature: FY2022 spans (2021-07-01, 2022-07-01]
    (reference get_data.py:35-38). Calendar: (sy-01-01, (ey+1)-01-01]
    (get_data.py:40-43). The bounds are consumed half-open — strictly
    greater than start, <= end (get_data.py:80-82) — which with
    END-of-period timestamps yields exactly the periods of the window.
    """
    if year_type == "fy":
        return (
            datetime.datetime(start_year - 1, 7, 1),
            datetime.datetime(end_year, 7, 1),
        )
    elif year_type == "calendar":
        return (
            datetime.datetime(start_year, 1, 1),
            datetime.datetime(end_year + 1, 1, 1),
        )
    raise ValueError(f"year_type must be 'fy' or 'calendar', got {year_type!r}")


def construct_reference_year_mapping(
    start: int, end: int, reference_years: list[int]
) -> dict[int, int]:
    """Cycle a list of historical reference years over a modeled horizon
    (reference construct_reference_year_mapping.py:6-38): model year
    ``start + i`` maps to ``reference_years[i % len(reference_years)]``.
    Validated like the reference's @validate_call surface
    (get_data.py:7, tests/test_input_validation.py:166-178).
    """
    from isp_trace_parser_spark.input_validation import (
        start_year_before_end_year,
    )

    start_year_before_end_year(start, end)
    if not reference_years or not all(
        isinstance(y, int) and not isinstance(y, bool) for y in reference_years
    ):
        raise ValueError("reference_years must be a non-empty list of ints")
    mapping = {}
    for i, year in enumerate(range(start, end + 1)):
        mapping[year] = reference_years[i % len(reference_years)]
    return mapping
