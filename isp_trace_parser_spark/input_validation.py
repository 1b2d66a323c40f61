"""Strict input validation with the reference's error shapes.

The reference pydantic-validates every public call (@validate_call,
reference input_validation.py:4-19) and constrains filter vocabularies
with Literal models (solar_traces.py:24-55, wind_traces.py:24-55,
demand_traces.py:19-57; 262 lines of tests in
tests/test_input_validation.py). This module reproduces that behavior
for the Spark engine:

- path / directory / year-order validators raising the reference's
  exact error messages;
- ``SolarMetadataFilter`` / ``WindMetadataFilter`` /
  ``DemandMetadataFilter`` pydantic models with the reference's Literal
  vocabularies (ValidationError on a typo'd value, not a silently-empty
  frame);
- frame-schema-aware filter/column validation for the query surface: a
  typo'd filter or select column raises a loud ValueError naming the
  valid columns instead of surfacing as an AnalysisException.

pydantic is import-gated: without it the filter models degrade to
plain validating classes raising ValueError with the same messages.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Literal, Optional

VALID_YEAR_TYPES = ("fy", "calendar")


# ---------------------------------------------------------------- paths
def is_valid_path(path: str | Path) -> Path:
    """Reference input_validation.py:15-19 (same error message)."""
    try:
        return Path(path)
    except (TypeError, ValueError):
        raise ValueError(f"Invalid parsed directory path: {path}")


def input_directory(path: str | Path) -> Path:
    """Reference input_validation.py:4-8: must exist."""
    p = is_valid_path(path)
    if not p.is_dir():
        raise ValueError(f"Directory {p} does not exist")
    return p


def parsed_directory(path: str | Path) -> Path:
    """Reference input_validation.py:11-12."""
    return is_valid_path(path)


# ---------------------------------------------------------------- years
def start_year_before_end_year(start_year: int, end_year: int) -> None:
    """Reference input_validation.py:22-24 (message preserved verbatim,
    including its quirky wording)."""
    if end_year < start_year:
        raise ValueError(f"Start year {end_year} < end year {start_year}")


def validate_year_type(year_type: str) -> str:
    if year_type not in VALID_YEAR_TYPES:
        raise ValueError(
            f"year_type must be one of {list(VALID_YEAR_TYPES)}, got {year_type!r}"
        )
    return year_type


def validate_reference_year_mapping(mapping: dict) -> dict:
    if not isinstance(mapping, dict) or not mapping:
        raise ValueError("reference_year_mapping must be a non-empty dict")
    for k, v in mapping.items():
        if not isinstance(k, int) or isinstance(k, bool):
            raise ValueError(f"reference_year_mapping key {k!r} is not an int year")
        if not isinstance(v, int) or isinstance(v, bool):
            raise ValueError(
                f"reference_year_mapping value {v!r} for year {k} is not an int"
            )
    return mapping


# ------------------------------------------------- frame-schema filters
def validate_filter_columns(
    frame_columns: list[str],
    filters: dict[str, Any] | None,
    select_columns: list[str] | None = None,
    ts_col: str = "datetime",
) -> None:
    """A typo'd filter/select column must fail loud (the reference's
    pydantic models make unknown fields impossible; on an open schema we
    validate against the actual frame)."""
    cols = set(frame_columns)
    if ts_col not in cols:
        raise ValueError(
            f"timestamp column {ts_col!r} not in frame columns {sorted(cols)}"
        )
    for c in filters or {}:
        if c not in cols:
            raise ValueError(
                f"filter column {c!r} not in frame columns {sorted(cols)}"
            )
    for c in select_columns or []:
        if c not in cols:
            raise ValueError(
                f"select column {c!r} not in frame columns {sorted(cols)}"
            )


# ------------------------------------------------------- filter models
try:  # pydantic parity path (the reference's exact mechanism)
    from pydantic import BaseModel, validate_call

    class SolarMetadataFilter(BaseModel):
        """Reference solar_traces.py:24-55 (same fields + vocabulary)."""

        name: Optional[list[str]] = None
        file_type: Optional[list[Literal["zone", "project"]]] = None
        resource_type: Optional[list[Literal["SAT", "FFP", "CST"]]] = None
        reference_year: Optional[list[int]] = None

    class WindMetadataFilter(BaseModel):
        """Reference wind_traces.py:24-55."""

        name: Optional[list[str]] = None
        file_type: Optional[list[Literal["zone", "project"]]] = None
        resource_type: Optional[
            list[Literal["WH", "WM", "WL", "WX", "wind"]]
        ] = None
        reference_year: Optional[list[int]] = None

    class DemandMetadataFilter(BaseModel):
        """Reference demand_traces.py:19-57."""

        subregion: Optional[list[str]] = None
        scenario: Optional[
            list[Literal["Step Change", "Progressive Change", "Green Energy Exports"]]
        ] = None
        poe: Optional[list[Literal["POE50", "POE10"]]] = None
        demand_type: Optional[
            list[Literal["OPSO_MODELLING", "OPSO_MODELLING_PVLITE", "PV_TOT"]]
        ] = None
        reference_year: Optional[list[int]] = None

    HAS_PYDANTIC = True

except ImportError:  # plain-Python fallback, same semantics
    HAS_PYDANTIC = False
    validate_call = lambda f: f  # noqa: E731

    class _PlainFilter:
        _vocab: dict[str, tuple] = {}
        _fields: tuple = ()

        def __init__(self, **kwargs):
            for k, v in kwargs.items():
                if k not in self._fields:
                    raise ValueError(f"unknown filter field {k!r}")
                vocab = self._vocab.get(k)
                if v is not None and vocab is not None:
                    bad = [x for x in v if x not in vocab]
                    if bad:
                        raise ValueError(
                            f"{k} values {bad} not in {list(vocab)}"
                        )
                setattr(self, k, v)
            for k in self._fields:
                if not hasattr(self, k):
                    setattr(self, k, None)

        def model_dump(self):
            return {k: getattr(self, k) for k in self._fields}

    class SolarMetadataFilter(_PlainFilter):
        _fields = ("name", "file_type", "resource_type", "reference_year")
        _vocab = {
            "file_type": ("zone", "project"),
            "resource_type": ("SAT", "FFP", "CST"),
        }

    class WindMetadataFilter(_PlainFilter):
        _fields = ("name", "file_type", "resource_type", "reference_year")
        _vocab = {
            "file_type": ("zone", "project"),
            "resource_type": ("WH", "WM", "WL", "WX", "wind"),
        }

    class DemandMetadataFilter(_PlainFilter):
        _fields = ("subregion", "scenario", "poe", "demand_type", "reference_year")
        _vocab = {
            "scenario": ("Step Change", "Progressive Change", "Green Energy Exports"),
            "poe": ("POE50", "POE10"),
            "demand_type": ("OPSO_MODELLING", "OPSO_MODELLING_PVLITE", "PV_TOT"),
        }


def metadata_filter_to_parse_dims(filter_model) -> dict[str, Any]:
    """Adapt a reference-style metadata filter model to the parse
    pipeline's column names (reference field -> parse dim):
    name -> entity, file_type -> entity_type; resource_type and
    reference_year pass through. None fields are dropped."""
    d = filter_model.model_dump() if hasattr(filter_model, "model_dump") else dict(filter_model)
    rename = {"name": "entity", "file_type": "entity_type"}
    return {
        rename.get(k, k): v for k, v in d.items() if v is not None
    }
