"""Bundled trace-name vocabulary + loaders.

The reference ships the 2024 ISP trace-name->metadata vocabulary as
package-data YAML (reference mappings/__init__.py:6-18,
mappings/2024/{resources,topography,demand}.yaml) so parse_* is callable
out-of-the-box on real AEMO filenames. This package bundles the same
public vocabulary as JSON (``data/2024.json``) and provides:

- :func:`load` — reference-parity accessor (name, version) -> dict.
- :func:`load_yaml_dir` — read a reference-format mapping directory
  (a user migrating from the reference points this at their own
  ``mappings/<version>/`` tree).
- :func:`name_mapping` — the stem -> {entity, entity_type,
  resource_type, parent} dict :func:`parse.parse_traces` consumes,
  with parents resolved through the topography (projects: their REZ
  zone or subregion, reference resources.yaml notes; zones: their
  subregion via topography.yaml zones map).
- :func:`alias_map` — IASR display-name alias -> trace stem (the
  reference's iasr_aliases field, used by the alias semi-join J3).
- :func:`demand_vocab` — scenario display map + POE / demand-type
  vocabularies (reference demand.yaml).
"""

from __future__ import annotations

import json
from importlib.resources import files
from pathlib import Path
from typing import Any

_CACHE: dict[str, dict] = {}


def _bundle(version: str = "2024") -> dict:
    if version not in _CACHE:
        resource = files(__package__).joinpath("data", f"{version}.json")
        with resource.open("r") as f:
            _CACHE[version] = json.load(f)
    return _CACHE[version]


def load(name: str, version: str = "2024") -> dict:
    """Reference-parity accessor (mappings/__init__.py:6-18): ``name``
    is one of ``resources | topography | demand``."""
    bundle = _bundle(version)
    if name not in ("resources", "topography", "demand"):
        raise ValueError(f"unknown mapping name: {name!r}")
    return bundle[name]


def load_yaml_dir(directory: str | Path) -> dict:
    """Read a reference-format mapping directory
    (``resources.yaml``/``topography.yaml``/``demand.yaml``) into the
    same shape as the bundled JSON. Requires PyYAML."""
    import yaml  # gated: only needed for user-supplied YAML trees

    directory = Path(directory)
    if not directory.is_dir():
        raise ValueError(f"mapping directory does not exist: {directory}")
    out: dict[str, Any] = {}
    for name in ("resources", "topography", "demand"):
        p = directory / f"{name}.yaml"
        if p.exists():
            with open(p) as f:
                out[name] = yaml.safe_load(f)
    if "resources" not in out:
        raise ValueError(f"no resources.yaml under {directory}")
    return out


def name_mapping(
    version: str = "2024", bundle: dict | None = None
) -> dict[str, dict[str, Any]]:
    """Stem -> parse dims for :func:`parse.parse_traces` /
    :func:`parse.build_name_mapping_df`.

    - entity: the location identifier (project name or REZ code)
    - entity_type: project | zone (reference ``location_type``)
    - resource_type: e.g. solar_sat, wind_high
    - parent: project -> its REZ ``zone`` (or ``subregion`` for
      non-REZ projects); zone -> its subregion from topography.
    """
    bundle = bundle or _bundle(version)
    resources = bundle["resources"]
    zones_parent = bundle.get("topography", {}).get("zones", {})
    mapping: dict[str, dict[str, Any]] = {}
    for stem, m in resources.items():
        etype = m.get("location_type", "project")
        loc = m.get("location", stem)
        if etype == "zone":
            parent = zones_parent.get(loc, "")
        else:
            parent = m.get("zone") or m.get("subregion") or ""
        mapping[stem] = {
            "entity": loc,
            "entity_type": etype,
            "resource_type": m.get("resource_type", ""),
            "parent": parent,
        }
    return mapping


def alias_map(version: str = "2024", bundle: dict | None = None) -> dict[str, str]:
    """IASR display-name alias -> trace stem (iasr_aliases field)."""
    bundle = bundle or _bundle(version)
    out: dict[str, str] = {}
    for stem, m in bundle["resources"].items():
        for alias in m.get("iasr_aliases") or []:
            out[alias] = stem
    return out


def demand_vocab(version: str = "2024", bundle: dict | None = None) -> dict:
    """Demand-trace vocabulary: scenario code -> display name, POE
    levels, demand types (reference demand.yaml)."""
    bundle = bundle or _bundle(version)
    return bundle["demand"]
