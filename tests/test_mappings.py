"""Bundled 2024 vocabulary + loader, and parse e2e on real AEMO stems
(reference mappings/__init__.py:6-18, mappings/2024/*.yaml)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from isp_trace_parser_spark import mappings
from isp_trace_parser_spark.parse import parse_traces
from isp_trace_parser_spark.sources.catalog import Catalog


def test_load_reference_parity():
    res = mappings.load("resources")
    assert len(res) == 371
    # spot-check one project and one zone entry against the public vocab
    assert res["Avonlie_SAT"]["location"] == "Avonlie"
    assert res["Avonlie_SAT"]["zone"] == "N6"
    topo = mappings.load("topography")
    assert topo["zones"]["N6"] == "SNSW"
    dem = mappings.load("demand")
    assert dem["scenarios"]["HYDROGEN_EXPORT"] == "Green Energy Exports"
    with pytest.raises(ValueError, match="unknown mapping"):
        mappings.load("nope")


def test_name_mapping_parent_resolution():
    nm = mappings.name_mapping()
    assert len(nm) == 371
    # project inside a REZ -> parent is the zone
    assert nm["Avonlie_SAT"] == {
        "entity": "Avonlie", "entity_type": "project",
        "resource_type": "solar_sat", "parent": "N6",
    }
    # non-REZ project -> parent is its subregion
    assert nm["Adelaide_Desal_FFP"]["parent"] == "CSA"
    # zone -> parent from topography
    zones = {k: v for k, v in nm.items() if v["entity_type"] == "zone"}
    assert zones, "no zone stems in bundle"
    for v in zones.values():
        assert v["parent"] != "", v


def test_alias_map():
    am = mappings.alias_map()
    assert am["Avonlie Solar Farm"] == "Avonlie_SAT"


def test_load_yaml_dir_roundtrip(tmp_path):
    """A reference-format YAML directory loads to the same mapping as
    the bundled JSON (format parity for migrating users)."""
    yaml = pytest.importorskip("yaml")
    bundle = mappings._bundle()
    d = tmp_path / "2024"
    d.mkdir()
    for name in ("resources", "topography", "demand"):
        with open(d / f"{name}.yaml", "w") as f:
            yaml.safe_dump(bundle[name], f)
    loaded = mappings.load_yaml_dir(d)
    assert loaded["resources"] == bundle["resources"]
    assert mappings.name_mapping(bundle=loaded) == mappings.name_mapping()


def _write_csv(path, seed, year=2022, days=2):
    rng = np.random.default_rng(seed)
    dates = pd.date_range(f"{year}-01-01", periods=days, freq="D")
    df = pd.DataFrame({"Year": dates.year, "Month": dates.month, "Day": dates.day})
    for i in range(1, 49):
        df[f"{i:02d}"] = rng.random(days).round(6)
    df.to_csv(path, index=False)


def test_parse_e2e_with_bundled_mapping(spark, tmp_path):
    """parse_traces is callable out-of-the-box on real 2024 AEMO
    filenames using only the bundled vocabulary."""
    d = tmp_path / "aemo"
    d.mkdir()
    for stem in ("Avonlie_SAT", "Adelaide_Desal_FFP", "REZ_N0_NSW_Non-REZ_SAT"):
        _write_csv(d / f"{stem}_RefYear2022.csv", seed=abs(hash(stem)) % 2**31)
    cat = Catalog(spark, str(tmp_path / "wh"))
    parse_traces(spark, str(d), cat, "traces", mappings.name_mapping())
    out = cat.read("traces").toPandas()
    assert set(out["entity"]) == {"Avonlie", "Adelaide_Desal", "N0"}
    by = out.drop_duplicates("entity").set_index("entity")
    assert by.loc["Avonlie", "parent"] == "N6"
    assert by.loc["N0", "entity_type"] == "zone"
    assert by.loc["N0", "parent"] == "CNSW"
    assert len(out) == 3 * 2 * 48
