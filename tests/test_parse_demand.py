"""Demand parse variant: composite filename decode, scenario rename,
per-file (no merge) semantics, hive layout scenario/reference_year —
mirrors reference demand_traces tests + README.md:92-101 layout."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from isp_trace_parser_spark.parse_demand import parse_demand_traces
from isp_trace_parser_spark.sources.catalog import Catalog


def _write_csv(path, seed, year=2011, days=3):
    rng = np.random.default_rng(seed)
    dates = pd.date_range(f"{year}-07-01", periods=days, freq="D")
    df = pd.DataFrame({"Year": dates.year, "Month": dates.month, "Day": dates.day})
    for i in range(1, 49):
        df[f"{i:02d}"] = rng.random(days).round(6)
    df.to_csv(path, index=False)
    return df


@pytest.fixture()
def demand_dir(tmp_path):
    d = tmp_path / "demand"
    d.mkdir()
    names = [
        "CNSW_RefYear_2011_HYDROGEN_EXPORT_POE10_OPSO_MODELLING.csv",
        "CNSW_RefYear_2012_STEP_CHANGE_POE50_PV_TOT.csv",
        "VIC_RefYear_2011_PROGRESSIVE_CHANGE_POE10_OPSO_MODELLING_PVLITE.csv",
    ]
    for i, n in enumerate(names):
        _write_csv(d / n, seed=i)
    return str(d)


def test_parse_demand(spark, tmp_path, demand_dir):
    cat = Catalog(spark, str(tmp_path / "wh"))
    parse_demand_traces(
        spark, demand_dir, cat, "demand", subregions=["CNSW", "VIC", "SQ"]
    )
    out = cat.read("demand").toPandas()
    assert len(out) == 3 * 3 * 48
    # scenario renamed to display form (J4, demand.yaml:14-18)
    assert set(out["scenario"]) == {
        "Green Energy Exports", "Step Change", "Progressive Change",
    }
    assert set(out["demand_type"]) == {
        "OPSO_MODELLING", "PV_TOT", "OPSO_MODELLING_PVLITE",
    }
    # hive layout scenario=<s>/reference_year=<y> (README.md:92-101)
    assert set(cat.list_partitions("demand", "scenario")) == {
        "Green Energy Exports", "Step Change", "Progressive Change",
    }


def test_parse_demand_bad_filename(spark, tmp_path):
    d = tmp_path / "d2"
    d.mkdir()
    _write_csv(d / "CNSW_RefYear_2011_NOT_A_SCENARIO_POE10_OPSO_MODELLING.csv", 0)
    cat = Catalog(spark, str(tmp_path / "wh2"))
    with pytest.raises(ValueError, match="Unexpected trace filename"):
        parse_demand_traces(spark, str(d), cat, "demand", subregions=["CNSW"])


def test_parse_demand_filters(spark, tmp_path, demand_dir):
    cat = Catalog(spark, str(tmp_path / "wh3"))
    parse_demand_traces(
        spark, demand_dir, cat, "demand", subregions=["CNSW", "VIC"],
        filters={"poe": "POE10", "subregion": ["CNSW"]},
    )
    out = cat.read("demand").toPandas()
    assert set(out["subregion"]) == {"CNSW"}
    assert set(out["poe"]) == {"POE10"}


def test_parse_demand_no_driver_collect(spark, tmp_path, demand_dir, monkeypatch):
    """Filename validation and touched-partition derivation both come
    from the scan's file listing: the whole demand parse job must run
    without a single driver-side collect (VERDICT r2 #8) — the only
    Spark action is the sink write itself."""
    from pyspark.sql import DataFrame

    cat = Catalog(spark, str(tmp_path / "wh"))
    monkeypatch.setattr(
        DataFrame, "collect",
        lambda self: (_ for _ in ()).throw(AssertionError("driver collect")),
    )
    snap = parse_demand_traces(
        spark, demand_dir, cat, "demand", subregions=["CNSW", "VIC", "SQ"]
    )
    assert snap["operation"] == "write:dynamic"
    assert set(snap["partitions"]) == {
        "scenario=Green Energy Exports/reference_year=2011",
        "scenario=Step Change/reference_year=2012",
        "scenario=Progressive Change/reference_year=2011",
    }
