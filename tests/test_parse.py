"""End-to-end parse pipeline over synthetic AEMO-style CSV fixtures —
the analog of the reference's golden parse tests
(tests/test_trace_parsers.py:13-76) with seeded synthetic fixtures
(theirs are unseeded, create_end_to_end_test_data.py:21)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from isp_trace_parser_spark.parse import parse_traces
from isp_trace_parser_spark.sources.catalog import Catalog
from isp_trace_parser_spark.sources.csv_trace import read_wide_trace_csvs

MAPPING = {
    "REZ_N1_Solar": {"entity": "N1", "entity_type": "zone", "resource_type": "solar", "parent": "NSW"},
    "SNOWSTH1": {"entity": "Snowtown S2", "entity_type": "project", "resource_type": "wind", "parent": "S5"},
    "SNOWNTH1": {"entity": "Snowtown S2", "entity_type": "project", "resource_type": "wind", "parent": "S5"},
}


def _write_csv(path, seed, year=2022, days=4):
    rng = np.random.default_rng(seed)
    dates = pd.date_range(f"{year}-01-01", periods=days, freq="D")
    df = pd.DataFrame({"Year": dates.year, "Month": dates.month, "Day": dates.day})
    for i in range(1, 49):
        df[f"{i:02d}"] = rng.random(days).round(6)
    df.to_csv(path, index=False)
    return df


@pytest.fixture()
def csv_dir(tmp_path):
    d = tmp_path / "csvs" / "sub"
    d.mkdir(parents=True)
    frames = {}
    for stem in MAPPING:
        frames[stem] = _write_csv(d / f"{stem}_RefYear2022.csv", seed=hash(stem) % 2**31)
    return str(tmp_path / "csvs"), frames


def test_parse_end_to_end(spark, tmp_path, csv_dir):
    directory, frames = csv_dir
    cat = Catalog(spark, str(tmp_path / "wh"))
    parse_traces(spark, directory, cat, "traces", MAPPING)
    out = cat.read("traces").toPandas()

    # one merged entity (Snowtown from 2 files, mean) + one zone
    assert set(out["entity"]) == {"N1", "Snowtown S2"}
    assert out[out["entity"] == "N1"].shape[0] == 4 * 48
    snow = out[out["entity"] == "Snowtown S2"].sort_values("datetime")
    assert len(snow) == 4 * 48

    # A1 parity: Snowtown == mean of its two source files, point by point
    def long_values(stem):
        df = frames[stem]
        vals = df[[f"{i:02d}" for i in range(1, 49)]].to_numpy().ravel()
        return vals

    expect = (long_values("SNOWSTH1") + long_values("SNOWNTH1")) / 2
    got = snow["value"].to_numpy()
    np.testing.assert_allclose(np.sort(got), np.sort(expect), rtol=1e-12)

    # metadata are columns, reference_year is a partition
    assert (out["reference_year"] == 2022).all()
    assert cat.list_partitions("traces", "reference_year") == ["2022"]


def test_parse_unknown_stem_fails_loud(spark, tmp_path):
    d = tmp_path / "c2"
    d.mkdir()
    _write_csv(d / "MYSTERY_RefYear2022.csv", seed=1)
    cat = Catalog(spark, str(tmp_path / "wh2"))
    with pytest.raises(ValueError, match="Unexpected trace filename"):
        parse_traces(spark, str(d), cat, "t", MAPPING)


def test_unknown_stem_validation_runs_zero_jobs(spark, tmp_path):
    """Stem validation must come from the file LISTING, not a data scan:
    a failing parse_traces call should raise before any Spark job runs
    (the old implementation collected over the full CSV scan, doubling
    ingest I/O on the success path)."""
    d = tmp_path / "c3"
    d.mkdir()
    _write_csv(d / "MYSTERY_RefYear2022.csv", seed=1)
    cat = Catalog(spark, str(tmp_path / "wh4"))
    sc = spark.sparkContext
    sc.setJobGroup("stem-validate", "unknown-stem validation", False)
    try:
        with pytest.raises(ValueError, match="Unexpected trace filename"):
            parse_traces(spark, str(d), cat, "t", MAPPING)
        jobs = sc.statusTracker().getJobIdsForGroup("stem-validate")
        assert list(jobs) == [], "validation triggered a Spark job"
    finally:
        sc.setJobGroup("", "", False)


def test_parse_metadata_prefilter(spark, tmp_path, csv_dir):
    directory, _ = csv_dir
    cat = Catalog(spark, str(tmp_path / "wh3"))
    parse_traces(
        spark, directory, cat, "traces", MAPPING,
        filters={"resource_type": "wind"},
    )
    out = cat.read("traces").toPandas()
    assert set(out["entity"]) == {"Snowtown S2"}


def test_missing_directory_fails(spark, tmp_path):
    with pytest.raises(ValueError, match="does not exist"):
        read_wide_trace_csvs(spark, str(tmp_path / "nope"))
