"""Legacy v1 migration reader against the reference's real
example_parsed_data tree."""

from __future__ import annotations

import os

import pytest

from isp_trace_parser_spark.sources.legacy_v1 import read_legacy_v1

V1_DIR = "/root/reference/example_parsed_data/solar"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(V1_DIR), reason="reference example data unavailable"
)


def test_read_legacy_tree(spark):
    df = read_legacy_v1(spark, V1_DIR)
    assert df.columns == [
        "datetime", "value", "entity", "entity_type", "resource_type",
        "reference_year",
    ]
    first = df.orderBy("entity", "datetime").first()
    assert first["entity_type"] in ("project", "zone")
    assert first["reference_year"] in (2011, 2012)
    # chunks are whole half-years of half-hours: 181/182/184 days
    # (Jan-Jun non-leap/leap, Jul-Dec) -> every file's row count is one
    # of 8688/8736/8832 and rows are unique per
    # (entity, resource_type, refyear, ts)
    n = df.count()
    assert n > 0
    assert (
        df.select("entity", "resource_type", "reference_year", "datetime")
        .distinct()
        .count()
        == n
    )
    # entity names decoded from the path with underscores restored
    ents = {r["entity"] for r in df.select("entity").distinct().collect()}
    assert any("Adelaide Desalination Plant Solar Farm" == e for e in ents)


def test_area_rows_decode_zone_and_technology(spark):
    """Area files nest Area/<zone>/<tech>/ — the zone must be the
    entity and the leaf technology dir must land in resource_type
    (not be mistaken for the entity)."""
    df = read_legacy_v1(spark, V1_DIR)
    zones = (
        df.filter(df.entity_type == "zone")
        .select("entity", "resource_type")
        .distinct()
        .collect()
    )
    assert len(zones) > 0
    assert {r["entity"] for r in zones} == {"Q1"}
    assert {r["resource_type"] for r in zones} == {"SAT"}
    # project rows carry no resource_type
    projs = df.filter(df.entity_type == "project")
    assert projs.filter(projs.resource_type.isNotNull()).count() == 0


def test_missing_dir_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="does not exist"):
        read_legacy_v1(spark, str(tmp_path / "nope"))
