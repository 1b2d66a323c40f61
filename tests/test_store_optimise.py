"""TraceStore query surface + storage re-layout over a parsed dataset —
mirrors the reference's get_data golden tests (tests/test_get_data.py)
and partitioned-layout golden (tests/test_optimise_parquet.py:12-37)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from isp_trace_parser_spark.api import TraceStore
from isp_trace_parser_spark.operators.optimise import partition_traces_by_columns


@pytest.fixture(scope="module")
def parsed_dir(spark, tmp_path_factory):
    """A parsed-trace parquet directory: 2 entities x 2 refyears spanning
    FY2022, flat files (pre-optimise layout)."""
    base = tmp_path_factory.mktemp("parsed")
    rows = []
    for ry in (2011, 2012):
        for ent in ("alpha", "beta"):
            ts = pd.date_range("2021-07-01 00:30:00", periods=48 * 400, freq="30min")
            rows.append(
                pd.DataFrame(
                    {
                        "datetime": ts,
                        "value": np.arange(len(ts), dtype=float) + ry,
                        "entity": ent,
                        "reference_year": np.int32(ry),
                        "resource_type": "solar",
                    }
                )
            )
    pdf = pd.concat(rows, ignore_index=True)
    spark.createDataFrame(pdf).repartition(4).write.parquet(str(base / "flat"))
    return str(base / "flat"), pdf


def test_trace_store_fy_query(spark, parsed_dir):
    path, pdf = parsed_dir
    store = TraceStore(spark, path)
    got = store.single_reference_year(
        start_year=2022, end_year=2022, reference_year=2011,
        filters={"entity": "alpha"},
    )
    # reference projection policy: scalar filter -> (datetime, value)
    assert list(got.columns) == ["datetime", "value"]
    m = (
        (pdf["reference_year"] == 2011)
        & (pdf["entity"] == "alpha")
        & (pdf["datetime"] > "2021-07-01")
        & (pdf["datetime"] <= "2022-07-01")
    )
    want = pdf[m].sort_values("datetime")
    assert len(got) == len(want) == 365 * 48
    assert (got["value"].to_numpy() == want["value"].to_numpy()).all()


def test_trace_store_multi_refyear(spark, parsed_dir):
    path, pdf = parsed_dir
    store = TraceStore(spark, path)
    got = store.multiple_reference_years(
        reference_year_mapping={2022: 2011},
        filters={"entity": ["alpha", "beta"]},
    )
    assert list(got.columns) == ["datetime", "value", "entity"]
    assert len(got) == 2 * 365 * 48


def test_partition_relayout(spark, parsed_dir, tmp_path):
    path, pdf = parsed_dir
    out = str(tmp_path / "by_ry")
    partition_traces_by_columns(
        spark, path, out, partition_cols=["reference_year"], sort_by=["datetime"]
    )
    assert {"reference_year=2011", "reference_year=2012"} <= set(os.listdir(out))
    back = spark.read.option("basePath", out).parquet(out)
    assert back.count() == len(pdf)
    # rows sorted by datetime within each partition file (reference
    # optimise_parquet.py:85-86 semantics)
    one = [
        f for f in os.listdir(os.path.join(out, "reference_year=2011"))
        if f.endswith(".parquet")
    ][0]
    part = pd.read_parquet(os.path.join(out, "reference_year=2011", one))
    assert part["datetime"].is_monotonic_increasing

    # partition pruning: a reference_year filter prunes to one partition
    q = back.where("reference_year = 2011")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "reference_year=2011" in plan or "PartitionFilters" in plan
    assert q.count() == len(pdf) // 2


def test_partition_relayout_bad_column(spark, parsed_dir, tmp_path):
    path, _ = parsed_dir
    with pytest.raises(ValueError, match="partition columns"):
        partition_traces_by_columns(spark, path, str(tmp_path / "x"), ["nope"])
