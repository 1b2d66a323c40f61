"""Interval (range) join vs a naive theta-join oracle, plus plan shape."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from isp_trace_parser_spark.operators.interval import interval_join


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(5)
    n_ev, n_iv = 400, 60
    ev = pd.DataFrame(
        {
            "series": rng.integers(0, 6, n_ev),
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 72 * 3600, n_ev), unit="s"),
            "v": rng.random(n_ev).round(3),
        }
    )
    starts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        rng.integers(0, 72 * 3600, n_iv), unit="s"
    )
    iv = pd.DataFrame(
        {
            "series": rng.integers(0, 6, n_iv),
            "start": starts,
            # a mix of sub-bucket and multi-bucket spans + one empty
            "end": starts
            + pd.to_timedelta(rng.integers(-60, 3 * 3600, n_iv), unit="s"),
            "label": [f"iv{i}" for i in range(n_iv)],
        }
    )
    return spark.createDataFrame(ev), spark.createDataFrame(iv)


def _naive(spark, ev, iv):
    return (
        ev.alias("l")
        .join(iv.alias("r"), F.col("l.series") == F.col("r.series"))
        .where(
            (F.col("l.ts") >= F.col("r.start")) & (F.col("l.ts") < F.col("r.end"))
        )
        .select("l.series", "l.ts", "l.v", "r.start", "r.end", "r.label")
    )


def test_interval_join_matches_naive(spark, frames):
    ev, iv = frames
    got = (
        interval_join(ev, iv, bucket_seconds=1800)
        .toPandas()
        .sort_values(["series", "ts", "label"])
        .reset_index(drop=True)
    )
    want = (
        _naive(spark, ev, iv)
        .toPandas()
        .sort_values(["series", "ts", "label"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_interval_join_left_keeps_unmatched(spark, frames):
    ev, iv = frames
    inner = interval_join(ev, iv, bucket_seconds=1800)
    left = interval_join(ev, iv, bucket_seconds=1800, how="left")
    n_ev = ev.count()
    matched_left_rows = (
        inner.select("series", "ts").distinct().count()
    )
    # every original left row appears: matched rows (possibly multiple
    # intervals each) + unmatched rows with NULL interval columns
    assert left.where(F.col("label").isNull()).count() == n_ev - matched_left_rows
    assert left.count() == inner.count() + n_ev - matched_left_rows


def test_interval_join_is_equi_not_nested_loop(spark, frames):
    ev, iv = frames
    plan = interval_join(ev, iv)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_bucket_boundary_exact(spark):
    """Containment is half-open and survives cell-boundary alignment:
    an event exactly at `start` matches, exactly at `end` does not,
    even when both sit on bucket edges."""
    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "series": [1, 1, 1],
                "ts": pd.to_datetime(
                    ["2024-01-01 01:00:00", "2024-01-01 02:00:00",
                     "2024-01-01 01:30:00"]
                ),
                "v": [1.0, 2.0, 3.0],
            }
        )
    )
    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "series": [1],
                "start": pd.to_datetime(["2024-01-01 01:00:00"]),
                "end": pd.to_datetime(["2024-01-01 02:00:00"]),
                "label": ["w"],
            }
        )
    )
    got = interval_join(ev, iv, bucket_seconds=3600).toPandas()
    assert sorted(got["v"]) == [1.0, 3.0]
