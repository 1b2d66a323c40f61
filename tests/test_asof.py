"""As-of join vs a pandas merge_asof oracle (+ DuckDB ASOF JOIN parity
lives in the contract query)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from isp_trace_parser_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "series": np.repeat(["a", "b"], 50),
            "ts": np.concatenate(
                [
                    pd.date_range("2024-01-01", periods=50, freq="37min").to_numpy(),
                    pd.date_range("2024-01-01", periods=50, freq="53min").to_numpy(),
                ]
            ),
            "lv": rng.random(100),
        }
    )
    right = pd.DataFrame(
        {
            "series": np.repeat(["a", "b"], 20),
            "ts": np.concatenate(
                [
                    pd.date_range("2024-01-01 00:15", periods=20, freq="97min").to_numpy(),
                    pd.date_range("2024-01-01 00:04", periods=20, freq="111min").to_numpy(),
                ]
            ),
            "price": rng.random(20 * 2) * 100,
        }
    )
    return left, right


def _oracle(left, right, tolerance=None):
    kw = {"by": "series", "on": "ts", "direction": "backward"}
    if tolerance is not None:
        kw["tolerance"] = pd.Timedelta(seconds=tolerance)
    return pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable").rename(columns={"price": "price_right"}),
        **kw,
    )


def test_asof_matches_pandas(spark, frames):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            right_values=["price"],
        )
        .toPandas()
        .sort_values(["series", "ts"])
        .reset_index(drop=True)
    )
    want = (
        _oracle(left, right)
        .sort_values(["series", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(left)
    nan = got["price_right"].isna() & want["price_right"].isna()
    assert (nan | (got["price_right"] == want["price_right"])).all()


def test_asof_exact_timestamp_inclusive(spark):
    left = pd.DataFrame(
        {"series": ["a"], "ts": [pd.Timestamp("2024-01-01 10:00")], "lv": [1.0]}
    )
    right = pd.DataFrame(
        {"series": ["a"], "ts": [pd.Timestamp("2024-01-01 10:00")], "price": [5.0]}
    )
    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        right_values=["price"],
    ).toPandas()
    assert got.iloc[0]["price_right"] == 5.0  # <= semantics


def test_asof_tolerance(spark, frames):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            right_values=["price"],
            tolerance_seconds=1800,
        )
        .toPandas()
        .sort_values(["series", "ts"])
        .reset_index(drop=True)
    )
    want = (
        _oracle(left, right, tolerance=1800)
        .sort_values(["series", "ts"])
        .reset_index(drop=True)
    )
    nan = got["price_right"].isna() & want["price_right"].isna()
    assert (nan | (got["price_right"] == want["price_right"])).all()
    assert got["price_right"].isna().sum() > 0  # tolerance actually bites


def _oracle_dir(left, right, direction, tolerance=None):
    kw = {"by": "series", "on": "ts", "direction": direction}
    if tolerance is not None:
        kw["tolerance"] = pd.Timedelta(seconds=tolerance)
    return pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable").rename(
            columns={"price": "price_right"}
        ),
        **kw,
    )


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_directions_match_pandas(spark, frames, direction):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            right_values=["price"],
            direction=direction,
        )
        .toPandas()
        .sort_values(["series", "ts"])
        .reset_index(drop=True)
    )
    want = (
        _oracle_dir(left, right, direction)
        .sort_values(["series", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(left)
    nan = got["price_right"].isna() & want["price_right"].isna()
    assert (nan | (got["price_right"] == want["price_right"])).all(), direction


def test_asof_forward_tolerance(spark, frames):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            right_values=["price"],
            direction="forward",
            tolerance_seconds=1800,
        )
        .toPandas()
        .sort_values(["series", "ts"])
        .reset_index(drop=True)
    )
    want = (
        _oracle_dir(left, right, "forward", tolerance=1800)
        .sort_values(["series", "ts"])
        .reset_index(drop=True)
    )
    nan = got["price_right"].isna() & want["price_right"].isna()
    assert (nan | (got["price_right"] == want["price_right"])).all()


def test_asof_bad_direction(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            direction="sideways",
        )


def test_asof_nearest_keys_only_left(spark, frames):
    _, right = frames
    left = pd.DataFrame(
        {"series": ["a", "a"], "ts": pd.to_datetime(["2024-01-01 01:00"] * 2)}
    )
    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        right_values=["price"], direction="nearest",
    ).toPandas()
    assert len(got) == 2  # duplicate key+ts rows preserved 1:1
    assert got["price_right"].notna().all()


def test_asof_nearest_preserves_null_key_rows(spark, frames):
    """Rows with a NULL key or NULL timestamp must survive nearest with
    NULL match columns, same multiplicity as backward/forward (ADVICE r2)."""
    _, right = frames
    left = pd.DataFrame(
        {
            "series": ["a", None, "a", None],
            "ts": pd.to_datetime(
                ["2024-01-01 01:00", "2024-01-01 02:00", None, None]
            ),
            "lv": [1.0, 2.0, 3.0, 4.0],
        }
    )
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    for direction in ("backward", "forward", "nearest"):
        got = asof_join(
            sl, sr, right_values=["price"], direction=direction
        ).toPandas()
        assert len(got) == 4, direction
        null_rows = got[got["series"].isna() | got["ts"].isna()]
        assert len(null_rows) == 3, direction
        assert null_rows["price_right"].isna().all(), direction
