"""Driver-contract conformance: run every queries() entry and compare
against oracle_sql() via DuckDB (row count + schema + order-insensitive
values), exactly like the driver's correctness gate."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        # rows-only check (driver's weak mode)
        assert len(got) >= 0
        return
    want = con.execute(ORACLES[name]).df()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"

    cols = sorted(got.columns)
    g = got[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    w = want[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    for c in cols:
        gv, wv = g[c], w[c]
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(wv.dtype, np.floating):
            gn = gv.astype(float).to_numpy()
            wn = wv.astype(float).to_numpy()
            both_nan = np.isnan(gn) & np.isnan(wn)
            assert (both_nan | (gn == wn)).all(), f"{name}.{c}: value mismatch"
        elif np.issubdtype(gv.dtype, np.datetime64) or np.issubdtype(
            wv.dtype, np.datetime64
        ):
            ga = pd.to_datetime(gv).to_numpy()
            wa = pd.to_datetime(wv).to_numpy()
            both_nat = pd.isna(ga) & pd.isna(wa)
            assert (both_nat | (ga == wa)).all(), f"{name}.{c}: ts mismatch"
        else:
            assert gv.astype(str).tolist() == wv.astype(str).tolist(), (
                f"{name}.{c}: value mismatch"
            )
