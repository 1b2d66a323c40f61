"""functions/sampling.py — deterministic hash sampling properties."""

from __future__ import annotations

import pandas as pd

from isp_trace_parser_spark.functions import sampling


def _docs(spark, n=2000):
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "lang": [["en", "en", "en", "de", "fr"][i % 5] for i in range(n)],
        }
    )
    return spark.createDataFrame(pdf)


def test_hash_sample_is_deterministic_and_rate_accurate(spark):
    df = _docs(spark)
    a = sorted(r["doc_id"] for r in sampling.hash_sample(df, 0.3, ["doc_id"]).collect())
    b = sorted(r["doc_id"] for r in sampling.hash_sample(df, 0.3, ["doc_id"]).collect())
    assert a == b  # same input, same sample — no RNG
    assert 0.25 <= len(a) / 2000 <= 0.35  # within ~binomial noise


def test_hash_sample_repartition_invariant(spark):
    df = _docs(spark)
    a = sorted(r["doc_id"] for r in sampling.hash_sample(df, 0.2, ["doc_id"]).collect())
    c = sorted(
        r["doc_id"]
        for r in sampling.hash_sample(df.repartition(17), 0.2, ["doc_id"]).collect()
    )
    assert a == c  # unlike df.sample(), layout doesn't change the kept set


def test_hash_sample_monotone_growth(spark):
    df = _docs(spark)
    small = set(r["doc_id"] for r in sampling.hash_sample(df, 0.1, ["doc_id"]).collect())
    big = set(r["doc_id"] for r in sampling.hash_sample(df, 0.4, ["doc_id"]).collect())
    assert small <= big  # growing the rate never drops kept rows


def test_stratified_rates_respected(spark):
    df = _docs(spark)
    out = sampling.stratified_sample(
        df, "lang", {"en": 0.25, "de": 1.0}, ["doc_id"], default_rate=0.0
    ).toPandas()
    by_lang = out.groupby("lang").size().to_dict()
    assert by_lang.get("fr", 0) == 0  # default 0 drops unlisted strata
    assert by_lang["de"] == 400  # rate 1.0 keeps every de row
    assert 0.18 <= by_lang["en"] / 1200 <= 0.32


def test_seed_changes_sample(spark):
    df = _docs(spark)
    a = set(r["doc_id"] for r in sampling.hash_sample(df, 0.3, ["doc_id"], seed=1).collect())
    b = set(r["doc_id"] for r in sampling.hash_sample(df, 0.3, ["doc_id"], seed=2).collect())
    assert a != b


def test_plan_is_pure_filter(spark):
    """The sampler must compile to a plain Filter over the scan — no
    UDF, no exchange (pushdown/pruning stay live)."""
    df = _docs(spark)
    plan = (
        sampling.stratified_sample(df, "lang", {"en": 0.5}, ["doc_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_export_shards_stable_addresses(spark):
    from isp_trace_parser_spark.functions import sampling

    df = _docs(spark, 500)
    a = (
        sampling.export_shards(df, 8, ["doc_id"], ["doc_id"])
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        sampling.export_shards(df.repartition(13), 8, ["doc_id"], ["doc_id"])
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # same addresses regardless of input layout
    assert a[["doc_id", "shard", "shard_pos"]].equals(
        b[["doc_id", "shard", "shard_pos"]]
    )
    # all 8 shards populated; positions are dense 0..n-1 per shard
    g = a.groupby("shard")["shard_pos"]
    assert set(a["shard"]) == set(range(8))
    for _, pos in g:
        assert sorted(pos) == list(range(len(pos)))
