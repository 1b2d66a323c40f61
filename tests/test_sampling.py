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


def test_pack_sequences_straddle_and_shards(spark):
    """Concat-then-split at seq_len=10 within each shard: offsets are
    running sums in doc order, a 12-token doc starting at offset 4
    straddles packs 0-1, and shards pack independently."""
    from isp_trace_parser_spark.functions.sampling import pack_sequences

    rows = [
        # shard 0: tokens 4, 12, 3  -> offsets 0, 4, 16
        (0, 0, 4), (1, 0, 12), (2, 0, 3),
        # shard 1: tokens 25 -> offset 0, spans packs 0..2
        (3, 1, 25),
    ]
    df = spark.createDataFrame(rows, "doc_id long, shard long, n long")
    got = {
        r["doc_id"]: (r["token_offset"], r["start_pack"], r["end_pack"],
                      r["offset_in_pack"])
        for r in pack_sequences(df, "doc_id", "n", 10, "shard",
                                ["doc_id"]).collect()
    }
    assert got[0] == (0, 0, 0, 0)
    assert got[1] == (4, 0, 1, 4)    # straddles the pack boundary
    assert got[2] == (16, 1, 1, 6)
    assert got[3] == (0, 0, 2, 0)    # one doc spanning three packs
    plan = (
        pack_sequences(df, "doc_id", "n", 10, "shard", ["doc_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1 and "EvalPython" not in plan, plan


def test_contamination_report_crafted_overlap(spark):
    """Doc 1 shares its full 2-gram set with the benchmark doc, doc 2
    shares one shingle, doc 3 shares none — fractions and benchmark-hit
    counts are exact; clean docs still appear with zeros."""
    import pandas as pd

    from isp_trace_parser_spark.operators.dedup import (
        contamination_report,
    )

    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "alpha beta gamma",          # shingles: 'alpha beta','beta gamma'
            "zz beta gamma yy",          # shares 'beta gamma' only
            "totally clean words here",
        ],
    }))
    bench = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100],
        "text": ["alpha beta gamma delta"],
    }))
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"],
                      r["n_bench_docs"], round(r["contamination_frac"], 4))
        for r in contamination_report(corpus, bench, n=2).collect()
    }
    assert got[1] == (2, 2, 1, 1.0)
    assert got[2] == (3, 1, 1, round(1 / 3, 4))
    assert got[3] == (3, 0, 0, 0.0)


def test_pack_read_plan_covers_every_token_exactly_once(spark):
    """Completeness invariant of the loader plan: within each shard,
    every pack's slices sum to exactly seq_len tokens (the final
    partial pack to the remainder), every doc's slices cover [0, n)
    without overlap, and the plan is shuffle-free."""
    import numpy as np

    from isp_trace_parser_spark.functions.sampling import (
        pack_read_plan,
        pack_sequences,
    )

    rows = [(i, i % 3, 1 + (i * 37) % 23) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, shard long, n long")
    L = 16
    manifest = pack_sequences(df, "doc_id", "n", L, "shard", ["doc_id"])
    plan = pack_read_plan(manifest, L)
    pdf = plan.toPandas()
    pdf["len"] = pdf["doc_to"] - pdf["doc_from"]
    # per (shard, pack): full packs carry exactly L tokens
    per_pack = pdf.groupby(["shard", "pack"])["len"].sum()
    totals = {s: sum(n for i, sh, n in rows if sh == s) for s in (0, 1, 2)}
    for (s, k), tot in per_pack.items():
        n_packs = -(-totals[s] // L)
        if k < n_packs - 1:
            assert tot == L, (s, k, tot)
        else:
            assert tot == totals[s] - (n_packs - 1) * L
    # per doc: slices tile [0, n) exactly
    for (_s, d), grp in pdf.groupby(["shard", "doc_id"]):
        g = grp.sort_values("pack")
        n = dict((i, n) for i, _sh, n in rows)[d]
        assert g.iloc[0]["doc_from"] == 0 and g.iloc[-1]["doc_to"] == n
        assert (g["doc_from"].to_numpy()[1:]
                == g["doc_to"].to_numpy()[:-1]).all()
    # shuffle-free beyond the manifest's own exchange(s): the read plan
    # adds NO exchange to the manifest plan (counted on the same
    # pre-execution plans so AQE stage rewrites don't skew the compare)
    n_manifest = (
        pack_sequences(df, "doc_id", "n", L, "shard", ["doc_id"])
        ._jdf.queryExecution().executedPlan().toString().count("Exchange")
    )
    n_plan = (
        pack_read_plan(
            pack_sequences(df, "doc_id", "n", L, "shard", ["doc_id"]), L
        )
        ._jdf.queryExecution().executedPlan().toString().count("Exchange")
    )
    assert n_plan == n_manifest, (n_plan, n_manifest)
