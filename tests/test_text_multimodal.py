"""Text-stats columns vs python oracles; multimodal plumbing shapes."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

from isp_trace_parser_spark.functions import multimodal, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_token_counts_vs_oracle(spark, docs):
    got = text.with_text_stats(docs).toPandas().sort_values("doc_id")
    for _, row in got.head(50).iterrows():
        t = row["text"]
        assert row["n_tokens_ws"] == (len(t.split()) if t.strip() else 0)
        assert row["n_tokens_bpe"] == len(re.findall(text.BPE_ISH, t))
        assert row["n_chars_computed"] == len(t)
    # n_chars column in testdata should agree with computed length
    assert (got["n_chars_computed"] == got["n_chars"]).all()


def test_quality_and_ratios_bounds(spark, docs):
    got = text.with_text_stats(docs).toPandas()
    for c in ("punct_ratio", "stopword_ratio"):
        assert got[c].between(0, 1).all()
    assert got["quality"].between(0, 1).all()
    # deterministic: same input -> same fingerprint
    got2 = text.with_text_stats(docs).toPandas()
    assert got.sort_values("doc_id")["fingerprint"].tolist() == got2.sort_values(
        "doc_id"
    )["fingerprint"].tolist()


def test_fingerprint_order_sensitive(spark):
    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["alpha beta gamma", "gamma beta alpha"]}
    )
    got = text.with_text_stats(spark.createDataFrame(pdf)).toPandas()
    assert got.iloc[0]["fingerprint"] != got.iloc[1]["fingerprint"]


def test_media_features_shape(spark):
    media = multimodal.synth_media(spark, n=30)
    feats = multimodal.extract_features(media).toPandas()
    assert len(feats) == 30
    assert all(len(f) == 8 for f in feats["feature"])
    # deterministic decode
    feats2 = multimodal.extract_features(media).toPandas()
    a = np.stack(feats.sort_values("media_id")["feature"].to_numpy())
    b = np.stack(feats2.sort_values("media_id")["feature"].to_numpy())
    assert (a == b).all()


def test_frame_sample_plan(spark):
    media = multimodal.synth_media(spark, n=30)
    plan = multimodal.frame_sample_plan(media, every_ms=1000).toPandas()
    vids = media.where("kind = 'video'").toPandas()
    expect = int(np.ceil(vids["duration_ms"] / 1000).sum())
    assert len(plan) == expect
    # all planned frames inside their video's duration
    j = plan.merge(vids[["media_id", "duration_ms"]], on="media_id")
    assert (j["frame_ts_ms"] < j["duration_ms"]).all()
