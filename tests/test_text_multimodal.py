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


def test_ppm_codec_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    assert (multimodal.decode_ppm(multimodal.encode_ppm(img)) == img).all()
    # header with comments + PGM depth-1 path
    pgm = b"P5\n# a comment\n3 2\n255\n" + bytes(range(6))
    out = multimodal.decode_ppm(pgm)
    assert out.shape == (2, 3) and out[1, 2] == 5
    with pytest.raises(ValueError, match="not a binary PPM"):
        multimodal.decode_ppm(b"JFIF....")


def test_ppm_truncated_header_fails_loud():
    """A corrupt payload cut mid-header must raise, not hang the
    executor scanning past the end of the buffer (ADVICE r2)."""
    for payload in (b"P6", b"P6\n10", b"P6\n10 20", b"P6\n# only a comment",
                    b"P6\n10 20\n255", b"P5 "):
        with pytest.raises(ValueError, match="truncated|not a binary"):
            multimodal.decode_ppm(payload)


def test_wav_codec_roundtrip():
    t = np.arange(4000) / 4000.0
    sig = 0.5 * np.sin(2 * np.pi * 220 * t)
    back, rate = multimodal.decode_wav_pcm16(multimodal.encode_wav_pcm16(sig))
    assert rate == 4000 and len(back) == 4000
    assert np.abs(back - sig).max() < 1e-3  # 16-bit quantization bound
    with pytest.raises(ValueError, match="RIFF"):
        multimodal.decode_wav_pcm16(b"nope")


def test_resize_nearest_real():
    img = np.arange(36, dtype=np.uint8).reshape(6, 6)
    small = multimodal.resize_nearest(img, 2, 3)
    assert small.shape == (2, 3)
    assert small[0, 0] == img[0, 0] and small[1, 2] == img[3, 4]


def test_image_audio_features_are_real():
    """Features must respond to actual content, not payload bytes:
    a bright image scores higher channel means than a dark one; a
    high-frequency tone puts energy in higher FFT bands than a low one."""
    bright = multimodal._image_feature(np.full((8, 8, 3), 250, dtype=np.uint8))
    dark = multimodal._image_feature(np.full((8, 8, 3), 5, dtype=np.uint8))
    assert (bright[:3] > dark[:3]).all()

    t = np.arange(8000) / 4000.0
    low = multimodal._audio_feature(np.sin(2 * np.pi * 55 * t))
    high = multimodal._audio_feature(np.sin(2 * np.pi * 1800 * t))
    assert high[1] > low[1]  # zero-crossing rate orders by frequency
    assert np.argmax(high[2:]) > np.argmax(low[2:])  # band energy shifts up


def test_synth_media_payloads_are_real(spark):
    """Image payloads are valid PPMs whose decoded dims equal the
    metadata columns; audio payloads are valid WAVs whose sample count
    matches duration_ms at the synth rate."""
    rows = multimodal.synth_media(spark, n=12).toPandas()
    for r in rows.itertuples():
        data = bytes(r.payload)
        if r.kind == "image":
            img = multimodal.decode_ppm(data)
            assert img.shape == (r.height, r.width, 3)
        elif r.kind == "audio":
            sig, rate = multimodal.decode_wav_pcm16(data)
            assert rate == multimodal.WAV_RATE
            assert len(sig) == rate * r.duration_ms // 1000
        else:
            assert data.startswith(b"FAKEMP4")


def test_resize_images_stage(spark):
    media = multimodal.synth_media(spark, n=12)
    out = multimodal.resize_images(media, 16, 16).toPandas()
    assert len(out) == len(media.where("kind = 'image'").toPandas())
    for r in out.itertuples():
        img = multimodal.decode_ppm(bytes(r.payload))
        assert img.shape == (16, 16, 3)


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
