"""Deterministic synthetic "Common-Crawl-style pages" table.

Produces the ``input_hint`` base table::

    pages(url: string, warc_ts: timestamp_ntz, html: binary,
          text: string, lang: string, value: double)

plus a derived numeric trace ``value`` that is a pure, closed-form
function of ``(url, warc_ts)`` so a tiny pandas oracle can recompute every
rolled-up point (mirrors the reference's synthetic e2e generator,
reference: tests/create_end_to_end_test_data.py:9-87 — but seeded and
deterministic, theirs is unseeded ``np.random.rand``).

Scale-first: generation is ``spark.range`` + pure column expressions
(whole-stage codegen, zero Python). The same closed form is implemented in
numpy (:func:`pages_pandas`) for oracle computation at test scale. No
transcendental functions are used (triangle wave, not sin) so the JVM and
numpy values agree bit-for-bit.

Knobs:
- ``skew``: Zipf-ish exponent concentrating snapshots on a few hot
  domains (exercises salting / AQE skew handling).
- ``gap_pct``: percent of (url, slot) snapshots dropped (exercises
  gap-fill).

Timestamps are half-hour aligned, END-of-period labeled — same
convention as the reference trace format (reference:
src/isp_trace_parser/trace_formatter.py:12-15,68-72).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "de", "fr", "es", "zh", "pt", "ru", "ja"]

# Epoch of the first half-hour period END: 2024-01-01 00:30:00 UTC.
T0_EPOCH = 1704067200 + 1800
HALF_HOUR = 1800


def _domain_expr(url_id, n_domains: int, skew: float):
    """Map url_id -> domain rank with a power-law (Zipf-ish) skew.

    u = fractional hash of url_id in [0, 1); rank = floor(n_domains * u^s).
    s > 1 concentrates mass on low ranks (hot domains).
    """
    u = ((url_id * 2654435761) % 100000) / 100000.0
    return F.floor(F.pow(u, F.lit(skew)) * n_domains).cast("int")


def pages(
    spark: SparkSession,
    n_urls: int = 100,
    n_slots: int = 48 * 14,
    skew: float = 2.0,
    gap_pct: int = 0,
    n_domains: int = 20,
    partitions: int | None = None,
) -> DataFrame:
    """Build the pages DataFrame: ``n_urls`` series x ``n_slots``
    half-hour snapshots, minus gaps.

    Pure column expressions over ``spark.range`` — scales linearly with
    executors; no data ever touches the driver.
    """
    n_rows = n_urls * n_slots
    df = spark.range(0, n_rows, 1, numPartitions=partitions or max(8, n_urls // 64))
    url_id = (F.col("id") / n_slots).cast("long")
    slot = (F.col("id") % n_slots).cast("long")

    dom = _domain_expr(url_id, n_domains, skew)
    url = F.concat(
        F.lit("https://site"), dom.cast("string"), F.lit(".example.com/page/"),
        url_id.cast("string"),
    )
    # Engine standard: TIMESTAMP_NTZ == the reference's naive
    # Datetime[us] (trace_formatter.py:90); UTC session makes the cast
    # wall-clock identity.
    ts = F.timestamp_seconds(F.lit(T0_EPOCH) + slot * HALF_HOUR).cast("timestamp_ntz")

    # Deterministic per-url trace parameters from crc32(url) — identical
    # in JVM (F.crc32) and Python (zlib.crc32).
    h = F.crc32(url.cast("binary"))
    amp = (h % 1000).cast("double") / 100.0 + 1.0
    base = ((h / 1000).cast("long") % 1000).cast("double") / 10.0
    phase = ((h / 1000000).cast("long") % 48).cast("double") / 48.0

    # Triangle wave with daily period (48 half-hour slots), exact in f64.
    x = slot.cast("double") / 48.0 + phase
    frac = x - F.floor(x)
    tri = F.abs(frac * 2.0 - 1.0)
    value = amp * tri + base

    lang = F.element_at(
        F.array(*[F.lit(lang_) for lang_ in LANGS]), (url_id % len(LANGS) + 1).cast("int")
    )

    title = F.concat(F.lit("Snapshot of page "), url_id.cast("string"),
                     F.lit(" domain "), dom.cast("string"))
    # Embed the value as floor(value * 1e6) — floor on identical doubles is
    # bit-stable across JVM and numpy (unlike decimal formatting).
    value_micro = F.floor(value * 1000000.0).cast("long")
    para1 = F.concat(F.lit("Observed value "),
                     value_micro.cast("string"), F.lit(" at slot "), slot.cast("string"), F.lit("."))
    para2 = F.concat(F.lit("Language "), lang, F.lit("; series "), url_id.cast("string"),
                     F.lit(" of the crawl archive."))
    text = F.concat_ws("\n\n", title, para1, para2)
    html = F.concat(
        F.lit("<html><head><title>"), title, F.lit("</title></head><body><h1>"),
        title, F.lit("</h1><p>"), para1, F.lit("</p><p>"), para2,
        F.lit("</p></body></html>"),
    ).cast("binary")

    out = df.select(
        url.alias("url"),
        ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        value.alias("value"),
    )
    if gap_pct > 0:
        # Deterministic pseudo-random drop keyed on (url_id, slot).
        g = (url_id * 1000003 + slot * 7919) % 100
        out = out.where(g >= gap_pct)
    return out


def pages_pandas(
    n_urls: int = 100,
    n_slots: int = 48 * 14,
    skew: float = 2.0,
    gap_pct: int = 0,
    n_domains: int = 20,
) -> pd.DataFrame:
    """numpy mirror of :func:`pages` — the oracle generator.

    Must stay bit-identical with the Spark version (tested in
    tests/test_synth.py).
    """
    idx = np.arange(n_urls * n_slots, dtype=np.int64)
    url_id = idx // n_slots
    slot = idx % n_slots

    u = ((url_id * 2654435761) % 100000) / 100000.0
    dom = np.floor(np.power(u, skew) * n_domains).astype(np.int64)
    urls = np.array(
        [f"https://site{d}.example.com/page/{i}" for d, i in zip(dom, url_id)]
    )
    ts = pd.to_datetime((T0_EPOCH + slot * HALF_HOUR) * 10**9)

    h = np.array([zlib.crc32(s.encode()) for s in urls], dtype=np.int64)
    amp = (h % 1000).astype(np.float64) / 100.0 + 1.0
    base = ((h // 1000) % 1000).astype(np.float64) / 10.0
    phase = ((h // 1000000) % 48).astype(np.float64) / 48.0

    x = slot.astype(np.float64) / 48.0 + phase
    frac = x - np.floor(x)
    tri = np.abs(frac * 2.0 - 1.0)
    value = amp * tri + base

    langs = np.array(LANGS)[url_id % len(LANGS)]
    title = np.array([f"Snapshot of page {i} domain {d}" for i, d in zip(url_id, dom)])
    value_micro = np.floor(value * 1000000.0).astype(np.int64)
    para1 = np.array(
        [f"Observed value {v} at slot {s}." for v, s in zip(value_micro, slot)]
    )
    para2 = np.array(
        [f"Language {lg}; series {i} of the crawl archive." for lg, i in zip(langs, url_id)]
    )
    text = np.array([f"{t}\n\n{p1}\n\n{p2}" for t, p1, p2 in zip(title, para1, para2)])
    html = np.array(
        [
            f"<html><head><title>{t}</title></head><body><h1>{t}</h1><p>{p1}</p><p>{p2}</p></body></html>".encode()
            for t, p1, p2 in zip(title, para1, para2)
        ],
        dtype=object,
    )
    df = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": html,
            "text": text,
            "lang": langs,
            "value": value,
        }
    )
    if gap_pct > 0:
        g = (url_id * 1000003 + slot * 7919) % 100
        df = df[g >= gap_pct].reset_index(drop=True)
    return df
