"""functions/web.py — URL parsing/canonicalization column expressions."""

from __future__ import annotations

import pandas as pd

from isp_trace_parser_spark.functions import web

CASES = [
    # url, scheme, host, path, query, domain, depth, normalized
    (
        "HTTPS://User:pw@WWW.Site.COM:443/A/b/C?x=1&y=2#frag",
        "https",
        "www.site.com",
        "/A/b/C",
        "x=1&y=2",
        "site.com",
        3,
        "https://www.site.com/A/b/C?x=1&y=2",
    ),
    (
        "http://example.org/",
        "http",
        "example.org",
        "/",
        "",
        "example.org",
        0,
        "http://example.org/",
    ),
    (
        "https://sub.deep.host.net:8080/one//two/",
        "https",
        "sub.deep.host.net",
        "/one//two/",
        "",
        "host.net",
        2,
        "https://sub.deep.host.net/one//two/",
    ),
    # no path at all
    (
        "https://bare.com#only-frag",
        "https",
        "bare.com",
        "",
        "",
        "bare.com",
        0,
        "https://bare.com",
    ),
    # query but no fragment; port without number
    (
        "FTP://files.example.com:/pub?dl=1",
        "ftp",
        "files.example.com",
        "/pub",
        "dl=1",
        "example.com",
        1,
        "ftp://files.example.com/pub?dl=1",
    ),
]


def test_url_parts(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"url": [c[0] for c in CASES]})
    )
    got = (
        web.with_url_parts(df)
        .toPandas()
        .set_index("url")
    )
    for url, scheme, host, path, query, domain, depth, norm in CASES:
        row = got.loc[url]
        assert row["url_scheme"] == scheme, url
        assert row["url_host"] == host, url
        assert row["url_path"] == path, url
        assert row["url_query"] == query, url
        assert row["url_domain"] == domain, url
        assert row["url_depth"] == depth, url
        assert row["url_normalized"] == norm, url


def test_no_python_udf_in_plan(spark):
    """URL parsing must stay JVM-side: no BatchEvalPython/ArrowEvalPython
    in the physical plan."""
    df = spark.createDataFrame(pd.DataFrame({"url": ["https://a.b/c"]}))
    plan = (
        web.with_url_parts(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_crawl_schedule_politeness_and_stickiness(spark):
    """Same-domain fetches go to ONE worker, are spaced exactly
    delay_seconds apart in doc_id order, and the plan is deterministic
    across repartitionings."""
    import datetime

    from isp_trace_parser_spark.functions.web import crawl_schedule

    rows = [(i, ["news.com", "blog.org"][i % 2]) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    start = datetime.datetime(2024, 2, 1)
    got = (
        crawl_schedule(df, "source", "doc_id", start, delay_seconds=5,
                       n_workers=4)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    for dom in ("news.com", "blog.org"):
        d = got[got["domain"] == dom].sort_values("fetch_seq")
        assert d["worker"].nunique() == 1  # sticky
        assert list(d["fetch_seq"]) == list(range(5))
        deltas = d["fetch_ts"].diff().dropna().dt.total_seconds()
        assert (deltas == 5.0).all()
        assert d["fetch_ts"].iloc[0] == start
    got2 = (
        crawl_schedule(df.repartition(7), "source", "doc_id", start,
                       delay_seconds=5, n_workers=4)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got.equals(got2)  # layout-invariant plan
