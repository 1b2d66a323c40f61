"""URL parsing / canonicalization for web-crawl corpora — pure Catalyst
column expressions (no UDFs, whole-stage-codegen eligible).

A Common-Crawl-style pipeline keyed on ``url`` needs the URL broken
into comparable parts before any grouping is meaningful: the same page
is crawled as ``HTTPS://WWW.Site.COM:443/a#frag`` and
``https://www.site.com/a``, and per-domain statistics (the hot-domain
skew that drives salting — plans/partitioning.py) group on the
registered domain, not the raw string. The reference has no URL
handling (its keys are trace filenames, stem decode in
sources/csv_trace.py); this module is new-engine scope per SURVEY §2.7.

Everything here is deliberately expressible in ANSI SQL (regexp +
string ops) so each operator carries a DuckDB oracle row — see
``domain_stats`` in __spark_entry__.py.

Scale: string/regex column ops run JVM-side inside codegen; the
per-domain aggregation is a standard two-phase hash agg. Hot domains
(Zipf head) are exactly the skew case the engine's salting helper
targets; ``domain_stats`` is the measurement side of that loop.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# RFC-3986-shaped split (public knowledge): scheme://authority/path?query#frag
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _c(url: Column | str) -> Column:
    return F.col(url) if isinstance(url, str) else url


def url_scheme(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(_c(url), _SCHEME_RE, 1))


def url_host(url: Column | str) -> Column:
    """Lowercased host: authority minus userinfo (``user:pw@``) and
    port (``:443``)."""
    auth = F.regexp_extract(_c(url), _AUTHORITY_RE, 1)
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.lower(F.regexp_replace(no_user, r":\d*$", ""))


def url_path(url: Column | str) -> Column:
    return F.regexp_extract(_c(url), _PATH_RE, 1)


def url_query(url: Column | str) -> Column:
    return F.regexp_extract(_c(url), _QUERY_RE, 1)


def registered_domain(url: Column | str) -> Column:
    """Last two host labels (``www.site.com`` -> ``site.com``). A
    heuristic, not the Public Suffix List — multi-label suffixes like
    ``.co.uk`` fold to ``co.uk``; documented trade-off (a PSL lookup
    would be a broadcast join against a suffix table, same plan shape)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def path_depth(url: Column | str) -> Column:
    """Number of non-empty path segments."""
    segs = F.split(url_path(url), "/")
    return F.size(F.filter(segs, lambda s: s != F.lit("")))


def normalize_url(url: Column | str) -> Column:
    """Crawl-dedup canonical form: lowercase scheme + bare lowercase
    host, path as-is, query kept (it addresses content), fragment
    dropped (client-side only). Port and userinfo are stripped with the
    host. Empty path stays empty (no trailing-slash invention)."""
    q = url_query(url)
    return F.concat(
        url_scheme(url),
        F.lit("://"),
        url_host(url),
        url_path(url),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach all parsed columns in one projection."""
    u = F.col(url_col)
    return df.withColumns(
        {
            "url_scheme": url_scheme(u),
            "url_host": url_host(u),
            "url_path": url_path(u),
            "url_query": url_query(u),
            "url_domain": registered_domain(u),
            "url_depth": path_depth(u),
            "url_normalized": normalize_url(u),
        }
    )


def crawl_schedule(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    start: "datetime.datetime",
    delay_seconds: int = 5,
    n_workers: int = 16,
) -> DataFrame:
    """Politeness-aware fetch plan: when and where each URL gets
    crawled, honoring a per-domain minimum delay.

    Every crawl pipeline needs this step between frontier and fetcher:
    (a) all of a domain's fetches go to ONE worker (sticky assignment —
    per-domain rate limiting needs a single enforcement point, and
    connection reuse wants locality), (b) fetches within a domain are
    spaced ``delay_seconds`` apart starting at ``start``.

    Plan shape: one row_number window partitioned by domain (single
    exchange on the domain key — the same key the assignment hashes,
    so a domain's plan is computed where it will run) and pure column
    arithmetic. The worker id uses an md5-derived hash (first 15 hex
    digits), not xxhash64, so the assignment is engine-portable and
    oracle-checkable. Deterministic: same frontier -> same plan.
    """
    dom = F.col(domain_col)
    w = Window.partitionBy(domain_col).orderBy(id_col)
    seq = F.row_number().over(w) - F.lit(1)
    worker = F.pmod(
        F.conv(F.substring(F.md5(dom.cast("string")), 1, 15), 16, 10).cast(
            "long"
        ),
        F.lit(n_workers),
    )
    # naive-datetime-as-UTC micros (NOT .timestamp(), which reads the
    # driver's local tz — the engine-wide NTZ convention)
    start_us = (
        start - datetime.datetime(1970, 1, 1)
    ) // datetime.timedelta(microseconds=1)
    fetch_us = (
        F.lit(start_us)
        + seq.cast("long") * F.lit(delay_seconds * 1_000_000)
    )
    return df.select(
        F.col(id_col),
        dom.alias("domain"),
        worker.cast("int").alias("worker"),
        seq.alias("fetch_seq"),
        F.timestamp_micros(fetch_us).cast("timestamp_ntz").alias("fetch_ts"),
    )
