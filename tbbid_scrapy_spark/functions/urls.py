"""URL canonicalization + 64-bit hashing (the frontier's identity function).

The reference relies on Scrapy's request-fingerprint dedup (w3lib
canonicalization) plus ad-hoc URL edits:
- param replace  : add_or_replace_parameter(url,'PAGENUMBER',n)
  (/root/reference/xizang/spiders/bid_info.py:123)
- quote / urljoin / prefix rewrite (company_emp_info.py:52,214-216,
  corp_list.py:33)
- epoch-millis cache-busters appended as `_` / `t` params
  (company_emp_info.py:95-97,166) — MUST be stripped before hashing or
  every fetch of the same page looks new.

Canonical form (documented, deterministic):
  scheme lowercased · host lowercased · default ports dropped · fragment
  dropped · path '' → '/' · query params parsed, cache-buster keys removed,
  remaining pairs sorted by (key, value), re-encoded.

The canonicalizer is an Arrow-batched pandas UDF (urllib.parse has no
Catalyst analog); the hash is Spark's built-in ``xxhash64`` so the 64-bit
identity is computed JVM-side and is consistent everywhere (bloom shards
derive their probe positions from this single hash — no Python hashing).
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Cache-buster / anti-bot salt params observed in the reference's URL
# construction (company_emp_info.py:95-97,166,194,229,270; bid_notice.py:37).
CACHE_BUSTER_KEYS = frozenset({"_", "t", "timestamp", "random", "token", "_t"})

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url_py(url: str | None, base: str | None = None) -> str | None:
    """Single-value canonicalizer (shared with the fixture simulator so the
    engine and the ordering oracle agree byte-for-byte)."""
    if url is None or url == "":
        return None
    if base:
        url = urljoin(base, url)
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower() or "https"
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    q = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if k not in CACHE_BUSTER_KEYS
    ]
    q.sort()
    return urlunsplit((scheme, netloc, path, urlencode(q), ""))


@F.pandas_udf(T.StringType())
def canonicalize_url_pd(urls: pd.Series) -> pd.Series:
    """Arrow-batched canonicalizer (absolute URLs)."""
    return urls.map(lambda u: canonicalize_url_py(u))


@F.pandas_udf(T.StringType())
def resolve_and_canonicalize_pd(urls: pd.Series, bases: pd.Series) -> pd.Series:
    """Arrow-batched relative-URL resolution + canonicalization
    (response.urljoin analog, corp_list.py:33)."""
    return pd.Series(
        [canonicalize_url_py(u, b) for u, b in zip(urls, bases)], dtype="object"
    )


def url_hash_col(url_norm: Column) -> Column:
    """64-bit identity of a canonical URL — JVM-side xxhash64 (the
    north-star's '64-bit hash sized for 10^10 URLs')."""
    return F.xxhash64(url_norm)


def host_col(url_norm: Column) -> Column:
    """Host extracted from an already-canonical URL — pure Catalyst
    (parse_url is JVM-side), used for politeness partitioning."""
    return F.lower(F.parse_url(url_norm, F.lit("HOST")))


def with_url_norm(df: DataFrame, url_col: str = "url", base_col: str | None = None) -> DataFrame:
    """Attach url_norm / url_hash / host to a DataFrame of raw URLs."""
    if base_col:
        norm = resolve_and_canonicalize_pd(F.col(url_col), F.col(base_col))
    else:
        norm = canonicalize_url_pd(F.col(url_col))
    return (
        df.withColumn("url_norm", norm)
        .withColumn("url_hash", url_hash_col(F.col("url_norm")))
        .withColumn("host", host_col(F.col("url_norm")))
    )
