"""Property-based tests (hypothesis) for the pure-Python kernels shared
between the engine and the parity oracle — no SparkSession needed, so
these run in milliseconds and explore far more inputs than example
tests."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tbbid_scrapy_spark.functions.chinese import chinese_to_arabic_py
from tbbid_scrapy_spark.functions.urls import CACHE_BUSTER_KEYS, canonicalize_url_py
from tbbid_scrapy_spark.operators.bloom import BloomSpec, bloom_fp_rate

# ---------------------------------------------------------------------------
# URL canonicalizer
# ---------------------------------------------------------------------------

hosts = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z][a-z0-9]{0,8}){1,3}", fullmatch=True)
paths = st.from_regex(r"(/[A-Za-z0-9_\-\.]{0,12}){0,4}", fullmatch=True)
qkeys = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,8}", fullmatch=True)
qvals = st.from_regex(r"[A-Za-z0-9_\-]{0,12}", fullmatch=True)
queries = st.lists(st.tuples(qkeys, qvals), max_size=5)


def _mk_url(scheme, host, path, query, fragment):
    q = "&".join(f"{k}={v}" for k, v in query)
    u = f"{scheme}://{host}{path}"
    if q:
        u += "?" + q
    if fragment:
        u += "#frag"
    return u


@settings(max_examples=200, deadline=None)
@given(
    scheme=st.sampled_from(["http", "https", "HTTP", "HTTPS"]),
    host=hosts, path=paths, query=queries, fragment=st.booleans(),
)
def test_canonicalize_idempotent(scheme, host, path, query, fragment):
    u = _mk_url(scheme, host, path, query, fragment)
    c1 = canonicalize_url_py(u)
    assert c1 == canonicalize_url_py(c1), (u, c1)


@settings(max_examples=200, deadline=None)
@given(host=hosts, path=paths, query=queries)
def test_canonicalize_query_order_invariant(host, path, query):
    u1 = _mk_url("https", host, path, query, False)
    u2 = _mk_url("https", host, path, list(reversed(query)), False)
    assert canonicalize_url_py(u1) == canonicalize_url_py(u2)


@settings(max_examples=100, deadline=None)
@given(host=hosts, path=paths, query=queries,
       buster=st.sampled_from(sorted(CACHE_BUSTER_KEYS)),
       bval=st.integers(0, 10**13))
def test_cache_busters_never_survive(host, path, query, buster, bval):
    query = [(k, v) for k, v in query if k not in CACHE_BUSTER_KEYS]
    with_b = query + [(buster, str(bval))]
    u1 = _mk_url("https", host, path, query, False)
    u2 = _mk_url("https", host, path, with_b, False)
    assert canonicalize_url_py(u1) == canonicalize_url_py(u2)


@settings(max_examples=100, deadline=None)
@given(host=hosts, path=paths)
def test_default_ports_dropped(host, path):
    assert canonicalize_url_py(f"https://{host}:443{path}") == \
        canonicalize_url_py(f"https://{host}{path}")
    assert canonicalize_url_py(f"http://{host}:80{path}") == \
        canonicalize_url_py(f"http://{host}{path}")
    # non-default port preserved
    assert ":8443" in canonicalize_url_py(f"https://{host}:8443{path}")


@settings(max_examples=200, deadline=None)
@given(host=hosts, path=paths, port=st.integers(1, 99999))
def test_out_of_range_ports_invalid_never_fatal(host, path, port):
    """Ports 65536-99999 parse but are INVALID (urlsplit raises on
    .port); the canonicalizer must map them to None — never raise — so a
    single malformed href can't kill an Arrow batch (whole wave) in
    mode='python'. In-range ports canonicalize normally."""
    c = canonicalize_url_py(f"https://{host}:{port}{path}")
    if port <= 65535:
        assert c is not None and c.startswith("https://")
    else:
        assert c is None


# ---------------------------------------------------------------------------
# Chinese numerals (reference semantics, util.py:22-48)
# ---------------------------------------------------------------------------

_DIGITS = "一二三四五六七八九"


@settings(max_examples=100, deadline=None)
@given(tens=st.integers(2, 9), ones=st.integers(0, 9))
def test_chinese_compound_tens(tens, ones):
    s = _DIGITS[tens - 1] + "十" + (_DIGITS[ones - 1] if ones else "")
    assert chinese_to_arabic_py(s) == tens * 10 + ones


@settings(max_examples=50, deadline=None)
@given(ones=st.integers(1, 9))
def test_chinese_teens_and_units(ones):
    assert chinese_to_arabic_py("十" + _DIGITS[ones - 1]) == 10 + ones
    assert chinese_to_arabic_py(_DIGITS[ones - 1]) == ones


@settings(max_examples=100, deadline=None)
@given(s=st.text(alphabet="abcxyz标段总包0123456789", min_size=1, max_size=6))
def test_chinese_garbage_is_minus_one(s):
    # no recognized numeral characters at all → -1 (reference behavior)
    if not any(ch in "一二三四五六七八九十零〇壹贰叁肆伍陆柒捌玖拾貳參" for ch in s):
        assert chinese_to_arabic_py(s) == -1


# ---------------------------------------------------------------------------
# Bloom sizing math
# ---------------------------------------------------------------------------

@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(10**3, 10**10),
    p=st.sampled_from([0.05, 0.01, 0.001]),
    shards=st.sampled_from([16, 256, 4096]),
)
def test_bloom_sizing_properties(n, p, shards):
    spec = BloomSpec.for_capacity(n, p, shards)
    assert spec.bits_per_shard % 8 == 0
    assert spec.n_probes >= 1
    # theoretical FP at design load within 2x of the target
    assert bloom_fp_rate(spec, n / shards) < 2 * p
    import math

    optimal = -n * math.log(p) / (math.log(2) ** 2)
    total = spec.n_shards * spec.bits_per_shard
    # never undersized (oversizing only lowers FP)...
    assert total >= optimal * 0.999
    # ...and oversized only by the per-shard byte-alignment slack
    assert total <= optimal * 1.02 + 8 * shards
