"""Property-based fuzzing of URL canonicalization (hypothesis).

The canonicalizer sits in front of the seen-set hash: any input that
crashes it, or any fixpoint it lacks, is a crawl-killer at 10^10 URLs
(a non-idempotent canonical form would let the same logical page
re-enter the frontier forever).  Pure-Python, no Spark — the JVM
fast path is proven equal to canonicalize_one in test_urls_jvm.py.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from llm_scraper_spark.functions.urls import canonicalize_one, url_hash_one

_scheme = st.sampled_from(["http", "https", "HTTP", "Https"])
_host = st.from_regex(r"[A-Za-z0-9]([A-Za-z0-9.-]{0,30}[A-Za-z0-9])?", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~%-]{0,12}){0,4}/?", fullmatch=True)
_key = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
_param = st.tuples(_key, st.from_regex(r"[A-Za-z0-9%-]{0,8}", fullmatch=True))
_urlish = st.builds(
    lambda s, h, port, p, q, frag: (
        f"{s}://{h}{port}{p}"
        + ("?" + "&".join(f"{k}={v}" for k, v in q) if q else "")
        + frag
    ),
    _scheme,
    _host,
    st.sampled_from(
        [
            "", ":80", ":443", ":8080", ":0", ":080", ":65535",
            # malformed / out-of-range: urlsplit().port raises on these,
            # canonicalize must map them to None, never crash
            ":8a", ":99999", ":65536", ":999999999999999", ":",
        ]
    ),
    _path,
    st.lists(_param, max_size=5),
    st.sampled_from(["", "#frag", "#a/b?c"]),
)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_never_raises_on_garbage(s):
    out = canonicalize_one(s)
    assert out is None or out.startswith(("http://", "https://"))


@settings(max_examples=300, deadline=None)
@given(_urlish)
def test_idempotent_on_urlish(u):
    once = canonicalize_one(u)
    if once is not None:
        assert canonicalize_one(once) == once


@settings(max_examples=300, deadline=None)
@given(_urlish)
def test_hash_in_63_bit_range(u):
    c = canonicalize_one(u)
    if c is not None:
        assert 0 <= url_hash_one(c) < 1 << 63


@settings(max_examples=200, deadline=None)
@given(_urlish, st.integers(0, 2**32 - 1))
def test_query_param_order_is_canonicalized_away(u, seed):
    """Shuffling query params never changes the canonical form (and
    therefore never duplicates a seen-set entry)."""
    c = canonicalize_one(u)
    if c is None or "?" not in u or "#" in u:
        return
    base, q = u.split("?", 1)
    params = [kv for kv in q.split("&") if kv]
    random.Random(seed).shuffle(params)
    assert canonicalize_one(base + "?" + "&".join(params)) == c


@settings(max_examples=200, deadline=None)
@given(_host, _path)
def test_relative_href_absolutizes_against_base(host, path):
    base = f"https://{host}/"
    href = "/" + path.lstrip("/")
    out = canonicalize_one(href, base=base)
    assert out is not None and out.startswith(f"https://{host.lower()}/")
