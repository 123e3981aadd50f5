"""JVM canonicalize/hash column expressions ≡ the Python reference
implementations (which the sequential oracle uses) — on the synthetic
web's real link corpus AND a battery of nasty URL shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_scraper_spark.functions.urls import (
    canonicalize_col,
    canonicalize_one,
    url_hash_col,
    url_hash_one,
)
from llm_scraper_spark.sources.synthweb import page_outlinks, seed_urls

NASTY = [
    "https://Host.Example.COM/path/Item?b=2&a=1&ref=sr_1&utm_source=x#frag",
    "HTTPS://UPPER.example.com:443/x",
    "http://h.example.com:80/",
    "http://h.example.com:8080/x?qid=9",
    "https://h.example.com",
    "https://h.example.com?tag=only",
    "https://h.example.com/a/b/?z=1&y=2&y=1",
    "  https://pad.example.com/x  ",
    "",
    "ftp://nope.example.com/x",
    "not a url",
    "/relative/only",
    "https://h.example.com/percent%20enc?x=%20",
    # adversarial ports: urlsplit().port raises on malformed or
    # out-of-range values — both engines must map these to None
    "http://h.example.com:8a/x",
    "http://h.example.com:99999/",
    "http://h.example.com:65536/",
    "http://h.example.com:999999999999999/x",
    "http://h.example.com:65535/ok",
    "http://h.example.com:080/x",
    "http://h.example.com:0/x",
    "http://h.example.com:/empty-port",
]


def _pairs():
    urls = list(NASTY)
    for s in seed_urls(40):
        urls.append(s)
        for link in page_outlinks(canonicalize_one(s) or s):
            urls.append(link)
    return urls


def test_canonicalize_jvm_matches_python_no_base(spark):
    urls = [u for u in _pairs() if not u.startswith("/")]
    df = spark.createDataFrame([(u,) for u in urls], "raw string")
    got = [
        r["c"] for r in df.select(canonicalize_col(F.col("raw")).alias("c")).collect()
    ]
    want = [canonicalize_one(u) for u in urls]
    assert got == want


def test_canonicalize_jvm_matches_python_with_base(spark):
    base = "https://h7.bench.example.com/item/3"
    urls = [u for u in _pairs()]
    df = spark.createDataFrame([(u, base) for u in urls], "raw string, base string")
    got = [
        r["c"]
        for r in df.select(
            canonicalize_col(F.col("raw"), F.col("base")).alias("c")
        ).collect()
    ]
    want = [canonicalize_one(u, base) for u in urls]
    assert got == want


def test_hash_jvm_matches_python(spark):
    canon = sorted({canonicalize_one(u) for u in _pairs() if canonicalize_one(u)})
    df = spark.createDataFrame([(u,) for u in canon], "url string")
    got = [r["h"] for r in df.select(url_hash_col(F.col("url")).alias("h")).collect()]
    want = [url_hash_one(u) for u in canon]
    assert got == want
    assert all(h >= 0 for h in got)
