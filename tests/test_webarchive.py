"""Web-archive interop suite: DuckDB twins plus the structural
properties that make CDX/SURT and WARC outputs actually usable."""

import pytest

from llm_scraper_spark.operators.webarchive import (
    ORACLE_SQL,
    QUERIES,
    N_SHARDS,
)
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_webarchive_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches(df, ORACLE_SQL[name], SF_DIR, name)


def test_surt_normalizations(spark):
    rows = QUERIES["cdx_surt_index"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # scheme dropped, host reversed: every key starts with the TLD
        assert r["surt_key"].startswith("com,example,"), r["surt_key"]
        # www. stripped and host lowercased
        assert "www" not in r["surt_key"]
        assert r["surt_key"] == r["surt_key"].lower()
        # query params sorted: the planted '?b=2&a=1' must come out a-first
        if "?" in r["surt_key"]:
            assert r["surt_key"].endswith("?a=1&b=2")
        assert r["length_bytes"] > 0
    # the index is globally sorted — the property range scans rely on
    keys = [r["surt_key"] for r in rows]
    assert keys == sorted(keys)
    # sorted SURT order groups each host contiguously
    hosts = [k.split(")")[0] for k in keys]
    seen, prev = set(), None
    for h in hosts:
        if h != prev:
            assert h not in seen, f"host {h} not contiguous in CDX order"
            seen.add(h)
            prev = h


def test_warc_manifest_accounts_every_capture(spark):
    rows = QUERIES["warc_manifest"](spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r["n_records"] for r in rows) == n_docs
    assert len(rows) <= N_SHARDS
    for r in rows:
        # a WARC record is strictly larger than its payload: headers
        # (~200 bytes) + CRLF framing
        assert r["total_bytes"] > r["n_records"] * 200
        assert r["records_checksum"] > 0


def _surt_py(url: str) -> str:
    """Independent pure-Python SURT oracle (not the SQL expression
    re-spelled: stdlib parsing, different code path)."""
    rest = url.split("://", 1)[1]
    for cut in ("/", "?"):
        if cut in rest:
            host = rest[: min(i for i in [rest.find("/"), rest.find("?")] if i >= 0)]
            break
    else:
        host = rest
    tail = rest[len(host):]
    path, _, query = tail.partition("?")
    host = host.lower()
    if host.startswith("www."):
        host = host[4:]
    key = ",".join(reversed(host.split("."))) + ")" + path
    if query:
        key += "?" + "&".join(sorted(query.split("&")))
    return key


def test_surt_edge_cases_vs_python_oracle(spark):
    urls = [
        "https://www.Example.com/",
        "http://example.com/a/b/c",
        "https://sub.deep.example.com/x?z=9&y=8&a=1",
        "https://example.com/noquery/",
        "http://www.a.b.c.example.com/p?only=1",
        "https://example.com/?b=2&a=1",
        "https://HOST.example.COM/UPPER/path",  # host folds, path doesn't
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    from llm_scraper_spark.operators.webarchive import surt_key_col

    got = {
        r["url"]: r["k"]
        for r in df.selectExpr("url", f"{surt_key_col()} AS k").collect()
    }
    for u in urls:
        assert got[u] == _surt_py(u), u


def test_warc_record_rendering(spark):
    """One record, rendered and parsed back: header discipline, byte-
    exact Content-Length, digest line matches the payload."""
    import hashlib

    from llm_scraper_spark.operators.webarchive import warc_record_col

    df = spark.createDataFrame(
        [("https://example.com/x", "payload body é")], "url string, text string"
    ).selectExpr(f"{warc_record_col()} AS rec")
    rec = df.collect()[0]["rec"]
    head, _, payload = rec.partition("\r\n\r\n")
    lines = head.split("\r\n")
    assert lines[0] == "WARC/1.1"
    hdr = dict(line.split(": ", 1) for line in lines[1:])
    body = "payload body é"
    assert int(hdr["Content-Length"]) == len(body.encode())
    assert hdr["WARC-Target-URI"] == "https://example.com/x"
    assert hdr["WARC-Payload-Digest"] == (
        "md5:" + hashlib.md5(body.encode()).hexdigest()
    )
    assert payload == body + "\r\n\r\n"


def test_warc_ingest_matches_oracle_and_roundtrips(spark):
    from llm_scraper_spark.operators.webarchive import warc_ingest

    df = warc_ingest(spark, SF_DIR)
    assert_matches(df, ORACLE_SQL["warc_ingest"], SF_DIR, "warc_ingest")
    rows = df.collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n_docs
    # every rendered record parses back byte-exactly
    assert all(r["payload_ok"] == 1 for r in rows)


def test_crawler_export_warc_roundtrips(spark, tmp_path):
    """Drive a small real crawl, export it as WARC shards, parse every
    record back, and verify payloads against the records' own
    headers — the full export→ingest loop on actual crawl output."""
    from llm_scraper_spark.operators.webarchive import warc_parse_cols
    from llm_scraper_spark.plans.crawler import Crawler
    from llm_scraper_spark.sources.synthweb import robots_rows, seed_urls

    wd = str(tmp_path / "wd")
    c = Crawler(spark, wd, budget_ms=2000)
    c.init_state(seed_urls(40), robots_rows())
    c.run(max_rounds=2)
    out = str(tmp_path / "warc")
    c.export_warc(out)
    parsed = (
        spark.read.parquet(out)
        .selectExpr("round", *warc_parse_cols())
        .selectExpr(
            "round",
            "url",
            "if(md5(payload) = digest"
            " and octet_length(payload) = length_bytes, 1, 0) AS ok",
        )
    )
    rows = parsed.collect()
    assert len(rows) == c.documents_df().count()
    assert all(r["ok"] == 1 for r in rows)
    assert {r["round"] for r in rows} == {0, 1}


def test_surt_and_warc_roundtrip_on_seeded_random_urls(spark):
    """200 seeded pseudorandom URLs/payloads through both codecs in
    one batch: SURT equals the stdlib oracle on every one, and every
    WARC record parses back byte-exactly."""
    import hashlib
    import random

    from llm_scraper_spark.operators.webarchive import (
        surt_key_col,
        warc_parse_cols,
        warc_record_col,
    )

    rng = random.Random(0xC0FFEE)
    rows = []
    for i in range(200):
        scheme = rng.choice(["http", "https"])
        labels = [
            rng.choice(["www", "a", "sub", "x9"])
            for _ in range(rng.randint(0, 2))
        ] + [f"h{rng.randint(0, 99)}", "example", "com"]
        path = "/" + "/".join(
            f"s{rng.randint(0, 9)}" for _ in range(rng.randint(0, 4))
        )
        params = [f"k{rng.randint(0, 9)}=v{rng.randint(0, 9)}"
                  for _ in range(rng.randint(0, 3))]
        url = f"{scheme}://{'.'.join(labels)}{path}"
        if params:
            url += "?" + "&".join(params)
        payload = f"body {i} é " + hashlib.md5(str(i).encode()).hexdigest()
        rows.append((url, payload))
    df = spark.createDataFrame(rows, "url string, text string")
    got = df.selectExpr(
        "url",
        "text",
        f"{surt_key_col()} AS sk",
        f"{warc_record_col()} AS rec",
    ).selectExpr("url", "text", "sk", *warc_parse_cols("rec"))
    for r in got.collect():
        assert r["sk"] == _surt_py(r["url"]), r["url"]
        assert r["payload"] == r["text"]
        assert r["length_bytes"] == len(r["text"].encode())
        assert r["digest"] == hashlib.md5(r["text"].encode()).hexdigest()
