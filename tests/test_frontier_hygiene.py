"""Frontier-hygiene operators: oracle equality at sf0.001 plus the
trap-population invariants the synthetic construction guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_scraper_spark.operators import frontier_hygiene as fh
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


def test_url_trap_flags_matches_oracle(spark):
    assert_matches(
        fh.url_trap_flags(spark, SF_DIR),
        fh.ORACLE_SQL["url_trap_flags"],
        SF_DIR,
        "url_trap_flags",
    )


def test_sitemap_extract_matches_oracle(spark):
    assert_matches(
        fh.sitemap_frontier_extract(spark, SF_DIR),
        fh.ORACLE_SQL["sitemap_frontier_extract"],
        SF_DIR,
        "sitemap_frontier_extract",
    )


def test_robots_gate_matches_oracle(spark):
    assert_matches(
        fh.robots_gate_summary(spark, SF_DIR),
        fh.ORACLE_SQL["robots_gate_summary"],
        SF_DIR,
        "robots_gate_summary",
    )


def test_trap_populations(spark):
    """The generator plants two loop families (doc_id%7==0 with depth>=2
    repeats one segment all the way down; depth>=8 repeats by
    pigeonhole) and a session family (doc_id%11==0) — the detector,
    which only sees the URL string, must find exactly them."""
    rows = fh.url_trap_flags(spark, SF_DIR).collect()
    assert rows, "frontier must be non-empty"
    for r in rows:
        d = r["doc_id"]
        depth = d % 9 + 1
        want_repeat = 1 if (d % 7 == 0 and depth >= 2) or depth >= 8 else 0
        assert r["trap_repeat"] == want_repeat, (d, depth, r["url"])
        assert r["trap_session"] == (1 if d % 11 == 0 else 0)
        assert r["trap_deep"] == (1 if depth > fh.MAX_DEPTH else 0)
        assert r["is_trap"] == (
            1
            if (r["trap_deep"] or r["trap_repeat"] or r["trap_params"] or r["trap_session"])
            else 0
        )


def test_sitemap_candidates_never_seen(spark):
    """Anti-join contract: no emitted candidate is in the seen set, and
    duplicate listings collapse to one row with the listing count."""
    out = fh.sitemap_frontier_extract(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    seen_pages = {
        r[0] % fh.PAGE_SPACE
        for r in docs.filter(F.col("doc_id") % 2 == 0).select("doc_id").collect()
    }
    got = out.collect()
    assert got
    urls = [r["url"] for r in got]
    assert len(urls) == len(set(urls)), "candidates must be deduped"
    for r in got:
        page = int(r["url"].rsplit("/", 1)[1])
        assert page not in seen_pages, r["url"]
    assert any(r["n_listings"] > 1 for r in got), "page space forces collisions"


def test_robots_blocks_exactly_denied_segment(spark):
    """Every host's block count equals the frontier rows whose first
    path segment matches the host's denied segment — recomputed
    independently from the raw URLs."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    summary = {r["host"]: r for r in fh.robots_gate_summary(spark, SF_DIR).collect()}
    from collections import Counter

    want_blocked: Counter = Counter()
    want_total: Counter = Counter()
    for d, src in docs.select("doc_id", "source").collect():
        host = f"s{d % 20}.{src}.example.com"
        first_seg = f"p{(d * 1) % 7}"
        deny = f"p{(d % 20) % 7}"
        want_total[host] += 1
        if first_seg == deny:
            want_blocked[host] += 1
    assert set(summary) == set(want_total)
    for host, r in summary.items():
        assert r["n_blocked"] == want_blocked[host], host
        assert r["n_allowed"] == want_total[host] - want_blocked[host], host


def test_robots_roundtrip_matches_oracle(spark):
    assert_matches(
        fh.robots_roundtrip(spark, SF_DIR),
        fh.ORACLE_SQL["robots_roundtrip"],
        SF_DIR,
        "robots_roundtrip",
    )


def test_robots_codec_roundtrips_the_real_crawl_rules(spark):
    """Render + parse the ACTUAL synthweb rule table the crawler is
    initialized with (not the md5 gate universe) — the codec must be
    lossless on every rule the crawl path uses, including the
    null-prefix (allow-all) and sub-second-delay hosts."""
    from llm_scraper_spark.sources.synthweb import robots_rows

    rows = robots_rows()
    df = spark.createDataFrame(
        rows,
        "host string, disallow_prefix string, crawl_delay_ms bigint",
    )
    back = {
        r["host"]: (r["disallow_prefix"], r["crawl_delay_ms"])
        for r in df.selectExpr(
            "host", f"{fh.robots_txt_col()} AS robots_txt"
        )
        .selectExpr("host", *fh.robots_parse_cols())
        .collect()
    }
    assert len(back) == len(rows)
    for r in rows:
        assert back[r["host"]] == (
            r["disallow_prefix"],
            r["crawl_delay_ms"],
        ), r["host"]


def test_redirect_resolution_hand_chain_and_loop(spark):
    """A 5-hop chain resolves to its terminal with exact hop counts;
    a 2-cycle raises instead of returning wrong targets."""
    from llm_scraper_spark.operators.frontier_hygiene import (
        resolve_redirects,
    )

    chain = [(5, 4), (4, 3), (3, 2), (2, 1), (1, 0)]
    df = spark.createDataFrame(chain, "src long, dst long")
    got = {
        r.url_id: (r.final_id, r.hops)
        for r in resolve_redirects(df).collect()
    }
    assert got == {5: (0, 5), 4: (0, 4), 3: (0, 3), 2: (0, 2), 1: (0, 1)}

    loop = spark.createDataFrame(
        [(1, 2), (2, 1)], "src long, dst long"
    )
    import pytest

    with pytest.raises(RuntimeError, match="loop"):
        resolve_redirects(loop)


def test_redirect_resolve_hops_equal_id_gap(spark):
    """The synthetic block construction guarantees hops == url_id −
    final_id and final_id % BLOCK == 0 for every resolved row."""
    from llm_scraper_spark.operators.frontier_hygiene import (
        RED_BLOCK,
        redirect_resolve,
    )

    out = redirect_resolve(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r.final_id % RED_BLOCK == 0
        assert r.hops == r.url_id - r.final_id


def test_registered_domain_longest_match_semantics(spark):
    """kyoto.jp (2 labels) must beat jp: wiki hosts group under
    temple.kyoto.jp, never kyoto.jp; co.uk hosts under example.co.uk."""
    from llm_scraper_spark.operators.frontier_hygiene import (
        registered_domain_mix,
    )

    out = {r.reg_domain: (r.n_hosts, r.n_pages)
           for r in registered_domain_mix(spark, SF_DIR).collect()}
    assert "temple.kyoto.jp" in out
    assert "kyoto.jp" not in out          # longest match, plus one label
    assert "example.co.uk" in out
    assert "co.uk" not in out
    assert "example.org.uk" in out
    assert "example.com" in out
    assert "example.jp" in out
    # every wiki host (≤7 name variants) collapsed into one domain
    n_hosts, n_pages = out["temple.kyoto.jp"]
    assert n_hosts <= 7 and n_pages >= n_hosts
