"""Bounded fetch retries (SURVEY §2.9: the reference's RETRIES=3 loop
as frontier re-entry).  The deterministic transient-failure model
(synthweb.transient_ok) makes the tests exact: we know in advance
which URLs fail on which attempts."""

import hashlib

import pyarrow.parquet as pq

from llm_scraper_spark.plans.crawler import Crawler
from llm_scraper_spark.sources.synthweb import robots_rows, seed_urls, transient_ok


def _flaky(url: str, fail_mod: int) -> bool:
    h = int(hashlib.md5(f"flaky:{url}".encode()).hexdigest()[:15], 16)
    return h % fail_mod == 0


def _docs(wd, spark):
    return {
        r["doc_id"]
        for r in spark.read.parquet(f"{wd}/fetch/*.parquet")
        .filter("ok")
        .select("doc_id")
        .collect()
    }


def test_transient_failures_retry_and_complete(spark, tmp_path):
    # every flaky URL fails attempt 0 and succeeds on attempt 1 —
    # with max_attempts=3 the crawl must still fetch EVERY url a
    # failure-free crawl fetches, exactly once ok
    wd_ok, wd_flaky = str(tmp_path / "ok"), str(tmp_path / "flaky")
    for wd, kw in (
        (wd_ok, {}),
        (wd_flaky, {"fail_mod": 4, "fail_attempts": 1, "max_attempts": 3}),
    ):
        c = Crawler(spark, wd, budget_ms=4000, **kw)
        c.init_state(seed_urls(40), robots_rows())
        c.run(max_rounds=6)
    base, flaky = _docs(wd_ok, spark), _docs(wd_flaky, spark)
    # the flaky crawl can lag the baseline by the retry latency on the
    # last rounds' discoveries, but everything IT resolved must be a
    # baseline page, and every baseline page of the early rounds (the
    # seeds, which had ≥2 rounds of retry headroom) must be present
    assert flaky <= base
    seeds_canon = {
        r["doc_id"]
        for r in spark.read.parquet(f"{wd_ok}/fetch/r0.parquet")
        .select("doc_id")
        .collect()
    }
    assert seeds_canon <= flaky
    # no URL is ever fetched-ok twice
    log = (
        spark.read.parquet(f"{wd_flaky}/fetch/*.parquet")
        .filter("ok")
        .groupBy("doc_id")
        .count()
        .filter("count > 1")
        .count()
    )
    assert log == 0
    # a flaky seed's fetch log shows attempt 0 failed, attempt 1 ok
    rows = (
        spark.read.parquet(f"{wd_flaky}/fetch/*.parquet")
        .select("doc_id", "attempt", "ok")
        .collect()
    )
    flaky_attempts = {}
    for r in rows:
        flaky_attempts.setdefault(r["doc_id"], []).append((r["attempt"], r["ok"]))
    retried = {u: sorted(a) for u, a in flaky_attempts.items() if len(a) > 1}
    assert retried, "failure model injected no retries"
    for u, attempts in retried.items():
        assert _flaky(u, 4)
        assert attempts[0] == (0, False)
        assert attempts[-1][1] is True


def test_permanent_failures_give_up_and_resolve(spark, tmp_path):
    # flaky URLs fail EVERY attempt: after max_attempts they must be
    # marked resolved (gone from the frontier, counted as gave_up) and
    # never appear in documents
    wd = str(tmp_path / "perm")
    c = Crawler(
        spark, wd, budget_ms=4000, fail_mod=4, fail_attempts=99, max_attempts=2
    )
    c.init_state(seed_urls(40), robots_rows())
    manifests = c.run(max_rounds=6)
    assert sum(m.get("gave_up", 0) for m in manifests) > 0
    docs = _docs(wd, spark)
    assert all(not _flaky(u, 4) for u in docs)
    # gave-up URLs are in the final frontier of no round
    last = max(
        int(f[1:-8])
        for f in __import__("os").listdir(f"{wd}/frontier")
        if f.endswith(".parquet")
    )
    pending = {
        r["url"]
        for r in spark.read.parquet(f"{wd}/frontier/r{last}.parquet")
        .select("url")
        .collect()
    }
    gave_up = {
        r["doc_id"]
        for r in spark.read.parquet(f"{wd}/fetch/*.parquet")
        .filter("NOT ok AND attempt + 1 >= 2")
        .select("doc_id")
        .collect()
    }
    assert gave_up and not (gave_up & pending)
    # ... and each was attempted exactly max_attempts times
    counts = (
        spark.read.parquet(f"{wd}/fetch/*.parquet")
        .filter("NOT ok")
        .groupBy("doc_id")
        .count()
        .collect()
    )
    assert all(r["count"] <= 2 for r in counts)


def test_transient_ok_model_is_deterministic():
    urls = [f"http://h{i}.example/p" for i in range(50)]
    for u in urls:
        for a in range(4):
            assert transient_ok(u, a, 7, 2) == (not (_flaky(u, 7) and a < 2))
        assert transient_ok(u, 0, 0, 5)  # disabled model never fails


def test_inlink_weight_prioritizes_heavily_linked_urls(spark):
    from pyspark.sql import functions as F

    from llm_scraper_spark.operators.frontier import frontier_delta

    fetched = spark.createDataFrame(
        [
            (
                "https://a.example/p1",
                ["https://a.example/pop", "https://a.example/lone"],
                0,
            ),
            ("https://a.example/p2", ["https://a.example/pop"], 0),
        ],
        "doc_id string, outlinks array<string>, depth int",
    )
    empty = spark.createDataFrame([], "url_hash long, url string")
    prio = {
        r["url"]: r["priority"]
        for r in frontier_delta(
            fetched, empty, empty, empty, round_no=0, inlink_weight=0.5
        ).collect()
    }
    # pop has 2 in-links: priority = 1 - 0.5*log2(2) = 0.5 < lone's 1.0
    assert prio["https://a.example/pop"] == 0.5
    assert prio["https://a.example/lone"] == 1.0
    # weight 0 (default) keeps priority == depth exactly
    prio0 = {
        r["url"]: r["priority"]
        for r in frontier_delta(fetched, empty, empty, empty, round_no=0).collect()
    }
    assert prio0 == {
        "https://a.example/pop": 1.0,
        "https://a.example/lone": 1.0,
    }


def test_inlink_weighted_crawl_runs_and_converges(spark, tmp_path):
    wd = str(tmp_path / "opic")
    c = Crawler(spark, wd, budget_ms=4000, inlink_weight=0.5)
    c.init_state(seed_urls(40), robots_rows())
    ms = c.run(max_rounds=3)
    assert len(ms) == 3
    seen = [m["seen_total"] for m in ms]
    assert seen == sorted(seen) and seen[-1] > seen[0]


def test_documents_df_excludes_failed_attempts(spark, tmp_path):
    wd = str(tmp_path / "docsok")
    c = Crawler(
        spark, wd, budget_ms=4000, fail_mod=4, fail_attempts=1, max_attempts=3
    )
    c.init_state(seed_urls(40), robots_rows())
    c.run(max_rounds=3)
    docs = c.documents_df().collect()
    assert docs
    # no ghost documents: every row comes from an ok fetch, so no
    # doc_id repeats and no empty span list appears
    ids = [r["doc_id"] for r in docs]
    assert len(ids) == len(set(ids))
    assert all(len(r["spans"]) > 0 for r in docs)
