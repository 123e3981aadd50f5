"""Seen-set compaction: base-snapshot + delta reads must equal the
pure delta-union view, and a resume after compaction must continue the
identical crawl."""

import json
import os

from llm_scraper_spark.plans.crawler import Crawler
from llm_scraper_spark.sources.synthweb import robots_rows, seed_urls

ROUNDS = 4


def _seen_rows(crawler, upto):
    return {
        (r["url_hash"], r["url"])
        for r in crawler.seen_df(upto).collect()
    }


def test_compacted_seen_equals_delta_union(spark, tmp_path):
    wd_c = str(tmp_path / "compacted")
    wd_n = str(tmp_path / "plain")
    seeds = seed_urls(60)
    c1 = Crawler(spark, wd_c, budget_ms=2000, compact_every=2)
    c1.init_state(seeds, robots_rows())
    m1 = c1.run(max_rounds=ROUNDS)
    c2 = Crawler(spark, wd_n, budget_ms=2000, compact_every=0)
    c2.init_state(seeds, robots_rows())
    m2 = c2.run(max_rounds=ROUNDS)

    # compaction actually happened and is crash-safe (no tmp left)
    last = m1[-1]["round"]
    assert c1.latest_compact_round(last) is not None
    assert not any(
        f.endswith(".tmp") for f in os.listdir(os.path.join(wd_c, "seen_compact"))
    )
    # identical crawl, identical seen set at every committed round
    assert [m["fetched"] for m in m1] == [m["fetched"] for m in m2]
    for r in range(last + 1):
        assert _seen_rows(c1, r) == _seen_rows(c2, r), f"round {r}"


def test_resume_after_compaction(spark, tmp_path):
    wd_a = str(tmp_path / "resumed")
    wd_b = str(tmp_path / "straight")
    seeds = seed_urls(60)

    a = Crawler(spark, wd_a, budget_ms=2000, compact_every=2)
    a.init_state(seeds, robots_rows())
    a.run(max_rounds=3)  # compacts at round 1 and continues
    a2 = Crawler(spark, wd_a, budget_ms=2000, compact_every=2)
    ms_a = a2.run(max_rounds=ROUNDS)  # fresh instance resumes at round 3
    assert ms_a and ms_a[0]["round"] == 3

    b = Crawler(spark, wd_b, budget_ms=2000, compact_every=0)
    b.init_state(seeds, robots_rows())
    b.run(max_rounds=ROUNDS)

    for r in range(ROUNDS):
        with open(os.path.join(wd_a, "manifests", f"r{r}.json")) as fa, open(
            os.path.join(wd_b, "manifests", f"r{r}.json")
        ) as fb:
            ma, mb = json.load(fa), json.load(fb)
        for k in ("fetched", "blocked", "seen_delta", "seen_total", "next_frontier"):
            assert ma[k] == mb[k], f"round {r} field {k}"
    assert _seen_rows(a2, ROUNDS - 1) == _seen_rows(b, ROUNDS - 1)
