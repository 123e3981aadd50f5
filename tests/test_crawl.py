"""Crawl equality vs the sequential reference oracle (SURVEY.md §5):

(a) crawl ordering equality — every fetched URL gets the same (round,
    politeness slot) in the engine and the oracle;
(b) final URL-seen-set equality;
(c) per-document span-sequence equality (kind, text, media_ref, order)
    — the BASELINE.json input_hint per-row invariant;
plus politeness-budget and monotonicity invariants.
"""

from __future__ import annotations

import pytest

from llm_scraper_spark.plans.crawler import Crawler
from llm_scraper_spark.plans.oracle import crawl_oracle
from llm_scraper_spark.sources.synthweb import robots_rows, seed_urls

BUDGET_MS = 2000
ROUNDS = 3
SEEDS = seed_urls(80)
ROBOTS = robots_rows()


@pytest.fixture(scope="module")
def crawl_pair(spark, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("crawl"))
    eng = Crawler(spark, workdir, budget_ms=BUDGET_MS, use_bloom=True)
    eng.init_state(SEEDS, ROBOTS)
    manifests = eng.run(max_rounds=ROUNDS)
    ora = crawl_oracle(SEEDS, ROBOTS, budget_ms=BUDGET_MS, max_rounds=ROUNDS)
    return eng, ora, manifests


def test_fetch_ordering_matches_oracle(crawl_pair):
    eng, ora, _ = crawl_pair
    got = {
        (r["round"], r["slot"], r["host"], r["url"], r["url_hash"], r["depth"])
        for r in eng.fetch_log_df().collect()
    }
    want = {(r, s, h, u, uh, d) for (r, s, h, u, uh, p, d) in ora.fetch_log}
    assert got == want
    assert len(got) == len(ora.fetch_log)  # no URL fetched twice


def test_seen_set_matches_oracle(crawl_pair):
    eng, ora, _ = crawl_pair
    last = eng.last_committed_round()
    got = {
        (r["url"], r["first_round"]) for r in eng.seen_df(last).collect()
    }
    assert got == set(ora.seen.items())


def test_span_sequences_match_oracle(crawl_pair):
    eng, ora, _ = crawl_pair
    rows = eng.documents_df().collect()
    assert len(rows) == len(ora.documents)
    for row in rows:
        want = ora.documents[row["doc_id"]]
        got = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]
        ]
        assert got == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in want
        ], row["doc_id"]
        # offsets dense 0..n-1 in order
        assert [s["offset"] for s in row["spans"]] == list(range(len(got)))


def test_politeness_budget_respected(crawl_pair):
    eng, _, _ = crawl_pair
    delays = {r["host"]: r["crawl_delay_ms"] for r in ROBOTS}
    log = eng.fetch_log_df().collect()
    for row in log:
        budget = max(1, BUDGET_MS // delays.get(row["host"], 1000))
        assert row["slot"] <= budget, (row["host"], row["slot"], budget)


def test_manifests_and_lineage(crawl_pair):
    _, _, manifests = crawl_pair
    assert manifests, "at least one committed round"
    for m in manifests:
        assert m["fetched"] == sum(p["rows"] for p in m["partition_lineage"])
        assert m["seen_total"] >= m["seen_delta"]


def test_bloom_off_is_identical(spark, tmp_path, crawl_pair):
    """Bloom is a prefilter only — disabling it must not change any state."""
    eng_b, _, _ = crawl_pair
    eng = Crawler(spark, str(tmp_path / "nobloom"), budget_ms=BUDGET_MS, use_bloom=False)
    eng.init_state(SEEDS, ROBOTS)
    eng.run(max_rounds=ROUNDS)
    a = {tuple(r) for r in eng.fetch_log_df().collect()}
    b = {tuple(r) for r in eng_b.fetch_log_df().collect()}
    assert a == b
