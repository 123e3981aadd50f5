"""Resume-from-checkpoint ≡ uninterrupted run (north rule).

The crawler commits a round iff its manifest exists (atomic rename).
Three scenarios must all yield byte-identical final state vs a single
uninterrupted run:

1. clean stop after round 0, new Crawler instance resumes rounds 1..2;
2. torn round: round 1's snapshots written but manifest missing
   (simulated driver kill between snapshot writes and commit) — resume
   must redo round 1 and converge to the same state;
3. resume of a fully-finished crawl is a no-op (no new manifests).

Reference analog being replaced: append-mode files + manual slice
resume (scrape_eccomerce.py:289 "a" mode; extract_pages.py:137
``product_urls[355:]``).
"""

from __future__ import annotations

import os
import shutil

import pytest

from llm_scraper_spark.plans.crawler import Crawler
from llm_scraper_spark.sources.synthweb import robots_rows, seed_urls

BUDGET_MS = 2000
ROUNDS = 3
SEEDS = seed_urls(60)
ROBOTS = robots_rows()


def _final_state(eng: Crawler):
    last = eng.last_committed_round()
    fetch = {tuple(r) for r in eng.fetch_log_df().collect()}
    seen = {(r["url"], r["first_round"]) for r in eng.seen_df(last).collect()}
    docs = {
        (
            r["doc_id"],
            tuple((s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]),
        )
        for r in eng.documents_df().collect()
    }
    return last, fetch, seen, docs


@pytest.fixture(scope="module")
def baseline(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("uninterrupted"))
    eng = Crawler(spark, wd, budget_ms=BUDGET_MS, use_bloom=True)
    eng.init_state(SEEDS, ROBOTS)
    manifests = eng.run(max_rounds=ROUNDS)
    return _final_state(eng), manifests


def test_resume_after_clean_stop(spark, tmp_path, baseline):
    want, _ = baseline
    wd = str(tmp_path / "cleanstop")
    eng1 = Crawler(spark, wd, budget_ms=BUDGET_MS, use_bloom=True)
    eng1.init_state(SEEDS, ROBOTS)
    m1 = eng1.run(max_rounds=1)  # stop after round 0
    assert [m["round"] for m in m1] == [0]
    # fresh driver instance resumes from the committed checkpoint
    eng2 = Crawler(spark, wd, budget_ms=BUDGET_MS, use_bloom=True)
    m2 = eng2.run(max_rounds=ROUNDS)
    assert [m["round"] for m in m2] == list(range(1, ROUNDS))
    assert _final_state(eng2) == want


def test_resume_after_torn_round(spark, tmp_path, baseline):
    """Snapshots of round 1 exist but its manifest does not → round 1
    is uncommitted; resume must redo it and converge."""
    want, _ = baseline
    wd = str(tmp_path / "torn")
    eng1 = Crawler(spark, wd, budget_ms=BUDGET_MS, use_bloom=True)
    eng1.init_state(SEEDS, ROBOTS)
    eng1.run(max_rounds=2)  # commits rounds 0 and 1
    # simulate a kill AFTER round-1 snapshot writes but BEFORE commit:
    # drop the manifest, leave (possibly partial) snapshots behind
    os.remove(os.path.join(wd, "manifests", "r1.json"))
    # also tear one of the snapshot dirs half-away to prove snapshots
    # of uncommitted rounds are disposable
    shutil.rmtree(os.path.join(wd, "fetch", "r1.parquet"))
    eng2 = Crawler(spark, wd, budget_ms=BUDGET_MS, use_bloom=True)
    assert eng2.last_committed_round() == 0
    m2 = eng2.run(max_rounds=ROUNDS)
    assert [m["round"] for m in m2] == list(range(1, ROUNDS))
    assert _final_state(eng2) == want


def test_resume_of_finished_crawl_is_noop(spark, tmp_path, baseline):
    want, _ = baseline
    wd = str(tmp_path / "noop")
    eng1 = Crawler(spark, wd, budget_ms=BUDGET_MS, use_bloom=True)
    eng1.init_state(SEEDS, ROBOTS)
    eng1.run(max_rounds=ROUNDS)
    eng2 = Crawler(spark, wd, budget_ms=BUDGET_MS, use_bloom=True)
    assert eng2.run(max_rounds=ROUNDS) == []
    assert _final_state(eng2) == want
