"""The two per-round bloom absorb paths must be bit-identical.

`Crawler._bloom_absorb` folds a round's delta driver-side (pyarrow +
numpy) below SPARK_GRAFT_BLOOM_LOCAL_ABSORB_MAX and as a distributed
partial-bitmap build above it (crawler.py).  Both must produce the same
bitmap: the prefilter's correctness contract (no false negatives) rides
on the probe positions, so the paths are compared word-for-word on the
same crawl.
"""

import os

import numpy as np
import pytest

from llm_scraper_spark.plans.crawler import Crawler
from llm_scraper_spark.sources.synthweb import robots_rows, seed_urls


def _run_crawl(spark, wd, rounds=3):
    c = Crawler(spark, str(wd), budget_ms=2000, use_bloom=True)
    c.init_state(seed_urls(150), robots_rows())
    c.run(max_rounds=rounds)
    return c


def test_driver_side_absorb_matches_distributed(spark, tmp_path, monkeypatch):
    # force the driver-side path (threshold far above any delta)
    monkeypatch.setenv("SPARK_GRAFT_BLOOM_LOCAL_ABSORB_MAX", "100000000")
    c_local = _run_crawl(spark, tmp_path / "local")
    # force the distributed path (threshold below every delta)
    monkeypatch.setenv("SPARK_GRAFT_BLOOM_LOCAL_ABSORB_MAX", "-1")
    c_dist = _run_crawl(spark, tmp_path / "dist")

    assert c_local._bloom is not None and c_dist._bloom is not None
    assert c_local._bloom.m_bits == c_dist._bloom.m_bits
    assert c_local._bloom.k == c_dist._bloom.k
    assert np.array_equal(c_local._bloom.words, c_dist._bloom.words)


def test_resume_rebuild_matches_distributed_over_compacted_base(
    spark, tmp_path, monkeypatch
):
    # a resume rebuilds the bloom from the committed seen set — with a
    # compacted base in play, the driver-side fold must read base +
    # deltas exactly as the distributed seen_df build does
    blooms = {}
    for mode, local_max in (("local", "100000000"), ("dist", "-1")):
        monkeypatch.setenv("SPARK_GRAFT_BLOOM_LOCAL_ABSORB_MAX", local_max)
        wd = tmp_path / mode
        c = Crawler(spark, str(wd), budget_ms=2000, use_bloom=True, compact_every=1)
        c.init_state(seed_urls(150), robots_rows())
        c.run(max_rounds=2)
        # fresh instance = resume path: _bloom_rebuild from manifests
        c2 = Crawler(spark, str(wd), budget_ms=2000, use_bloom=True, compact_every=1)
        c2.run(max_rounds=3)
        assert c2._bloom is not None
        blooms[mode] = c2._bloom
    assert blooms["local"].m_bits == blooms["dist"].m_bits
    assert blooms["local"].k == blooms["dist"].k
    assert np.array_equal(blooms["local"].words, blooms["dist"].words)


def test_absorb_covers_all_seen_urls(spark, tmp_path, monkeypatch):
    # no-false-negative contract: every committed seen url_hash probes
    # positive after driver-side absorbs (rebuild-free rounds included)
    monkeypatch.setenv("SPARK_GRAFT_BLOOM_LOCAL_ABSORB_MAX", "100000000")
    c = _run_crawl(spark, tmp_path / "cover")
    last = c.last_committed_round()
    hashes = np.array(
        [r["url_hash"] for r in c.seen_df(last).select("url_hash").collect()],
        dtype=np.uint64,
    )
    assert len(hashes) > 0
    assert bool(c._bloom.maybe_contains(hashes).all())
