"""Priority-band frontier pruning: the round's candidate pipeline runs
only over the lowest bands that cover the budget; unread bands ride
through verbatim.  Contract under test:

* the FETCH SCHEDULE (which URLs, which round, which politeness slot)
  is identical to the unpruned crawl — pruning may only change when
  robots-blocked / already-seen rows in deep bands get absorbed;
* a drained crawl converges to the identical final seen set;
* the shortfall check redoes the round exactly when a host with unread
  rows did not fill its budget.
"""

import json
import os

from pyspark.sql import functions as F

from llm_scraper_spark.plans.crawler import Crawler
from llm_scraper_spark.sources.synthweb import robots_rows, seed_urls


def _run(spark, wd, *, band_prune, seeds=2000, budget_ms=500, rounds=3,
         **kw):
    c = Crawler(spark, wd, budget_ms=budget_ms, salt_buckets=4,
                fetch_partitions=4, band_prune=band_prune, **kw)
    c.init_state(seed_urls(seeds), robots_rows())
    ms = c.run(max_rounds=rounds)
    return c, ms


def _fetch_schedule(spark, wd, rounds):
    out = {}
    for r in range(rounds):
        p = os.path.join(wd, "fetch", f"r{r}.parquet")
        if not os.path.isdir(p):
            break
        out[r] = {
            (row.doc_id, row.slot)
            for row in spark.read.parquet(p).select("doc_id", "slot").collect()
        }
    return out


def test_pruned_crawl_fetches_identically(spark, tmp_path):
    a, ms_a = _run(spark, str(tmp_path / "plain"), band_prune=False)
    b, ms_b = _run(spark, str(tmp_path / "banded"), band_prune=True)
    sched_a = _fetch_schedule(spark, str(tmp_path / "plain"), 3)
    sched_b = _fetch_schedule(spark, str(tmp_path / "banded"), 3)
    assert sched_a == sched_b
    assert [m["fetched"] for m in ms_a] == [m["fetched"] for m in ms_b]
    # the pruned path must actually have pruned at least one round
    # (else this test proves nothing about the fast path)
    pruned_rounds = [
        m for m in ms_b
        if m.get("band_prune", {}).get("bands_total", 0)
        > m["band_prune"].get("bands_read", 0)
        and not m.get("prune_fallback")
    ]
    assert pruned_rounds, [m.get("band_prune") for m in ms_b]


def test_drained_crawl_converges_to_identical_seen(spark, tmp_path):
    """With budget to spare, both crawls exhaust the (finite) synthetic
    web reachable from the seeds — final seen sets must be identical,
    including the deep-band blocked/seen rows whose absorption the
    pruned crawl deferred."""
    a, _ = _run(spark, str(tmp_path / "plain"), band_prune=False,
                seeds=60, budget_ms=60000, rounds=12)
    b, ms_b = _run(spark, str(tmp_path / "banded"), band_prune=True,
                   seeds=60, budget_ms=60000, rounds=12)
    sa = {r.url for r in a.seen_df(a.last_committed_round()).collect()}
    sb = {r.url for r in b.seen_df(b.last_committed_round()).collect()}
    assert sa == sb
    assert len(ms_b) <= 12


def test_shortfall_check_detects_underfilled_host(spark, tmp_path):
    """Unit-level: a host with unread rows and an unfilled budget trips
    `_prune_fell_short`; a filled host (or one absent from the
    passthrough) does not."""
    from llm_scraper_spark import schemas

    wd = str(tmp_path / "wd")
    c = Crawler(spark, wd, budget_ms=3000, band_prune=True)
    os.makedirs(os.path.join(wd, "fetch"), exist_ok=True)
    # fetch snapshot: hostA fetched 3 (== budget 3000/1000), hostB 1
    snap = spark.createDataFrame(
        [("a1", "hostA"), ("a2", "hostA"), ("a3", "hostA"), ("b1", "hostB")],
        "doc_id string, host string",
    )
    snap.write.mode("overwrite").parquet(
        os.path.join(wd, "fetch", "r1.parquet")
    )
    robots = spark.createDataFrame(
        [("hostA", None, 1000), ("hostB", None, 1000)],
        schemas.ROBOTS,
    )
    full = spark.createDataFrame(
        [("hostA",), ("hostB",)], "host string"
    )
    assert c._prune_fell_short(1, robots, full)  # hostB: 1 < 3, has unread
    only_a = spark.createDataFrame([("hostA",)], "host string")
    assert not c._prune_fell_short(1, robots, only_a)  # hostA filled


def test_fallback_round_equals_unpruned(spark, tmp_path):
    """Integration: force the estimate to cut too early (margin so low
    that a host with deep rows can't fill), and verify the fallback
    fires AND the round's fetch schedule still equals the unpruned
    crawl's."""
    kw = dict(seeds=300, budget_ms=60000, rounds=2, band_margin=1)
    a, _ = _run(spark, str(tmp_path / "plain"), band_prune=False, **kw)
    b, ms_b = _run(spark, str(tmp_path / "banded"), band_prune=True, **kw)
    assert _fetch_schedule(spark, str(tmp_path / "plain"), 2) == \
        _fetch_schedule(spark, str(tmp_path / "banded"), 2)
    # with budget this large every host wants more than band 0 holds,
    # so any pruned round must have fallen back (and been redone)
    for m in ms_b:
        bp = m.get("band_prune") or {}
        if bp.get("bands_read", 0) < bp.get("bands_total", 0):
            assert m["prune_fallback"]


def test_banded_layout_resumes_identically(spark, tmp_path):
    """A fresh process resuming a band-pruned crawl (hive-partitioned
    frontier, manifest-sourced prev_fetched) must produce the same
    fetch schedule as an uninterrupted run."""
    kw = dict(seeds=2000, budget_ms=500)
    a, _ = _run(spark, str(tmp_path / "whole"), band_prune=True,
                rounds=4, **kw)
    wd = str(tmp_path / "resumed")
    b, _ = _run(spark, wd, band_prune=True, rounds=2, **kw)
    # fresh crawler object = fresh process state (bloom, margins)
    c2 = Crawler(spark, wd, budget_ms=500, salt_buckets=4,
                 fetch_partitions=4, band_prune=True)
    ms2 = c2.run(max_rounds=4)
    assert [m["round"] for m in ms2] == [2, 3]
    assert _fetch_schedule(spark, str(tmp_path / "whole"), 4) == \
        _fetch_schedule(spark, wd, 4)
