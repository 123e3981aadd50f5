"""Crawl-throughput benchmark job — run once per parallelism level.

Measures URLs fetched+deduped per second over the 4096-host bench web
(the BASELINE.json headline metric).  Invoked as a subprocess by
bench.py at two core counts (N and 4N) on the *same* input to evidence
the scaling-efficiency criterion without a real cluster:

    python -m llm_scraper_spark.bench_crawl --cores 8 --seeds 20000
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile

from .plans.crawler import Crawler
from .session import get_spark
from .sources.synthweb import bench_robots_rows, bench_seed_urls


def run(cores: int, seeds: int, rounds: int, budget_ms: int) -> dict:
    spark = get_spark(
        f"bench-crawl-{cores}", cores=cores, shuffle_partitions=max(cores, 8)
    )
    workdir = tempfile.mkdtemp(prefix=f"bench_crawl_{cores}_")
    try:
        crawler = Crawler(
            spark,
            workdir,
            budget_ms=budget_ms,
            salt_buckets=32,
            use_bloom=True,
            fetch_partitions=max(cores, 8),
        )
        crawler.init_state(bench_seed_urls(seeds), bench_robots_rows())
        manifests = crawler.run(max_rounds=rounds)
        fetched = sum(m["fetched"] for m in manifests)
        deduped = sum(m["seen_delta"] for m in manifests)
        elapsed = sum(m["elapsed_sec"] for m in manifests)
        return {
            "cores": cores,
            "rounds": len(manifests),
            "fetched": fetched,
            "seen_delta": deduped,
            "elapsed_sec": round(elapsed, 3),
            "urls_per_sec": round(fetched / elapsed, 2) if elapsed else None,
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--seeds", type=int, default=20000)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--budget-ms", type=int, default=60000)
    args = ap.parse_args()
    print(json.dumps(run(args.cores, args.seeds, args.rounds, args.budget_ms)))
