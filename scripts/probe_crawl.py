#!/usr/bin/env python
"""Long-crawl scale probe — the dedicated evidence run for the
steady-state regime the 2-round criterion legs cannot reach
(10^7+-row frontiers, budget-limited rounds, compaction cycles).

Runs one multi-round crawl over the 4096-host bench web and dumps a
JSON artifact with per-round phase profiles plus (band_prune mode)
the frontier-log state per round: generations alive, live rows,
bands read/passthrough, fallbacks, compactions.  The r4 probes
(BENCH_PROBE_10M*.json) were this shape; round 5 adds the
log-structured-frontier columns so O(delta) round IO is auditable
(write_next_frontier flat vs frontier growth).

    python -m scripts.probe_crawl --seeds 10000000 --rounds 24 \
        --budget-ms 30000 --cores 32 --band-prune --out PROBE.json
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, required=True)
    ap.add_argument("--rounds", type=int, required=True)
    ap.add_argument("--budget-ms", type=int, default=30000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--band-prune", action="store_true")
    ap.add_argument("--compact-gens", type=int, default=8)
    ap.add_argument("--compact-every", type=int, default=8)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--keep-workdir", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from llm_scraper_spark.bench_crawl import _clock_probe
    from llm_scraper_spark.plans.crawler import Crawler
    from llm_scraper_spark.session import get_spark
    from llm_scraper_spark.sources.synthweb import (
        bench_robots_rows,
        bench_seed_urls,
    )

    clock_pre = _clock_probe()
    spark = get_spark(
        f"probe-crawl-{args.cores}",
        cores=args.cores,
        shuffle_partitions=max(4 * args.cores, 8),
    )
    workdir = args.workdir or tempfile.mkdtemp(prefix="probe_crawl_")
    t0 = time.monotonic()
    try:
        crawler = Crawler(
            spark,
            workdir,
            budget_ms=args.budget_ms,
            salt_buckets=32,
            use_bloom=True,
            fetch_partitions=max(2 * args.cores, 8),
            band_prune=args.band_prune,
            frontier_compact_gens=args.compact_gens,
            compact_every=args.compact_every,
        )
        crawler.init_state(bench_seed_urls(args.seeds), bench_robots_rows())
        manifests = crawler.run(max_rounds=args.rounds)
        elapsed = time.monotonic() - t0
        steady = manifests[1:] or manifests
        rounds_detail = []
        for m in manifests:
            row = {
                "round": m["round"],
                "fetched": m["fetched"],
                "seen_total": m["seen_total"],
                "next_frontier": m["next_frontier"],
                "elapsed_sec": m["elapsed_sec"],
                "phase_sec": m["phase_sec"],
            }
            if "band_prune" in m:
                row["band_prune"] = m["band_prune"]
                row["prune_fallback"] = m.get("prune_fallback")
            if "frontier_log" in m:
                live = m["frontier_log"]["live"]
                row["flog"] = {
                    "generations": len({u["gen"] for u in live}),
                    "units": len(live),
                    "live_rows": sum(u["rows"] for u in live),
                }
            rounds_detail.append(row)
        out = {
            "probe": "long-crawl",
            "cores": args.cores,
            "seeds": args.seeds,
            "budget_ms": args.budget_ms,
            "band_prune": args.band_prune,
            "frontier_compact_gens": args.compact_gens,
            "compact_every": args.compact_every,
            "rounds": len(manifests),
            "fetched": sum(m["fetched"] for m in manifests),
            "seen_delta": sum(m["seen_delta"] for m in manifests),
            "elapsed_sec": round(sum(m["elapsed_sec"] for m in manifests), 3),
            "wall_sec": round(elapsed, 3),
            "urls_per_sec": round(
                sum(m["fetched"] for m in manifests)
                / sum(m["elapsed_sec"] for m in manifests),
                2,
            ),
            "steady_urls_per_sec": round(
                sum(m["fetched"] for m in steady)
                / sum(m["elapsed_sec"] for m in steady),
                2,
            ),
            "clock_probe": {"pre": clock_pre, "post": _clock_probe()},
            "rounds_detail": rounds_detail,
        }
        text = json.dumps(out, indent=1)
        if args.out:
            with open(args.out, "w") as f:
                f.write(text)
        print(text)
    finally:
        if not args.keep_workdir:
            shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
