"""Per-key gate-latency report: run EVERY registered query at the
driver's bench shape (sf0.1, local[SPARK_GRAFT_CPUS]) and record
wall-clock seconds per key to GATE_TIMING.json.

Why (round-3 advice item 6): the driver's CORRECTNESS run samples ~50
of the registered keys — a future sample must never hit a key whose
latency is pathological at the bench scale.  The companion pytest
(tests/test_gate_timing.py) asserts every recorded key stays under
GATE_BUDGET_S and that the artifact covers the full current registry,
so adding a key without re-running this script fails CI.

Usage:  python scripts/gate_timing.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: per-key latency budget at sf0.1 (seconds) — the driver's bench
#: shape.  Tightened 20 → 15 in round 5 (r4 verdict task 7): with the
#: composed attest_* keys in the registry the slowest key measures
#: 11.65 s, so the bound now asserts real headroom instead of just the
#: original cap.
GATE_BUDGET_S = 15.0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "GATE_TIMING.json",
    )
    import __spark_entry__ as entry
    from llm_scraper_spark.session import get_spark

    spark = get_spark("gate-timing")
    qs = entry.queries()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(qs):
        t0 = time.monotonic()
        try:
            rows = qs[name](spark, sf_dir).collect()
            timings[name] = round(time.monotonic() - t0, 3)
            print(f"{name}: {timings[name]:.2f}s ({len(rows)} rows)", flush=True)
        except Exception as exc:  # record, keep sweeping
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"{name}: ERROR {errors[name]}", flush=True)
    art = {
        "sf_dir": sf_dir,
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "budget_s": GATE_BUDGET_S,
        "n_keys": len(qs),
        "slowest": sorted(
            timings, key=timings.__getitem__, reverse=True
        )[:10],
        "timings_s": timings,
        "errors": errors,
    }
    with open(out_path, "w") as f:
        json.dump(art, f, indent=2, sort_keys=False)
        f.write("\n")
    worst = max(timings.values(), default=0.0)
    print(f"wrote {out_path}; worst {worst:.2f}s, errors {len(errors)}")
    return 1 if errors or worst >= GATE_BUDGET_S else 0


if __name__ == "__main__":
    sys.exit(main())
