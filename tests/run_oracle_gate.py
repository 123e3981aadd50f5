"""Run the full driver-style correctness gate locally.

For every key in ``__spark_entry__.queries()``: run the Spark query and
its DuckDB oracle twin at sf0.01, compare columns/rows/values, print a
one-line verdict per query.  Exit non-zero if any mismatch.

Usage: python tests/run_oracle_gate.py [sf_dir] [only_key ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from llm_scraper_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402
from tests.oracle_check import assert_matches, duck_run  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                assert_matches(df, oracles[name], sf_dir, name)
                verdict = "MATCH"
            else:
                n = df.count()
                verdict = f"ROWS-ONLY ({n} rows)"
        except Exception as e:  # pragma: no cover
            verdict = f"FAIL: {e}"
            failures.append(name)
            traceback.print_exc()
        print(f"{name:32s} {verdict}  [{time.time()-t0:.1f}s]")
    missing_oracle = [k for k in qs if k not in oracles]
    extra_oracle = [k for k in oracles if k not in qs]
    if missing_oracle:
        print("no-oracle (rows-only) keys:", missing_oracle)
    if extra_oracle:
        print("WARNING: oracle without query:", extra_oracle)
        failures.extend(extra_oracle)
    print(f"=== {len(failures)} failures of {len(qs)} queries ===")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
