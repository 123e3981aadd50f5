"""Driver-side crawl loop: rounds as batch jobs over snapshot state.

Iceberg-style state discipline without the Iceberg runtime (not in this
container): every table is a directory of immutable parquet snapshots
plus an atomically-renamed JSON manifest per round.  A round is
*committed* iff its manifest exists; resume replays from the last
committed manifest — killing the driver mid-round and restarting yields
a byte-identical crawl (tested in tests/test_resume.py).

Layout under ``workdir``:
    robots.parquet                 per-host rules (dim table)
    frontier/r{N}.parquet          frontier *entering* round N
    seen/delta_r{N}.parquet        seen-set delta committed by round N
    documents/r{N}.parquet         span documents fetched in round N
    fetch_log/r{N}.parquet         politeness-slotted fetch log
    manifests/r{N}.json            commit record: row counts, metrics,
                                   per-partition lineage

Reference analogs: append-mode output files + manual slice resume
(scrape_eccomerce.py:289 ``"a"`` mode; extract_pages.py:137
``product_urls[355:]``) — replaced by atomic snapshot commits.
SLURM array tasks (llm-scraper-batch.sh:9,106-110) — replaced by Spark
partitions inside each round.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..functions.urls import canonicalize_udf, host_col, url_hash_udf
from ..operators.frontier import run_round


def _manifest_path(workdir: str, r: int) -> str:
    return os.path.join(workdir, "manifests", f"r{r}.json")


def _write_manifest(workdir: str, r: int, payload: dict) -> None:
    os.makedirs(os.path.join(workdir, "manifests"), exist_ok=True)
    tmp = _manifest_path(workdir, r) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.rename(tmp, _manifest_path(workdir, r))  # atomic commit


def seeds_to_frontier(spark: SparkSession, seed_list: list[str]) -> DataFrame:
    """Seed lines → round-0 frontier (S1 + F12: read, canonicalize,
    hash, dedup).  Reference: readlines + set (extract_pages.py:131-132,
    extract_product_urls.py:57)."""
    raw = spark.createDataFrame(
        [(u, i) for i, u in enumerate(seed_list)], "raw string, seed_rank int"
    )
    return (
        raw.withColumn("url", canonicalize_udf("raw"))
        .filter(F.col("url").isNotNull())
        .dropDuplicates(["url"])
        .withColumn("url_hash", url_hash_udf("url"))
        .withColumn("host", host_col(F.col("url")))
        .select(
            "url",
            "url_hash",
            "host",
            F.lit(0.0).alias("priority"),
            F.lit(0).alias("depth"),
            F.lit(0).alias("discovered_round"),
        )
    )


class Crawler:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        *,
        budget_ms: int = 2000,
        salt_buckets: int = 16,
        use_bloom: bool = True,
        fetch_partitions: int | None = None,
    ) -> None:
        self.spark = spark
        self.workdir = workdir
        self.budget_ms = budget_ms
        self.salt_buckets = salt_buckets
        self.use_bloom = use_bloom
        self.fetch_partitions = fetch_partitions

    # ---- state io ------------------------------------------------------
    def _p(self, *parts: str) -> str:
        return os.path.join(self.workdir, *parts)

    def init_state(self, seed_list: list[str], robots_rows: list[dict]) -> None:
        os.makedirs(self.workdir, exist_ok=True)
        self.spark.createDataFrame(robots_rows, schemas.ROBOTS).coalesce(1).write.mode(
            "overwrite"
        ).parquet(self._p("robots.parquet"))
        seeds_to_frontier(self.spark, seed_list).write.mode("overwrite").parquet(
            self._p("frontier", "r0.parquet")
        )

    def last_committed_round(self) -> int:
        """-1 if no round has committed yet."""
        mdir = self._p("manifests")
        if not os.path.isdir(mdir):
            return -1
        rounds = [
            int(f[1:-5]) for f in os.listdir(mdir) if f.startswith("r") and f.endswith(".json")
        ]
        return max(rounds, default=-1)

    def seen_df(self, upto_round: int) -> DataFrame:
        paths = [
            self._p("seen", f"delta_r{i}.parquet")
            for i in range(upto_round + 1)
            if os.path.isdir(self._p("seen", f"delta_r{i}.parquet"))
        ]
        if not paths:
            return self.spark.createDataFrame([], schemas.SEEN)
        return self.spark.read.parquet(*paths)

    def _multi(self, sub: str, upto_round: int | None = None) -> DataFrame:
        d = self._p(sub)
        last = self.last_committed_round() if upto_round is None else upto_round
        paths = [
            os.path.join(d, f"r{i}.parquet")
            for i in range(last + 1)
            if os.path.isdir(os.path.join(d, f"r{i}.parquet"))
        ]
        return self.spark.read.parquet(*paths)

    def fetch_log_df(self) -> DataFrame:
        return self._multi("fetch_log")

    def documents_df(self) -> DataFrame:
        return self._multi("documents")

    # ---- the loop --------------------------------------------------------
    def run(self, max_rounds: int) -> list[dict]:
        """Run (or resume) the crawl; returns committed manifests."""
        robots = self.spark.read.parquet(self._p("robots.parquet"))
        manifests: list[dict] = []
        start_round = self.last_committed_round() + 1
        seen_rows = 0
        if start_round > 0:
            with open(_manifest_path(self.workdir, start_round - 1)) as f:
                seen_rows = json.load(f)["seen_total"]

        for r in range(start_round, max_rounds):
            fpath = self._p("frontier", f"r{r}.parquet")
            if not os.path.isdir(fpath):
                break
            frontier = self.spark.read.parquet(fpath)
            if not frontier.head(1):
                break
            t0 = time.monotonic()
            seen = self.seen_df(r - 1)
            res = run_round(
                self.spark,
                frontier,
                seen,
                robots,
                round_no=r,
                budget_ms=self.budget_ms,
                salt_buckets=self.salt_buckets,
                use_bloom=self.use_bloom,
                fetch_partitions=self.fetch_partitions,
                seen_count_estimate=seen_rows if self.use_bloom else None,
            )
            # materialize snapshots (each write is one job over cached state)
            res.documents.write.mode("overwrite").parquet(
                self._p("documents", f"r{r}.parquet")
            )
            res.fetch_log.write.mode("overwrite").parquet(
                self._p("fetch_log", f"r{r}.parquet")
            )
            res.seen_delta.write.mode("overwrite").parquet(
                self._p("seen", f"delta_r{r}.parquet")
            )
            res.next_frontier.write.mode("overwrite").parquet(
                self._p("frontier", f"r{r + 1}.parquet")
            )

            # lineage + metrics from the written snapshots (parquet
            # footers make counts cheap; no extra shuffle)
            log = self.spark.read.parquet(self._p("fetch_log", f"r{r}.parquet"))
            lineage = [
                {"partition": int(row["pid"]), "rows": int(row["rows"])}
                for row in log.groupBy(F.spark_partition_id().alias("pid"))
                .agg(F.count("*").alias("rows"))
                .collect()
            ]
            fetched = sum(x["rows"] for x in lineage)
            delta_rows = self.spark.read.parquet(
                self._p("seen", f"delta_r{r}.parquet")
            ).count()
            next_frontier_rows = self.spark.read.parquet(
                self._p("frontier", f"r{r + 1}.parquet")
            ).count()
            seen_rows += delta_rows
            elapsed = time.monotonic() - t0
            manifest = {
                "round": r,
                "fetched": fetched,
                "seen_delta": delta_rows,
                "seen_total": seen_rows,
                "next_frontier": next_frontier_rows,
                "elapsed_sec": round(elapsed, 3),
                "urls_per_sec": round(fetched / elapsed, 2) if elapsed > 0 else None,
                "partition_lineage": sorted(lineage, key=lambda x: x["partition"]),
            }
            _write_manifest(self.workdir, r, manifest)
            manifests.append(manifest)
            res.unpersist()
            if next_frontier_rows == 0:
                break
        return manifests
