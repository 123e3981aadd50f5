"""One crawl round as a pure DataFrame job — the heart of the north rule.

Pipeline per round (SURVEY.md §3.1 "Spark lifecycle equivalent"):

    frontier ⟕anti seen (Bloom-prefiltered, exact-confirmed)
      → robots gate (broadcast dim join)
      → per-host politeness slots (window) → eligible/deferred split
      → salted host-hash repartition → mapInPandas fetch+extract
      → outlink canonicalization (Arrow UDF) → next-frontier delta
      → seen delta

Reference analogs:
- anti-join seen:   ``if page.url not in VISITED`` / ``set`` membership
                    (extract_product_urls.py:39-41,57; db.py:76-79) — J3
- politeness slots: fixed per-page sleeps (scrape_eccomerce.py:55,
                    121-124) — W2; here slot*crawl_delay_ms is the
                    host-local fetch time, budget_ms caps a round
- pagination BFS:   round-r frontier = links(round r−1) anti-join seen
                    (extract_product_urls.py:121-133) — W3
- robots gate:      absent in the reference; required by the north rule

Everything is DataFrame ops + Arrow pandas UDFs; there is no driver-side
iteration over rows anywhere (the frontier is never collected).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.bloom import BloomFilter, build_bloom, with_bloom_flag
from ..functions.urls import canonicalize_with_base_udf, host_col, url_hash_udf
from ..sources.synthweb import fetch_batch

DEFAULT_CRAWL_DELAY_MS = 1000

_FETCH_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>, outlinks array<string>, "
    "depth int, slot int, priority double, url_hash long, host string"
)


@dataclass
class RoundResult:
    fetch_log: DataFrame      # FETCH_LOG schema
    documents: DataFrame      # (doc_id, spans, round)
    seen_delta: DataFrame     # SEEN schema (fetched + robots-blocked)
    next_frontier: DataFrame  # FRONTIER schema (deferred ∪ new links)
    metrics: dict = field(default_factory=dict)
    _cached: list = field(default_factory=list)

    def unpersist(self) -> None:
        for df in self._cached:
            df.unpersist()


def _fetch_map(iterator):
    """mapInPandas kernel: Arrow batches of eligible frontier rows →
    (doc_id, spans, outlinks) via the deterministic synthetic web.
    Pass-through of slot/priority/etc. keeps the fetch log join-free."""
    for pdf in iterator:
        fetched = fetch_batch(pdf["url"])
        fetched["depth"] = pdf["depth"].values
        fetched["slot"] = pdf["slot"].values
        fetched["priority"] = pdf["priority"].values
        fetched["url_hash"] = pdf["url_hash"].values
        fetched["host"] = pdf["host"].values
        yield fetched


def run_round(
    spark: SparkSession,
    frontier: DataFrame,
    seen: DataFrame,
    robots: DataFrame,
    *,
    round_no: int,
    budget_ms: int = 2000,
    fetch_partitions: int | None = None,
    salt_buckets: int = 16,
    bloom: BloomFilter | None = None,
    use_bloom: bool = True,
    seen_count_estimate: int | None = None,
) -> RoundResult:
    """Execute crawl round ``round_no``; all outputs are lazy DataFrames.

    ``salt_buckets``: the hot-host skew defense — fetch partitioning is
    on (host, salt) where salt = url_hash % salt_buckets, so one hot
    host spreads over ``salt_buckets`` partitions instead of one.
    """
    if fetch_partitions is None:
        fetch_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    # --- J3: frontier anti-join seen, Bloom-prefiltered ----------------
    if use_bloom and bloom is None and seen_count_estimate:
        bloom = build_bloom(seen, capacity=max(seen_count_estimate * 2, 4096))
    if use_bloom and bloom is not None:
        flagged = with_bloom_flag(spark, frontier, bloom)
        fresh = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
        maybe = (
            flagged.filter(F.col("_maybe_seen"))
            .drop("_maybe_seen")
            .join(seen.select("url_hash", "url"), ["url_hash", "url"], "left_anti")
        )
        candidates = fresh.unionByName(maybe)
    else:
        candidates = frontier.join(
            seen.select("url_hash", "url"), ["url_hash", "url"], "left_anti"
        )

    # --- robots gate (broadcast: robots is a per-host dim table) -------
    path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    gated = candidates.join(F.broadcast(robots), "host", "left").withColumn(
        "_blocked",
        F.col("disallow_prefix").isNotNull()
        & path.startswith(F.col("disallow_prefix")),
    )
    blocked_seen = (
        gated.filter(F.col("_blocked"))
        .select("url_hash", "url", F.lit(round_no).alias("first_round"))
    )
    allowed = gated.filter(~F.col("_blocked"))

    # --- W2: per-host politeness slots ---------------------------------
    delay = F.coalesce(F.col("crawl_delay_ms"), F.lit(DEFAULT_CRAWL_DELAY_MS))
    budget = F.greatest(F.lit(1), F.floor(F.lit(budget_ms) / delay)).cast("int")
    w = Window.partitionBy("host").orderBy("priority", "url_hash")
    # persisted: both the eligible and deferred splits read this, and the
    # window shuffle should run once per round
    slotted = (
        allowed.withColumn("slot", F.row_number().over(w))
        .withColumn("_budget", budget)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    eligible = slotted.filter(F.col("slot") <= F.col("_budget"))
    deferred = slotted.filter(F.col("slot") > F.col("_budget")).select(
        "url", "url_hash", "host", "priority", "depth", "discovered_round"
    )

    # --- fetch: salted host-hash repartition → Arrow fetch kernel ------
    to_fetch = eligible.select(
        "url", "url_hash", "host", "priority", "depth", "slot"
    ).withColumn("_salt", F.pmod(F.col("url_hash"), F.lit(salt_buckets)))
    # persisted: four outputs (log/documents/seen-delta/links) consume the
    # fetch result; without caching the fetch kernel would run 4×
    fetched = (
        to_fetch.repartition(fetch_partitions, F.col("host"), F.col("_salt"))
        .drop("_salt")
        .mapInPandas(_fetch_map, _FETCH_SCHEMA)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    fetch_log = fetched.select(
        F.lit(round_no).alias("round"),
        "slot",
        "host",
        F.col("doc_id").alias("url"),
        "url_hash",
        "priority",
        "depth",
    )
    documents = fetched.select("doc_id", "spans", F.lit(round_no).alias("round"))
    seen_delta = fetched.select(
        "url_hash",
        F.col("doc_id").alias("url"),
        F.lit(round_no).alias("first_round"),
    ).unionByName(blocked_seen)

    # --- W3: next frontier = canonicalized outlinks ⟕anti (seen∪delta∪deferred)
    raw_links = fetched.select(
        F.col("doc_id").alias("base"), "depth", F.explode("outlinks").alias("raw")
    )
    canon = (
        raw_links.withColumn("url", canonicalize_with_base_udf("raw", "base"))
        .filter(F.col("url").isNotNull())
        .groupBy("url")
        .agg((F.min("depth") + 1).alias("depth"))
        .withColumn("url_hash", url_hash_udf("url"))
        .withColumn("host", host_col(F.col("url")))
        .withColumn("priority", F.col("depth").cast("double"))
        .withColumn("discovered_round", F.lit(round_no + 1))
    )
    new_links = (
        canon.join(seen.select("url_hash", "url"), ["url_hash", "url"], "left_anti")
        .join(seen_delta.select("url_hash", "url"), ["url_hash", "url"], "left_anti")
        .join(deferred.select("url_hash", "url"), ["url_hash", "url"], "left_anti")
        .select("url", "url_hash", "host", "priority", "depth", "discovered_round")
    )
    next_frontier = deferred.unionByName(new_links)

    return RoundResult(
        fetch_log=fetch_log,
        documents=documents,
        seen_delta=seen_delta,
        next_frontier=next_frontier,
        metrics={"round": round_no},
        _cached=[slotted, fetched],
    )
