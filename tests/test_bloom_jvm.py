"""JVM broadcast-bitmap Bloom probe ≡ the numpy probe, and Bloom
correctness invariants (no false negatives)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from llm_scraper_spark.functions.bloom import (
    BloomFilter,
    ShardedBloom,
    bloom_probe_col,
    build_bloom,
    with_bloom_flag,
)


def test_jvm_probe_matches_numpy(spark):
    rng = np.random.default_rng(7)
    added = rng.integers(0, 1 << 62, size=5000, dtype=np.int64)
    probes = np.concatenate(
        [added[:2500], rng.integers(0, 1 << 62, size=5000, dtype=np.int64)]
    )
    bf = BloomFilter.empty(capacity=5000, fpp=0.01)
    bf.add(added.astype(np.uint64))
    want = bf.maybe_contains(probes.astype(np.uint64)).tolist()
    df = spark.createDataFrame([(int(h),) for h in probes], "url_hash long")
    got = [
        r["_maybe_seen"]
        for r in with_bloom_flag(spark, df, bf).collect()
    ]
    assert got == want
    # no false negatives: everything added must be flagged
    assert all(want[:2500])


def test_distributed_build_and_flag(spark):
    rows = [(int(h),) for h in range(10_000, 16_000)]
    seen = spark.createDataFrame(rows, "url_hash long")
    bf = build_bloom(seen, capacity=8192)
    flagged = with_bloom_flag(spark, seen, bf)
    assert flagged.filter(~F.col("_maybe_seen")).count() == 0
    fresh = spark.createDataFrame(
        [(int(h),) for h in range(1_000_000, 1_006_000)], "url_hash long"
    )
    fp = with_bloom_flag(spark, fresh, bf).filter(F.col("_maybe_seen")).count()
    assert fp < 6000 * 0.05  # ~1% fpp with slack


def test_sharded_build_matches_unsharded_semantics(spark):
    """Shard ≡ unsharded on the invariants that matter: identical
    no-false-negative guarantee, comparable fpp, and the JVM sharded
    probe ≡ the pure-Python sharded oracle on every row.

    Keys are drawn uniformly (the filter's input contract: url_hash is
    sha1-derived) — consecutive integers would violate it and collapse
    per-shard probe positions onto gcd(stride, m) residue classes."""
    rng = np.random.default_rng(11)
    added = np.unique(rng.integers(0, 1 << 62, size=8000, dtype=np.int64))
    seen = spark.createDataFrame([(int(h),) for h in added], "url_hash long")
    sharded = build_bloom(seen, capacity=8192, shards=8)
    assert isinstance(sharded, ShardedBloom) and sharded.n_shards == 8
    # no false negatives through the sharded JVM probe
    flagged = with_bloom_flag(spark, seen, sharded)
    assert flagged.filter(~F.col("_maybe_seen")).count() == 0
    # JVM probe ≡ python sharded probe on a mixed added/fresh set
    fresh = rng.integers(0, 1 << 62, size=4000, dtype=np.int64)
    probes = added[:2000].tolist() + fresh.tolist()
    df = spark.createDataFrame([(int(h),) for h in probes], "url_hash long")
    got = {
        r["url_hash"]: r["_maybe_seen"]
        for r in with_bloom_flag(spark, df, sharded).collect()
    }
    want = sharded.maybe_contains(np.asarray(probes, dtype=np.uint64))
    assert [got[h] for h in probes] == want.tolist()
    # fpp comparable to the unsharded filter at the same total capacity
    fp = sum(want[2000:])
    assert fp < 4000 * 0.05
