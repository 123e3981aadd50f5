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


def test_top_bit_hashes_route_identically(spark):
    """Hashes ≥ 2^63 (negative as int64 — outside the 63-bit url_hash
    contract, but build_bloom accepts arbitrary frames): the JVM probe
    and the Python build/oracle must still agree on shard routing
    (signed floor-mod both sides) and probe positions (bit 63 masked
    both sides) — no false negatives, even with a non-power-of-two
    shard count."""
    rng = np.random.default_rng(23)
    # top bit set → negative int64
    added = (rng.integers(0, 1 << 62, size=3000, dtype=np.int64)) | np.int64(
        -(1 << 63)
    )
    seen = spark.createDataFrame([(int(h),) for h in added], "url_hash long")
    for shards in (1, 5):  # 5: non-power-of-two, the divergent case
        bf = build_bloom(seen, capacity=4096, shards=shards)
        flagged = with_bloom_flag(spark, seen, bf)
        assert flagged.filter(~F.col("_maybe_seen")).count() == 0, shards
        want = bf.maybe_contains(added.view(np.uint64))
        assert want.all(), shards


def test_staged_bitmaps_scoped_per_bloom(spark):
    """Two blooms interleaving ships must not delete each other's
    staged files: each owner retains its own 2 most recent."""
    from llm_scraper_spark.functions.bloom import bitmap_df

    a = BloomFilter.empty(capacity=2048)
    b = BloomFilter.empty(capacity=2048)
    a.add(np.arange(100, dtype=np.uint64))
    b.add(np.arange(200, 300, dtype=np.uint64))
    df_a = bitmap_df(spark, a)
    for _ in range(4):  # 4 later ships from ANOTHER bloom
        bitmap_df(spark, b)
    # df_a's staged file must still be readable (old global keep-2
    # would have deleted it)
    assert df_a.count() == 1
    assert len(a._stage_paths) <= 2 and len(b._stage_paths) <= 2


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
