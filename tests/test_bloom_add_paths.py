"""The two BloomFilter.add code paths must be bit-identical.

``add`` picks between a boolean-scatter+packbits fast path (small
bitmaps, big batches) and the in-place ``bitwise_or.at`` fallback
(huge bitmaps / tiny batches).  Seen-set correctness rides on the two
producing the same words: a divergence is a silent false negative
(re-fetch) or false positive (extra join probe) depending on which
side built vs probed.  No Spark needed — pure numpy.
"""

import numpy as np

from llm_scraper_spark.functions.bloom import BloomFilter


def _fresh_pair(capacity: int) -> tuple[BloomFilter, BloomFilter]:
    a = BloomFilter.empty(capacity)
    b = BloomFilter.empty(capacity)
    assert a.m_bits == b.m_bits and a.k == b.k
    return a, b


def _force_fallback(bf: BloomFilter, hashes: np.ndarray) -> None:
    idx = bf._indices(np.asarray(hashes, dtype=np.uint64)).ravel()
    np.bitwise_or.at(
        bf.words, (idx // 64).astype(np.int64), np.uint64(1) << (idx % 64)
    )


def test_packbits_path_matches_fallback_bitwise():
    rng = np.random.default_rng(7)
    # 200k hashes >= the 4096 batch floor, capacity small enough that
    # m_bits stays under the 1<<30 gate -> add() takes the fast path.
    hashes = rng.integers(0, 1 << 63, size=200_000, dtype=np.uint64)
    fast, slow = _fresh_pair(capacity=500_000)
    assert fast.m_bits <= (1 << 30)
    fast.add(hashes)
    _force_fallback(slow, hashes)
    assert np.array_equal(fast.words, slow.words)
    # And the probe side agrees on both: everything added is found.
    assert fast.maybe_contains(hashes).all()
    assert slow.maybe_contains(hashes).all()


def test_small_batch_takes_fallback_and_accumulates():
    rng = np.random.default_rng(11)
    bf, ref = _fresh_pair(capacity=100_000)
    # Many small adds (below the 4096 floor -> fallback) must equal one
    # big fast-path add of the same union.
    chunks = [rng.integers(0, 1 << 63, size=300, dtype=np.uint64) for _ in range(20)]
    for c in chunks:
        bf.add(c)
    ref.add(np.concatenate(chunks))
    assert np.array_equal(bf.words, ref.words)


def test_top_bit_hashes_identical_across_paths():
    # Hashes with bit 63 set exercise the mask-first contract in
    # _indices; both add paths consume the same indices.
    hashes = (np.arange(8192, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1 << 63)
    fast, slow = _fresh_pair(capacity=50_000)
    fast.add(hashes)
    _force_fallback(slow, hashes)
    assert np.array_equal(fast.words, slow.words)
