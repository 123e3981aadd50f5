"""doc_fingerprint winnowing: Spark ≡ pure-Python reference
implementation of Schleimer-Wilkerson-Aiken selection, plus the
guarantee property — two docs sharing a substring of ≥ w+k−1 chars
share at least one selected fingerprint."""

from __future__ import annotations

import hashlib

import pytest

from llm_scraper_spark.operators.textstats import (
    FP_K,
    FP_W,
    doc_fingerprint,
    winnow_postings,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _winnow_py(text: str, k: int = FP_K, w: int = FP_W) -> set[int]:
    words = text.split(" ")
    if len(words) < k:
        grams = [_h60(text)]
    else:
        grams = [
            _h60(" ".join(words[i : i + k])) for i in range(len(words) - k + 1)
        ]
    n_windows = max(len(grams) - w + 1, 1)
    return {min(grams[j : j + w]) for j in range(n_windows)}


# docs 5/6 share a contiguous run of 12 words ≥ w+k-1 = 10 — the
# winnowing guarantee threshold at word granularity
_SHARED = "one two three four five six seven eight nine ten eleven twelve"
DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "hi"),
    (3, "ab"),
    (4, "aa aa aa aa aa aa aa aa aa aa aa"),
    (5, _SHARED),
    (6, "prefix words then " + _SHARED + " trailing bit"),
]


@pytest.fixture(scope="module")
def fp_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("winnow"))
    spark.createDataFrame(DOCS, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    return d


def _postings(spark, fp_dir):
    docs = spark.read.parquet(f"{fp_dir}/documents.parquet")
    got: dict[int, set[int]] = {}
    for r in winnow_postings(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    return got


def test_spark_matches_python_winnowing(spark, fp_dir):
    got = _postings(spark, fp_dir)
    for doc_id, text in DOCS:
        assert got[doc_id] == _winnow_py(text), doc_id


def test_shared_substring_guarantee(spark, fp_dir):
    # docs 5 and 6 share >> w+k-1 = 12 chars of contiguous text
    got = _postings(spark, fp_dir)
    assert got[5] & got[6], "winnowing guarantee violated"


def test_checksum_query_consistent_with_postings(spark, fp_dir):
    got = _postings(spark, fp_dir)
    for r in doc_fingerprint(spark, fp_dir).collect():
        fps = got[r["doc_id"]]
        xor = 0
        for fp in fps:
            xor ^= fp
        assert r["n_fps"] == len(fps)
        assert r["fp_min"] == min(fps) and r["fp_max"] == max(fps)
        assert r["fp_xor"] == xor
