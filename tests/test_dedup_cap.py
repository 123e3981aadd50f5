"""Hot-bucket cap + short-doc shingle fallback (dedup scale hardening).

A degenerate LSH bucket (boilerplate text shared by ~90 docs, > the
MAX_BUCKET=64 cap) must NOT go quadratic in the candidate join — its
pairs are excluded, while exact dedup still catches the identical
copies.  Docs with <3 words fall back to a whole-text singleton
shingle, so tiny duplicates are no longer silently exempt from
MinHash dedup.
"""

from __future__ import annotations

import pytest

from llm_scraper_spark.operators.dedup import (
    MAX_BUCKET,
    dedup_exact,
    dedup_minhash_lsh,
)

BOILER = (
    "the same boilerplate navigation footer text repeated across "
    "every page of the site"
)
NEAR_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
NEAR_B = NEAR_A + " tail"
TINY = "hi there"

# ids avoid doc_id%10==0 and %17==0 so the corpus-augmentation CTE
# (near/exact copies) stays out of the expected output
BOILER_IDS = [i for i in range(10001, 10121) if i % 10 != 0 and i % 17 != 0][:90]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    rows = [(i, BOILER) for i in BOILER_IDS]
    rows += [(3, NEAR_A), (7, NEAR_B), (9, TINY), (11, TINY)]
    d = str(tmp_path_factory.mktemp("dedupcap"))
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    return d


def test_degenerate_bucket_capped(spark, corpus_dir):
    assert len(BOILER_IDS) > MAX_BUCKET
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, corpus_dir).collect()
    }
    boiler = set(BOILER_IDS)
    assert not any(a in boiler and b in boiler for a, b in pairs), (
        "capped bucket must emit no candidate pairs"
    )
    assert (3, 7) in pairs, "normal near-dup pair must survive the cap"


def test_exact_path_still_catches_boilerplate(spark, corpus_dir):
    rows = {r["keeper_doc_id"]: r["n_copies"] for r in dedup_exact(spark, corpus_dir).collect()}
    assert rows[min(BOILER_IDS)] == len(BOILER_IDS)


def test_tiny_docs_dedup_via_singleton_shingle(spark, corpus_dir):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_minhash_lsh(spark, corpus_dir).collect()
    }
    assert got.get((9, 11)) == 1.0
