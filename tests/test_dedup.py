"""Dedup suite vs DuckDB oracles; plus planted-duplicate recall checks."""

import pytest

from llm_scraper_spark.operators.dedup import ORACLE_SQL, QUERIES
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_dedup_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches(df, ORACLE_SQL[name], SF_DIR, name)


def test_exact_dedup_finds_planted_copies(spark):
    rows = QUERIES["dedup_exact"](spark, SF_DIR).collect()
    # every doc_id%17==0 original got an exact copy planted at +2e6
    assert rows, "planted exact duplicates must be found"
    assert all(r["n_copies"] == 2 for r in rows)


def test_minhash_finds_planted_near_dups(spark):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash_lsh"](spark, SF_DIR).collect()
    }
    exhaustive = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).collect()
    }
    # planted near-dups (original, original+1e6) should mostly be caught
    planted = {p for p in exhaustive if p[1] - p[0] == 1000000}
    assert planted, "exhaustive jaccard must see the planted near-dups"
    caught = planted & pairs
    assert len(caught) >= 0.8 * len(planted), (len(caught), len(planted))
    # LSH returns a subset of the exhaustive ground truth (same verifier)
    assert pairs <= exhaustive
