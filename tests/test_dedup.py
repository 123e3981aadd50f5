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


def test_incremental_finds_planted_cross_shard_dups(spark):
    """Every planted new-shard duplicate must be matched back to its
    existing-corpus source: exact copies at jaccard 1.0, near copies
    above threshold; true-novelty shard docs must not match."""
    from llm_scraper_spark.operators.dedup import INC_EXACT_ID, INC_NEAR_ID

    rows = QUERIES["dedup_incremental"](spark, SF_DIR).collect()
    assert rows, "planted cross-shard duplicates must be found"
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r["batch_doc"], []).append(r)
    import duckdb

    existing = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF_DIR}/documents.parquet' "
            f"WHERE doc_id % 10 <> 0"
        ).fetchall()
    ]
    for d in existing:
        if d % 13 == 0:
            hits = by_batch.get(d + INC_EXACT_ID, [])
            assert any(
                h["corpus_doc"] == d and h["jaccard"] == 1.0 for h in hits
            ), f"exact copy of {d} not matched"
        if d % 11 == 0:
            hits = by_batch.get(d + INC_NEAR_ID, [])
            assert any(h["corpus_doc"] == d for h in hits), (
                f"near copy of {d} not matched"
            )
    # side correctness: matches always point FROM the new shard INTO
    # the existing corpus (the corpus has natural near-dups — e.g. doc
    # 0 ≈ doc 50 — so novel shard docs may legitimately match too)
    for r in rows:
        assert r["corpus_doc"] % 10 != 0 and r["corpus_doc"] < INC_NEAR_ID
        assert r["batch_doc"] % 10 == 0 or r["batch_doc"] >= INC_NEAR_ID


def test_lsh_eval_precision_is_exact_and_recall_full_here(spark):
    """Precision is 1.0 by construction (candidates are exact-verified)
    and on this corpus the 4-band/8-hash config catches every true
    ≥0.5-Jaccard pair, so recall is 1.0 too — a regression tripwire on
    both the banding and the verification."""
    from llm_scraper_spark.operators.dedup import EVAL_SCALE, dedup_lsh_eval

    row = dedup_lsh_eval(spark, SF_DIR).collect()[0]
    assert row.n_true > 0
    assert row.precision_units == EVAL_SCALE
    assert row.recall_units == EVAL_SCALE
    assert row.n_hit == row.n_true == row.n_lsh
