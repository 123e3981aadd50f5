"""Similarity search + text analysis vs DuckDB oracles; ANN recall check."""

import pytest

from llm_scraper_spark.operators import similarity, textstats
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(similarity.QUERIES))
def test_similarity_matches_oracle(spark, name):
    assert_matches(
        similarity.QUERIES[name](spark, SF_DIR),
        similarity.ORACLE_SQL[name],
        SF_DIR,
        name,
    )


@pytest.mark.parametrize("name", sorted(textstats.QUERIES))
def test_textstats_matches_oracle(spark, name):
    assert_matches(
        textstats.QUERIES[name](spark, SF_DIR),
        textstats.ORACLE_SQL[name],
        SF_DIR,
        name,
    )


def test_ann_is_subset_of_bruteforce_candidates(spark):
    """Every ANN neighbor must be a real vector, ranks contiguous —
    and the result NON-VACUOUS: with the adaptive key width every
    query must fill its full top-k at this corpus size (a fixed 16-bit
    key once made every bucket a singleton and this test passed on
    zero rows)."""
    rows = similarity.QUERIES["ann_lsh_topk"](spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert len(by_q) == similarity.N_QUERIES, "every query needs candidates"
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, similarity.TOP_K + 1)), q


def test_adaptive_bits_matches_sql_formula():
    """`_adaptive_bits` (Python, drives the Spark plan) and the kbits
    CTE (DuckDB twin) must pick the identical key width at any corpus
    size — integer bit_length vs length(bin(m-1))."""
    import duckdb

    s = similarity
    for n in (1, 7, 32, 33, 500, 2000, 5000, 64_000, 10**6, 10**9, 10**12):
        m = (n + s.TARGET_BUCKET - 1) // s.TARGET_BUCKET
        sql_k = duckdb.sql(
            f"SELECT CASE WHEN {m} <= 1 THEN {s.MIN_BITS} "
            f"ELSE least({s.N_PLANES}, greatest({s.MIN_BITS}, "
            f"length(bin({m} - 1)))) END"
        ).fetchone()[0]
        assert s._adaptive_bits(n) == sql_k, n
    # the clamps actually engage at the extremes
    assert s._adaptive_bits(10) == s.MIN_BITS
    assert s._adaptive_bits(10**12) == s.N_PLANES


def test_bigram_lm_prefers_repeated_sequences(spark):
    """A doc made of one repeated bigram pattern must score lower mean
    bigram surprisal than a doc of corpus-unique bigrams, under the
    corpus LM trained on both; n_bigrams == tokens − 1."""
    import os
    import tempfile

    from llm_scraper_spark.operators.textstats import bigram_lm_score

    docs = [
        (1, "alpha beta " * 20),             # one bigram, 39 repeats
        (2, "cat dog bird fish wolf bear fox hen owl elk"),  # all unique
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in bigram_lm_score(spark, d).collect()}
    assert out[1].n_bigrams == 39
    assert out[2].n_bigrams == 9
    assert out[1].mean_surprisal_fp < out[2].mean_surprisal_fp
