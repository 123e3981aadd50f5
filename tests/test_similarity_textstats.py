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
    """Every ANN neighbor must be a real vector, ranks contiguous."""
    rows = similarity.QUERIES["ann_lsh_topk"](spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
