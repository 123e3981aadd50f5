"""Structured Streaming + multimodal plumbing vs DuckDB oracles."""

import pytest

from llm_scraper_spark.operators import multimodal
from llm_scraper_spark.streaming import jobs
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(jobs.QUERIES))
def test_streaming_matches_oracle(spark, name):
    assert_matches(jobs.QUERIES[name](spark, SF_DIR), jobs.ORACLE_SQL[name], SF_DIR, name)


@pytest.mark.parametrize("name", sorted(multimodal.QUERIES))
def test_multimodal_matches_oracle(spark, name):
    assert_matches(
        multimodal.QUERIES[name](spark, SF_DIR),
        multimodal.ORACLE_SQL[name],
        SF_DIR,
        name,
    )


def test_real_decode_is_gated(spark):
    with pytest.raises(NotImplementedError):
        next(multimodal.real_decode(iter([])))
