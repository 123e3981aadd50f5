"""Extended TPC-H shapes / rollup / as-of join vs DuckDB at sf0.001."""

import pytest

from llm_scraper_spark.operators.tpch_extra import ORACLE_SQL, QUERIES
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    assert name in ORACLE_SQL, f"{name} missing oracle SQL"
    df = QUERIES[name](spark, SF_DIR)
    assert_matches(df, ORACLE_SQL[name], SF_DIR, name)
