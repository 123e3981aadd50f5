import pytest

from llm_scraper_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("llm-scraper-spark-tests", cores=4, shuffle_partitions=8)
    yield s
