"""Bucketed-table layout contract: joins and aggregations on the
bucket key must plan WITHOUT any Exchange (that is the whole point of
paying the shuffle at write time), and results must equal the plain
path exactly."""

import pytest

from pyspark.sql import functions as F

from llm_scraper_spark.sources import warehouse

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # keep the optimizer honest: tiny test tables would otherwise
    # broadcast, which proves nothing about the bucketed layout
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    embs = spark.read.parquet(f"{SF}/embeddings.parquet").withColumnRenamed(
        "vec_id", "doc_id"
    )
    warehouse.write_bucketed(docs, "wh_docs", "doc_id")
    warehouse.write_bucketed(embs, "wh_embs", "doc_id")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    for t in ("wh_docs", "wh_embs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_colocated_join_has_no_exchange(bucketed_tables):
    spark = bucketed_tables
    j = warehouse.colocated_join(spark, "wh_docs", "wh_embs", "doc_id")
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert plan.count("Bucketed: true") == 2


def test_write_side_sort_elides_read_side_sort(bucketed_tables):
    # Spark >=3.0 only trusts per-bucket order behind the legacy conf
    # (single-file buckets required — which write_bucketed guarantees)
    spark = bucketed_tables
    key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(key, "true")
    try:
        j = warehouse.colocated_join(spark, "wh_docs", "wh_embs", "doc_id")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert "Sort [" not in plan.replace("SortMergeJoin [", "")
    finally:
        spark.conf.unset(key)


def test_plain_parquet_join_does_shuffle(bucketed_tables):
    # the counterfactual: identical data without bucket metadata plans
    # two Exchanges — this is the cost write_bucketed amortizes away
    spark = bucketed_tables
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    embs = spark.read.parquet(f"{SF}/embeddings.parquet").withColumnRenamed(
        "vec_id", "doc_id"
    )
    assert _plan(docs.join(embs, "doc_id")).count("Exchange") >= 2


def test_colocated_join_matches_plain_join(bucketed_tables):
    spark = bucketed_tables
    got = sorted(
        warehouse.colocated_join(spark, "wh_docs", "wh_embs", "doc_id")
        .select("doc_id", "source", "label")
        .collect()
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    embs = spark.read.parquet(f"{SF}/embeddings.parquet").withColumnRenamed(
        "vec_id", "doc_id"
    )
    expected = sorted(
        docs.join(embs, "doc_id").select("doc_id", "source", "label").collect()
    )
    assert got == expected
    assert len(got) > 0


def test_groupby_on_bucket_key_has_no_exchange(bucketed_tables):
    spark = bucketed_tables
    agg = (
        spark.table("wh_docs")
        .groupBy("doc_id")
        .agg(F.sum("n_chars").alias("s"))
    )
    assert "Exchange" not in _plan(agg)
