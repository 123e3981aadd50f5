"""Stratified-sample hash-threshold pre-filter (scale hardening).

A dominant stratum must not reach the per-stratum rank at full size:
the pre-filter bounds the rank input at ~SAMPLE_MARGIN × STRATA_N
rows per language, and the sampled output is provably identical to
ranking the whole stratum (verified here against an independent
pure-Python oracle on a skewed corpus).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from llm_scraper_spark.operators.curation import (
    SAMPLE_MARGIN,
    STRATA_N,
    _sample_survivors,
    stratified_sample,
)

EN_IDS = list(range(1, 5001))          # dominant stratum
FR_IDS = list(range(20001, 20031))     # normal stratum (30 docs)
DE_IDS = list(range(30001, 30006))     # tiny stratum (5 < STRATA_N)


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    rows = [(i, "en", "web") for i in EN_IDS]
    rows += [(i, "fr", "web") for i in FR_IDS]
    rows += [(i, "de", "news") for i in DE_IDS]
    d = str(tmp_path_factory.mktemp("strat"))
    spark.createDataFrame(rows, "doc_id long, lang string, source string").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    return d


def test_prerank_input_is_bounded_on_skewed_stratum(spark, corpus_dir):
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    surv, _ = _sample_survivors(docs)
    per = {r["lang"]: r["n"] for r in surv.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # the dominant stratum shrinks to ~SAMPLE_MARGIN × STRATA_N, never
    # anywhere near its full 5000 rows (10× margin on the expectation)
    assert STRATA_N <= per["en"] <= 10 * SAMPLE_MARGIN * STRATA_N
    # sub-quota strata keep everything (threshold saturates at 2^32)
    assert per["de"] == len(DE_IDS)


def test_sample_identical_to_full_rank(spark, corpus_dir):
    got = [
        (r["doc_id"], r["lang"], r["sample_rank"])
        for r in stratified_sample(spark, corpus_dir).collect()
    ]
    expected = []
    for lang, ids in (("de", DE_IDS), ("en", EN_IDS), ("fr", FR_IDS)):
        ranked = sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
        expected += [(i, lang, rank + 1) for rank, i in enumerate(ranked[:STRATA_N])]
    assert got == expected
