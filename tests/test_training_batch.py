"""Composed corpus→training-batch pipeline: cross-engine twins,
row-conservation ledger, and stage-subset invariants."""

import pytest
from pyspark.sql import functions as F

from llm_scraper_spark.operators.curation import EVAL_MOD, STRATA_N
from llm_scraper_spark.operators.training_batch import ORACLE_SQL, QUERIES
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_training_batch_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches(df, ORACLE_SQL[name], SF_DIR, name)


def test_audit_conserves_rows_across_stages(spark):
    """kept + dropped == in at every stage, and each stage's input is
    exactly the previous stage's output — the composition cannot leak
    or invent rows."""
    rows = {r.stage: r for r in QUERIES["corpus_to_training_batch_audit"](
        spark, SF_DIR).collect()}
    assert set(rows) == {"curation", "decontamination", "sampling"}
    for r in rows.values():
        assert r.n_kept + r.n_dropped == r.n_in
        assert 0 <= r.n_kept <= r.n_in
    assert rows["decontamination"].n_in == rows["curation"].n_kept
    assert rows["sampling"].n_in == rows["decontamination"].n_kept
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert rows["curation"].n_in == n_docs
    # the final batch is exactly the sampling stage's survivors
    batch = QUERIES["corpus_to_training_batch"](spark, SF_DIR)
    assert batch.count() == rows["sampling"].n_kept


def test_batch_packs_contiguously_and_excludes_eval_split(spark):
    """Packing over survivors is gap-free in doc_id order, per-lang
    quotas hold, and no held-out eval doc ever reaches the batch."""
    rows = QUERIES["corpus_to_training_batch"](spark, SF_DIR).collect()
    assert rows
    # contiguous token ranges in doc_id order (prefix-sum correctness)
    rows_sorted = sorted(rows, key=lambda r: r.doc_id)
    off = 0
    for r in rows_sorted:
        assert r.tok_start == off
        off += r.n_tokens
        assert r.doc_id % EVAL_MOD != 0
    # per-language quota
    per_lang = {}
    for r in rows_sorted:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
        assert 1 <= r.sample_rank <= STRATA_N
    assert all(n <= STRATA_N for n in per_lang.values())
