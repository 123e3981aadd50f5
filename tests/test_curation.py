"""Corpus-curation suite vs DuckDB oracles + semantic invariants."""

import pytest

from llm_scraper_spark.operators import curation
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(curation.QUERIES))
def test_curation_matches_oracle(spark, name):
    assert_matches(
        curation.QUERIES[name](spark, SF_DIR),
        curation.ORACLE_SQL[name],
        SF_DIR,
        name,
    )


def test_decontamination_excludes_eval_docs(spark):
    """Eval-split docs never appear in the scanned training output, and
    a contaminated doc always reports at least one eval hit."""
    rows = curation.QUERIES["decontaminate_ngram_overlap"](
        spark, SF_DIR
    ).collect()
    assert rows, "empty decontamination scan"
    for r in rows:
        assert r["doc_id"] % curation.EVAL_MOD != 0
        if r["contaminated"]:
            assert r["n_shared_grams"] > 0 and r["n_eval_docs_hit"] > 0
        else:
            assert r["n_shared_grams"] == 0 and r["n_eval_docs_hit"] == 0


def test_exact_duplicates_are_contaminated(spark):
    """A training doc whose text equals an eval doc's text must be
    flagged (shares every gram)."""
    import duckdb

    dup = duckdb.sql(
        f"""
        SELECT t.doc_id FROM '{SF_DIR}/documents.parquet' t
        JOIN '{SF_DIR}/documents.parquet' e ON t.text = e.text
        WHERE t.doc_id % {curation.EVAL_MOD} != 0
          AND e.doc_id % {curation.EVAL_MOD} = 0
        """
    ).fetchall()
    flagged = {
        r["doc_id"]
        for r in curation.QUERIES["decontaminate_ngram_overlap"](
            spark, SF_DIR
        ).collect()
        if r["contaminated"]
    }
    for (doc_id,) in dup:
        assert doc_id in flagged, f"exact eval copy {doc_id} not flagged"


def test_stratified_sample_respects_quota(spark):
    rows = curation.QUERIES["stratified_sample"](spark, SF_DIR).collect()
    per_lang: dict[str, int] = {}
    for r in rows:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
        assert 1 <= r["sample_rank"] <= curation.STRATA_N
    assert per_lang and all(n <= curation.STRATA_N for n in per_lang.values())


def test_source_mix_shares_sum_to_one(spark):
    rows = curation.QUERIES["corpus_source_mix"](spark, SF_DIR).collect()
    assert abs(sum(r["doc_share"] for r in rows) - 1.0) < 1e-9


def test_curation_pipeline_kept_is_conjunction(spark):
    rows = curation.QUERIES["corpus_curation_pipeline"](spark, SF_DIR).collect()
    n_kept = 0
    for r in rows:
        expect = int(
            r["quality_keep"]
            and r["lang_keep"]
            and r["rep_keep"]
            and r["dedup_keeper"]
        )
        assert r["kept"] == expect, r
        n_kept += r["kept"]
    assert 0 < n_kept < len(rows), "curation gate must be selective"


def test_degenerate_docs_never_divide_by_zero(spark):
    """Empty and single-word texts flow through every curation helper
    without NULL/NaN blowups (split('') yields [''], so n_words >= 1)."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "word"), (3, "a a a a"), (4, "the a of data join")],
        "doc_id long, text string",
    )
    rep = curation._rep_cols(docs).collect()
    assert len(rep) == 4
    for r in rep:
        assert r["dup_word_ratio"] is not None
        assert 0.0 <= r["dup_word_ratio"] <= 1.0
        assert 0.0 <= r["dup_bigram_ratio"] <= 1.0
    grams = curation._gram_sets(docs).collect()
    for g in grams:
        assert len(g["grams"]) >= 1  # short docs hash their whole text
    by_id = {r["doc_id"]: r for r in rep}
    assert by_id[3]["dup_word_ratio"] == 0.75  # 'a a a a' -> 3 dups of 4
    assert by_id[2]["dup_word_ratio"] == 0.0


def test_dsir_scores_separate_target_sources(spark):
    """The DSIR importance score must actually discriminate: docs from
    target-split sources (suffix % 5 == 0) score strictly higher on
    average than the rest, and the keep flag / fixed-point mean are
    consistent with the raw integer sum."""
    rows = curation.QUERIES["dsir_importance_score"](spark, SF_DIR).collect()
    assert len(rows) > 0
    import duckdb

    src = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"SELECT doc_id, CAST(substr(source, 4) AS INT) "
            f"% {curation.DSIR_TARGET_SRC_MOD} = 0 "
            f"FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    }
    in_t, out_t = [], []
    for r in rows:
        assert r["n_tokens"] > 0
        assert r["dsir_keep"] == (1 if r["dsir_sum_fp"] >= 0 else 0)
        # Spark div truncates toward zero; re-derive in Python the same way
        q = abs(r["dsir_sum_fp"]) // r["n_tokens"]
        expect = q if r["dsir_sum_fp"] >= 0 else -q
        assert r["mean_dsir_fp"] == expect
        (in_t if src[r["doc_id"]] else out_t).append(
            r["dsir_sum_fp"] / r["n_tokens"]
        )
    assert in_t and out_t
    assert sum(in_t) / len(in_t) > sum(out_t) / len(out_t) + 10, (
        "target-source docs should score clearly higher than the rest"
    )


def test_quality_classifier_matches_pure_python(spark):
    """Hashed-feature linear scorer vs an independent hashlib
    reimplementation — weights, buckets, score, and keep flag."""
    import hashlib

    import duckdb

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def score(text):
        tot = 0
        for w in text.split(" "):
            b = h60(w) % curation.QCLF_BUCKETS
            tot += h60(f"qw:{b}") % curation.QCLF_WRANGE - (
                curation.QCLF_WRANGE - 1
            ) // 2
        return tot

    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    )
    rows = curation.QUERIES["quality_classifier_score"](spark, SF_DIR).collect()
    assert len(rows) == len(texts)
    for r in rows:
        exp = score(texts[r["doc_id"]])
        assert r["score"] == exp
        assert r["clf_keep"] == (1 if exp >= 0 else 0)
    # the scorer must actually split the corpus, not rubber-stamp it
    kept = sum(r["clf_keep"] for r in rows)
    assert 0 < kept < len(rows)
