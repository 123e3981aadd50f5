"""PII scrub / boilerplate / length-histogram suite vs DuckDB oracles
plus semantic invariants on crafted inputs."""

import pytest

from llm_scraper_spark.operators import scrub
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(scrub.QUERIES))
def test_scrub_matches_oracle(spark, name):
    assert_matches(
        scrub.QUERIES[name](spark, SF_DIR),
        scrub.ORACLE_SQL[name],
        SF_DIR,
        name,
    )


def test_pii_counts_follow_injection_schedule(spark):
    """The synthetic injection is the only PII source, so the per-doc
    counts must equal the doc_id mod schedule exactly, and redaction
    must change the text iff a count is nonzero."""
    from pyspark.sql import functions as F

    rows = scrub.pii_scrub(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        d = r["doc_id"]
        assert r["n_email"] == (1 if d % 3 == 0 else 0)
        assert r["n_ip"] == (1 if d % 5 == 0 else 0)
        assert r["n_phone"] == (1 if d % 7 == 0 else 0)
    # redaction actually rewrites the matched spans
    aug = scrub._with_pii(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ).filter(F.col("doc_id") % 3 == 0)
    red = aug.select(
        F.regexp_replace("text", scrub.EMAIL_RE, "<EMAIL>").alias("t")
    ).first()["t"]
    assert "<EMAIL>" in red and "@example.com" not in red


def test_pii_redaction_on_crafted_strings(spark):
    """Known tricky positives/negatives through the same expressions
    the operator uses."""
    from pyspark.sql import functions as F

    cases = [
        ("mail a.b+c_d%e@sub.domain.org now", 1, 0, 0),
        ("ips 10.0.0.1 and 255.255.255.255", 0, 2, 0),
        ("call 555-0142 or 555-9999", 0, 0, 2),
        ("not-an-ip 1.2.3 and half-phone 555-12", 0, 0, 0),
        ("x@y.z too-short-tld", 0, 0, 0),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(cases)], "doc_id long, text string"
    )
    got = (
        df.select(
            "doc_id",
            F.size(
                F.regexp_extract_all("text", F.lit(f"({scrub.EMAIL_RE})"))
            ).alias("e"),
            F.size(
                F.regexp_extract_all("text", F.lit(f"({scrub.IP_RE})"))
            ).alias("i"),
            F.size(
                F.regexp_extract_all("text", F.lit(f"({scrub.PHONE_RE})"))
            ).alias("p"),
        )
        .orderBy("doc_id")
        .collect()
    )
    for row, (_, e, i, p) in zip(got, cases):
        assert (row["e"], row["i"], row["p"]) == (e, i, p), row


def test_boilerplate_flags_repeated_bigrams(spark):
    """A source where 6 of 8 docs share the same bigram-heavy footer
    marks those docs' footer grams boilerplate; a unique-content doc in
    the same source keeps bp_ratio 0."""
    footer = "subscribe now footer links"
    docs = [(i, f"unique{i}a unique{i}b " + footer, "en", "sX", 0) for i in range(6)]
    docs.append((6, "entirely original content here", "en", "sX", 0))
    docs.append((7, "another original doc text", "en", "sY", 0))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in scrub.boilerplate_flag(spark, td).collect()
        }
    # footer bigrams appear in 6 >= BP_MIN_DOCS docs of sX
    for i in range(6):
        assert out[i]["n_bp_grams"] >= 3, out[i]  # the 3 footer bigrams
        assert out[i]["bp_keep"] == 0  # footer dominates short docs
    assert out[6]["n_bp_grams"] == 0 and out[6]["bp_keep"] == 1
    assert out[7]["n_bp_grams"] == 0 and out[7]["bp_keep"] == 1


def test_len_histogram_accounts_every_doc(spark):
    rows = scrub.corpus_len_histogram(spark, SF_DIR).collect()
    import duckdb

    total = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == total
    assert abs(sum(r["doc_share"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r["bucket_lo"] <= r["min_chars"] <= r["max_chars"]
        assert r["max_chars"] < r["bucket_lo"] + scrub.LEN_BUCKET
