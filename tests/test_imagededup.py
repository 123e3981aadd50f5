"""Image aHash near-dup suite: DuckDB twins, planted-copy recall, and
the brightness-invariance property of the production kernel."""

import pytest
from pyspark.sql import functions as F

from llm_scraper_spark.operators.dedup import HAMMING_MAX
from llm_scraper_spark.operators.imagededup import (
    ORACLE_SQL,
    QUERIES,
    ahash_from_pixels,
)
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_imagededup_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches(df, ORACLE_SQL[name], SF_DIR, name)


def test_exact_image_copies_at_hamming_zero(spark):
    pairs = QUERIES["image_dedup_pairs"](spark, SF_DIR).collect()
    assert pairs, "planted copies must surface"
    by_pair = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    planted_exact = {
        (r["doc_id"], r["doc_id"] + 2000000)
        for r in docs.filter(F.col("doc_id") % 17 == 0).collect()
    }
    found = {p for p in planted_exact if p in by_pair}
    # identical grids share every band: all planted exact copies found
    # unless all four of a doc's buckets are capped (none at this SF)
    assert found == planted_exact
    assert all(by_pair[p] == 0 for p in found)


def test_near_image_copies_within_hamming_budget(spark):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["image_dedup_pairs"](spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    planted_near = {
        (r["doc_id"], r["doc_id"] + 1000000)
        for r in docs.filter(F.col("doc_id") % 10 == 0).collect()
    }
    assert planted_near
    # one brightened pixel flips only a handful of threshold bits, so
    # nearly every near copy stays within HAMMING_MAX of its original
    # and shares at least one clean 15-bit band
    caught = planted_near & pairs
    assert len(caught) >= 0.8 * len(planted_near), (
        len(caught),
        len(planted_near),
    )


def test_ahash_brightness_invariance(spark):
    """mean-threshold aHash is invariant to a constant brightness shift
    (p_i + c vs mean + c) — the property that makes it a perceptual
    hash rather than a byte hash."""
    base = spark.range(0, 50).selectExpr(
        "id AS doc_id",
        "transform(sequence(1, 60), i ->"
        " cast(conv(substr(md5(concat(id, ':', i)), 1, 2), 16, 10) as bigint))"
        " AS pixels",
    )
    shifted = base.selectExpr(
        "doc_id", "transform(pixels, x -> x + 37) AS pixels"
    )
    a = {r["doc_id"]: r["simhash"] for r in ahash_from_pixels(base).collect()}
    b = {
        r["doc_id"]: r["simhash"] for r in ahash_from_pixels(shifted).collect()
    }
    assert a == b
    assert len(set(a.values())) > 1  # and it is not a constant hash


def test_hamming_cut_enforced(spark):
    rows = QUERIES["image_dedup_pairs"](spark, SF_DIR).collect()
    assert all(r["hamming"] <= HAMMING_MAX for r in rows)


def test_incremental_probe_finds_cross_shard_dups_only(spark):
    """r4: per-round image dedup probes the new shard against the
    corpus band index.  Every planted exact copy must surface at
    hamming 0, near copies mostly within budget, and the truly-novel
    images (fresh md5 chain) must match nothing."""
    from llm_scraper_spark.operators.imagededup import NOVEL_ID

    out = QUERIES["image_dedup_incremental"](spark, SF_DIR).collect()
    assert out
    by_pair = {(r.batch_doc, r.corpus_doc): r.hamming for r in out}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    planted_exact = {(i + 2000000, i) for i in ids if i % 17 == 0}
    planted_near = {(i + 1000000, i) for i in ids if i % 10 == 0}
    assert planted_exact <= set(by_pair), "exact copies must all surface"
    assert all(by_pair[p] == 0 for p in planted_exact)
    caught = planted_near & set(by_pair)
    assert len(caught) >= 0.8 * len(planted_near)
    # novel shard images share no chain with the corpus: zero matches
    assert not [p for p in by_pair if p[0] >= NOVEL_ID]
