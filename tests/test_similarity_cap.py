"""Hot-bucket cap on the embedding LSH paths (scale hardening).

A degenerate (band, bucket) — here 91 identical vectors, > the
MAX_BUCKET=64 cap — must NOT go quadratic in the candidate join: its
members are excluded from both the near-dup pair join and the ANN
candidate join, while a normal near-dup pair in an uncapped bucket
still comes out.  This mirrors tests/test_dedup_cap.py for the text
(minhash/simhash) paths.
"""

from __future__ import annotations

import pytest

from llm_scraper_spark.operators.similarity import (
    DIM,
    MAX_BUCKET,
    ann_lsh_topk,
    dedup_embedding_cosine,
)

# ids avoid vec_id%13==0 and %9==0 so the corpus-augmentation step of
# dedup_embedding_cosine (exact/perturbed copies) adds nothing
HOT_IDS = [i for i in range(10001, 10201) if i % 13 != 0 and i % 9 != 0][:90]
HOT_VEC = [0.5] * DIM
W = [0.1 * ((i * 7) % 13 - 6) for i in range(DIM)]
W2 = W.copy()
W2[0] += 0.001  # quantized: one component off by 1 → cosine ≈ 1.0


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    rows = [(5, HOT_VEC, 0)]  # a QUERY (vec_id < 10) inside the hot bucket
    rows += [(i, HOT_VEC, 0) for i in HOT_IDS]
    rows += [(1, W, 1), (2, W2, 1)]
    d = str(tmp_path_factory.mktemp("simcap"))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return d


def test_degenerate_embedding_bucket_capped(spark, corpus_dir):
    assert len(HOT_IDS) + 1 > MAX_BUCKET
    hot = set(HOT_IDS) | {5}
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in dedup_embedding_cosine(spark, corpus_dir).collect()
    }
    assert not any(a in hot and b in hot for a, b in pairs), (
        "capped bucket must emit no candidate pairs"
    )
    assert (1, 2) in pairs, "normal near-dup pair must survive the cap"


def test_ann_candidates_respect_cap(spark, corpus_dir):
    rows = ann_lsh_topk(spark, corpus_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    # query 5 sits in the capped bucket in every band → no candidates
    assert 5 not in by_q
    # queries 1/2 find each other through their uncapped buckets
    assert by_q.get(1) == [2]
    assert by_q.get(2) == [1]
