"""IVF k-means trainer: Spark ≡ an independent pure-Python Lloyd's
implementation (exact integer sums, cosine scale-invariance trick) on
the sf0.001 embeddings — assignment counts and centroid norms must
match exactly, and the final cells must partition the corpus."""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import pytest

from llm_scraper_spark.operators.similarity import (
    KMEANS_ITERS,
    N_CELLS,
    N_QUERIES,
    ann_ivf_train_cells,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_train():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    vecs = {
        vid: [math.floor(float(x) * 1000) for x in emb]
        for vid, emb in zip(t["vec_id"], t["embedding"])
    }
    cents = {
        vid - N_QUERIES: list(vecs[vid])
        for vid in range(N_QUERIES, N_QUERIES + N_CELLS)
    }
    assigned = {}
    for _ in range(KMEANS_ITERS):
        assigned = {}
        for vid, v in vecs.items():
            nv = math.sqrt(sum(x * x for x in v))
            best = max(
                sorted(cents),
                key=lambda c: (
                    sum(a * b for a, b in zip(v, cents[c]))
                    / (math.sqrt(sum(x * x for x in cents[c])) * nv),
                    -c,
                ),
            )
            assigned[vid] = best
        new = {}
        for vid, c in assigned.items():
            acc = new.setdefault(c, [0] * len(vecs[vid]))
            for i, x in enumerate(vecs[vid]):
                acc[i] += x
        cents = {c: new.get(c, cents[c]) for c in cents}
    counts = {c: 0 for c in cents}
    for c in assigned.values():
        counts[c] += 1
    norms = {c: sum(x * x for x in cents[c]) for c in cents}
    return counts, norms, len(vecs)


def test_trainer_matches_python_oracle(spark):
    counts, norms, n_vecs = _py_train()
    rows = ann_ivf_train_cells(spark, SF_DIR).collect()
    assert [r["cell"] for r in rows] == list(range(N_CELLS))
    assert {r["cell"]: r["n_members"] for r in rows} == counts
    assert {r["cell"]: r["c_norm2"] for r in rows} == norms
    assert sum(r["n_members"] for r in rows) == n_vecs  # cells partition corpus


def test_trained_serving_matches_oracle(spark):
    """The train→serve composition: k-means centroids feed the shared
    serving plan; every served neighbor value-checked vs the unrolled
    DuckDB twin."""
    from llm_scraper_spark.operators import similarity
    from tests.oracle_check import assert_matches

    assert_matches(
        similarity.QUERIES["ann_ivf_trained_topk"](spark, SF_DIR),
        similarity.ORACLE_SQL["ann_ivf_trained_topk"],
        SF_DIR,
        "ann_ivf_trained_topk",
    )


def test_trained_serving_ranks_are_contiguous(spark):
    from llm_scraper_spark.operators import similarity

    rows = similarity.QUERIES["ann_ivf_trained_topk"](spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
        assert r["neighbor_id"] != r["query_id"]
    assert by_q
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
