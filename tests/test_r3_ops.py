"""Independent pure-Python oracles for the round-3 additions:
tf-idf top terms, degree-ordered triangle counting, and fixed-point
embedding centroids.  The DuckDB twins already gate value equality
(tests/run_oracle_gate.py); these tests re-derive the answers from
first principles with no SQL engine at all, so a shared misreading of
the spec in both SQL dialects cannot slip through.
"""

import math
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from llm_scraper_spark.operators.graph import PR_FANOUT, kg_triangle_count
from llm_scraper_spark.operators.similarity import (
    CENTROID_SCALE,
    centroid_stats,
    embedding_label_centroids,
)
from llm_scraper_spark.operators.textstats import (
    STOPWORDS,
    TFIDF_MIN_TERM_LEN,
    TFIDF_SCALE,
    TFIDF_TOPK,
    tfidf_top_terms,
)

SF_DIR = "/root/testdata/sf0.001"


def _tokens(text):
    return [
        t
        for t in re.split(r"[^a-z]+", text.lower())
        if len(t) >= TFIDF_MIN_TERM_LEN and t not in STOPWORDS
    ]


def test_tfidf_matches_pure_python(spark):
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    tf = {}
    df = Counter()
    for doc_id, text in docs:
        counts = Counter(_tokens(text))
        tf[doc_id] = counts
        df.update(counts.keys())
    expected = []
    for doc_id, counts in tf.items():
        scored = sorted(
            (
                (term, cnt, df[term], cnt * TFIDF_SCALE // df[term])
                for term, cnt in counts.items()
            ),
            key=lambda r: (-r[3], r[0]),
        )[:TFIDF_TOPK]
        for rnk, (term, cnt, d, s) in enumerate(scored, 1):
            expected.append((doc_id, term, cnt, d, s, rnk))
    got = [
        (r.doc_id, r.term, r.tf, r.df, r.score_fp, r.rnk)
        for r in tfidf_top_terms(spark, SF_DIR).collect()
    ]
    assert sorted(got) == sorted(expected)


def test_triangles_match_bruteforce(spark):
    n = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    und = set()
    for v in range(n):
        for j in range(1, PR_FANOUT + 1):
            d = (v * 31 + j) % n
            if d != v:
                und.add((min(v, d), max(v, d)))
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    out = defaultdict(list)  # oriented low-(deg,id) -> high-(deg,id)
    for a, b in und:
        u, w = sorted((a, b), key=lambda v: (deg[v], v))
        out[u].append(w)
    wedges = triangles = 0
    for u, ws in out.items():
        for w in ws:  # directed 2-paths u -> w -> z
            for z in out.get(w, ()):
                wedges += 1
                if (min(u, z), max(u, z)) in und:
                    triangles += 1
    row = kg_triangle_count(spark, SF_DIR).collect()[0]
    assert (row.n_wedges, row.n_triangles) == (wedges, triangles)
    assert triangles > 0  # the synthetic graph is dense enough to close


def test_centroid_sums_match_pure_python(spark):
    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["label", "embedding"])
    sums = defaultdict(int)
    counts = Counter()
    for label, emb in zip(
        tbl.column("label").to_pylist(), tbl.column("embedding").to_pylist()
    ):
        counts[label] += 1
        for dim, val in enumerate(emb):
            # float32 -> double widen then the same double multiply
            sums[(label, dim)] += math.floor(float(val) * CENTROID_SCALE)
    got = {
        (r.label, r.dim): (r.sum_fp, r.n_vecs)
        for r in embedding_label_centroids(spark, SF_DIR).collect()
    }
    assert got == {
        (lbl, dim): (s, counts[lbl]) for (lbl, dim), s in sums.items()
    }


def test_centroid_sums_merge_by_addition(spark):
    """The sufficient-statistics property the 100 TB design relies on:
    centroids of two disjoint shards combine by plain addition."""
    full = {
        (r.label, r.dim): (r.sum_fp, r.n_vecs)
        for r in embedding_label_centroids(spark, SF_DIR).collect()
    }
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    merged = defaultdict(lambda: [0, 0])
    for pred in ("vec_id % 2 = 0", "vec_id % 2 = 1"):
        for r in centroid_stats(emb.filter(pred)).collect():
            merged[(r.label, r.dim)][0] += r.sum_fp
            merged[(r.label, r.dim)][1] += r.n_vecs
    assert full == {k: tuple(v) for k, v in merged.items()}
