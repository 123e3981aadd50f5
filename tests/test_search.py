"""BM25 + phrase search vs pure-Python oracles on hand corpora."""

from pyspark.sql import functions as F

from llm_scraper_spark.operators import search
from llm_scraper_spark.operators.textstats import (
    STOPWORDS,
    TFIDF_MIN_TERM_LEN,
)

SF_DIR = "/root/testdata/sf0.001"

HAND_DOCS = [
    (1, "merge sort merge sort merge"),
    (2, "window scan window the scan scan scan"),
    (3, "merge window hash stream vector"),
    (4, "sort sort sort sort sort sort sort sort"),
    (5, "batch batch batch merge"),
]


def _py_bm25(docs, query_terms):
    """Integer BM25 exactly as the operator defines it."""
    S, K1, B = search.S, search.K1_U, search.B_U
    kept = {
        d: [
            w
            for w in t.lower().split()
            if len(w) >= TFIDF_MIN_TERM_LEN and w not in STOPWORDS
        ]
        for d, t in docs
    }
    kept = {d: ws for d, ws in kept.items() if ws}
    n_docs = len(kept)
    total_dl = sum(len(ws) for ws in kept.values())
    avgdl = total_dl // n_docs
    df = {}
    for ws in kept.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    scores = {}
    for qid, term in query_terms:
        for d, ws in kept.items():
            tf = ws.count(term)
            if not tf:
                continue
            idf = (n_docs - df[term]) * S // (df[term] + 1)
            norm = (S - B) + B * len(ws) // avgdl
            sat = (tf * S * (K1 + S)) // (tf * S + K1 * norm // S)
            scores[(qid, d)] = scores.get((qid, d), 0) + idf * sat // S
    return scores


def test_bm25_matches_python_oracle(spark):
    df = spark.createDataFrame(HAND_DOCS, "doc_id long, text string")
    qt = spark.createDataFrame(
        search.QUERIES_BM25, "query_id long, term string"
    )
    got = {
        (r.query_id, r.doc_id): r.score_units
        for r in search.bm25_scores(df, qt).collect()
    }
    assert got == _py_bm25(HAND_DOCS, search.QUERIES_BM25)


def test_bm25_length_normalization_orders_docs(spark):
    """Doc 1 (short, 3×merge+2×sort) must outrank doc 4 (long, 8×sort
    only) for the [merge, sort] query: saturation + length norm."""
    df = spark.createDataFrame(HAND_DOCS, "doc_id long, text string")
    qt = spark.createDataFrame([(1, "merge"), (1, "sort")],
                               "query_id long, term string")
    s = {r.doc_id: r.score_units for r in search.bm25_scores(df, qt).collect()}
    assert s[1] > s[4]


def test_phrase_overlapping_matches(spark):
    """'batch batch batch' contains the phrase 'batch batch' twice."""
    df = spark.createDataFrame(HAND_DOCS, "doc_id long, text string")
    ph = spark.createDataFrame(
        search.PHRASES, "phrase_id long, w1 string, w2 string"
    )
    got = {
        (r.phrase_id, r.doc_id): r.n_occ
        for r in search.phrase_occurrences(df, ph).collect()
    }
    assert got[(3, 5)] == 2           # overlapping self-adjacent pair
    assert got[(1, 1)] == 2           # "merge sort" twice in doc 1
    assert (2, 2) in got              # "window scan" in doc 2
    assert (1, 4) not in got          # sort-only doc has no "merge sort"


def test_bm25_topk_respects_k_and_order(spark):
    out = search.bm25_topk(spark, SF_DIR).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append((r.rnk, r.score_units, r.doc_id))
    for q, rows in per_q.items():
        assert len(rows) <= search.BM25_TOPK
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        # scores non-increasing, doc_id ascending within ties
        for (r1, s1, d1), (r2, s2, d2) in zip(rows, rows[1:]):
            assert (s1, -d1) >= (s2, -d2)


def test_search_oracles_match(spark):
    from tests.oracle_check import assert_matches

    for key in ("bm25_topk", "phrase_search"):
        assert_matches(
            search.QUERIES[key](spark, SF_DIR),
            search.ORACLE_SQL[key],
            SF_DIR,
            key,
        )
