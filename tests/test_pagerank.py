"""Fixed-point PageRank vs a pure-Python integer oracle + DuckDB twin."""

from llm_scraper_spark.operators import graph
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


def _python_pagerank(n: int, iters: int) -> list[int]:
    """Bit-exact reimplementation with plain ints (no Spark, no SQL)."""
    ranks = [graph.PR_SCALE // n] * n
    base = (100 - graph.PR_DAMP_PCT) * graph.PR_SCALE // (100 * n)
    for _ in range(iters):
        s = [0] * n
        for vid in range(n):
            c = ranks[vid] // graph.PR_FANOUT
            for j in range(1, graph.PR_FANOUT + 1):
                s[(vid * 31 + j) % n] += c
        ranks = [base + graph.PR_DAMP_PCT * sv // 100 for sv in s]
    return ranks


def test_pagerank_matches_duckdb(spark):
    assert_matches(
        graph.QUERIES["link_pagerank_topk"](spark, SF_DIR),
        graph.ORACLE_SQL["link_pagerank_topk"],
        SF_DIR,
        "link_pagerank_topk",
    )


def test_pagerank_matches_python_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    doc_ids = sorted(r["doc_id"] for r in docs.collect())
    n = len(doc_ids)
    expect = _python_pagerank(n, graph.PR_ITERS)
    got = {
        r["doc_id"]: r["rank_units"]
        for r in graph.link_pagerank(docs).collect()
    }
    assert len(got) == n
    for vid, doc_id in enumerate(doc_ids):
        assert got[doc_id] == expect[vid], (doc_id, vid)


def test_pagerank_mass_is_conserved_approximately(spark):
    """Total fixed-point mass stays within integer-truncation loss of
    PR_SCALE (each of n vertices truncates < 1 unit per div, 3 divs
    per iteration)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    total = sum(r["rank_units"] for r in graph.link_pagerank(docs).collect())
    n = docs.count()
    loss_bound = graph.PR_ITERS * 4 * n + n
    assert graph.PR_SCALE - loss_bound <= total <= graph.PR_SCALE
