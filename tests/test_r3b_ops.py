"""Independent pure-Python oracles for the later round-3 additions:
unigram-LM surprisal, rank-based length quantiles, and the HLL
approx-distinct gate.  The DuckDB twins already gate value equality
(tests/run_oracle_gate.py); these re-derive the answers from first
principles with no SQL engine, so a shared spec misreading in both
SQL dialects cannot slip through.
"""

import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from llm_scraper_spark.operators.textstats import (
    LENGTH_QUANTILES,
    LM_SCALE,
    approx_distinct_gate,
    corpus_length_quantiles,
    unigram_lm_score,
)

SF_DIR = "/root/testdata/sf0.001"


def test_unigram_lm_matches_pure_python(spark):
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    tf = {}
    counts = Counter()
    for doc_id, text in docs:
        toks = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
        tf[doc_id] = Counter(toks)
        counts.update(toks)
    total = sum(counts.values())
    expected = {}
    for doc_id, c in tf.items():
        n_tokens = sum(c.values())
        # surprisal in whole bits: length of the binary representation
        # of total // cnt — must equal Spark's length(bin(x))
        ssum = sum(k * len(bin(total // counts[t])[2:]) for t, k in c.items())
        expected[doc_id] = (n_tokens, ssum, ssum * LM_SCALE // n_tokens)
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal_sum"], r["mean_surprisal_fp"])
        for r in unigram_lm_score(spark, SF_DIR).collect()
    }
    assert got == expected


def test_length_quantiles_match_pure_python(spark):
    tbl = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    rows = list(
        zip(
            tbl.column("source").to_pylist(),
            tbl.column("n_chars").to_pylist(),
            tbl.column("doc_id").to_pylist(),
        )
    )
    by_src = defaultdict(list)
    for src, n_chars, doc_id in rows:
        by_src[src].append((n_chars, doc_id))
    expected = {}
    for src, vals in by_src.items():
        vals.sort()
        n = len(vals)
        expected[src] = (n,) + tuple(
            vals[p * (n - 1) // 100][0] for p in LENGTH_QUANTILES
        )
    got = {
        r["source"]: (r["n_docs"],) + tuple(r[f"p{p}"] for p in LENGTH_QUANTILES)
        for r in corpus_length_quantiles(spark, SF_DIR).collect()
    }
    assert got == expected


def test_approx_distinct_gate_exact_and_within_tolerance(spark):
    tbl = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_type", "user_id"]
    )
    exact = defaultdict(set)
    for et, uid in zip(
        tbl.column("event_type").to_pylist(), tbl.column("user_id").to_pylist()
    ):
        exact[et].add(uid)
    got = {r["event_type"]: r for r in approx_distinct_gate(spark, SF_DIR).collect()}
    assert set(got) == set(exact)
    for et, users in exact.items():
        assert got[et]["exact_users"] == len(users)
        # rsd=2% HLL++ on these cardinalities must sit within the 5% gate
        assert got[et]["within_tolerance"] == 1
