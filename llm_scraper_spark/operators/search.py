"""Ranked retrieval over the crawled corpus: BM25 top-k + positional
phrase search.

A crawl pipeline's output is consumed by search — the reference's own
downstream is retrieval-augmented prompting (it greps its triplet
dumps and rebuilds keyword lists per run, e.g.
server/scripts/util/db.py:46-50 keyword-keys pages into the KG, and
validation re-queries a search engine per triplet,
util/validate/validate.py).  These operators are the corpus-side
scale path: build the statistics once, serve every query from them.

* **`bm25_topk`** — Okapi BM25 (Robertson–Spärck Jones) ranked top-k
  for a fixed query workload.  All arithmetic is fixed-point integer:
  linear idf ``(N − df)·S div (df + 1)`` (the same linearization the
  tf-idf operator uses — no libm logs, so both engines agree
  bit-for-bit), document-length normalization ``(S − b) + b·dl div
  avgdl``, and the classic saturation ``tf·(k1+1) / (tf + k1·norm)``
  in S-units.  Tokenization is shared with `tfidf_top_terms`
  (lowercase alpha runs, min length, stopword list) so the corpus
  statistics line up across the text suite.

  Scale shape: postings = one hash agg over row-local tokens; the
  query workload joins as a BROADCAST (a query table is always tiny
  relative to the corpus); candidate scoring is one skinny join +
  per-(query, doc) sum; the final top-k runs the repo's two-phase
  salted window (pq.py:249-267 pattern) so no single task ever sees
  a whole query's candidate set — at 10^10 docs a common term's
  candidate list is itself web-scale.

* **`phrase_search`** — exact phrase occurrence counting from
  positional postings: adjacency is an equi-join of the phrase's
  word-1 postings against word-2 postings at ``pos + 1`` on the same
  doc.  Postings are pre-filtered to the phrase vocabulary by a
  broadcast semi-join BEFORE any shuffle, so only the phrase words'
  positions ever move.  Overlapping matches count each start position
  (the "batch batch" self-adjacent case is pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_scraper_spark.functions.topk import salted_topk
from llm_scraper_spark.operators.textstats import (
    TFIDF_MIN_TERM_LEN,
    _STOP_SQL,
    kept_tokens,
)

S = 1_000_000          # fixed-point scale
K1_U = 1_200_000       # k1 = 1.2
B_U = 750_000          # b = 0.75
BM25_TOPK = 10
TOPK_SALTS = 8         # phase-1 fan-out of the two-phase top-k

#: the fixed query workload: (query_id, term) — terms from the corpus
#: vocabulary, one query per selectivity regime
QUERIES_BM25 = [
    (1, "merge"), (1, "sort"),
    (2, "window"), (2, "scan"),
    (3, "vector"), (3, "stream"), (3, "hash"),
]

#: phrase workload: (phrase_id, word1, word2) — includes the
#: self-adjacent phrase ("batch batch") overlap edge case
PHRASES = [(1, "merge", "sort"), (2, "window", "scan"), (3, "batch", "batch")]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def bm25_scores(docs: DataFrame, query_terms: DataFrame) -> DataFrame:
    """Per-(query_id, doc_id) BM25 score in S-units over the kept-token
    statistics (textstats.kept_tokens — the text suite's one
    tokenization).  `query_terms` = (query_id, term), broadcast."""
    toks = kept_tokens(docs)
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    df = toks.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    totals = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    )
    # scalar (n_docs, avgdl) — one row, broadcast into every expression
    hits = (
        tf.join(F.broadcast(query_terms), "term")
        .join(df, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
    )
    term_score = f"""
          ((n_docs - df) * {S}L div (df + 1)) *
          ((tf * {S}L * ({K1_U}L + {S}L))
             div (tf * {S}L
                  + {K1_U}L * (({S}L - {B_U}L)
                               + {B_U}L * dl div (total_dl div n_docs))
                    div {S}L))
          div {S}L"""
    return (
        hits.selectExpr(
            "query_id", "doc_id", f"({term_score}) AS term_score"
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").cast("long").alias("score_units"))
    )


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: BM25 top-10 per query, two-phase salted window,
    tie-break (score desc, doc_id asc)."""
    qt = spark.createDataFrame(QUERIES_BM25, "query_id long, term string")
    scored = bm25_scores(_docs(spark, sf_dir), qt)
    return salted_topk(
        scored,
        "query_id",
        [F.desc("score_units"), F.asc("doc_id")],
        BM25_TOPK,
        "doc_id",
        TOPK_SALTS,
        rank_name="rnk",
    )


def phrase_occurrences(docs: DataFrame, phrases: DataFrame) -> DataFrame:
    """Count exact adjacent-pair phrase occurrences per document.
    `phrases` = (phrase_id, w1, w2), broadcast.  Positions index the
    RAW lowercase token stream (no stopword removal — phrases are
    literal)."""
    pos = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias(
            "pos", "term"
        ),
    ).filter(F.col("term") != "")
    p1 = pos.join(
        F.broadcast(phrases.select("phrase_id", F.col("w1").alias("term"))),
        "term",
    ).select("phrase_id", "doc_id", "pos")
    p2 = pos.join(
        F.broadcast(
            phrases.select(F.col("phrase_id").alias("pid2"),
                           F.col("w2").alias("term"))
        ),
        "term",
    ).select("pid2", F.col("doc_id").alias("did2"), F.col("pos").alias("pos2"))
    return (
        p1.join(
            p2,
            (p1.phrase_id == p2.pid2)
            & (p1.doc_id == p2.did2)
            & (p2.pos2 == p1.pos + 1),
        )
        .groupBy("phrase_id", "doc_id")
        .agg(F.count("*").cast("long").alias("n_occ"))
    )


def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: per-phrase per-doc occurrence counts, ordered."""
    ph = spark.createDataFrame(
        PHRASES, "phrase_id long, w1 string, w2 string"
    )
    return phrase_occurrences(_docs(spark, sf_dir), ph).orderBy(
        "phrase_id", "doc_id"
    )


_QT_DUCK = ", ".join(f"({q}, '{t}')" for q, t in QUERIES_BM25)
_PH_DUCK = ", ".join(f"({p}, '{a}', '{b}')" for p, a, b in PHRASES)

ORACLE_SQL = {
    "bm25_topk": f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
          FROM documents),
        kept AS (
          SELECT doc_id, term FROM tok
          WHERE length(term) >= {TFIDF_MIN_TERM_LEN}
            AND term NOT IN ({_STOP_SQL})),
        tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM kept GROUP BY doc_id, term),
        dl AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
          FROM kept GROUP BY doc_id),
        df AS (
          SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          FROM kept GROUP BY term),
        tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(dl) AS BIGINT) AS total_dl
          FROM dl),
        qt AS (SELECT * FROM (VALUES {_QT_DUCK}) AS t(query_id, term)),
        scored AS (
          SELECT qt.query_id, tf.doc_id,
                 CAST(sum(
                   ((n_docs - df) * {S} // (df + 1)) *
                   ((tf * {S} * ({K1_U} + {S}))
                      // (tf * {S}
                          + {K1_U} * (({S} - {B_U})
                                      + {B_U} * dl // (total_dl // n_docs))
                            // {S}))
                   // {S}
                 ) AS BIGINT) AS score_units
          FROM tf
          JOIN qt ON tf.term = qt.term
          JOIN df ON tf.term = df.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN tot
          GROUP BY qt.query_id, tf.doc_id),
        r AS (
          SELECT query_id, doc_id, score_units,
                 CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY score_units DESC, doc_id) AS BIGINT) AS rnk
          FROM scored)
        SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_units, rnk
        FROM r WHERE rnk <= {BM25_TOPK}
        ORDER BY query_id, rnk
    """,
    "phrase_search": f"""
        WITH tok AS (
          SELECT doc_id,
                 generate_subscripts(regexp_split_to_array(lower(text), '[^a-z]+'), 1) - 1 AS pos,
                 unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
          FROM documents),
        pos AS (SELECT * FROM tok WHERE term <> ''),
        ph AS (SELECT * FROM (VALUES {_PH_DUCK}) AS t(phrase_id, w1, w2)),
        p1 AS (
          SELECT ph.phrase_id, pos.doc_id, pos.pos
          FROM pos JOIN ph ON pos.term = ph.w1),
        p2 AS (
          SELECT ph.phrase_id, pos.doc_id, pos.pos
          FROM pos JOIN ph ON pos.term = ph.w2)
        SELECT CAST(p1.phrase_id AS BIGINT) AS phrase_id, p1.doc_id,
               CAST(count(*) AS BIGINT) AS n_occ
        FROM p1 JOIN p2
          ON p1.phrase_id = p2.phrase_id AND p1.doc_id = p2.doc_id
         AND p2.pos = p1.pos + 1
        GROUP BY p1.phrase_id, p1.doc_id
        ORDER BY phrase_id, p1.doc_id
    """,
}

QUERIES = {
    "bm25_topk": bm25_topk,
    "phrase_search": phrase_search,
}
