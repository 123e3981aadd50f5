"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

Reference analogs: the reference normalizes text (content_cleaner.py:
5-6; precision_recall.py:17-22) and length-filters sentences
(llm_validation_playwright.py:95-97) but has no corpus-level quality
pipeline; at 100 TB these are the standard pre-training filters.

All expressions are JVM-side builtins (regexp/array functions) — no
Python in the hot path; DuckDB oracle twins produce identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "data", "join"]
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features: token/char counts, mean token length,
    stopword ratio, and a composite keep/drop score."""
    docs = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    n_tokens = F.size(words).cast("long")
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(STOPWORDS))
    ).cast("long")
    n_chars = F.length("text").cast("long")
    mean_tok = n_chars.cast("double") / n_tokens.cast("double")
    stop_ratio = n_stop.cast("double") / n_tokens.cast("double")
    quality = (
        F.when((n_tokens >= 20) & (mean_tok >= 3.0) & (stop_ratio <= 0.5), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_calc"),
        mean_tok.alias("mean_token_len"),
        n_stop.alias("n_stopwords"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("keep"),
    ).orderBy("doc_id")


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID (stopword-profile vote) compared against
    the table's lang label — the n-gram-profile classic, reduced to a
    deterministic token test so both engines agree."""
    docs = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    en_hits = F.size(F.filter(words, lambda w: w.isin(["the", "a", "of"]))).cast(
        "long"
    )
    pred = F.when(en_hits >= 2, F.lit("en")).otherwise(F.lit("other"))
    return docs.select(
        "doc_id",
        "lang",
        en_hits.alias("en_stopword_hits"),
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("agrees"),
    ).orderBy("doc_id")


def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex token count
    ([a-z]+ / digit runs) — the corpus-size accounting query."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), "\\s+")).cast("long").alias("ws_tokens"),
        F.expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+', 0))")
        .cast("long")
        .alias("bpe_tokens"),
    ).orderBy("doc_id")


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: minimum md5 over all 5-char grams
    (rolling-hash analog, expressed set-wise)."""
    docs = _docs(spark, sf_dir)
    grams = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text") - 4)).alias("i"),
        F.col("text"),
    ).select("doc_id", F.md5(F.expr("substr(text, i, 5)")).alias("g"))
    return grams.groupBy("doc_id").agg(F.min("g").alias("winnow_fp")).orderBy(
        "doc_id"
    )


def corpus_lang_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("n_chars")).cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


ORACLE_SQL = {
    "text_quality": f"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(length(text) AS BIGINT) AS n_chars_calc,
                 CAST(len(list_filter(string_split(text, ' '),
                      w -> w IN ({_STOP_SQL}))) AS BIGINT) AS n_stopwords
          FROM documents
        )
        SELECT doc_id, n_tokens, n_chars_calc,
               CAST(n_chars_calc AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS mean_token_len,
               n_stopwords,
               CAST(n_stopwords AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS stopword_ratio,
               CAST(CASE WHEN n_tokens >= 20
                          AND CAST(n_chars_calc AS DOUBLE)/CAST(n_tokens AS DOUBLE) >= 3.0
                          AND CAST(n_stopwords AS DOUBLE)/CAST(n_tokens AS DOUBLE) <= 0.5
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM t ORDER BY doc_id
    """,
    "lang_id": """
        WITH t AS (
          SELECT doc_id, lang,
                 CAST(len(list_filter(string_split(text, ' '),
                      w -> w IN ('the', 'a', 'of'))) AS BIGINT) AS en_stopword_hits
          FROM documents
        )
        SELECT doc_id, lang, en_stopword_hits,
               CASE WHEN en_stopword_hits >= 2 THEN 'en' ELSE 'other' END AS pred_lang,
               (CASE WHEN en_stopword_hits >= 2 THEN 'en' ELSE 'other' END) = lang AS agrees
        FROM t ORDER BY doc_id
    """,
    "token_count_bpe": """
        SELECT doc_id,
               CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS bpe_tokens
        FROM documents ORDER BY doc_id
    """,
    "doc_fingerprint": """
        WITH grams AS (
          SELECT doc_id, md5(substr(text, CAST(i AS INT), 5)) AS g
          FROM (SELECT doc_id, text, unnest(range(1, length(text) - 3)) AS i
                FROM documents)
        )
        SELECT doc_id, min(g) AS winnow_fp FROM grams
        GROUP BY doc_id ORDER BY doc_id
    """,
    "corpus_lang_summary": """
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
}

QUERIES = {
    "text_quality": text_quality,
    "lang_id": lang_id,
    "token_count_bpe": token_count_bpe,
    "doc_fingerprint": doc_fingerprint,
    "corpus_lang_summary": corpus_lang_summary,
}
