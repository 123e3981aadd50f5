"""Crawl-snapshot analytics: round-over-round change detection and
Wayback-style CDX digest collapsing.

A continuous crawl is a sequence of snapshots, and the two questions a
recrawl scheduler asks of them are (1) *what changed between rounds*
(feeds the Cho–Garcia-Molina revisit model in
operators/crawlsched.py:recrawl_schedule — that operator consumes a
change-observation log; this one PRODUCES it) and (2) *which repeat
captures are redundant* (the Internet Archive / Common Crawl "digest
collapse": consecutive captures of one URL with the same payload
digest are stored once — the CDX spec's ``collapse=digest``).  The
reference has neither notion: it re-scrapes its seed lists from
scratch every run and appends to flat files
(server/scripts/scrape_eccomerce.py:312-328 re-reads the full URL list
each invocation; extract_pages.py:131-164 rewrites page dumps without
comparing to previous output).

* **`crawl_delta_summary`** — diff two crawl rounds by content
  fingerprint: a full outer join of round A and round B on the URL
  key classifies every URL as ``new`` / ``gone`` / ``changed`` /
  ``unchanged``, then rolls the classification up per host.  Scale
  shape: the join shuffles only (8-byte key, 16-byte digest) pairs —
  never page text (digests are computed where the text already
  lives); the host rollup is a second skinny agg whose output is
  O(hosts).  At 10^10 URLs this is exactly the delta pass an
  incremental crawler runs between rounds.

* **`cdx_collapse`** — per-URL capture-history collapse: order each
  URL's captures by timestamp and keep a capture iff its digest
  differs from the previous kept one (for back-to-back duplicates the
  previous *capture* — the ``lag(digest)`` form — is the previous
  *kept* one, the standard CDX collapse).  Scale shape: one window
  over (url, ts) on skinny (url, ts, digest) rows — text never moves;
  the window partitions by URL so no single task sees more than one
  URL's history.  Output adds ``version_no`` (rank among kept
  captures) — the replay index's edition number.

Synthetic capture universe: the same deterministic messy-URL family
as operators/webarchive.py (shared expression), 4 timestamped captures
per document whose digest steps every third capture with a per-doc
phase — so collapses, singletons, and full-change histories all occur,
and the DuckDB twin rebuilds the identical input.  Production callers
feed two fetched tables ((url, text) after frontier.fetch) or a real
capture log through the same kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_scraper_spark.operators.webarchive import (
    N_HOSTS,  # the shared 20-bucket synthetic host family
    _URL_DUCK,
    _URL_SPARK,
)
CAPTURES_PER_URL = 4   # snapshots per URL in the collapse universe
TS_BASE = 1_600_000_000
TS_STEP = 86_400       # one capture per day


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ------------------------------------------------- round-over-round diff
#: round A = everything but the 9-mod-10 ids (those are NEW in B);
#: round B = everything but the 0-mod-10 ids (those are GONE after A);
#: ids 0 mod 4 present in both rounds CHANGE content between rounds.
_A_PRED = "doc_id % 10 <> 9"
_B_PRED = "doc_id % 10 <> 0"
_B_TEXT = "concat(text, if(doc_id % 4 = 0, '#v2', ''))"
_B_TEXT_DUCK = "text || (CASE WHEN doc_id % 4 = 0 THEN '#v2' ELSE '' END)"


def crawl_round_diff(round_a: DataFrame, round_b: DataFrame) -> DataFrame:
    """Classify every URL key across two crawl rounds.  Inputs are
    ``(url_key, digest)`` frames (digest already 16 bytes — computed
    next to the text, so only skinny rows reach this join).  Full
    outer join on the key; output ``(url_key, host, status)``."""
    a = round_a.select(
        F.col("url_key"), F.col("host"), F.col("digest").alias("digest_a")
    )
    b = round_b.select(
        F.col("url_key").alias("url_key_b"),
        F.col("host").alias("host_b"),
        F.col("digest").alias("digest_b"),
    )
    joined = a.join(b, a.url_key == b.url_key_b, "full_outer")
    return joined.select(
        F.coalesce("url_key", "url_key_b").alias("url_key"),
        F.coalesce("host", "host_b").alias("host"),
        F.when(F.col("digest_a").isNull(), "new")
        .when(F.col("digest_b").isNull(), "gone")
        .when(F.col("digest_a") != F.col("digest_b"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )


def crawl_delta_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: per-host new/gone/changed/unchanged counts between
    the two synthetic crawl rounds."""
    docs = _docs(spark, sf_dir)
    round_a = docs.filter(F.expr(_A_PRED)).selectExpr(
        "doc_id AS url_key",
        f"doc_id % {N_HOSTS} AS host",
        "md5(text) AS digest",
    )
    round_b = docs.filter(F.expr(_B_PRED)).selectExpr(
        "doc_id AS url_key",
        f"doc_id % {N_HOSTS} AS host",
        f"md5({_B_TEXT}) AS digest",
    )
    diff = crawl_round_diff(round_a, round_b)
    return (
        diff.groupBy("host")
        .agg(
            F.sum(F.expr("if(status = 'new', 1L, 0L)")).alias("n_new"),
            F.sum(F.expr("if(status = 'gone', 1L, 0L)")).alias("n_gone"),
            F.sum(F.expr("if(status = 'changed', 1L, 0L)")).alias(
                "n_changed"
            ),
            F.sum(F.expr("if(status = 'unchanged', 1L, 0L)")).alias(
                "n_unchanged"
            ),
            F.count("*").cast("long").alias("n_total"),
        )
        .orderBy("host")
    )


# ----------------------------------------------------- CDX digest collapse
#: capture j of doc d carries digest md5(text # (d + j) div 3): the
#: digest steps once every 3 captures with a per-doc phase, so with 4
#: captures per URL every collapse shape occurs (1-kept, 2-kept runs,
#: alternation at the phase boundary).
_DIGEST_SPARK = "md5(concat(text, '#', cast((doc_id + j) div 3 as string)))"
_DIGEST_DUCK = "md5(text || '#' || CAST((doc_id + j) // 3 AS VARCHAR))"


def collapse_captures(captures: DataFrame) -> DataFrame:
    """CDX ``collapse=digest``: keep a capture iff its digest differs
    from the immediately preceding capture of the same URL (the first
    capture is always kept).  Because dropped captures duplicate their
    predecessor, lag(digest) over captures equals the last KEPT digest
    — the one-window form of the collapse.  Input ``(url, ts_epoch,
    digest)``; output adds ``version_no`` (1-based kept-capture rank).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("ts_epoch")
    kept = captures.withColumn("prev", F.lag("digest").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("digest"))
    )
    return kept.withColumn(
        "version_no", F.row_number().over(w).cast("long")
    ).drop("prev")


def cdx_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: the collapsed capture index over the synthetic
    4-captures-per-URL universe, ordered (url, ts_epoch)."""
    caps = (
        _docs(spark, sf_dir)
        .selectExpr(
            "doc_id",
            "text",
            f"explode(sequence(0, {CAPTURES_PER_URL - 1})) AS j",
        )
        .selectExpr(
            f"{_URL_SPARK} AS url",
            f"{TS_BASE}L + doc_id + j * {TS_STEP}L AS ts_epoch",
            f"{_DIGEST_SPARK} AS digest",
        )
    )
    return collapse_captures(caps).orderBy("url", "ts_epoch")


ORACLE_SQL = {
    "crawl_delta_summary": f"""
        WITH a AS (
          SELECT doc_id AS url_key, doc_id % {N_HOSTS} AS host,
                 md5(text) AS digest
          FROM documents WHERE {_A_PRED}),
        b AS (
          SELECT doc_id AS url_key, doc_id % {N_HOSTS} AS host,
                 md5({_B_TEXT_DUCK}) AS digest
          FROM documents WHERE {_B_PRED}),
        d AS (
          SELECT coalesce(a.url_key, b.url_key) AS url_key,
                 coalesce(a.host, b.host) AS host,
                 CASE WHEN a.digest IS NULL THEN 'new'
                      WHEN b.digest IS NULL THEN 'gone'
                      WHEN a.digest <> b.digest THEN 'changed'
                      ELSE 'unchanged' END AS status
          FROM a FULL OUTER JOIN b ON a.url_key = b.url_key)
        SELECT host,
               CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(sum(CASE WHEN status = 'gone' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_gone,
               CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_changed,
               CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unchanged,
               CAST(count(*) AS BIGINT) AS n_total
        FROM d GROUP BY host ORDER BY host
    """,
    "cdx_collapse": f"""
        WITH caps AS (
          SELECT {_URL_DUCK} AS url,
                 {TS_BASE} + doc_id + j * {TS_STEP} AS ts_epoch,
                 {_DIGEST_DUCK} AS digest
          FROM documents
          CROSS JOIN (VALUES {", ".join(f"({j})" for j in range(CAPTURES_PER_URL))}) AS t(j)),
        lagged AS (
          SELECT url, ts_epoch, digest,
                 lag(digest) OVER (PARTITION BY url ORDER BY ts_epoch)
                   AS prev
          FROM caps),
        kept AS (
          SELECT url, ts_epoch, digest FROM lagged
          WHERE prev IS NULL OR prev <> digest)
        SELECT url, ts_epoch, digest,
               CAST(row_number() OVER (PARTITION BY url ORDER BY ts_epoch)
                    AS BIGINT) AS version_no
        FROM kept ORDER BY url, ts_epoch
    """,
}

QUERIES = {
    "crawl_delta_summary": crawl_delta_summary,
    "cdx_collapse": cdx_collapse,
}
