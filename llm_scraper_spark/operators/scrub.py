"""Content-scrubbing operators for a training-data pipeline: PII
detection/redaction, boilerplate-gram removal, and corpus length
accounting.

Reference analogs: the reference ships scraped page text straight to
its LLM stages (scrape_eccomerce.py:196-229) with no scrub pass; at
100 TB the standard pre-tokenization steps between crawl output and
training are PII redaction (emails/IPs/phones → placeholder tokens),
boilerplate stripping (nav/footer text repeated across a site — the
CCNet paragraph-dedup idea, C4's "dedup at the line level"), and
length/mix accounting.  All three are expressed here as pure JVM
DataFrame plans with DuckDB twins.

Scale notes:
- PII redaction is row-local regexp work (whole-stage codegen, no
  shuffle, no Python).  The synthetic corpus contains no PII, so the
  queries inject deterministic fake PII derived from doc_id — in BOTH
  engines, disclosed here — to exercise the match/redact machinery on
  real positives and true negatives.
- Boilerplate detection shuffles only (source, 16-byte gram-hash)
  postings: per-source gram document-frequency, then a posting join
  back.  O(postings), never O(docs²); the gram join key includes the
  source, so a common phrase in one site never blocks another site's
  docs.
- The regex dialect is kept to the Java-regex ∩ RE2 common subset
  (classes, bounded repeats, \\b word boundaries) so Spark and DuckDB
  compile the same automaton.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: regexes in the Java ∩ RE2 common subset (no lookaround, no \p{...}).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b555-\d{4}\b"

#: word-gram size and per-source document-frequency threshold for the
#: boilerplate gate: a bigram seen in ≥ BP_MIN_DOCS distinct docs of
#: the same source is site furniture, not content.
BP_K = 2
BP_MIN_DOCS = 5
#: docs whose boilerplate-gram share exceeds this are dropped.
BP_MAX_RATIO = 0.50

#: histogram bucket width (chars).
LEN_BUCKET = 100


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- PII -----------------------------------------------------------------

def _with_pii(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic-PII augmentation (the corpus has none):
    every 3rd doc gains an email, every 5th an IPv4, every 7th a phone
    number, all derived from doc_id.  The DuckDB twin performs the
    identical augmentation (_PII_AUG_SQL), so the queries test the
    detect/redact machinery on a mix of zero-, one- and multi-hit docs
    rather than vacuously passing on an all-negative corpus."""
    d = F.col("doc_id")
    email = F.when(
        d % 3 == 0,
        F.concat(F.lit(" user"), d.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 5 == 0,
        F.concat(
            F.lit(" 10."),
            (d % 256).cast("string"),
            F.lit(".0."),
            (d % 100).cast("string"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 7 == 0,
        F.concat(F.lit(" 555-"), F.lpad((d % 10000).cast("string"), 4, "0")),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id", F.concat(F.col("text"), email, ip, phone).alias("text")
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect and redact emails / IPv4s / phone numbers: per-doc match
    counts plus the md5 of the redacted text (emails → <EMAIL>, IPs →
    <IP>, phones → <PHONE>).  Row-local regexp codegen — the scan is
    the whole plan; at 100 TB this runs at parquet-read speed."""
    aug = _with_pii(_docs(spark, sf_dir))
    t = F.col("text")
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IP_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(f"({EMAIL_RE})")))
        .cast("long")
        .alias("n_email"),
        F.size(F.regexp_extract_all(t, F.lit(f"({IP_RE})")))
        .cast("long")
        .alias("n_ip"),
        F.size(F.regexp_extract_all(t, F.lit(f"({PHONE_RE})")))
        .cast("long")
        .alias("n_phone"),
        F.md5(red).alias("redacted_md5"),
    ).orderBy("doc_id")


def pii_scrub_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level PII accounting: docs hit and total matches per PII
    class — the scrub report a pipeline publishes.  One partial+final
    hash aggregate over pii_scrub's row-local columns."""
    per = pii_scrub(spark, sf_dir)
    return per.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("n_email") > 0).cast("long")).cast("long").alias(
            "docs_with_email"
        ),
        F.sum((F.col("n_ip") > 0).cast("long")).cast("long").alias(
            "docs_with_ip"
        ),
        F.sum((F.col("n_phone") > 0).cast("long")).cast("long").alias(
            "docs_with_phone"
        ),
        F.sum("n_email").cast("long").alias("total_email"),
        F.sum("n_ip").cast("long").alias("total_ip"),
        F.sum("n_phone").cast("long").alias("total_phone"),
    )


# --- boilerplate ---------------------------------------------------------

def _bigram_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, source, gram) — distinct word-bigram md5 hashes per
    doc, row-local; single-word docs post their whole text."""
    with_ws = docs.select(
        "doc_id", "source", F.split("text", " ").alias("ws")
    )
    ws = F.col("ws")
    grams = F.when(
        F.size(ws) >= BP_K,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - (BP_K - 1)),
                lambda i: F.md5(
                    F.concat_ws(
                        " ", F.element_at(ws, i), F.element_at(ws, i + F.lit(1))
                    )
                ),
            )
        ),
    ).otherwise(F.array(F.md5(F.concat_ws(" ", ws))))
    return with_ws.select("doc_id", "source", F.explode(grams).alias("gram"))


def boilerplate_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate-gram gate (CCNet/C4 line-dedup analog on
    a newline-free corpus): a bigram appearing in ≥ BP_MIN_DOCS
    distinct docs of the SAME source is boilerplate; a doc whose
    boilerplate share exceeds BP_MAX_RATIO is dropped.

    Plan: distinct-bigram postings → per-(source, gram) doc-frequency
    → semi-style join back on (source, gram) → per-doc aggregate.
    Only 16-byte hashes and the source key ever shuffle, and both
    shuffles are on the same (source, gram) key so the DF aggregate
    and the posting join share one exchange."""
    posts = _bigram_postings(_docs(spark, sf_dir))
    df = posts.groupBy("source", "gram").agg(
        F.count("*").alias("gram_df")
    )
    joined = posts.join(df, ["source", "gram"])
    per_doc = joined.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_grams"),
        F.sum((F.col("gram_df") >= BP_MIN_DOCS).cast("long"))
        .cast("long")
        .alias("n_bp_grams"),
    )
    ratio = F.col("n_bp_grams").cast("double") / F.col("n_grams").cast("double")
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_bp_grams",
        ratio.alias("bp_ratio"),
        (ratio <= BP_MAX_RATIO).cast("long").alias("bp_keep"),
    ).orderBy("doc_id")


def boilerplate_top_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boilerplate report: top-10 highest-document-frequency
    bigram hashes per source (ties broken by gram hash for a unique,
    engine-independent order) — what an operator inspects before
    tuning BP_MIN_DOCS."""
    posts = _bigram_postings(_docs(spark, sf_dir))
    df = posts.groupBy("source", "gram").agg(
        F.count("*").cast("long").alias("gram_df")
    )
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.col("gram_df").desc(), F.col("gram").asc()
        )
    )
    return (
        df.select("source", "gram", "gram_df", rn.alias("rk"))
        .filter(F.col("rk") <= 10)
        .orderBy("source", "rk")
    )


# --- length accounting ---------------------------------------------------

def corpus_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram in LEN_BUCKET-char buckets with
    corpus share — the length-mix chart every data card reports.
    One hash aggregate on a derived int key; the total joins back as
    a broadcast 1-row aggregate."""
    docs = _docs(spark, sf_dir)
    bucket = (F.col("n_chars") / LEN_BUCKET).cast("bigint")
    per = docs.groupBy(bucket.alias("bucket")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )
    total = per.agg(F.sum("n_docs").cast("long").alias("total_docs"))
    return (
        per.join(F.broadcast(total))
        .select(
            "bucket",
            (F.col("bucket") * LEN_BUCKET).cast("long").alias("bucket_lo"),
            "n_docs",
            "min_chars",
            "max_chars",
            (F.col("n_docs").cast("double") / F.col("total_docs").cast("double"))
            .alias("doc_share"),
        )
        .orderBy("bucket")
    )


# --- DuckDB twins ---------------------------------------------------------

#: identical synthetic-PII augmentation, SQL side.
_PII_AUG_SQL = """
    aug AS (
      SELECT doc_id,
             text ||
             CASE WHEN doc_id % 3 = 0
                  THEN ' user' || doc_id || '@example.com' ELSE '' END ||
             CASE WHEN doc_id % 5 = 0
                  THEN ' 10.' || (doc_id % 256) || '.0.' || (doc_id % 100)
                  ELSE '' END ||
             CASE WHEN doc_id % 7 = 0
                  THEN ' 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END AS text
      FROM documents)
"""

_PII_PER_DOC_SQL = f"""
    WITH {_PII_AUG_SQL},
    per AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
               AS n_email,
             CAST(len(regexp_extract_all(text, '{IP_RE}')) AS BIGINT) AS n_ip,
             CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
               AS n_phone,
             md5(regexp_replace(
                   regexp_replace(
                     regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                     '{IP_RE}', '<IP>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
      FROM aug)
"""

_BP_POSTS_SQL = f"""
    ws AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    posts AS (
      SELECT doc_id, source, unnest(
        CASE WHEN len(w) >= {BP_K} THEN
          list_distinct(list_transform(
            generate_series(1, len(w) - {BP_K - 1}),
            i -> md5(w[i] || ' ' || w[i+1])))
        ELSE [md5(list_aggregate(w, 'string_agg', ' '))] END) AS gram
      FROM ws),
    gdf AS (
      SELECT source, gram, CAST(count(*) AS BIGINT) AS gram_df
      FROM posts GROUP BY source, gram)
"""

ORACLE_SQL = {
    "pii_scrub": _PII_PER_DOC_SQL
    + """
        SELECT doc_id, n_email, n_ip, n_phone, redacted_md5
        FROM per ORDER BY doc_id
    """,
    "pii_scrub_summary": _PII_PER_DOC_SQL
    + """
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_with_email,
               CAST(sum(CASE WHEN n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_with_ip,
               CAST(sum(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_with_phone,
               CAST(sum(n_email) AS BIGINT) AS total_email,
               CAST(sum(n_ip) AS BIGINT) AS total_ip,
               CAST(sum(n_phone) AS BIGINT) AS total_phone
        FROM per
    """,
    "boilerplate_flag": f"""
        WITH {_BP_POSTS_SQL},
        per_doc AS (
          SELECT p.doc_id,
                 CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(sum(CASE WHEN g.gram_df >= {BP_MIN_DOCS} THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_bp_grams
          FROM posts p JOIN gdf g ON p.source = g.source AND p.gram = g.gram
          GROUP BY p.doc_id)
        SELECT doc_id, n_grams, n_bp_grams,
               CAST(n_bp_grams AS DOUBLE) / CAST(n_grams AS DOUBLE) AS bp_ratio,
               CAST(CASE WHEN CAST(n_bp_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
                              <= {BP_MAX_RATIO}
                         THEN 1 ELSE 0 END AS BIGINT) AS bp_keep
        FROM per_doc ORDER BY doc_id
    """,
    "boilerplate_top_grams": f"""
        WITH {_BP_POSTS_SQL}
        SELECT source, gram, gram_df, rk FROM (
          SELECT source, gram, gram_df,
                 CAST(row_number() OVER (
                   PARTITION BY source ORDER BY gram_df DESC, gram ASC)
                   AS INTEGER) AS rk
          FROM gdf)
        WHERE rk <= 10 ORDER BY source, rk
    """,
    "corpus_len_histogram": f"""
        WITH per AS (
          SELECT CAST(n_chars // {LEN_BUCKET} AS BIGINT) AS bucket,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(min(n_chars) AS BIGINT) AS min_chars,
                 CAST(max(n_chars) AS BIGINT) AS max_chars
          FROM documents GROUP BY 1)
        SELECT bucket, CAST(bucket * {LEN_BUCKET} AS BIGINT) AS bucket_lo,
               n_docs, min_chars, max_chars,
               CAST(n_docs AS DOUBLE) / CAST(sum(n_docs) OVER () AS DOUBLE)
                 AS doc_share
        FROM per ORDER BY bucket
    """,
}

QUERIES = {
    "pii_scrub": pii_scrub,
    "pii_scrub_summary": pii_scrub_summary,
    "boilerplate_flag": boilerplate_flag,
    "boilerplate_top_grams": boilerplate_top_grams,
    "corpus_len_histogram": corpus_len_histogram,
}
