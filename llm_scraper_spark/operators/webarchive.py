"""Web-archive interop: CDX/SURT capture index + WARC export accounting.

A web-scale crawl is not done when pages are fetched — the corpus has
to leave the engine in the formats the archive ecosystem speaks
(Common Crawl publishes WARC + CDX; every replay/dedup tool downstream
keys on SURT).  The reference keeps its pages as ad-hoc JSON files
(server/scripts/util/scrape/extract_htmls.py:43-87 dumps raw HTML,
db.py stores documents one row at a time) and has no index or export
format at all; these operators are the scale path for that gap.

* **`cdx_surt_index`** — the capture index: one row per crawled URL
  with its SURT key (Sort-friendly URI Reordering Transform — the
  public web-archive convention: scheme dropped, host lowercased,
  ``www.`` stripped, host labels reversed comma-joined, query
  parameters sorted), content digest, and byte length, globally
  sorted by (surt_key, url).  SURT is what makes a CDX file *useful*:
  all captures of one host — and one directory subtree — are
  contiguous under range scans.  Everything is row-local JVM string
  codegen (regexp_extract / split / reverse / array_sort); the only
  shuffle is the range-exchange of the final sort, which IS the
  product (a CDX index is by definition a sorted file).

* **`warc_manifest`** — WARC/1.1 export accounting: each capture is
  rendered row-locally into a full deterministic WARC response record
  (version line, record-id UUID derived from md5(url), target-URI,
  payload digest, Content-Length in BYTES, CRLF discipline), then
  folded per export shard into (records, bytes, order-free checksum).
  The record text itself never moves to the driver and never
  shuffles — only the 3-number-per-shard summary does — but the
  checksum pins every byte of every record cross-engine, so the twin
  proves the export format, not just the counts.

Synthetic captures derive from ``documents`` exactly like
operators/crawlsched.py's alias universe: deterministic messy URLs
(http vs https, ``www.`` or not, unsorted query parameters) so the
SURT normalizations are all exercised and the DuckDB twin rebuilds
the identical input.  A production run feeds the crawler's fetched
table ((url, text) after frontier.fetch) through the same kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_HOSTS = 20       # synthetic host buckets (matches crawlsched)
N_SHARDS = 16      # WARC export shards
CK_HEX = 10        # checksum folds the first 40 bits of each record md5

# ------------------------------------------------- synthetic capture table
#: one messy URL per doc: scheme varies (http for doc_id%4==0), www.
#: prefix for doc_id%3==0, an UNSORTED query string for doc_id%5==0
_URL_SPARK = (
    "concat("
    " if(doc_id % 4 = 0, 'http://', 'https://'),"
    " if(doc_id % 3 = 0, 'www.', ''),"
    " 'site', cast(doc_id % {n} as string), '.Example.com',"
    " '/page/', cast(doc_id as string), '/',"
    " if(doc_id % 5 = 0, '?b=2&a=1', '')"
    ")"
).format(n=N_HOSTS)

_URL_DUCK = (
    "(CASE WHEN doc_id % 4 = 0 THEN 'http://' ELSE 'https://' END"
    " || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END"
    f" || 'site' || (doc_id % {N_HOSTS}) || '.Example.com'"
    " || '/page/' || doc_id || '/'"
    " || CASE WHEN doc_id % 5 = 0 THEN '?b=2&a=1' ELSE '' END)"
)


def _captures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("doc_id", f"{_URL_SPARK} AS url", "text")
    )


# ----------------------------------------------------------------- SURT
#: the shared regex split (Java ∩ RE2 dialect subset, as pii_scrub):
#: scheme://host[/path][?query] — host stops at '/' or '?'
_RX_HOST = "^[a-z]+://([^/?]+)"
_RX_PATH = "^[a-z]+://[^/?]*([^?]*)"
_RX_QUERY = "\\\\?(.*)$"  # renders '\\?(.*)$' inside the SQL literal


def surt_key_col(url: str = "url") -> str:
    """SQL expression: SURT key of a URL column — scheme dropped,
    host lowercased + ``www.``-stripped + label-reversed (comma
    separators), then ``)`` + path + ``?`` + param-sorted query.
    Pure row-local codegen; identical text in the DuckDB twin modulo
    function spellings (see _SURT_DUCK)."""
    host = f"lower(regexp_extract({url}, '{_RX_HOST}', 1))"
    host = f"if(startswith({host}, 'www.'), substr({host}, 5), {host})"
    rev = f"array_join(reverse(split({host}, '\\\\.')), ',')"
    path = f"regexp_extract({url}, '{_RX_PATH}', 1)"
    query = f"regexp_extract({url}, '{_RX_QUERY}', 1)"
    qsorted = f"array_join(array_sort(split({query}, '&')), '&')"
    return (
        f"concat({rev}, ')', {path},"
        f" if({query} = '', '', concat('?', {qsorted})))"
    )


def cdx_surt_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDX capture index: (surt_key, url, digest, length_bytes)
    globally sorted by (surt_key, url) — the range-partitioned sort is
    the product; all key derivation is row-local."""
    return (
        _captures(spark, sf_dir)
        .selectExpr(
            f"{surt_key_col()} AS surt_key",
            "url",
            "md5(text) AS digest",
            "cast(octet_length(text) as bigint) AS length_bytes",
        )
        .orderBy("surt_key", "url")
    )


# ----------------------------------------------------------------- WARC
def warc_record_col(url: str = "url", text: str = "text") -> str:
    """SQL expression: a full WARC/1.1 response record for one capture.
    Record-ID is a UUID formatted from md5(url) (deterministic, both
    engines agree); Content-Length is the payload's BYTE length; CRLF
    throughout, blank line between headers and payload, double CRLF
    terminator per the spec."""
    h = f"md5({url})"
    uuid = (
        f"concat(substr({h},1,8),'-',substr({h},9,4),'-',"
        f"substr({h},13,4),'-',substr({h},17,4),'-',substr({h},21,12))"
    )
    crlf = "chr(13), chr(10)"
    return (
        "concat("
        f"'WARC/1.1', {crlf},"
        f"'WARC-Type: response', {crlf},"
        f"'WARC-Record-ID: <urn:uuid:', {uuid}, '>', {crlf},"
        f"'WARC-Target-URI: ', {url}, {crlf},"
        f"'WARC-Payload-Digest: md5:', md5({text}), {crlf},"
        f"'Content-Type: text/html', {crlf},"
        f"'Content-Length: ', cast(octet_length({text}) as string), {crlf},"
        f"{crlf},"
        f"{text}, {crlf}, {crlf}"
        ")"
    )


def warc_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard WARC export manifest: (shard, n_records, total_bytes,
    records_checksum).  The checksum is the order-free sum of the
    first 40 bits of md5(record) — any byte drift in any record's
    rendering breaks it, so the twin certifies the full export format
    while only 3 longs per shard ever shuffle."""
    recs = _captures(spark, sf_dir).selectExpr(
        f"doc_id % {N_SHARDS} AS shard",
        f"{warc_record_col()} AS rec",
    )
    return (
        recs.selectExpr(
            "shard",
            "cast(octet_length(rec) as bigint) AS nbytes",
            f"cast(conv(substr(md5(rec), 1, {CK_HEX}), 16, 10) as bigint)"
            " AS ck",
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_records"),
            F.sum("nbytes").cast("long").alias("total_bytes"),
            F.sum("ck").cast("long").alias("records_checksum"),
        )
        .orderBy("shard")
    )


# ------------------------------------------------------------ WARC ingest
def warc_parse_cols(rec: str = "rec") -> list[str]:
    """SQL expressions parsing a WARC/1.1 response record back into
    capture columns: target URI, payload digest, declared
    Content-Length, and the payload itself ((?s) so the body may span
    CRLFs).  The inverse of `warc_record_col` — the engine can ingest
    its own (or any conforming) WARC export."""
    return [
        f"regexp_extract({rec}, 'WARC-Target-URI: ([^\\r]*)', 1) AS url",
        f"regexp_extract({rec}, 'WARC-Payload-Digest: md5:([0-9a-f]{{32}})', 1)"
        " AS digest",
        f"cast(regexp_extract({rec}, 'Content-Length: ([0-9]+)', 1) as bigint)"
        " AS length_bytes",
        f"regexp_extract({rec}, '(?s)\\r\\n\\r\\n(.*)\\r\\n\\r\\n$', 1)"
        " AS payload",
    ]


def warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip gate: render every capture as a WARC record, parse
    it back, and verify the payload against the record's OWN headers
    (digest and byte length recomputed from the parsed payload).  The
    emitted ``payload_ok`` flag is pinned to 1 in the twin — any drift
    in either the renderer or the parser in either engine flips it and
    fails the value hash.  All row-local; the output is the CDX-shaped
    capture table a WARC-source scan would feed the engine."""
    recs = _captures(spark, sf_dir).selectExpr(f"{warc_record_col()} AS rec")
    return (
        recs.selectExpr(*warc_parse_cols())
        .selectExpr(
            "url",
            "digest",
            "length_bytes",
            "if(md5(payload) = digest"
            " and octet_length(payload) = length_bytes, 1L, 0L)"
            " AS payload_ok",
        )
        .orderBy("url")
    )


# ------------------------------------------------------------ DuckDB twins
_SURT_DUCK = """
  parts AS (
    SELECT url, digest, length_bytes,
           CASE WHEN lower(regexp_extract(url, '^[a-z]+://([^/?]+)', 1))
                     LIKE 'www.%'
                THEN substr(lower(regexp_extract(url, '^[a-z]+://([^/?]+)', 1)), 5)
                ELSE lower(regexp_extract(url, '^[a-z]+://([^/?]+)', 1))
           END AS host,
           regexp_extract(url, '^[a-z]+://[^/?]*([^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query
    FROM caps
  )
"""

_REC_DUCK = (
    "('WARC/1.1' || chr(13) || chr(10)"
    " || 'WARC-Type: response' || chr(13) || chr(10)"
    " || 'WARC-Record-ID: <urn:uuid:'"
    " || substr(md5(url),1,8) || '-' || substr(md5(url),9,4) || '-'"
    " || substr(md5(url),13,4) || '-' || substr(md5(url),17,4) || '-'"
    " || substr(md5(url),21,12) || '>' || chr(13) || chr(10)"
    " || 'WARC-Target-URI: ' || url || chr(13) || chr(10)"
    " || 'WARC-Payload-Digest: md5:' || md5(text) || chr(13) || chr(10)"
    " || 'Content-Type: text/html' || chr(13) || chr(10)"
    " || 'Content-Length: ' || strlen(text) || chr(13) || chr(10)"
    " || chr(13) || chr(10)"
    " || text || chr(13) || chr(10) || chr(13) || chr(10))"
)

ORACLE_SQL = {
    "cdx_surt_index": f"""
        WITH caps AS (
          SELECT {_URL_DUCK} AS url, md5(text) AS digest,
                 CAST(strlen(text) AS BIGINT) AS length_bytes
          FROM documents
        ),
        {_SURT_DUCK}
        SELECT array_to_string(list_reverse(string_split(host, '.')), ',')
                 || ')' || path
                 || CASE WHEN query = '' THEN '' ELSE
                      '?' || array_to_string(list_sort(string_split(query, '&')), '&')
                    END AS surt_key,
               url, digest, length_bytes
        FROM parts
        ORDER BY surt_key, url
    """,
    "warc_manifest": f"""
        WITH caps AS (
          SELECT doc_id % {N_SHARDS} AS shard, {_URL_DUCK} AS url, text
          FROM documents
        ),
        recs AS (SELECT shard, {_REC_DUCK} AS rec FROM caps)
        SELECT shard,
               CAST(count(*) AS BIGINT) AS n_records,
               CAST(sum(strlen(rec)) AS BIGINT) AS total_bytes,
               CAST(sum(CAST(concat('0x', substr(md5(rec), 1, {CK_HEX}))
                             AS BIGINT)) AS BIGINT) AS records_checksum
        FROM recs GROUP BY shard ORDER BY shard
    """,
}

# NOTE: the \r\n below are REAL control characters inside the SQL text
# (Python escapes), matching the prototype-verified DuckDB pattern
# dialect; the Spark side spells them as SQL-literal escapes instead.
ORACLE_SQL["warc_ingest"] = f"""
    WITH caps AS (
      SELECT {_URL_DUCK} AS url, text FROM documents
    ),
    recs AS (SELECT {_REC_DUCK} AS rec FROM caps),
    parsed AS (
      SELECT regexp_extract(rec, 'WARC-Target-URI: ([^\r]*)', 1) AS url,
             regexp_extract(rec, 'WARC-Payload-Digest: md5:([0-9a-f]{{32}})', 1)
               AS digest,
             CAST(regexp_extract(rec, 'Content-Length: ([0-9]+)', 1)
                  AS BIGINT) AS length_bytes,
             regexp_extract(rec, '(?s)\r\n\r\n(.*)\r\n\r\n$', 1) AS payload
      FROM recs
    )
    SELECT url, digest, length_bytes,
           CASE WHEN md5(payload) = digest
                 AND strlen(payload) = length_bytes
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             AS payload_ok
    FROM parsed ORDER BY url
"""

QUERIES = {
    "cdx_surt_index": cdx_surt_index,
    "warc_manifest": warc_manifest,
    "warc_ingest": warc_ingest,
}
