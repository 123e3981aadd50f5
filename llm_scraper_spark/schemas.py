"""Explicit StructType schemas for every engine table.

The reference is schemaless (dicts + ``str(dict)`` lines +
``ast.literal_eval``; see SURVEY.md §1).  We fix explicit schemas; the
reference's config-driven field names become *data* (``span.kind``),
not schema.

Reference parity anchors (file:line in /root/reference):
- documents/spans: util/scraper/content_scraper.py:9-106 (interleaved
  text/image/code/video per page), server/scripts/scrape_pp.py:105-110
  (ordered H1/H2/H3/P tag stream).
- frontier/seen: server/scripts/extract_product_urls.py:12,39-41,57
  (VISITED list + product_urls set).
- triplets: server/scripts/scrape_eccomerce.py:285 ("(triple) weight
  url timestamp" lines).
- vertices/edges: src/database/db.py:287-443 (ArangoDB IoT_KG graph).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The input_hint table (BASELINE.json): interleaved text+media documents.
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType()),       # heading|text|code|image|video
        T.StructField("text", T.StringType()),       # null for image; transcript for video
        T.StructField("media_ref", T.StringType()),  # null for text/heading/code
        T.StructField("offset", T.IntegerType()),    # dense document order 0..n-1
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN)),
    ]
)

# Crawl documents as produced per round (doc_id = canonical URL).
CRAWL_DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN)),
        T.StructField("round", T.IntegerType()),
    ]
)

FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType()),        # canonical form
        T.StructField("url_hash", T.LongType()),     # sha1-based 63-bit hash
        T.StructField("host", T.StringType()),
        T.StructField("priority", T.DoubleType()),   # lower = sooner (depth-derived)
        T.StructField("depth", T.IntegerType()),
        T.StructField("discovered_round", T.IntegerType()),
        T.StructField("attempt", T.IntegerType()),   # bounded-retry counter
    ]
)

SEEN = T.StructType(
    [
        T.StructField("url_hash", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("first_round", T.IntegerType()),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("disallow_prefix", T.StringType()),  # null = allow all
        T.StructField("crawl_delay_ms", T.IntegerType()),
    ]
)

FETCH_LOG = T.StructType(
    [
        T.StructField("round", T.IntegerType()),
        T.StructField("slot", T.IntegerType()),      # per-host politeness slot (1-based)
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("attempt", T.IntegerType()),   # bounded-retry counter
        T.StructField("ok", T.BooleanType()),        # fetch outcome
    ]
)

LINKS = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("out_url", T.StringType()),
        T.StructField("is_next_page", T.BooleanType()),
    ]
)

TRIPLETS = T.StructType(
    [
        T.StructField("subj_type", T.StringType()),
        T.StructField("subj", T.StringType()),
        T.StructField("predicate", T.StringType()),
        T.StructField("obj_type", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("weight", T.DoubleType()),
        T.StructField("url", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

VERTICES = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("src_key", T.StringType()),
        T.StructField("dst_key", T.StringType()),
        T.StructField("relationship", T.StringType()),
        T.StructField("weight", T.DoubleType()),
    ]
)

# Valid node/edge types — reference src/database/db.py:442-443.
NODE_TYPES = [
    "device",
    "manufacturer",
    "application",
    "process",
    "sensor",
    "observation",
    "inference",
    "research",
    "privacyPolicy",
    "regulation",
]

EDGE_TYPES = [
    "manufactures",
    "communicatesWith",
    "runs",
    "performs",
    "contains",
    "observes",
    "infers",
    "collects",
    "supports",
    "states",
    "regulates",
    "governs",
    "monitors",
    "analyzes",
    "produces",
]
