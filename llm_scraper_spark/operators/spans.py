"""Span-sequence operators over the interleaved documents table
(doc_id, spans:array<struct<kind,text,media_ref,offset>>).

- heading_fold  (W1): the privacy-policy tag-stream fold,
  scrape_pp.py:26-47 ``flush_extracted_text`` — reproduced bug-for-bug:
  * ``prev`` starts as a HEADING, so a document's first heading run
    yields a key beginning with " -> ";
  * heading→text transition appends content with NO separator;
  * the final (key, value) pair is never flushed (dropped);
  * a text→heading transition flushes and REPLACES the key.
- dedup_spans   (W4): row-local first-wins fuzzy field dedup,
  content_cleaner.py:8-24 (threshold 90 Indel ratio).

Both are row-local folds (no shuffle): each document's spans are one
array cell, so the operator is a vectorized pandas UDF over Arrow
batches — the distributed cost is exactly one projection.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import deduplicate_fields

HEADING_KINDS = {"heading"}
CONTENT_KINDS = {"text"}


def fold_spans(spans: list[dict]) -> list[tuple[str, str]]:
    """Pure fold (shared with tests): ordered heading/text spans →
    [(heading_path, concatenated_text)].  Non-text/heading kinds
    (image/code/video) are skipped, mirroring the reference's
    H1/H2/H3/P-only selector (scrape_pp.py:105-110)."""
    prev = "heading"
    key = ""
    value = ""
    out: list[tuple[str, str]] = []
    for s in sorted(spans, key=lambda x: x["offset"]):
        kind, content = s["kind"], s["text"]
        if kind in HEADING_KINDS:
            tag = "heading"
        elif kind in CONTENT_KINDS:
            tag = "text"
        else:
            continue
        if prev == "heading" and tag == "heading":
            key += f" -> {content}"
        elif prev == "text" and tag == "text":
            value += f" {content.strip()}"
        elif prev == "heading" and tag == "text":
            value += content
        elif prev == "text" and tag == "heading":
            out.append((key, value))
            key = content
            value = ""
        prev = tag
    # reference bug preserved: last (key, value) never flushed
    return out


_FOLD_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("heading_path", T.StringType()),
            T.StructField("content", T.StringType()),
        ]
    )
)


@F.pandas_udf(_FOLD_SCHEMA)
def fold_spans_udf(spans: pd.Series) -> pd.Series:
    return spans.map(
        lambda arr: [
            {"heading_path": k, "content": v}
            for k, v in fold_spans([dict(s) for s in arr])
        ]
        if arr is not None
        else None
    )


def heading_fold(documents: DataFrame) -> DataFrame:
    """documents → (doc_id, heading_path, content) — explode the folded
    sections.  One narrow projection + explode; no shuffle."""
    return documents.select(
        "doc_id", F.explode(fold_spans_udf("spans")).alias("sec")
    ).select("doc_id", "sec.heading_path", "sec.content")


@F.pandas_udf(
    T.ArrayType(
        T.StructType(
            [
                T.StructField("kind", T.StringType()),
                T.StructField("text", T.StringType()),
                T.StructField("media_ref", T.StringType()),
                T.StructField("offset", T.IntegerType()),
            ]
        )
    )
)
def dedup_spans_udf(spans: pd.Series) -> pd.Series:
    """W4: drop later spans whose text fuzzy-matches (≥90) any earlier
    kept span — first-wins, order-dependent (content_cleaner.py:8-24).
    Non-text spans (image) are always kept."""

    def one(arr):
        if arr is None:
            return None
        ordered = sorted((dict(s) for s in arr), key=lambda x: x["offset"])
        texted = [(str(i), s["text"]) for i, s in enumerate(ordered) if s["text"]]
        kept_ids = {t for t, _ in deduplicate_fields(texted)}
        return [
            s
            for i, s in enumerate(ordered)
            if not s["text"] or str(i) in kept_ids
        ]

    return spans.map(one)


def dedup_spans(documents: DataFrame) -> DataFrame:
    return documents.withColumn("spans", dedup_spans_udf("spans"))
