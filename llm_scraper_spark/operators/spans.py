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


# ----------------------------------------------------- driver contract
def synth_span_docs(spark, sf_dir: str, extra_words: bool = False) -> DataFrame:
    """Deterministic interleaved span documents synthesized from the
    flat testdata documents table (the driver corpus has no nested
    spans; the crawl path produces them from synthweb).  4-word chunks;
    every 3rd chunk is a heading, every 5th an image span with a
    media_ref and empty text — the input_hint table shape
    (doc_id, spans:array<struct<kind,text,media_ref,offset>>).
    Built entirely with JVM array functions: no UDF, no shuffle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text = F.col("text")
    if extra_words:
        # splice IoT vocabulary in so the classify gate and entity
        # extractor have something to find on the synthetic corpus
        text = F.concat(
            text,
            F.lit(" "),
            F.element_at(
                F.array(F.lit("sensor"), F.lit("hub"), F.lit("camera"), F.lit("thermostat")),
                (F.col("doc_id") % 4 + 1).cast("int"),
            ),
            F.lit(" vendor energy"),
        )
    words = F.split(text, " ")
    n_chunks = F.least(
        F.floor((F.size(words) + 3) / 4).cast("int"), F.lit(8)
    )
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    spans = F.transform(
        idx,
        lambda i: F.struct(
            F.when(i % 3 == 0, F.lit("heading"))
            .when(i % 5 == 4, F.lit("image"))
            .otherwise(F.lit("text"))
            .alias("kind"),
            F.when(
                i % 5 == 4, F.lit("")
            ).otherwise(F.concat_ws(" ", F.slice(words, i * 4 + 1, 4))).alias("text"),
            F.when(
                i % 5 == 4,
                F.concat(
                    F.lit("img://"), F.col("doc_id").cast("string"), F.lit("/"),
                    i.cast("string"),
                ),
            ).alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return docs.select("doc_id", spans.alias("spans"))


def w1_heading_fold(spark, sf_dir: str) -> DataFrame:
    """W1: the privacy-policy tag-stream fold over synthesized spans —
    reproduces scrape_pp.py:26-47 bug-for-bug (rows-only driver check:
    the sequential fold with its dropped-final-pair quirk is not
    SQL-expressible; equality vs the pure-Python fold is pytest-gated
    in tests/test_spans_extract.py)."""
    return heading_fold(synth_span_docs(spark, sf_dir)).orderBy(
        "doc_id", "heading_path", "content"
    )


def w4_span_dedup(spark, sf_dir: str) -> DataFrame:
    """W4: first-wins fuzzy span dedup (content_cleaner.py:8-24,
    threshold-90 Indel) — rows-only (rapidfuzz-style scoring has no
    SQL twin); per-doc kept/dropped counts."""
    src = synth_span_docs(spark, sf_dir)
    kept = dedup_spans(src)
    return (
        src.select("doc_id", F.size("spans").alias("n_spans"))
        .join(
            kept.select("doc_id", F.size("spans").alias("n_kept")), "doc_id"
        )
        .withColumn("n_dropped", (F.col("n_spans") - F.col("n_kept")).cast("long"))
        .select(
            "doc_id",
            F.col("n_spans").cast("long").alias("n_spans"),
            F.col("n_kept").cast("long").alias("n_kept"),
            "n_dropped",
        )
        .orderBy("doc_id")
    )


def extract_triplet_pipeline(spark, sf_dir: str) -> DataFrame:
    """The reference's flagship per-doc pipeline (scrape_eccomerce.py:
    179-292) as one plan: classify gate → entity extraction →
    synthetic-LLM triplet parse with the camel-collapse mangle
    (response_cleaner.py:48-63) — rows-only (the eval-based string
    mangle is not SQL-expressible; pytest-gated vs the pure-Python
    oracle)."""
    from .extract import extract_triplets

    docs = synth_span_docs(spark, sf_dir, extra_words=True)
    return extract_triplets(docs).orderBy(
        "url", "subj", "predicate", "obj"
    )


ORACLE_SQL: dict[str, str] = {}

QUERIES = {
    "w1_heading_fold": w1_heading_fold,
    "w4_span_dedup": w4_span_dedup,
    "extract_triplet_pipeline": extract_triplet_pipeline,
}
