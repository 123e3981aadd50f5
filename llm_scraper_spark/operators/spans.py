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


def synth_span_docs_py(
    sf_dir: str, extra_words: bool = False, keep_mod: int = 1
) -> dict[int, list[dict]]:
    """Pure-Python mirror of ``synth_span_docs`` (pyarrow read, no
    Spark anywhere) — the independent oracle input for the
    self-checking driver gates below and for tests.  ``keep_mod > 1``
    keeps only docs with ``doc_id % keep_mod == 0``: the filter runs
    per record batch BEFORE any span construction, so driver memory
    and Python-level work stay O(kept docs), not O(corpus) — the
    CHECK_N gates pass their stride here instead of post-filtering."""
    import pyarrow.parquet as pq

    extras = ["sensor", "hub", "camera", "thermostat"]
    out: dict[int, list[dict]] = {}
    pf = pq.ParquetFile(f"{sf_dir}/documents.parquet")
    kept: list[tuple[int, str]] = []
    for batch in pf.iter_batches(columns=["doc_id", "text"]):
        ids = batch.column(0).to_pylist()
        if keep_mod > 1:
            idx = [i for i, d in enumerate(ids) if d % keep_mod == 0]
            if not idx:
                continue
            texts = batch.column(1).take(idx).to_pylist()
            ids = [ids[i] for i in idx]
        else:
            texts = batch.column(1).to_pylist()
        kept.extend(zip(ids, texts))
    for doc_id, text in kept:
        if extra_words:
            text = f"{text} {extras[doc_id % 4]} vendor energy"
        ws = text.split(" ")
        n_chunks = max(min((len(ws) + 3) // 4, 8), 1)
        spans = []
        for i in range(n_chunks):
            kind = "heading" if i % 3 == 0 else ("image" if i % 5 == 4 else "text")
            spans.append(
                {
                    "kind": kind,
                    "text": "" if i % 5 == 4 else " ".join(ws[4 * i : 4 * i + 4]),
                    "media_ref": f"img://{doc_id}/{i}" if i % 5 == 4 else None,
                    "offset": i,
                }
            )
        out[doc_id] = spans
    return out


def w1_heading_fold(spark, sf_dir: str) -> DataFrame:
    """W1: the privacy-policy tag-stream fold over synthesized spans —
    reproduces scrape_pp.py:26-47 bug-for-bug.  The DuckDB twin is the
    gaps-and-islands form of the same fold: segments split at
    text→heading transitions, each segment is a heading-run (the
    ``" -> "``-joined key — leading separator on the first segment,
    the reference's prev-starts-as-heading quirk) followed by a
    text-run (first text appended raw, later texts trimmed and
    space-joined), and the final segment per document is dropped (the
    reference's never-flushed-last-pair bug)."""
    return heading_fold(synth_span_docs(spark, sf_dir)).orderBy(
        "doc_id", "heading_path", "content"
    )


#: target size of the deterministic check subset the self-checking
#: gates below run on: every K-th doc with K = max(1, n_docs // 500),
#: computed identically in Python (pyarrow count), Spark, and the
#: DuckDB twin.  The checked logic is doc-local, so a fixed-size
#: stratified subset exercises every code path while keeping the
#: driver-side oracle O(CHECK_N) — never O(corpus) — at any SF.
CHECK_N = 500


def _check_mod(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return max(1, n // CHECK_N)


def _hash40(s: str) -> int:
    """40-bit md5 prefix — the same value Spark computes as
    ``conv(substr(md5(s), 1, 10), 16, 10)``; summing ≤ CHECK_N of
    them stays far below 2^63 (order-independent multiset checksum,
    the doc_fingerprint xor-fold trick)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:10], 16)


_H40_SPARK = "cast(conv(substr(md5({s}), 1, 10), 16, 10) as bigint)"


#: Twin of the gate shell: n_docs/n_checked from the documents table
#: (K re-derived with the same max(1, n // CHECK_N) formula
#: `_check_mod` uses), n_mismatch pinned to the literal 0.
_GATE_SQL = f"""
    WITH kk AS (SELECT greatest(1, count(*) // {CHECK_N}) AS k FROM documents)
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (doc_id % (SELECT k FROM kk) = 0) AS BIGINT)
             AS n_checked,
           CAST(0 AS BIGINT) AS n_mismatch
    FROM documents
"""


def w4_span_dedup(spark, sf_dir: str) -> DataFrame:
    """W4: first-wins fuzzy span dedup (content_cleaner.py:8-24,
    threshold-90 Indel).  Indel scoring has no SQL form, so the driver
    gate is SELF-CHECKING: over the deterministic CHECK_N-doc subset
    (doc_id % K == 0), the Spark UDF's per-doc kept-counts are folded
    into an order-independent checksum (Σ 40-bit md5 of
    "doc_id|n_kept") and compared against the same checksum from an
    independent pure-Python oracle (pyarrow input via
    ``synth_span_docs_py`` + the shared ``deduplicate_fields`` — no
    Spark in the oracle path).  The DuckDB twin pins ``n_docs`` /
    ``n_checked`` from the documents table and ``n_mismatch`` as the
    literal 0; any Spark/oracle divergence flips n_mismatch to 1 and
    fails the value-hash compare.  Production pipelines call
    ``dedup_spans`` (the distributed half) directly — this query is
    the gate."""
    k = _check_mod(sf_dir)
    chk = 0
    for doc_id, spans in synth_span_docs_py(sf_dir, keep_mod=k).items():
        texted = [(str(i), s["text"]) for i, s in enumerate(spans) if s["text"]]
        kept_ids = {t for t, _ in deduplicate_fields(texted)}
        n = sum(
            1 for i, s in enumerate(spans) if not s["text"] or str(i) in kept_ids
        )
        chk += _hash40(f"{doc_id}|{n}")
    src = synth_span_docs(spark, sf_dir).filter(F.col("doc_id") % k == 0)
    kept = dedup_spans(src).select(
        "doc_id",
        F.expr(
            _H40_SPARK.format(
                s="concat_ws('|', cast(doc_id as string),"
                " cast(size(spans) as string))"
            )
        ).alias("h"),
    )
    agg = kept.agg(
        F.count("*").cast("long").alias("n_checked"),
        F.coalesce(F.sum("h"), F.lit(0)).alias("spark_chk"),
    )
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    return n_docs.crossJoin(agg).select(
        "n_docs",
        "n_checked",
        F.when(F.col("spark_chk") == F.lit(chk), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("n_mismatch"),
    )


def extract_triplet_pipeline(spark, sf_dir: str) -> DataFrame:
    """The reference's flagship per-doc pipeline (scrape_eccomerce.py:
    179-292) as one plan: classify gate → entity extraction →
    synthetic-LLM triplet parse with the camel-collapse mangle
    (response_cleaner.py:48-63).  The eval-based string mangle is not
    SQL-expressible, so like ``w4_span_dedup`` the driver gate is
    self-checking over the deterministic CHECK_N-doc subset: the Spark
    triplet multiset folds to an order-independent checksum (Σ 40-bit
    md5 of the '|'-joined 6-tuple) compared against the identical fold
    of the pure-Python ``extract_triplets_doc`` oracle over
    ``synth_span_docs_py`` input — a multiset compare without ever
    materializing the expected multiset on the driver.  The DuckDB
    twin pins ``n_docs``/``n_checked`` + the literal ``n_mismatch=0``.
    Production calls ``extract_triplets`` directly."""
    from .extract import extract_triplets, extract_triplets_doc

    k = _check_mod(sf_dir)
    chk = 0
    for doc_id, spans in synth_span_docs_py(
        sf_dir, extra_words=True, keep_mod=k
    ).items():
        for st, sn, p, ot, on in extract_triplets_doc(spans):
            chk += _hash40(f"{doc_id}|{st}|{sn}|{p}|{ot}|{on}")
    docs = synth_span_docs(spark, sf_dir, extra_words=True).filter(
        F.col("doc_id") % k == 0
    )
    got = extract_triplets(docs).select(
        F.expr(
            _H40_SPARK.format(
                s="concat_ws('|', cast(url as string), subj_type, subj,"
                " predicate, obj_type, obj)"
            )
        ).alias("h")
    )
    agg = got.agg(F.coalesce(F.sum("h"), F.lit(0)).alias("spark_chk"))
    counts = spark.read.parquet(f"{sf_dir}/documents.parquet").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("doc_id") % k == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_checked"),
    )
    return counts.crossJoin(agg).select(
        "n_docs",
        "n_checked",
        F.when(F.col("spark_chk") == F.lit(chk), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("n_mismatch"),
    )


_W1_FOLD_SQL = r"""
    WITH chunks AS (
      SELECT doc_id, i,
             CASE WHEN i % 3 = 0 THEN 'heading'
                  WHEN i % 5 = 4 THEN 'image'
                  ELSE 'text' END AS kind,
             CASE WHEN i % 5 = 4 THEN ''
                  ELSE array_to_string(ws[4*i+1 : 4*i+4], ' ') END AS txt
      FROM (
        SELECT doc_id, ws,
               unnest(range(0, greatest(least((len(ws)+3)//4, 8), 1))) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      )
    ),
    filtered AS (SELECT * FROM chunks WHERE kind IN ('heading','text')),
    bnd AS (
      SELECT doc_id, i, kind, txt,
             CASE WHEN kind = 'heading'
                   AND lag(kind) OVER (PARTITION BY doc_id ORDER BY i) = 'text'
                  THEN 1 ELSE 0 END AS is_bnd
      FROM filtered
    ),
    seg AS (
      SELECT doc_id, i, kind, txt,
             sum(is_bnd) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS UNBOUNDED PRECEDING) AS seg
      FROM bnd
    ),
    wtext AS (
      SELECT *, sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id, seg ORDER BY i
                        ROWS UNBOUNDED PRECEDING) AS trn
      FROM seg
    ),
    folded AS (
      SELECT doc_id, seg,
             CASE WHEN seg = 0
                  THEN coalesce(' -> ' || string_agg(
                         CASE WHEN kind='heading' THEN txt END, ' -> ' ORDER BY i), '')
                  ELSE string_agg(
                         CASE WHEN kind='heading' THEN txt END, ' -> ' ORDER BY i)
             END AS heading_path,
             coalesce(string_agg(CASE WHEN kind='text'
                                      THEN CASE WHEN trn = 1 THEN txt
                                                ELSE trim(txt) END
                                 END, ' ' ORDER BY i), '') AS content
      FROM wtext GROUP BY doc_id, seg
    )
    SELECT doc_id, heading_path, content
    FROM (SELECT *, max(seg) OVER (PARTITION BY doc_id) AS mx FROM folded)
    WHERE seg < mx
    ORDER BY doc_id, heading_path, content
"""

ORACLE_SQL: dict[str, str] = {
    "w1_heading_fold": _W1_FOLD_SQL,
    "w4_span_dedup": _GATE_SQL,
    "extract_triplet_pipeline": _GATE_SQL,
}

QUERIES = {
    "w1_heading_fold": w1_heading_fold,
    "w4_span_dedup": w4_span_dedup,
    "extract_triplet_pipeline": extract_triplet_pipeline,
}
