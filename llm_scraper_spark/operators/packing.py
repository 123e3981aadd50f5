"""Corpus → training-batch operators: segment-level exact dedup
(RefinedWeb / MassiveText line-dedup analog) and GPT-style
concatenate-and-chunk sequence packing.

Reference tie-in: the reference dedups whole fields row-locally
(server/scripts/util/content_cleaner.py) and ships scraped text
downstream as one JSON blob per page — it has no corpus-wide segment
dedup and no batch packing because a single-node scraper never sees
the corpus at once.  These are the two operators a training-data
pipeline needs between that scraper's output and a trainer's input,
expressed Spark-first.

Scale design (the whole point of both plans):

* ``para_dedup`` — the dedup DECISION runs entirely on skinny
  ``(doc_id, pos, fp)`` triples: segments are fingerprinted row-locally
  (md5 of the segment words), the first occurrence per fingerprint is a
  partial-aggregatable ``min(struct(doc_id, pos))`` (map-side combine,
  16-byte keys — document text NEVER enters the shuffle), kept
  positions fold back to one skinny array per doc, and the cleaned text
  is rebuilt ROW-LOCALLY by re-slicing the original word array in the
  doc row.  Total motion: two hash-aggregations of ~40-byte rows plus
  one doc_id equi-join — at 100 TB the shuffled bytes are ~1-2% of
  corpus size.  A row_number-over-fingerprint formulation (the naive
  translation) would instead sort full text by fingerprint and put
  every occurrence of a hot boilerplate segment in ONE task; min-struct
  has no such hot-key failure mode.

* ``pack_sequences`` — assigns every document its byte range in the
  virtual concatenation of the corpus (deterministic doc_id order) and
  derives the training-sequence bins it spans (context window CTX).
  The global prefix-sum is computed as a classic two-phase distributed
  scan: contiguous doc_id ranges → per-bucket window cumsum (each
  bucket is an independent partition-local sort), bucket totals (B tiny
  rows) → running offsets, broadcast join back.  No global
  single-partition window — the naive ``Window.orderBy(doc_id)`` plan
  funnels 100 TB through one task; this one never materializes more
  than a bucket per task and B scales with the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: words per dedup segment.  Production splits on real paragraph/line
#: boundaries; the synthetic corpus is single-line ~40-word docs, so a
#: fixed word window stands in (4 words ≈ the collision-bearing
#: segment size at this corpus' vocabulary).  The rule is disclosed
#: and identical in the DuckDB twin.
SEG_W = 4
#: tokens per packed training sequence (context window).
CTX = 128
#: prefix-sum buckets — sized to the cluster, not the data (each
#: bucket is one partition-local cumsum; totals frame stays B rows).
N_BUCKETS = 32
#: RAG-ingestion chunking: window width and overlap in words.
CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8
_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _with_words(docs: DataFrame) -> DataFrame:
    """(doc_id, ws array<string>, n_segs) — row-local; single-space
    split in BOTH engines so segment contents are bit-identical."""
    return docs.select(
        "doc_id", F.split("text", " ").alias("ws")
    ).withColumn("n_segs", F.expr(f"CAST((size(ws) + {SEG_W - 1}) DIV {SEG_W} AS INT)"))


def _seg_text(ws, pos):
    """Segment ``pos`` of word array ``ws`` — the one shared
    definition used to fingerprint AND to rebuild kept text."""
    return F.array_join(F.slice(ws, pos * SEG_W + 1, SEG_W), " ")


def para_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact segment dedup, first occurrence wins
    (ordered by (doc_id, segment position)).  Emits per doc: segment
    count, surviving-segment count, and the cleaned text rebuilt from
    the surviving segments in order."""
    ws = _with_words(_docs(spark, sf_dir))
    # row-local explode of (doc_id, pos, fp) ONLY — text stays home
    fps = ws.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_segs") - 1),
                lambda i: F.md5(_seg_text(F.col("ws"), i)),
            )
        ).alias("pos", "fp"),
    )
    # first occurrence per fingerprint = the kept set.  min(struct) is
    # partial-aggregatable: a hot boilerplate fp combines map-side to
    # one candidate per task before the shuffle.
    winners = fps.groupBy("fp").agg(F.min(F.struct("doc_id", "pos")).alias("w"))
    kept_pos = (
        winners.select(F.col("w.doc_id").alias("doc_id"), F.col("w.pos").alias("pos"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("kept_pos"))
    )
    kp = F.coalesce("kept_pos", F.array().cast("array<int>"))
    return (
        ws.join(kept_pos, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_segs").cast("long").alias("n_paras"),
            F.coalesce(F.size("kept_pos"), F.lit(0)).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(kp, lambda p: _seg_text(F.col("ws"), p)), " "
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


def _max_doc_id(spark: SparkSession, sf_dir: str) -> int:
    """Upper doc_id bound from parquet footer column statistics — no
    scan (a lakehouse manifest serves the same number); Spark-agg
    fallback for stat-less files."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata
        col = next(
            i
            for i in range(md.schema.to_arrow_schema().num_fields)
            if md.schema.column(i).name == "doc_id"
        )
        return max(
            md.row_group(g).column(col).statistics.max
            for g in range(md.num_row_groups)
        )
    except Exception:
        return _docs(spark, sf_dir).agg(F.max("doc_id")).first()[0]


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk packing: documents are laid end-to-end in
    doc_id order (whitespace token count) and cut into CTX-token
    training sequences; each doc reports the token range and the
    first/last sequence bin it lands in.  The global running offset is
    a two-phase distributed prefix-sum (see module docstring) — the
    per-doc result is IDENTICAL to a single global window, which is
    exactly what the DuckDB twin runs."""
    toks = _with_words(_docs(spark, sf_dir)).select(
        "doc_id", F.size("ws").cast("long").alias("n_tokens")
    )
    return pack_over(toks, int(_max_doc_id(spark, sf_dir)) + 1)


def pack_over(toks: DataFrame, hi: int) -> DataFrame:
    """The packing kernel over any ``(doc_id, n_tokens)`` frame with
    doc_ids < ``hi`` — `pack_sequences` applies it to the raw corpus;
    the composed training-batch pipeline applies it to the sampled
    survivor set.  Identical two-phase prefix-sum plan."""
    b = F.least(
        F.lit(N_BUCKETS - 1),
        (F.col("doc_id") * N_BUCKETS / F.lit(hi)).cast("int"),
    ).alias("bucket")
    in_bucket = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    part = toks.select("doc_id", "n_tokens", b).withColumn(
        "cum_in_bucket", F.sum("n_tokens").over(in_bucket)
    )
    # B tiny rows: running offset of each bucket = sum of all earlier
    # buckets' totals (single-partition window over B rows, not data)
    run = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("btot"))
        .withColumn("boff", F.coalesce(F.sum("btot").over(run), F.lit(0)))
        .select("bucket", "boff")
    )
    start = F.col("boff") + F.col("cum_in_bucket") - F.col("n_tokens")
    end = F.col("boff") + F.col("cum_in_bucket") - 1
    return (
        part.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            start.alias("tok_start"),
            F.floor(start / CTX).cast("long").alias("start_bin"),
            F.floor(end / CTX).cast("long").alias("end_bin"),
            (start % CTX).cast("long").alias("bin_offset"),
        )
        .orderBy("doc_id")
    )


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking for retrieval ingestion: CHUNK_TOKENS-word
    windows at stride CHUNK_TOKENS − CHUNK_OVERLAP, last window
    truncated, short docs emit one whole-doc chunk.  Entirely row-local
    (transform + posexplode — zero shuffle; output order is the input
    order, so downstream embedding jobs stream it partition-parallel
    with no exchange)."""
    docs = _docs(spark, sf_dir)
    ws = docs.select("doc_id", F.split("text", " ").alias("ws")).withColumn(
        "n_chunks",
        F.greatest(
            F.lit(1),
            F.expr(
                f"CAST((size(ws) - {CHUNK_OVERLAP} + {_STRIDE - 1})"
                f" DIV {_STRIDE} AS INT)"
            ),
        ),
    )
    chunk = lambda i: F.slice(F.col("ws"), i * _STRIDE + 1, CHUNK_TOKENS)  # noqa: E731
    return ws.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_chunks") - 1),
                lambda i: F.struct(
                    F.size(chunk(i)).cast("long").alias("n_tokens"),
                    F.array_join(chunk(i), " ").alias("chunk_text"),
                ),
            )
        ).alias("chunk_id", "c"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")


#: negatives per anchor for contrastive batch assembly.
NEG_K = 4
#: MINSTD Lehmer constants drive the deterministic candidate stream —
#: plain integer arithmetic so the DuckDB twin (and any other engine)
#: reproduces the exact sample with no RNG-implementation coupling.
NEG_A = 48271
NEG_B = 16807


def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic in-batch negative sampling for contrastive
    embedding training (reference analog: the reference validates
    triplets one-at-a-time against an LLM, validate_claims.py — a
    trainer instead needs K counterexample documents per anchor,
    which is a corpus-scale join problem).

    Each anchor draws NEG_K pseudo-random candidate doc_ids from a
    Lehmer stream over the dense id space ((id·A + j·B) mod N — exact
    below 2^63 for id < ~1.9e14; a 100 TB corpus with ~1e11 docs is
    3 orders of magnitude inside the bound), drops self-hits, and
    keeps candidates from a DIFFERENT source (the usual "hard false
    negative" guard).  Scale shape: a row-local K-way explode, then
    ONE equi-join on neg_id against the (doc_id, source) projection —
    both sides hash-partitioned on the join key; no window, no
    broadcast of a corpus-sized side, no RNG.  Sampling misses (self
    hit / same source) are dropped rather than re-drawn, so the plan
    stays one-pass; a trainer wanting exactly-K oversamples K."""
    n = _max_doc_id(spark, sf_dir) + 1
    docs = _docs(spark, sf_dir)
    anchors = docs.select("doc_id", F.col("source").alias("anchor_source"))
    cands = anchors.select(
        "doc_id",
        "anchor_source",
        F.explode(
            F.expr(
                f"transform(sequence(1, {NEG_K}), "
                f"j -> (doc_id * {NEG_A}L + j * {NEG_B}L) % {n}L)"
            )
        ).alias("neg_id"),
    ).filter(F.col("neg_id") != F.col("doc_id"))
    negs = docs.select(
        F.col("doc_id").alias("neg_id"), F.col("source").alias("neg_source")
    )
    return (
        cands.join(negs, "neg_id")
        .filter(F.col("neg_source") != F.col("anchor_source"))
        .select("doc_id", "anchor_source", "neg_id", "neg_source")
        .orderBy("doc_id", "neg_id")
    )


_WS_SQL = f"""
  ws AS (
    SELECT doc_id, string_split(text, ' ') AS ws,
           (len(string_split(text, ' ')) + {SEG_W - 1}) // {SEG_W} AS n_segs
    FROM documents
  )
"""

#: training shards produced by the deterministic global shuffle.
N_SHARDS = 16
#: checksum moduli (primes) — fold the 60-bit shuffle keys before the
#: order-pinning sums.  Overflow budget: every folded term is < ~10⁹
#: (P1 for key_sum; P2·P3 ≈ 1.02×10⁹ for pair_sum), so an int64 sum is
#: safe to ~9×10⁹ rows PER SHARD — 14× the ~6.3×10⁸ rows/shard of the
#: 10¹⁰-document design point (and shard row counts are uniform by
#: construction).  DuckDB sums BIGINT into HUGEINT, so within that
#: budget the twin's ::BIGINT cast is lossless and the engines agree.
_CK_P1 = 1_000_000_007
_CK_P2 = 1_000_003
_CK_P3 = 1_021


def global_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle of the corpus into N_SHARDS
    training shards — the epoch-order step between a curated corpus
    and a trainer's data loader: every doc gets a pseudorandom 60-bit
    key (md5 of its id — seedable, reproducible across runs and
    engines), its shard is key mod N_SHARDS, and its within-shard
    order is the (key, doc_id) sort.

    Scale shape: ONE row-local hash per doc and ONE hash-aggregation
    by shard — no window, no sort, no driver collect.  The within-
    shard order needs no rank column to be verified: order is a pure
    function of the per-shard key multiset, so the summary pins it
    with order-free integer checksums (key and key×doc products folded
    mod primes — exact int64 in both engines).  The production writer
    is ``repartition(shard).sortWithinPartitions(key)`` + parquet (a
    balanced shuffle: keys are uniform, so shards are even by
    construction); this query is its verification artifact."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = F.expr(
        "cast(conv(substr(md5(concat('shuf:', cast(doc_id as string))), 1, 15),"
        " 16, 10) as bigint)"
    )
    keyed = docs.select(
        "doc_id",
        "n_chars",
        key.alias("key"),
    ).withColumn("shard", F.pmod(F.col("key"), F.lit(N_SHARDS)))
    return (
        keyed.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.min("key").alias("min_key"),
            F.max("key").alias("max_key"),
            F.sum(F.col("key") % _CK_P1).cast("long").alias("key_sum"),
            F.sum((F.col("key") % _CK_P2) * (F.col("doc_id") % _CK_P3))
            .cast("long")
            .alias("pair_sum"),
        )
        .orderBy("shard")
    )


ORACLE_SQL = {
    "global_shuffle_shards": f"""
        WITH keyed AS (
          SELECT doc_id, n_chars,
                 CAST('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)),
                      1, 15) AS BIGINT) AS key
          FROM documents
        )
        SELECT key % {N_SHARDS} AS shard,
               count(*)::BIGINT AS n_docs,
               sum(n_chars)::BIGINT AS n_chars,
               min(key) AS min_key,
               max(key) AS max_key,
               sum(key % {_CK_P1})::BIGINT AS key_sum,
               sum((key % {_CK_P2}) * (doc_id % {_CK_P3}))::BIGINT AS pair_sum
        FROM keyed GROUP BY shard ORDER BY shard
    """,
    "para_dedup": f"""
        WITH {_WS_SQL},
        segs AS (
          SELECT doc_id,
                 unnest(list_transform(range(0, n_segs),
                   i -> struct_pack(pos := i,
                        seg := array_to_string(ws[i*{SEG_W}+1 : i*{SEG_W}+{SEG_W}],
                                               ' '))),
                        recursive := true)
          FROM ws
        ),
        marked AS (
          SELECT doc_id, pos,
                 row_number() OVER (PARTITION BY md5(seg)
                                    ORDER BY doc_id, pos) AS rn
          FROM segs
        ),
        kp AS (
          SELECT doc_id, list(pos ORDER BY pos) AS kept_pos
          FROM marked WHERE rn = 1 GROUP BY doc_id
        )
        SELECT w.doc_id,
               CAST(w.n_segs AS BIGINT) AS n_paras,
               CAST(coalesce(len(kp.kept_pos), 0) AS BIGINT) AS n_kept,
               coalesce(array_to_string(list_transform(kp.kept_pos,
                 p -> array_to_string(w.ws[p*{SEG_W}+1 : p*{SEG_W}+{SEG_W}], ' ')),
                 ' '), '') AS clean_text
        FROM ws w LEFT JOIN kp ON kp.doc_id = w.doc_id
        ORDER BY w.doc_id
    """,
    # the twin runs the NAIVE global window — the two-phase scan must
    # equal it doc-for-doc, which is the property under test
    "pack_sequences": f"""
        WITH toks AS (
          SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents
        ),
        cums AS (
          SELECT doc_id, n_tokens,
                 sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM toks
        )
        SELECT doc_id, n_tokens,
               CAST(cum - n_tokens AS BIGINT) AS tok_start,
               CAST((cum - n_tokens) // {CTX} AS BIGINT) AS start_bin,
               CAST((cum - 1) // {CTX} AS BIGINT) AS end_bin,
               CAST((cum - n_tokens) % {CTX} AS BIGINT) AS bin_offset
        FROM cums ORDER BY doc_id
    """,
    "chunk_documents": f"""
        WITH ws AS (
          SELECT doc_id, string_split(text, ' ') AS ws,
                 greatest(1, (len(string_split(text, ' ')) - {CHUNK_OVERLAP}
                              + {_STRIDE - 1}) // {_STRIDE}) AS n_chunks
          FROM documents
        ),
        chunks AS (
          SELECT doc_id,
                 unnest(list_transform(range(0, n_chunks),
                   i -> struct_pack(
                          chunk_id := i,
                          seg := ws[i*{_STRIDE}+1 : i*{_STRIDE}+{CHUNK_TOKENS}])),
                        recursive := true)
          FROM ws
        )
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
               CAST(len(seg) AS BIGINT) AS n_tokens,
               array_to_string(seg, ' ') AS chunk_text
        FROM chunks ORDER BY doc_id, chunk_id
    """,
    "contrastive_negatives": f"""
        WITH bound AS (SELECT max(doc_id) + 1 AS n FROM documents),
        cands AS (
          SELECT d.doc_id, d.source AS anchor_source,
                 (d.doc_id * {NEG_A} + j * {NEG_B})
                   % (SELECT n FROM bound) AS neg_id
          FROM documents d, unnest(range(1, {NEG_K} + 1)) AS t(j)
        )
        SELECT c.doc_id, c.anchor_source,
               CAST(c.neg_id AS BIGINT) AS neg_id,
               d2.source AS neg_source
        FROM cands c JOIN documents d2 ON d2.doc_id = c.neg_id
        WHERE c.neg_id <> c.doc_id
          AND d2.source <> c.anchor_source
        ORDER BY c.doc_id, c.neg_id
    """,
}

QUERIES = {
    "global_shuffle_shards": global_shuffle_shards,
    "para_dedup": para_dedup,
    "pack_sequences": pack_sequences,
    "chunk_documents": chunk_documents,
    "contrastive_negatives": contrastive_negatives,
}
