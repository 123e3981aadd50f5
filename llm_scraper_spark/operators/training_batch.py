"""The end-to-end training-data pipeline as ONE keyed query: crawl
corpus → curation (quality ∧ language ∧ repetition ∧ exact-dedup
keep-one) → benchmark decontamination → stratified language sample →
sequence packing.

Every stage is individually green (`corpus_curation_pipeline`,
`decontaminate_ngram_overlap`, `stratified_sample`, `pack_sequences`),
but the artifact a real user ships is the COMPOSITION — and inter-stage
schema drift, filter-order mistakes, or a stage silently swallowing
rows are exactly the failures a per-stage gate can't see.  Two keys:

* ``corpus_to_training_batch`` — the final packed batch: one row per
  surviving doc with its sample rank and token-range assignment
  (prefix-sum packing over the survivor set in doc_id order).
* ``corpus_to_training_batch_audit`` — the row-conservation ledger:
  one row per stage with (n_in, n_kept, n_dropped); ``n_kept +
  n_dropped == n_in`` everywhere and each stage's ``n_in`` equals the
  previous stage's ``n_kept`` (pinned by pytest, mirrored in the
  twin), so the composition can never silently leak rows.

Reference analog: the reference scrapes, extracts, and stores
(server/scripts/scrape_eccomerce.py end-to-end loop) but has no
curation/packing pipeline — this is the training-data surface SURVEY
§2.10 prescribes on top of the crawl.

Scale shape: pure composition of the audited stage plans — the only
additions are skinny doc_id semi-joins between stages and one
broadcast of the (bounded) sampled-id set into the packing join; the
audit is one hash-agg over flag columns followed by a 3-row stack.
All-integer outputs; the DuckDB twin is the same composition as
MATERIALIZED CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_scraper_spark.operators import curation, packing
from llm_scraper_spark.operators.curation import (
    DECON_K,
    EVAL_MOD,
    REP_BIGRAM_MAX,
    REP_WORD_MAX,
    STRATA_N,
    _GRAMS_SQL,
    _REP_SQL,
)
from llm_scraper_spark.operators.packing import CTX
from llm_scraper_spark.operators.textstats import (
    _LANG_EN_SQL,
    _STOP_SQL,
    LANG_MIN_HITS,
    QUALITY_MAX_STOP_RATIO,
    QUALITY_MIN_MEAN_TOK,
    QUALITY_MIN_TOKENS,
)


def _stage_frames(spark: SparkSession, sf_dir: str):
    """(docs, cur_ids, clean_ids, sampled) — each id frame ⊆ the
    previous one by construction, so conservation is structural and
    the audit documents it."""
    from pyspark.storagelevel import StorageLevel

    docs = curation._docs(spark, sf_dir)
    # each id frame is 8 bytes/row and consumed by BOTH the next stage
    # and the audit's flag joins — persist so the heavy stage pipelines
    # (curation gates, gram-overlap decon) run once, not per consumer
    cur_ids = (
        curation.corpus_curation_pipeline(spark, sf_dir)
        .filter(F.col("kept") == 1)
        .select("doc_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # decon only needs verdicts for curation SURVIVORS — restrict the
    # train-side gram postings to them (the eval split stays whole:
    # contamination is measured against ALL held-out grams).  Verdicts
    # for curation-dropped docs are never consumed, so this is
    # result-identical to running decon corpus-wide.
    sub = (
        docs.select("doc_id", "text")
        .join(cur_ids, "doc_id")
        .filter(F.col("doc_id") % EVAL_MOD != 0)
        .unionByName(
            docs.select("doc_id", "text").filter(
                F.col("doc_id") % EVAL_MOD == 0
            )
        )
    )
    decon_ok = (
        curation.decontaminate_over(sub)
        .filter(F.col("contaminated") == 0)
        .select("doc_id")
    )
    # eval-split docs (doc_id % EVAL_MOD == 0) are absent from the
    # decon output entirely, so this inner join drops them too — a
    # training batch must never contain held-out benchmark docs
    clean_ids = cur_ids.join(decon_ok, "doc_id").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sampled = curation.stratified_sample_over(
        docs.select("doc_id", "lang", "source").join(clean_ids, "doc_id")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    return docs, cur_ids, clean_ids, sampled


def corpus_to_training_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pipeline's final packed batch: (doc_id, lang,
    sample_rank, n_tokens, tok_start, start_bin, end_bin, bin_offset),
    packing computed over the SURVIVOR set in doc_id order."""
    docs, _, _, sampled = _stage_frames(spark, sf_dir)
    toks = packing._with_words(
        docs.join(sampled.select("doc_id"), "doc_id")
    ).select("doc_id", F.size("ws").cast("long").alias("n_tokens"))
    hi = int(packing._max_doc_id(spark, sf_dir)) + 1
    packed = packing.pack_over(toks, hi)
    return (
        packed.join(
            sampled.select("doc_id", "lang", "sample_rank"), "doc_id"
        )
        .select(
            "doc_id",
            "lang",
            F.col("sample_rank").cast("long").alias("sample_rank"),
            "n_tokens",
            "tok_start",
            "start_bin",
            "end_bin",
            "bin_offset",
        )
        .orderBy("doc_id")
    )


def corpus_to_training_batch_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Row-conservation ledger: (stage, n_in, n_kept, n_dropped) per
    stage, n_kept + n_dropped == n_in by construction."""
    docs, cur_ids, clean_ids, sampled = _stage_frames(spark, sf_dir)
    flags = (
        docs.select("doc_id")
        .join(cur_ids.withColumn("f_cur", F.lit(1)), "doc_id", "left")
        .join(clean_ids.withColumn("f_clean", F.lit(1)), "doc_id", "left")
        .join(
            sampled.select("doc_id").withColumn("f_samp", F.lit(1)),
            "doc_id",
            "left",
        )
    )
    agg = flags.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.coalesce("f_cur", F.lit(0))).cast("long").alias("n_cur"),
        F.sum(F.coalesce("f_clean", F.lit(0))).cast("long").alias("n_clean"),
        F.sum(F.coalesce("f_samp", F.lit(0))).cast("long").alias("n_samp"),
    )
    return (
        agg.selectExpr(
            "stack(3,"
            " 'curation', n_docs, n_cur,"
            " 'decontamination', n_cur, n_clean,"
            " 'sampling', n_clean, n_samp"
            ") AS (stage, n_in, n_kept)"
        )
        .selectExpr("stage", "n_in", "n_kept", "n_in - n_kept AS n_dropped")
        .orderBy("stage")
    )


# ------------------------------------------------------------ DuckDB twins
#: the composed pipeline as shared MATERIALIZED CTEs (each stage's SQL
#: is the SAME fragment its per-stage twin uses, so the composition
#: cannot drift from the stages)
_PIPE_SQL = f"""
    {_REP_SQL},
    flags AS MATERIALIZED (
      SELECT doc_id, text,
             CAST(CASE WHEN len(w) >= {QUALITY_MIN_TOKENS}
                    AND CAST(length(text) AS DOUBLE) / CAST(len(w) AS DOUBLE)
                        >= {QUALITY_MIN_MEAN_TOK}
                    AND CAST(len(list_filter(w, x -> x IN ({_STOP_SQL}))) AS DOUBLE)
                        / CAST(len(w) AS DOUBLE) <= {QUALITY_MAX_STOP_RATIO}
                    AND len(list_filter(w, x -> x IN ({_LANG_EN_SQL})))
                        >= {LANG_MIN_HITS}
                    AND dup_word_ratio <= {REP_WORD_MAX}
                    AND dup_bigram_ratio <= {REP_BIGRAM_MAX}
                   THEN 1 ELSE 0 END AS BIGINT) AS gates_keep
      FROM repr),
    cur AS MATERIALIZED (
      SELECT doc_id FROM (
        SELECT doc_id, gates_keep,
               CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text))
                    THEN 1 ELSE 0 END AS keeper
        FROM flags)
      WHERE gates_keep = 1 AND keeper = 1),
    {_GRAMS_SQL},
    contaminated AS MATERIALIZED (
      SELECT DISTINCT t.doc_id
      FROM (SELECT doc_id, unnest(grams) AS gram FROM gram_sets
            WHERE doc_id % {EVAL_MOD} <> 0) t
      JOIN (SELECT unnest(grams) AS gram FROM gram_sets
            WHERE doc_id % {EVAL_MOD} = 0) e
        ON t.gram = e.gram),
    clean AS MATERIALIZED (
      SELECT doc_id FROM cur
      WHERE doc_id % {EVAL_MOD} <> 0
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
    sampled AS MATERIALIZED (
      SELECT doc_id, lang, sample_rank FROM (
        SELECT d.doc_id, d.lang,
               CAST(row_number() OVER (
                 PARTITION BY d.lang
                 ORDER BY md5(CAST(d.doc_id AS VARCHAR))) AS BIGINT)
                 AS sample_rank
        FROM documents d JOIN clean c ON d.doc_id = c.doc_id)
      WHERE sample_rank <= {STRATA_N})
"""

ORACLE_SQL = {
    "corpus_to_training_batch": f"""
        WITH {_PIPE_SQL},
        toks AS (
          SELECT d.doc_id,
                 CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
          FROM documents d JOIN sampled s ON d.doc_id = s.doc_id),
        cums AS (
          SELECT doc_id, n_tokens,
                 sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM toks)
        SELECT c.doc_id, s.lang, s.sample_rank, c.n_tokens,
               CAST(c.cum - c.n_tokens AS BIGINT) AS tok_start,
               CAST((c.cum - c.n_tokens) // {CTX} AS BIGINT) AS start_bin,
               CAST((c.cum - 1) // {CTX} AS BIGINT) AS end_bin,
               CAST((c.cum - c.n_tokens) % {CTX} AS BIGINT) AS bin_offset
        FROM cums c JOIN sampled s ON c.doc_id = s.doc_id
        ORDER BY c.doc_id
    """,
    "corpus_to_training_batch_audit": f"""
        WITH {_PIPE_SQL},
        n AS (SELECT
            (SELECT count(*) FROM documents) AS n_docs,
            (SELECT count(*) FROM cur) AS n_cur,
            (SELECT count(*) FROM clean) AS n_clean,
            (SELECT count(*) FROM sampled) AS n_samp)
        SELECT stage, CAST(n_in AS BIGINT) AS n_in,
               CAST(n_kept AS BIGINT) AS n_kept,
               CAST(n_in - n_kept AS BIGINT) AS n_dropped
        FROM (
          SELECT 'curation' AS stage, n_docs AS n_in, n_cur AS n_kept FROM n
          UNION ALL
          SELECT 'decontamination', n_cur, n_clean FROM n
          UNION ALL
          SELECT 'sampling', n_clean, n_samp FROM n)
        ORDER BY stage
    """,
}

QUERIES = {
    "corpus_to_training_batch": corpus_to_training_batch,
    "corpus_to_training_batch_audit": corpus_to_training_batch_audit,
}
