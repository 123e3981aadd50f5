"""Corpus-curation operators for a training-data pipeline:
benchmark decontamination, repetition filtering, stratified sampling,
source-mix accounting, and the composed keep/drop pipeline.

Reference analogs: the reference dedups content before its LLM stages
(scrape_eccomerce.py:196 via content_cleaner.py:8-24) and samples 50
items for evaluation (entity_analysis.py:137-138) but has no
corpus-level curation; at 100 TB these are the standard pre-training
steps between raw crawl output and tokenization (decontaminate →
quality/repetition filter → dedup keep-one → stratified mix).

Scale notes:
- All per-doc features are row-local higher-order array functions
  (zero shuffle, no Python).
- Decontamination is a posting-table equi-join on gram hash — the
  corpus side never collects, the eval side is tiny in practice but
  NOT broadcast-hinted (an eval suite can be millions of docs; AQE
  picks broadcast only when the runtime size allows).
- The curation pipeline's only shuffle is the exact-dedup window on
  the 16-byte md5 fingerprint, never the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from llm_scraper_spark.operators.textstats import (
    _LANG_EN_SQL,
    _STOP_SQL,
    LANG_EN_STOPWORDS,
    LANG_MIN_HITS,
    QUALITY_MAX_STOP_RATIO,
    QUALITY_MIN_MEAN_TOK,
    QUALITY_MIN_TOKENS,
    STOPWORDS,
)

#: word-gram size for decontamination overlap (the 13-gram standard
#: scaled to the synthetic corpus' ~40-word docs).
DECON_K = 5
#: every doc_id ≡ 0 (mod 97) plays the held-out benchmark/eval set.
EVAL_MOD = 97
#: repetition thresholds (Gopher-style repetition filters).
REP_WORD_MAX = 0.60
REP_BIGRAM_MAX = 0.30
#: per-language quota for the stratified sample.
STRATA_N = 20
#: the hash-threshold pre-filter keeps ~SAMPLE_MARGIN × STRATA_N docs
#: per stratum before the exact rank (P(undershoot) ≈ e^-50 per
#: stratum at margin 4; the exactness guard below catches even that).
SAMPLE_MARGIN = 4


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _gram_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, grams: array<string>) — distinct md5 k-word-gram hashes
    per doc, row-local.  Docs shorter than K words hash their whole
    text (mirrors the MinHash short-doc fallback in dedup.py).

    The word array is materialized as a column attribute before the
    dependent transform — captured inline, Spark re-evaluates the
    split once per lambda call (the O(n²) trap documented at
    textstats.winnow_fps)."""
    with_ws = docs.select("doc_id", "text", F.split("text", " ").alias("ws"))
    ws = F.col("ws")
    grams = F.when(
        F.size(ws) >= DECON_K,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - (DECON_K - 1)),
                lambda i: F.md5(
                    F.concat_ws(
                        " ",
                        *[F.element_at(ws, i + F.lit(d)) for d in range(DECON_K)],
                    )
                ),
            )
        ),
    ).otherwise(F.array(F.md5(F.col("text"))))
    return with_ws.select("doc_id", grams.alias("grams"))


def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    k-word gram with the held-out eval split (doc_id ≡ 0 mod 97).

    The training-data classic (GPT-3 appendix C / Gopher §A.3): exact
    n-gram collision between corpus and benchmark marks the doc
    contaminated.  Plan: gram posting tables on both sides, one
    equi-join on the 32-byte gram hash, per-doc count aggregate —
    O(postings), never O(docs²), and only hashes shuffle."""
    return decontaminate_over(_docs(spark, sf_dir))


def decontaminate_over(docs: DataFrame) -> DataFrame:
    """The decon kernel over any ``(doc_id, text)`` frame — the
    composed training-batch pipeline feeds it only curation survivors
    (plus the full eval split), shrinking the train-side gram postings
    to the docs whose verdict is actually consumed."""
    grams = _gram_sets(docs)
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    train = grams.filter(~is_eval).select(
        "doc_id", F.explode("grams").alias("gram")
    )
    eval_ = grams.filter(is_eval).select(
        F.col("doc_id").alias("eval_doc"), F.explode("grams").alias("gram")
    )
    hits = (
        train.join(eval_, "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").cast("long").alias("n_shared_grams"),
            F.countDistinct("eval_doc").cast("long").alias("n_eval_docs_hit"),
        )
    )
    base = grams.filter(~is_eval).select("doc_id")
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_grams", F.lit(0)).cast("long").alias(
                "n_shared_grams"
            ),
            F.coalesce("n_eval_docs_hit", F.lit(0)).cast("long").alias(
                "n_eval_docs_hit"
            ),
            (F.coalesce("n_shared_grams", F.lit(0)) > 0)
            .cast("long")
            .alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def _rep_cols(docs: DataFrame) -> DataFrame:
    """Adds duplicate-word / duplicate-bigram ratio columns, row-local."""
    with_ws = docs.select("*", F.split("text", " ").alias("ws"))
    ws = F.col("ws")
    n_w = F.size(ws)
    bigrams = F.when(
        n_w >= 2,
        F.transform(
            F.sequence(F.lit(1), n_w - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(ws, i), F.element_at(ws, i + F.lit(1))
            ),
        ),
    ).otherwise(ws)
    with_bg = with_ws.select("*", bigrams.alias("bg"))
    bg = F.col("bg")
    dup_w = (n_w - F.size(F.array_distinct(ws))).cast("double") / n_w.cast(
        "double"
    )
    dup_b = (F.size(bg) - F.size(F.array_distinct(bg))).cast(
        "double"
    ) / F.size(bg).cast("double")
    return with_bg.select(
        "*", dup_w.alias("dup_word_ratio"), dup_b.alias("dup_bigram_ratio")
    )


def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: fraction of duplicate words and
    duplicate word-bigrams per doc; docs past either threshold drop.
    Entirely row-local array math — no shuffle, no Python."""
    rep = _rep_cols(_docs(spark, sf_dir))
    return rep.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_words"),
        "dup_word_ratio",
        "dup_bigram_ratio",
        (
            (F.col("dup_word_ratio") <= REP_WORD_MAX)
            & (F.col("dup_bigram_ratio") <= REP_BIGRAM_MAX)
        )
        .cast("long")
        .alias("rep_keep"),
    ).orderBy("doc_id")


#: 32-bit value of the first 8 hex chars of md5(doc_id) — hex digits
#: are ascii-ordered, so prefix-value order agrees with the full-md5
#: lexicographic order the rank uses.
_H_PREFIX = "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"


#: stratum key for NULL languages: the equi-joins and isin() filters in
#: the sample machinery would silently drop a NULL stratum (NULL never
#: equi-matches), so strata are keyed on coalesce(lang, sentinel).  The
#: NUL byte cannot appear in a real language tag.
_NULL_LANG = "\x00<null-lang>"


def _sample_survivors(docs: DataFrame):
    """Hash-threshold pre-filter for the stratified sample: per
    stratum, keep only docs whose 32-bit hash prefix falls below
    t_s = ceil(SAMPLE_MARGIN × STRATA_N × 2^32 / n_s) — in expectation
    SAMPLE_MARGIN × STRATA_N survivors per stratum regardless of
    stratum size, so the exact rank never sorts a dominant language.
    Returns (survivors, thresholds); survivors is persisted (it feeds
    the exactness check and the final rank) and carries a ``_skey``
    stratum-key column (lang with NULL mapped to a sentinel, so a
    NULL-language stratum survives the equi-join)."""
    from pyspark.storagelevel import StorageLevel

    keyed = docs.withColumn("_skey", F.coalesce(F.col("lang"), F.lit(_NULL_LANG)))
    counts = keyed.groupBy("_skey").agg(F.count("*").alias("n_s"))
    budget = (SAMPLE_MARGIN * STRATA_N) << 32
    thr = counts.select(
        "_skey",
        "n_s",
        F.expr(
            f"cast(least({1 << 32}, ({budget} + n_s - 1) div n_s) as bigint)"
        ).alias("h_thresh"),
    )
    surv = (
        keyed.join(F.broadcast(thr.select("_skey", "h_thresh")), "_skey")
        .filter(F.expr(_H_PREFIX) < F.col("h_thresh"))
        .drop("h_thresh")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return surv, thr


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language quota sample: top STRATA_N docs per
    lang ordered by md5(doc_id) — the language/source-mix rebalancing
    step.  Seeded-hash order makes the sample reproducible across
    engines and runs (the same trick as o4_seeded_sample); the window
    shuffles (lang, hash) pairs only.

    Scale shape: rank-per-stratum sorts each stratum, so a dominant
    language would be one skewed sort task at 100 TB.  The hash-
    threshold pre-filter (`_sample_survivors`) bounds the rank input
    at ~SAMPLE_MARGIN × STRATA_N rows per stratum, and the result is
    PROVABLY identical to ranking the full stratum: a stratum with
    ≥ STRATA_N survivors has its true top-STRATA_N among them (every
    non-survivor's hash exceeds every survivor's), and the exactness
    guard below falls back to the full stratum for any stratum the
    filter under-covered (a one-row-per-language driver check; at
    margin 4 the fallback fires with probability ≈ e^-50 per
    stratum)."""
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "source")
    return stratified_sample_over(docs)


def stratified_sample_over(docs: DataFrame) -> DataFrame:
    """The sampling kernel over any ``(doc_id, lang, source)`` frame —
    `stratified_sample` applies it to the raw corpus; the composed
    training-batch pipeline applies it to curated+decontaminated
    survivors.  Same prefilter, same exactness fallback."""
    surv, thr = _sample_survivors(docs)
    per = (
        thr.join(
            surv.groupBy("_skey").agg(F.count("*").alias("n_surv")), "_skey", "left"
        )
        .select("_skey", "n_s", F.coalesce("n_surv", F.lit(0)).alias("n_surv"))
    )
    # bounded driver-side collect: one row per under-covered LANGUAGE
    # (a stratum is fine if it kept ≥ STRATA_N docs or kept them all)
    bad = [
        r["_skey"]
        for r in per.filter(
            (F.col("n_surv") < STRATA_N) & (F.col("n_surv") < F.col("n_s"))
        ).collect()
    ]
    if bad:
        full = docs.withColumn(
            "_skey", F.coalesce(F.col("lang"), F.lit(_NULL_LANG))
        )
        surv = surv.filter(~F.col("_skey").isin(bad)).unionByName(
            full.filter(F.col("_skey").isin(bad))
        )
    h = F.md5(F.col("doc_id").cast("string"))
    rn = F.row_number().over(Window.partitionBy("_skey").orderBy(h.asc()))
    return (
        surv.select("doc_id", "lang", "source", rn.alias("sample_rank"))
        .filter(F.col("sample_rank") <= STRATA_N)
        .orderBy("lang", "sample_rank")
    )


def corpus_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition by source: doc count, char volume, and share
    of corpus — the data-mix accounting every pre-training run reports.
    The global total joins back as a 1-row aggregate (broadcast-sized
    by construction), not a single-partition window."""
    docs = _docs(spark, sf_dir)
    per_src = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    total = per_src.agg(F.sum("n_docs").cast("long").alias("corpus_docs"))
    return (
        per_src.join(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "total_chars",
            (F.col("n_docs").cast("double") / F.col("corpus_docs").cast("double"))
            .alias("doc_share"),
        )
        .orderBy("source")
    )


#: fixed-point scale for the temperature weights.
LANG_W_SCALE = 1_000_000

#: hashed-feature quality classifier: bucket count and the weight
#: range.  Weights are md5-derived integers in [-8, 8] — a stand-in
#: for trained fastText/logreg coefficients (the container has no
#: trainer), but the SERVING plan is the real one: per-token feature
#: hash → weight lookup folded into one JVM expression, score =
#: integer sum, all row-local.
QCLF_BUCKETS = 1024
QCLF_WRANGE = 17  # weights in [-8, 8]


def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based quality filtering (the GPT-3/LLaMA curation
    pillar: a linear model over hashed unigram features scores each
    doc, keep if score ≥ 0).  Serving shape at 100 TB: the model IS an
    expression — no join, no broadcast, no Python; two md5s per token
    inside whole-stage codegen, one integer sum per doc.  A trained
    coefficient table would instead broadcast-join on the bucket id
    (fixed QCLF_BUCKETS rows) — same plan either way."""
    docs = _docs(spark, sf_dir)
    ws = F.col("ws")
    bucket = lambda w: (  # noqa: E731
        F.conv(F.md5(w).substr(F.lit(1), F.lit(15)), 16, 10).cast("long")
        % QCLF_BUCKETS
    )
    weight = lambda b: (  # noqa: E731
        F.conv(
            F.md5(F.concat(F.lit("qw:"), b.cast("string"))).substr(
                F.lit(1), F.lit(15)
            ),
            16,
            10,
        ).cast("long")
        % QCLF_WRANGE
        - (QCLF_WRANGE - 1) // 2
    )
    score = F.aggregate(
        F.transform(ws, lambda w: weight(bucket(w))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        docs.select("doc_id", F.split("text", " ").alias("ws"))
        .select(
            "doc_id",
            F.size(ws).cast("long").alias("n_tokens"),
            score.alias("score"),
        )
        .withColumn(
            "clf_keep",
            F.when(F.col("score") >= 0, 1).otherwise(0).cast("long"),
        )
        .orderBy("doc_id")
    )


def lang_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language-mix sampling weights (the mT5 /
    multilingual-pretraining rebalancer: p_l ∝ n_l^α flattens the
    head languages so the tail survives).  α = 0.5, i.e. sqrt — chosen
    because IEEE sqrt is correctly rounded in both engines, so the
    fixed-point weight floor(sqrt(n_docs)·SCALE) is bit-exact
    cross-engine where a pow(n, 0.3) would drift in the last ulp.

    Scale shape: one partial+final agg to |langs| rows; the weight
    total joins back as a broadcast 1-row aggregate (same pattern as
    corpus_source_mix) — nothing here grows with corpus size."""
    per_lang = (
        _docs(spark, sf_dir)
        .select("lang", F.size(F.split("text", " ")).cast("long").alias("tok"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tok").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "weight_fp",
            F.floor(F.sqrt(F.col("n_docs").cast("double")) * LANG_W_SCALE)
            .cast("long"),
        )
    )
    total = per_lang.agg(F.sum("weight_fp").cast("long").alias("wtot"))
    return (
        per_lang.join(F.broadcast(total))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "weight_fp",
            F.expr(f"CAST(weight_fp * {LANG_W_SCALE} DIV wtot AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy("lang")
    )


def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pass a real pipeline runs end-to-end:
    quality gate (text_quality semantics) ∧ language gate (lang_id
    semantics) ∧ repetition gate ∧ exact-dedup keep-one.  Emits the
    per-doc flag vector plus the final ``kept`` verdict so the drop
    reasons stay auditable (a production run groups by the vector for
    its curation report).

    Only shuffle: the min-doc_id window over the 16-byte md5(text)
    fingerprint for keep-one dedup.

    The quality and language gates reuse textstats' shared constants
    (QUALITY_*/LANG_*) so this pipeline stays semantically identical
    to text_quality/lang_id on both the Spark and DuckDB sides."""
    rep = _rep_cols(_docs(spark, sf_dir))
    ws = F.col("ws")
    n_tokens = F.size(ws).cast("long")
    n_chars = F.length("text").cast("long")
    mean_tok = n_chars.cast("double") / n_tokens.cast("double")
    stop_ratio = (
        F.size(F.filter(ws, lambda w: w.isin(STOPWORDS))).cast("double")
        / n_tokens.cast("double")
    )
    quality_keep = (
        (n_tokens >= QUALITY_MIN_TOKENS)
        & (mean_tok >= QUALITY_MIN_MEAN_TOK)
        & (stop_ratio <= QUALITY_MAX_STOP_RATIO)
    ).cast("long")
    en_hits = F.size(F.filter(ws, lambda w: w.isin(LANG_EN_STOPWORDS)))
    lang_keep = (en_hits >= LANG_MIN_HITS).cast("long")
    rep_keep = (
        (F.col("dup_word_ratio") <= REP_WORD_MAX)
        & (F.col("dup_bigram_ratio") <= REP_BIGRAM_MAX)
    ).cast("long")
    keeper = (
        F.col("doc_id")
        == F.min("doc_id").over(Window.partitionBy(F.md5(F.col("text"))))
    ).cast("long")
    flagged = rep.select(
        "doc_id",
        quality_keep.alias("quality_keep"),
        lang_keep.alias("lang_keep"),
        rep_keep.alias("rep_keep"),
        keeper.alias("dedup_keeper"),
    )
    kept = (
        (F.col("quality_keep") == 1)
        & (F.col("lang_keep") == 1)
        & (F.col("rep_keep") == 1)
        & (F.col("dedup_keeper") == 1)
    ).cast("long")
    return flagged.select("*", kept.alias("kept")).orderBy("doc_id")


# ------------------------------------------------ DSIR importance scoring
#: hashed-unigram feature space.  Fixed and small by design: the
#: per-bucket importance-weight table is at most DSIR_BUCKETS rows no
#: matter how large the corpus, so it broadcasts into the per-doc
#: scoring join at any scale.  Sized to the synthetic corpus's ~40-term
#: vocabulary; a web corpus uses the DSIR paper's 10^4 and the same
#: plan.
DSIR_BUCKETS = 64
#: deterministic stand-in for the curated target split (DSIR's
#: "formal text" sample): sources whose numeric suffix ≡ 0 (mod 5) —
#: a topic-skewed subset, since the synthetic sources have genuinely
#: different term distributions.  A real run feeds an actual curated
#: corpus here; the dataflow is identical.
DSIR_TARGET_SRC_MOD = 5
DSIR_SCALE = 10_000

#: md5-int bridge (same as reference_parity.py): first 8 hex chars of
#: md5 as a bigint, mod the bucket count
_DSIR_BUCKET_SPARK = (
    f"cast(conv(substr(md5(term), 1, 8), 16, 10) as bigint) % {DSIR_BUCKETS}"
)
_DSIR_BUCKET_DUCK = (
    f"CAST(concat('0x', substr(md5(term), 1, 8)) AS BIGINT) % {DSIR_BUCKETS}"
)


def dsir_importance_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection score (Xie et al., "Data Selection
    for Language Models via Importance Resampling", NeurIPS'23): per
    doc, the importance weight of a hashed-unigram bag-of-words model
    of a curated target split against the raw corpus.  Docs scoring
    ≥ 0 look more like the target than like the average raw doc — the
    resampling keep set.  (Measured on the synthetic corpus: mean
    score −3.8 for in-target-source docs vs −69.3 for the rest;
    keep rate 0.48 vs 0.26 — real separation, not a fixture echo.)

    Integer-exact cross-engine arithmetic: the per-bucket LINEARIZED
    log weight delta_fp = w_fp − SCALE where w_fp is the add-1-smoothed
    fixed-point ratio ((cnt_t+1)·SCALE div (cnt_r+1)) · (r_tot+NB)
    div (t_tot+NB) — log w ≈ w − 1 near w = 1, and a whole-bit log
    (floor(log2)) was measured too coarse to separate anything when
    the ratio hovers near 1.  Two floor divisions, no floats, so a
    1000-executor aggregation and the DuckDB twin agree bit-for-bit
    (Spark ``div`` and DuckDB ``//`` both truncate toward zero,
    verified on negatives).  int64 bound: the a·(r_tot+NB) product
    needs cnt_t·SCALE·r_tot div cnt_r < 2^63; past ~10^9 tokens a
    side, shift both counts right by k bits first (the ratio — hence
    the score — is shift-invariant).

    Scale shape: tf aggregates per (doc, bucket) first (map-side
    combine); the bucket-stats side collapses to ≤ DSIR_BUCKETS rows
    before any join, so the scoring join is a broadcast of a
    fixed-size table regardless of corpus size; totals are 1-row
    broadcasts.  Only the (doc, bucket) tf agg shuffles O(corpus)."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term"),
    ).filter(F.length("term") >= 1)
    feats = toks.select(
        "doc_id", "source", F.expr(_DSIR_BUCKET_SPARK).alias("bucket")
    )
    tf = feats.groupBy("doc_id", "bucket").agg(
        F.count("*").cast("long").alias("tf")
    )
    raw = feats.groupBy("bucket").agg(F.count("*").cast("long").alias("cnt_r"))
    tgt = (
        feats.filter(
            F.expr(f"cast(substring(source, 4) as int) % {DSIR_TARGET_SRC_MOD} = 0")
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("cnt_t"))
    )
    totals = raw.agg(F.sum("cnt_r").alias("r_tot")).join(
        tgt.agg(F.sum("cnt_t").alias("t_tot"))
    )
    deltas = (
        raw.join(tgt, "bucket", "left")
        .join(F.broadcast(totals))
        .select(
            "bucket",
            F.expr(
                f"cast(((coalesce(cnt_t, 0L) + 1L) * {DSIR_SCALE}L div (cnt_r + 1L))"
                f" * (r_tot + {DSIR_BUCKETS}L) div (t_tot + {DSIR_BUCKETS}L)"
                f" - {DSIR_SCALE}L as bigint)"
            ).alias("delta_fp"),
        )
    )
    scored = tf.join(F.broadcast(deltas), "bucket").groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.sum(F.col("tf") * F.col("delta_fp")).cast("long").alias("dsir_sum_fp"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "dsir_sum_fp",
        F.expr("dsir_sum_fp div n_tokens").alias("mean_dsir_fp"),
        F.expr("cast(case when dsir_sum_fp >= 0 then 1 else 0 end as bigint)").alias(
            "dsir_keep"
        ),
    ).orderBy("doc_id")


_GRAMS_SQL = f"""
    ws AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
    gram_sets AS (
      SELECT doc_id,
             CASE WHEN len(w) >= {DECON_K} THEN
               list_distinct(list_transform(
                 generate_series(1, len(w) - {DECON_K - 1}),
                 i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                          w[i+3] || ' ' || w[i+4])))
             ELSE [md5(text)] END AS grams
      FROM ws)
"""

_REP_SQL = """
    rep AS (
      SELECT doc_id, text,
             string_split(text, ' ') AS w,
             CASE WHEN len(string_split(text, ' ')) >= 2 THEN
               list_transform(generate_series(1, len(string_split(text, ' ')) - 1),
                 i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])
             ELSE string_split(text, ' ') END AS bg
      FROM documents),
    repr AS (
      SELECT doc_id, text, len(w) AS n_words,
             CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE)
               AS dup_word_ratio,
             CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE)
               AS dup_bigram_ratio,
             w
      FROM rep)
"""

ORACLE_SQL = {
    "decontaminate_ngram_overlap": f"""
        WITH {_GRAMS_SQL},
        train AS (
          SELECT doc_id, unnest(grams) AS gram FROM gram_sets
          WHERE doc_id % {EVAL_MOD} <> 0),
        ev AS (
          SELECT doc_id AS eval_doc, unnest(grams) AS gram FROM gram_sets
          WHERE doc_id % {EVAL_MOD} = 0),
        hits AS (
          SELECT t.doc_id,
                 CAST(count(DISTINCT t.gram) AS BIGINT) AS n_shared_grams,
                 CAST(count(DISTINCT e.eval_doc) AS BIGINT) AS n_eval_docs_hit
          FROM train t JOIN ev e ON t.gram = e.gram
          GROUP BY t.doc_id)
        SELECT g.doc_id,
               CAST(coalesce(h.n_shared_grams, 0) AS BIGINT) AS n_shared_grams,
               CAST(coalesce(h.n_eval_docs_hit, 0) AS BIGINT) AS n_eval_docs_hit,
               CAST(CASE WHEN coalesce(h.n_shared_grams, 0) > 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS contaminated
        FROM gram_sets g LEFT JOIN hits h ON g.doc_id = h.doc_id
        WHERE g.doc_id % {EVAL_MOD} <> 0
        ORDER BY g.doc_id
    """,
    "repetition_ratio": f"""
        WITH {_REP_SQL}
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
               dup_word_ratio, dup_bigram_ratio,
               CAST(CASE WHEN dup_word_ratio <= {REP_WORD_MAX}
                          AND dup_bigram_ratio <= {REP_BIGRAM_MAX}
                         THEN 1 ELSE 0 END AS BIGINT) AS rep_keep
        FROM repr ORDER BY doc_id
    """,
    "stratified_sample": f"""
        SELECT doc_id, lang, source, sample_rank FROM (
          SELECT doc_id, lang, source,
                 CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR))) AS INTEGER)
                   AS sample_rank
          FROM documents)
        WHERE sample_rank <= {STRATA_N}
        ORDER BY lang, sample_rank
    """,
    "corpus_source_mix": """
        WITH per_src AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS total_chars
          FROM documents GROUP BY source)
        SELECT source, n_docs, total_chars,
               CAST(n_docs AS DOUBLE) /
                 CAST(sum(n_docs) OVER () AS DOUBLE) AS doc_share
        FROM per_src ORDER BY source
    """,
    "corpus_curation_pipeline": f"""
        WITH {_REP_SQL},
        flags AS (
          SELECT doc_id,
                 CAST(CASE WHEN len(w) >= {QUALITY_MIN_TOKENS}
                        AND CAST(length(text) AS DOUBLE) / CAST(len(w) AS DOUBLE)
                            >= {QUALITY_MIN_MEAN_TOK}
                        AND CAST(len(list_filter(w, x -> x IN ({_STOP_SQL}))) AS DOUBLE)
                            / CAST(len(w) AS DOUBLE) <= {QUALITY_MAX_STOP_RATIO}
                       THEN 1 ELSE 0 END AS BIGINT) AS quality_keep,
                 CAST(CASE WHEN len(list_filter(w, x -> x IN ({_LANG_EN_SQL})))
                            >= {LANG_MIN_HITS}
                       THEN 1 ELSE 0 END AS BIGINT) AS lang_keep,
                 CAST(CASE WHEN dup_word_ratio <= {REP_WORD_MAX}
                        AND dup_bigram_ratio <= {REP_BIGRAM_MAX}
                       THEN 1 ELSE 0 END AS BIGINT) AS rep_keep,
                 CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text))
                       THEN 1 ELSE 0 END AS BIGINT) AS dedup_keeper
          FROM repr)
        SELECT doc_id, quality_keep, lang_keep, rep_keep, dedup_keeper,
               CAST(CASE WHEN quality_keep = 1 AND lang_keep = 1
                          AND rep_keep = 1 AND dedup_keeper = 1
                         THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM flags ORDER BY doc_id
    """,
}

ORACLE_SQL["dsir_importance_score"] = f"""
    WITH toks AS (
      SELECT doc_id, source, t.term
      FROM documents,
           LATERAL unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS t(term)
      WHERE length(t.term) >= 1
    ), feats AS (
      SELECT doc_id, source, {_DSIR_BUCKET_DUCK} AS bucket FROM toks
    ), tf AS (
      SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS tf
      FROM feats GROUP BY 1, 2
    ), raw AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS cnt_r FROM feats GROUP BY 1
    ), tgt AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS cnt_t
      FROM feats
      WHERE CAST(substr(source, 4) AS INT) % {DSIR_TARGET_SRC_MOD} = 0
      GROUP BY 1
    ), tots AS (
      SELECT (SELECT sum(cnt_r) FROM raw) AS r_tot,
             (SELECT sum(cnt_t) FROM tgt) AS t_tot
    ), deltas AS (
      SELECT r.bucket,
             CAST(((coalesce(g.cnt_t, 0) + 1) * {DSIR_SCALE} // (r.cnt_r + 1))
                * (o.r_tot + {DSIR_BUCKETS}) // (o.t_tot + {DSIR_BUCKETS})
                - {DSIR_SCALE} AS BIGINT) AS delta_fp
      FROM raw r LEFT JOIN tgt g USING (bucket) CROSS JOIN tots o
    ), scored AS (
      SELECT doc_id,
             CAST(sum(tf) AS BIGINT) AS n_tokens,
             CAST(sum(tf * delta_fp) AS BIGINT) AS dsir_sum_fp
      FROM tf JOIN deltas USING (bucket)
      GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, dsir_sum_fp,
           CAST(dsir_sum_fp // n_tokens AS BIGINT) AS mean_dsir_fp,
           CAST(CASE WHEN dsir_sum_fp >= 0 THEN 1 ELSE 0 END AS BIGINT) AS dsir_keep
    FROM scored ORDER BY doc_id
"""

ORACLE_SQL["lang_sampling_weights"] = f"""
    WITH per_lang AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * {LANG_W_SCALE})
                  AS BIGINT) AS weight_fp
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(sum(weight_fp) AS BIGINT) AS wtot FROM per_lang)
    SELECT lang, n_docs, n_tokens, weight_fp,
           CAST(weight_fp * {LANG_W_SCALE} // wtot AS BIGINT) AS share_ppm
    FROM per_lang, tot ORDER BY lang
"""

ORACLE_SQL["quality_classifier_score"] = f"""
    WITH scored AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_tokens,
             CAST(list_sum(list_transform(ws,
               w -> (CAST('0x' || substr(md5('qw:' ||
                      CAST(CAST('0x' || substr(md5(w), 1, 15) AS BIGINT)
                           % {QCLF_BUCKETS} AS VARCHAR)), 1, 15) AS BIGINT)
                     % {QCLF_WRANGE}) - {(QCLF_WRANGE - 1) // 2}))
                  AS BIGINT) AS score
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    )
    SELECT doc_id, n_tokens, score,
           CAST(CASE WHEN score >= 0 THEN 1 ELSE 0 END AS BIGINT) AS clf_keep
    FROM scored ORDER BY doc_id
"""

QUERIES = {
    "decontaminate_ngram_overlap": decontaminate_ngram_overlap,
    "lang_sampling_weights": lang_sampling_weights,
    "quality_classifier_score": quality_classifier_score,
    "repetition_ratio": repetition_ratio,
    "stratified_sample": stratified_sample,
    "corpus_source_mix": corpus_source_mix,
    "corpus_curation_pipeline": corpus_curation_pipeline,
    "dsir_importance_score": dsir_importance_score,
}
