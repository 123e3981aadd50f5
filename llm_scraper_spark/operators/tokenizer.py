"""Tokenizer-training operators: distributed BPE merge induction over
the documents corpus.

Reference tie-in: the reference ships raw scraped text to an LLM and
never trains a tokenizer (server/scripts/analysis/db.py stores plain
strings) — but a training-data pipeline that feeds a trainer needs the
merge table, and inducing it is a corpus-scale aggregation problem
that fits Spark exactly.

Scale design (the whole point):

* **Train on the word-frequency table, never the corpus.**  Classic
  BPE (Sennrich et al. 2016) counts symbol pairs weighted by word
  frequency.  The corpus (100 TB of text) collapses to the vocabulary
  frame ``(word, freq)`` — one hash aggregation with map-side combine
  — and every subsequent merge round touches ONLY that frame: |V|
  rows (millions, not billions), ~30-byte each.  A naive per-token
  explode would shuffle the corpus once per merge round.

* **Per-round cost is one narrow explode + one tiny agg.**  Each round
  explodes the vocab into adjacent symbol pairs (row-local
  ``sequence`` + ``substring``, zero shuffle), aggregates counts per
  pair (≤ |alphabet|² keys — the partial agg collapses almost
  everything map-side), and collects exactly ONE argmax row to the
  driver (bounded scalar, same discipline as graph.py's n).

* **Merges apply as literal ``replace``.**  The winning pair is
  rewritten into a fresh single-character placeholder symbol
  (``0``, ``1``, …) so position-based pair extraction keeps working
  on later rounds.  Both Spark's and DuckDB's non-regex ``replace``
  scan left-to-right non-overlapping — exactly BPE's greedy merge
  order — so the twin is bit-identical (e.g. ``aaa`` + merge ``aa``
  → ``0a`` in both).

Tokenization matches textstats.tfidf_top_terms: lowercase alpha runs.
All counts are exact BIGINTs; tie-breaks are (count DESC, pair ASC) —
a total order, so Spark and the DuckDB twin agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: top-K pairs reported by the single-round query.
BPE_TOPK = 64
#: merge rounds run by the trainer (the DuckDB twin unrolls this many
#: CTE stages, so keep it small; the Spark loop itself is O(rounds)).
N_MERGES = 3
#: placeholder symbols for merged pairs, round i → PLACEHOLDERS[i].
#: Single characters outside [a-z] so substring-based pair extraction
#: stays valid after a merge lands.
PLACEHOLDERS = "0123456789"

assert N_MERGES <= len(PLACEHOLDERS)


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq) over lowercase alpha runs, length ≥ 2 (one-symbol
    words carry no pairs).  THE corpus-to-vocab collapse: everything
    downstream is vocabulary-sized."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w")
        )
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("f"))
    )


def _pair_counts(wf: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts, frequency-weighted.  Row-local
    explode (no shuffle) then one hash agg over ≤ |alphabet|² keys.

    The length guard matters on post-merge rounds: a fully-merged
    word shrinks to one symbol, and Spark's ``sequence(1, 0)`` counts
    DOWN ([1, 0]) instead of yielding empty like DuckDB's ``range`` —
    without the filter a 1-char word fabricates pairs."""
    return (
        wf.filter(F.length("w") >= 2)
        .select(
            F.expr("explode(sequence(1, length(w) - 1))").alias("i"),
            F.col("w"),
            F.col("f"),
        )
        .select(F.expr("substring(w, i, 2)").alias("pair"), "f")
        .groupBy("pair")
        .agg(F.sum("f").cast("long").alias("merge_count"))
    )


def bpe_merge_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-1 BPE statistics: the BPE_TOPK most frequent adjacent
    character pairs across the corpus, frequency-weighted.

    (pair, merge_count) ordered by (merge_count DESC, pair ASC) —
    the head of this frame is the first merge a BPE trainer would
    emit.  TakeOrdered top-k: no global sort materializes."""
    return _pair_counts(_word_freq(spark, sf_dir)).orderBy(
        F.desc("merge_count"), F.asc("pair")
    ).limit(BPE_TOPK)


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE training loop: N_MERGES rounds of count-pairs →
    pick-argmax → rewrite-vocab.  Returns the merge table
    (merge_rank, pair, merge_count) — rank i is the pair chosen on
    round i over the vocabulary AFTER merges 0..i-1 applied.

    Driver traffic is one argmax ROW per round; the vocab frame is
    re-derived per round by stacked ``replace`` literals (lineage
    stays shallow at N_MERGES rounds; a production trainer running
    thousands of merges would checkpoint every ~50)."""
    wf = _word_freq(spark, sf_dir).persist()
    wf.count()  # materialize once; every round re-reads this frame
    merges: list[tuple[int, str, int]] = []
    col = F.col("w")
    try:
        for rnd in range(N_MERGES):
            pairs = _pair_counts(wf.select(col.alias("w"), "f"))
            top = pairs.orderBy(
                F.desc("merge_count"), F.asc("pair")
            ).limit(1).collect()
            if not top:
                break
            pair, cnt = top[0]["pair"], int(top[0]["merge_count"])
            merges.append((rnd, pair, cnt))
            col = F.replace(col, F.lit(pair), F.lit(PLACEHOLDERS[rnd]))
    finally:
        wf.unpersist()
    return spark.createDataFrame(
        merges, "merge_rank long, pair string, merge_count long"
    ).orderBy("merge_rank")


def _oracle_bpe_train() -> str:
    """Unrolled-CTE DuckDB twin of the N_MERGES-round trainer (same
    pattern as the k-means trainer twin in similarity.py): wf_0 is the
    word-frequency collapse, round i picks argmax over wf_i and
    rewrites wf_{i+1} = replace(w, argmax_i, placeholder_i)."""
    ctes = [
        """wf_0 AS (
      SELECT w, count(*)::BIGINT AS f
      FROM (
        SELECT w FROM documents,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(w)
        WHERE length(w) >= 2
      ) GROUP BY w
    )"""
    ]
    selects = []
    for rnd in range(N_MERGES):
        ctes.append(f"""pairs_{rnd} AS (
      SELECT substring(w, CAST(i AS INTEGER), 2) AS pair,
             sum(f)::BIGINT AS merge_count
      FROM wf_{rnd}, unnest(range(1, length(w)::BIGINT)) AS t(i)
      GROUP BY pair
    ), top_{rnd} AS (
      SELECT {rnd}::BIGINT AS merge_rank, pair, merge_count
      FROM pairs_{rnd} ORDER BY merge_count DESC, pair ASC LIMIT 1
    ), wf_{rnd + 1} AS (
      SELECT replace(w, (SELECT pair FROM top_{rnd}),
                     '{PLACEHOLDERS[rnd]}') AS w, f
      FROM wf_{rnd}
    )""")
        selects.append(f"SELECT * FROM top_{rnd}")
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY merge_rank"
    )


def bpe_encode_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→apply composition for the tokenizer (the same discipline
    as ann_ivf_trained_topk): run the N_MERGES trainer, then ENCODE the
    corpus with the learned merge table and report per-source token
    accounting — (source, n_words, n_alpha_chars, n_bpe_tokens,
    chars_saved).  n_bpe_tokens is the post-merge symbol count (every
    placeholder = one token), so chars_saved is exactly the number of
    merge applications — the compression the learned table buys.

    Scale shape: the merge table is N_MERGES driver-side literals
    (bounded scalars, same discipline as the trainer's argmax rows),
    so encoding is a chain of N_MERGES non-regex ``replace`` calls
    INSIDE whole-stage codegen on the exploded word stream — zero
    joins, zero broadcast, zero Python; the only shuffle is the final
    |sources|-key hash agg.  A production encoder with thousands of
    merges would instead broadcast-join the (word → encoded_len)
    VOCABULARY frame (millions of rows) — same output, one extra
    broadcast; at N_MERGES the inline chain is strictly cheaper."""
    merges = [
        r["pair"] for r in bpe_train_merges(spark, sf_dir).collect()
    ]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w"),
    ).filter(F.length("w") >= 1)
    enc = F.col("w")
    for rnd, pair in enumerate(merges):
        enc = F.replace(enc, F.lit(pair), F.lit(PLACEHOLDERS[rnd]))
    return (
        words.select("source", F.length("w").alias("wl"), F.length(enc).alias("el"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("wl").cast("long").alias("n_alpha_chars"),
            F.sum("el").cast("long").alias("n_bpe_tokens"),
            (F.sum("wl") - F.sum("el")).cast("long").alias("chars_saved"),
        )
        .orderBy("source")
    )


def _oracle_bpe_encode() -> str:
    """Twin of `bpe_encode_summary`: the trainer's unrolled CTEs
    re-derive the merge table in SQL, and the encode chain reads each
    round's pair via a scalar subquery — one source of truth, the twin
    can't drift from the trainer."""
    train = _oracle_bpe_train()
    ctes = train[len("WITH ") : train.index("\nSELECT * FROM top_0")]
    enc = "w"
    for rnd in range(N_MERGES):
        enc = (
            f"replace({enc}, (SELECT pair FROM top_{rnd}), "
            f"'{PLACEHOLDERS[rnd]}')"
        )
    return f"""
    WITH {ctes},
    words AS (
      SELECT source, w FROM documents,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(w)
      WHERE length(w) >= 1
    )
    SELECT source,
           count(*)::BIGINT AS n_words,
           sum(length(w))::BIGINT AS n_alpha_chars,
           sum(length({enc}))::BIGINT AS n_bpe_tokens,
           (sum(length(w)) - sum(length({enc})))::BIGINT AS chars_saved
    FROM words GROUP BY source ORDER BY source
    """


QUERIES = {
    "bpe_merge_topk": bpe_merge_topk,
    "bpe_train_merges": bpe_train_merges,
    "bpe_encode_summary": bpe_encode_summary,
}

ORACLE_SQL = {
    "bpe_merge_topk": f"""
    WITH wf AS (
      SELECT w, count(*)::BIGINT AS f
      FROM (
        SELECT w FROM documents,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(w)
        WHERE length(w) >= 2
      ) GROUP BY w
    )
    SELECT substring(w, CAST(i AS INTEGER), 2) AS pair,
           sum(f)::BIGINT AS merge_count
    FROM wf, unnest(range(1, length(w)::BIGINT)) AS t(i)
    GROUP BY pair
    ORDER BY merge_count DESC, pair ASC
    LIMIT {BPE_TOPK}
    """,
    "bpe_train_merges": _oracle_bpe_train(),
    "bpe_encode_summary": _oracle_bpe_encode(),
}
