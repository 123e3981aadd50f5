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


QUERIES = {
    "bpe_merge_topk": bpe_merge_topk,
    "bpe_train_merges": bpe_train_merges,
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
}
