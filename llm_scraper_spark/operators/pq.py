"""Product-quantization ANN (Jégou, Douze & Schmid, TPAMI 2011): the
memory-side scale path that complements the LSH/IVF candidate pruning
in similarity.py.

Why PQ at 100 TB: the corpus embedding column is DIM×float (256 B/row
at DIM=64 fp32); after PQ encoding each vector is PQ_M small codes
(4 B/row here) — a 64× smaller scan, small enough that the *entire*
corpus index fits in the page cache of a modest cluster.  Serving
never touches the embeddings: a query precomputes its distance table
to every sub-centroid (PQ_M × PQ_K integers), and each corpus row's
approximate distance is PQ_M array lookups + adds (ADC — asymmetric
distance computation), entirely row-local inside whole-stage codegen.

Cross-engine exactness (the repo discipline): everything is integer.
* Subvectors are the quantized int64 ``qe`` slices (similarity.py).
* Assignment metric is squared L2 — integer sums of squared diffs
  (≤ 16 · (2·10³)² ≈ 6×10⁷, nowhere near overflow), ties broken by
  lowest cell id: a total order, identical in both engines.
  (Cosine is deliberately NOT used on subvectors: a subspace slice
  can be all-zero, where cosine is undefined; L2 never is.)
* Centroid update is the element-wise floor(sum/count) — floor of an
  exact double quotient (|sum| < 2⁵³), identical in Spark and DuckDB,
  including negatives (floor, not truncate-toward-zero).
* ADC distances are integer sums, so the top-k output is fully
  hash-stable — no IEEE cosine doubles at all in this module.

Plan shape per training iteration: one broadcast-assign pass over the
(vec_id, m, sq) subvector stream (corpus × PQ_M skinny rows,
map-side-combinable ``min_by`` argmin — no window shuffle), then one
(m, cell, pos) hash agg of PQ_M × PQ_K × PQ_DSUB cells.  Serving:
codes are built by the same assign, folded to one array per vector;
the ADC scan is one corpus pass against a broadcast per-query
distance-table frame (N_QUERIES × PQ_M × PQ_K integers); the only
shuffle is the final per-query top-k rank over skinny
(query, neighbor, adc) rows.

Reference tie-in: the reference has no vector index at all (it
re-embeds and re-compares per script run); this is the from-scratch
replacement a 10¹⁰-document corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_scraper_spark.functions.topk import salted_topk
from llm_scraper_spark.operators.similarity import (
    _QUANT_SQL,
    _quantized,
    DIM,
    N_QUERIES,
    TOP_K,
)

#: subspaces × dims-per-subspace must tile DIM exactly.
PQ_M = 4
PQ_DSUB = DIM // PQ_M
#: sub-centroids per subspace (the code alphabet; 8 → 3-bit codes).
PQ_K = 8
#: Lloyd's iterations per subspace (the DuckDB twin unrolls these).
PQ_ITERS = 2
#: salt fan-out for the two-phase serving top-k (phase-1 partitions
#: per query; sized to a typical executor count so no partition is hot).
TOPK_SALTS = 32

assert PQ_M * PQ_DSUB == DIM


def _l2(a, b):
    """Integer squared-L2 between two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )


def _subvectors(vecs: DataFrame) -> DataFrame:
    """(vec_id, m, sq): the PQ_M subspace slices of every vector —
    row-local posexplode, PQ_M skinny rows out per vector."""
    slices = F.array(
        *[F.slice("qe", m * PQ_DSUB + 1, PQ_DSUB) for m in range(PQ_M)]
    )
    return vecs.select(
        "vec_id", F.posexplode(slices).alias("m", "sq")
    ).select("vec_id", F.col("m").cast("long").alias("m"), "sq")


def _seed_codebooks(subs: DataFrame) -> DataFrame:
    """Deterministic seed: subspace m's cell c starts at the subvector
    of vec_id N_QUERIES + c — the same seed-row convention as the IVF
    coarse codebook (similarity.py _seed_cents)."""
    return subs.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + PQ_K)
    ).select(
        "m",
        (F.col("vec_id") - N_QUERIES).cast("long").alias("cell"),
        F.col("sq").alias("c_sq"),
    )


def _pq_assign(subs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, m, cell): nearest sub-centroid per subspace slice.
    Broadcast the PQ_M × PQ_K codebook, integer-L2 argmin via
    ``min_by`` on the (distance, cell) struct — a partial-aggregating
    groupBy (map-side combine), NOT a row_number window, so the
    corpus × PQ_M stream never shuffles at full width."""
    j = subs.join(F.broadcast(cents), "m")
    d = _l2(F.col("sq"), F.col("c_sq"))
    return (
        j.select("vec_id", "m", "cell", d.alias("d"))
        .groupBy("vec_id", "m")
        .agg(F.min_by("cell", F.struct("d", "cell")).alias("cell"))
    )


def pq_train_codebooks(spark: SparkSession, vecs: DataFrame) -> DataFrame:
    """PQ_ITERS rounds of Lloyd's per subspace, all PQ_M subspaces
    trained in the SAME pass (the subspace id is just another grouping
    key).  Returns (m, cell, c_sq array<long>).

    Exactness: new centroid component = floor(sum / count) — an exact
    integer both engines compute identically; empty cells keep their
    previous centroid; every argmin tie breaks on lowest cell."""
    subs = _subvectors(vecs)
    grid = spark.range(PQ_M).selectExpr("id as m").join(
        spark.range(PQ_K).selectExpr("id as cell")
    )
    cents = _seed_codebooks(subs)
    for _ in range(PQ_ITERS):
        assigned = _pq_assign(subs, cents)
        comp = (
            assigned.join(subs, ["vec_id", "m"])
            .select("m", "cell", F.posexplode("sq").alias("pos", "val"))
            .groupBy("m", "cell", "pos")
            .agg(
                F.floor(
                    F.sum("val").cast("double") / F.count("*").cast("double")
                )
                .cast("long")
                .alias("c")
            )
        )
        newc = comp.groupBy("m", "cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda t: t["c"],
            ).alias("new_sq")
        )
        cents = (
            grid.join(newc, ["m", "cell"], "left")
            .join(
                cents.select("m", "cell", F.col("c_sq").alias("prev_sq")),
                ["m", "cell"],
                "left",
            )
            .select("m", "cell", F.coalesce("new_sq", "prev_sq").alias("c_sq"))
            # PQ_M × PQ_K tiny rows; cut the lineage so later consumers
            # don't re-run the whole assign+mean pipeline (same
            # discipline as ivf_train_kmeans)
            .localCheckpoint()
        )
    return cents


def ann_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the PQ trainer: the full trained codebook,
    exploded to (m, cell, pos, comp) — every component of every
    sub-centroid is value-pinned against the unrolled twin."""
    cents = pq_train_codebooks(spark, _quantized(spark, sf_dir))
    return (
        cents.select("m", "cell", F.posexplode("c_sq").alias("pos", "comp"))
        .select("m", "cell", F.col("pos").cast("long").alias("pos"), "comp")
        .orderBy("m", "cell", "pos")
    )


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC top-k: encode the corpus to PQ_M codes per vector, then
    rank every query's neighbors by the integer ADC distance
    Σ_m ||q_m − c_{m, code_m}||².

    The serving scan reads ONLY (vec_id, codes) — the 64×-compressed
    index — and each row's distance is PQ_M lookups into the query's
    broadcast distance table (built in-plan from the same codebook:
    N_QUERIES × PQ_M × PQ_K integers).  One corpus pass; the only
    shuffle is the skinny per-query top-k rank."""
    vecs = _quantized(spark, sf_dir)
    cents = pq_train_codebooks(spark, vecs)
    subs = _subvectors(vecs)
    # the compressed index: one array<long> of PQ_M codes per vector
    codes = (
        _pq_assign(subs, cents)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "cell"))),
                lambda t: t["cell"],
            ).alias("codes")
        )
    )
    # per-query distance table: dtab[m][cell] = ||q_m - c_{m,cell}||²,
    # folded to one nested array per query (tiny, broadcast)
    qd = (
        subs.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cents), "m")
        .select(
            F.col("vec_id").alias("query_id"),
            "m",
            "cell",
            _l2(F.col("sq"), F.col("c_sq")).alias("d"),
        )
        .groupBy("query_id", "m")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("cell", "d"))),
                lambda t: t["d"],
            ).alias("dt_m")
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "dt_m"))),
                lambda t: t["dt_m"],
            ).alias("dtab")
        )
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        F.lit(0).cast("long"),
        lambda acc, m: acc
        + F.element_at(
            F.element_at(F.col("dtab"), m + 1),
            F.element_at(F.col("codes"), m + 1).cast("int") + 1,
        ),
    )
    scored = (
        codes.join(F.broadcast(qd))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            adc.alias("adc_dist2"),
        )
    )
    # Two-phase top-k (shared kernel — see functions/topk.py for the
    # hot-partition rationale and the phase-1 subset proof).
    return salted_topk(
        scored,
        "query_id",
        [F.asc("adc_dist2"), F.asc("neighbor_id")],
        TOP_K,
        "neighbor_id",
        TOPK_SALTS,
    )


def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the PQ-ADC index against the exact brute-force
    top-k — the acceptance gauge for the 64×-compressed index (the PQ
    twin of similarity.ann_recall_eval, same composition shape:
    semi-join exact × approx on (query, neighbor), count per query)."""
    from llm_scraper_spark.operators.similarity import sim_bruteforce_topk

    exact = sim_bruteforce_topk(spark, sf_dir).select("query_id", "neighbor_id")
    approx = ann_pq_topk(spark, sf_dir).select(
        F.col("query_id").alias("a_query"), F.col("neighbor_id").alias("a_neighbor")
    )
    hits = (
        exact.join(
            approx,
            (F.col("query_id") == F.col("a_query"))
            & (F.col("neighbor_id") == F.col("a_neighbor")),
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hit"))
    )
    base = exact.groupBy("query_id").agg(F.count("*").cast("long").alias("n_exact"))
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_hit", F.lit(0).cast("long")).alias("n_hit"),
            (
                F.coalesce("n_hit", F.lit(0).cast("long")).cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


# ------------------------------------------------------------- twins

_SUBS_SQL = f"""
    subs AS (
      SELECT vec_id, mm.m AS m,
             qe[CAST(mm.m * {PQ_DSUB} + 1 AS BIGINT) :
                CAST((mm.m + 1) * {PQ_DSUB} AS BIGINT)] AS sq
      FROM qn, (SELECT unnest(range(0, {PQ_M})) AS m) mm
    ),
    grid AS (
      SELECT a.m, b.cell
      FROM (SELECT unnest(range(0, {PQ_M})) AS m) a,
           (SELECT unnest(range(0, {PQ_K})) AS cell) b
    ),
    pc0 AS (
      SELECT m, CAST(vec_id - {N_QUERIES} AS BIGINT) AS cell, sq AS c_sq
      FROM subs
      WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + PQ_K}
    )"""

_D2 = (
    f"CAST(list_sum(list_transform(range(1, {PQ_DSUB + 1}), "
    f"i -> (s.sq[i] - c.c_sq[i]) * (s.sq[i] - c.c_sq[i]))) AS BIGINT)"
)


def _pq_iter_sql(i: int) -> str:
    """One unrolled PQ Lloyd's round: argmin-assign against pc{i-1},
    floor-mean per (m, cell, pos), empty cells keep the old centroid."""
    prev, cur = f"pc{i - 1}", f"pc{i}"
    return f"""
    pa{i} AS (
      SELECT vec_id, m, cell FROM (
        SELECT s.vec_id, s.m, c.cell,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                    ORDER BY {_D2} ASC, c.cell ASC) AS rk
        FROM subs s JOIN {prev} c ON c.m = s.m)
      WHERE rk = 1
    ),
    pu{i} AS (
      SELECT a.m, a.cell, t.i AS pos,
             CAST(floor(CAST(sum(s.sq[t.i]) AS DOUBLE) / count(*)) AS BIGINT) AS c
      FROM pa{i} a JOIN subs s USING (vec_id, m), range(1, {PQ_DSUB + 1}) t(i)
      GROUP BY a.m, a.cell, t.i
    ),
    pn{i} AS (
      SELECT m, cell, list(c ORDER BY pos) AS new_sq
      FROM pu{i} GROUP BY m, cell
    ),
    {cur} AS (
      SELECT g.m, g.cell, coalesce(n.new_sq, c.c_sq) AS c_sq
      FROM grid g
      LEFT JOIN pn{i} n ON n.m = g.m AND n.cell = g.cell
      LEFT JOIN {prev} c ON c.m = g.m AND c.cell = g.cell
    )"""


_TRAIN_CTES = (
    f"{_QUANT_SQL},\n{_SUBS_SQL},"
    + ",".join(_pq_iter_sql(i) for i in range(1, PQ_ITERS + 1))
)

_FINAL = f"pc{PQ_ITERS}"

ORACLE_SQL = {
    "ann_pq_codebook": f"""
    WITH {_TRAIN_CTES}
    SELECT m, cell, CAST(t.i - 1 AS BIGINT) AS pos, c_sq[t.i] AS comp
    FROM {_FINAL}, range(1, {PQ_DSUB + 1}) t(i)
    ORDER BY m, cell, pos
    """,
    "ann_pq_topk": f"""
    WITH {_TRAIN_CTES},
    codes AS (
      SELECT vec_id, m, cell FROM (
        SELECT s.vec_id, s.m, c.cell,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                    ORDER BY {_D2} ASC, c.cell ASC) AS rk
        FROM subs s JOIN {_FINAL} c ON c.m = s.m)
      WHERE rk = 1
    ),
    adc AS (
      SELECT qs.vec_id AS query_id, cd.vec_id AS neighbor_id,
             CAST(sum(list_sum(list_transform(range(1, {PQ_DSUB + 1}),
                  i -> (qs.sq[i] - c.c_sq[i]) * (qs.sq[i] - c.c_sq[i]))))
                  AS BIGINT) AS adc_dist2
      FROM codes cd
      JOIN {_FINAL} c ON c.m = cd.m AND c.cell = cd.cell
      JOIN subs qs ON qs.m = cd.m
       AND qs.vec_id < {N_QUERIES} AND qs.vec_id <> cd.vec_id
      GROUP BY qs.vec_id, cd.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, adc_dist2,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY adc_dist2 ASC, neighbor_id ASC) AS BIGINT) AS rank
      FROM adc
    )
    SELECT * FROM ranked WHERE rank <= {TOP_K} ORDER BY query_id, rank
    """,
}

# composed twin (DuckDB allows WITH inside parenthesized subqueries):
# wraps the exact oracle from similarity.py and the PQ oracle above
# verbatim — one source of truth for both definitions.
def _recall_sql() -> str:
    from llm_scraper_spark.operators.similarity import ORACLE_SQL as SIM_SQL

    return f"""
    WITH exact AS (
      SELECT query_id, neighbor_id FROM ({SIM_SQL["sim_bruteforce_topk"]}) e
    ),
    approx AS (
      SELECT query_id, neighbor_id FROM ({ORACLE_SQL["ann_pq_topk"]}) a
    ),
    hits AS (
      SELECT e.query_id, count(*) AS n_hit
      FROM exact e JOIN approx a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
      GROUP BY e.query_id
    ),
    base AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id)
    SELECT b.query_id,
           CAST(b.n_exact AS BIGINT) AS n_exact,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(b.n_exact AS DOUBLE) AS recall
    FROM base b LEFT JOIN hits h USING (query_id)
    ORDER BY query_id
    """


ORACLE_SQL["ann_pq_recall"] = _recall_sql()

QUERIES = {
    "ann_pq_codebook": ann_pq_codebook,
    "ann_pq_topk": ann_pq_topk,
    "ann_pq_recall": ann_pq_recall,
}
