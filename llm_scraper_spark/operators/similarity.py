"""Similarity search over the embeddings table — brute-force cosine
top-k baseline and an LSH (random-hyperplane) bucketed ANN scale path.

Cross-engine determinism: embeddings are quantized to integers
(floor(x*1000)) so dot products and norms are *exact* integer sums
(associative — partition order can't change them); the final cosine is
a single IEEE division/sqrt on identical integers, identical in Spark
and DuckDB.  Hyperplane signs are derived once in Python from md5 and
embedded as literals in both the Spark plan and the oracle SQL.

Scale path (100 TB): brute force is O(queries × corpus) — fine for a
broadcast query set, quadratic for all-pairs.  The LSH variant buckets
vectors by 8 hyperplane sign bits; candidate generation is a bucket
equi-join (shuffle on an 8-bit key + salt), turning all-pairs into
per-bucket work.  An IVF variant would swap the bucket key for a
centroid id — same join shape.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 8
TOP_K = 3
N_QUERIES = 10  # vec_id < 10 are the query vectors
N_CELLS = 8     # IVF coarse cells (centroids)
N_PROBE = 2     # IVF cells probed per query
NEAR_DUP_COS = 0.95


def _plane_signs() -> list[list[int]]:
    """8 deterministic ±1 hyperplanes from md5 — one source of truth
    for both engines (embedded as literals in SQL)."""
    planes = []
    for p in range(N_PLANES):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"plane:{p}:{d}".encode()).digest()[0]
            row.append(1 if h & 1 else -1)
        planes.append(row)
    return planes


PLANES = _plane_signs()


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1000).cast("long"),
    )
    return emb.select("vec_id", "label", q.alias("qe")).withColumn(
        "norm2",
        F.aggregate(
            "qe", F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ),
    )

_QUANT_SQL = """
  q AS (
    SELECT vec_id, label,
           list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qe
    FROM embeddings
  ),
  qn AS (
    SELECT vec_id, label, qe,
           CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS norm2
    FROM q
  )
"""


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the small query set against the
    corpus (one scan, no corpus shuffle), rank per query."""
    vecs = _quantized(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qe").alias("q_qe"),
        F.col("norm2").alias("q_norm2"),
    )
    pairs = vecs.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    dot = _dot("q_qe", "qe")
    cos = dot.cast("double") / (
        F.sqrt(F.col("q_norm2").cast("double")) * F.sqrt(F.col("norm2").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucket assignment: 8 sign bits per vector —
    integer projections, JVM-side, no UDF."""
    vecs = _quantized(spark, sf_dir)
    bucket = F.lit(0).cast("long")
    for p in range(N_PLANES):
        plane = F.array(*[F.lit(s) for s in PLANES[p]])
        proj = F.aggregate(
            F.zip_with(F.col("qe"), plane, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(0).cast("long")
    return vecs.select("vec_id", "label", bucket.alias("bucket")).orderBy("vec_id")


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket, then
    exact cosine rank within bucket — the join is on the bucket key, so
    cost scales with bucket occupancy, not corpus²."""
    vecs = _quantized(spark, sf_dir)
    with_bucket = ann_lsh_buckets(spark, sf_dir).select("vec_id", "bucket")
    v = vecs.join(with_bucket, "vec_id")
    queries = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qe").alias("q_qe"),
        F.col("norm2").alias("q_norm2"),
        F.col("bucket").alias("q_bucket"),
    )
    cands = v.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    dot = _dot("q_qe", "qe")
    cos = dot.cast("double") / (
        F.sqrt(F.col("q_norm2").cast("double")) * F.sqrt(F.col("norm2").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cands.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def _seed_cents(vecs: DataFrame) -> DataFrame:
    """The deterministic seed codebook: centroids are the vectors with
    vec_id ∈ [N_QUERIES, N_QUERIES+N_CELLS).  ``ivf_train_kmeans``
    below refines it with exact Lloyd's updates."""
    return vecs.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + N_CELLS)
    ).select(
        (F.col("vec_id") - N_QUERIES).alias("cell"),
        F.col("qe").alias("c_qe"),
        F.col("norm2").alias("c_norm2"),
    )


def _ivf_serve(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """IVF-ANN serving against an arbitrary (cell, c_qe, c_norm2)
    codebook — shared by the seed-codebook and trained-codebook query
    paths so the two can never drift.  Corpus vectors are bucketed
    into cells; each query probes its N_PROBE nearest cells and ranks
    exact cosine only within them.  The candidate join key is the cell
    id — the same equi-join shape as LSH, so cost scales with cell
    occupancy (corpus/N_CELLS × N_PROBE per query), not corpus²."""
    cells = _assign_to(vecs, cents)
    v = vecs.join(cells, "vec_id")
    # query → its N_PROBE closest cells (broadcast of centroids again)
    pcents = cents.select(
        F.col("cell").alias("probe_cell"), "c_qe", "c_norm2"
    )
    queries = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qe").alias("q_qe"),
        F.col("norm2").alias("q_norm2"),
    )
    qcos = _dot("c_qe", "q_qe").cast("double") / (
        F.sqrt(F.col("c_norm2").cast("double")) * F.sqrt(F.col("q_norm2").cast("double"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("p_cos"), F.asc("probe_cell"))
    probes = (
        queries.join(F.broadcast(pcents))
        .select("query_id", "q_qe", "q_norm2", "probe_cell", qcos.alias("p_cos"))
        .withColumn("prank", F.row_number().over(wq))
        .filter(F.col("prank") <= N_PROBE)
        .select("query_id", "q_qe", "q_norm2", F.col("probe_cell").alias("p_cell"))
    )
    cands = v.join(
        F.broadcast(probes),
        (F.col("cell") == F.col("p_cell")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = _dot("q_qe", "qe").cast("double") / (
        F.sqrt(F.col("q_norm2").cast("double")) * F.sqrt(F.col("norm2").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cands.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
        )
        .distinct()  # a neighbor may sit in both probed cells
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ANN top-k against the deterministic seed codebook."""
    vecs = _quantized(spark, sf_dir)
    return _ivf_serve(vecs, _seed_cents(vecs))


def ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ANN top-k served from the TRAINED codebook: the exact
    integer Lloyd's trainer (``ivf_train_kmeans``) produces the
    centroids, and the identical serving plan (`_ivf_serve`) consumes
    them — the full train→serve composition a production ANN index
    runs, with the training unrolled in the DuckDB twin so every
    served neighbor is still value-checked end-to-end."""
    vecs = _quantized(spark, sf_dir)
    cents, _ = ivf_train_kmeans(spark, vecs)
    return _ivf_serve(vecs, cents)


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: corpus ∪ deterministic
    copies (exact for vec_id%13==0, tiny-perturbed for vec_id%9==0),
    blocked by the 8-bit hyperplane bucket, exact cosine ≥ NEAR_DUP_COS
    within blocks.  Blocking keeps the pair join linear in bucket
    occupancy — the all-pairs cosine join is never materialized."""
    vecs = _quantized(spark, sf_dir)
    exact = vecs.filter(F.col("vec_id") % 13 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "label", "qe", "norm2"
    )
    perturbed = (
        vecs.filter(F.col("vec_id") % 9 == 0)
        .select(
            (F.col("vec_id") + 200000).alias("vec_id"),
            "label",
            F.concat(
                F.array(F.element_at(F.col("qe"), 1) + 1), F.slice("qe", 2, DIM - 1)
            ).alias("qe"),
        )
        .withColumn(
            "norm2",
            F.aggregate("qe", F.lit(0).cast("long"), lambda acc, x: acc + x * x),
        )
    )
    aug = vecs.unionByName(exact).unionByName(perturbed)
    bucket = F.lit(0).cast("long")
    for p in range(N_PLANES):
        plane = F.array(*[F.lit(s) for s in PLANES[p]])
        proj = F.aggregate(
            F.zip_with(F.col("qe"), plane, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(0).cast("long")
    b = aug.withColumn("bucket", bucket)
    pairs = b.alias("x").join(
        b.alias("y"),
        (F.col("x.bucket") == F.col("y.bucket"))
        & (F.col("x.vec_id") < F.col("y.vec_id")),
    )
    dot = F.aggregate(
        F.zip_with(F.col("x.qe"), F.col("y.qe"), lambda a_, b_: a_ * b_),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )
    cos = dot.cast("double") / (
        F.sqrt(F.col("x.norm2").cast("double")) * F.sqrt(F.col("y.norm2").cast("double"))
    )
    return (
        pairs.select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= NEAR_DUP_COS)
        .orderBy("vec_a", "vec_b")
    )


# --------------------------------------------------- IVF codebook training
KMEANS_ITERS = 2


def _assign_to(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Argmax-cosine cell per vector against a (cell, c_qe, c_norm2)
    codebook — broadcast centroid join + per-vector rank window."""
    scored = vecs.join(F.broadcast(cents))
    cos = _dot("c_qe", "qe").cast("double") / (
        F.sqrt(F.col("c_norm2").cast("double")) * F.sqrt(F.col("norm2").cast("double"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("cell"))
    return (
        scored.select("vec_id", "cell", cos.alias("c_cos"))
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") == 1)
        .select("vec_id", "cell")
    )


def ivf_train_kmeans(
    spark: SparkSession, vecs: DataFrame, k: int = N_CELLS, iters: int = KMEANS_ITERS
):
    """Deterministic Lloyd's k-means for the IVF codebook — the offline
    training step the ann_ivf_topk serving plan assumes.

    Exactness trick: cosine is invariant to positive scaling, so each
    new centroid is kept as the element-wise integer SUM of its member
    vectors, never the fractional mean — every number in the loop stays
    an exact int64 (sums of quantized components; norms ≪ 2^63), which
    makes the trainer bit-reproducible across engines and lets the
    DuckDB twin verify it by unrolling the iterations.  Ties break on
    the lowest cell id; empty cells keep their previous centroid.

    Plan per iteration: one broadcast-assign corpus scan (O(corpus×k)
    in-row dot products), then a skinny (cell, pos, component) shuffle
    for the sums — O(corpus×DIM) rows of 20 bytes.  At 100 TB you run
    this on a corpus sample; serving uses the static codebook.

    Returns (centroids DF (cell, c_qe, c_norm2), last assignment DF
    (vec_id, cell) — the assignment that produced those centroids).
    """
    cells = spark.range(k).select(F.col("id").cast("int").alias("cell"))
    cents = vecs.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + k)
    ).select(
        (F.col("vec_id") - N_QUERIES).cast("int").alias("cell"),
        F.col("qe").alias("c_qe"),
        F.col("norm2").alias("c_norm2"),
    )
    assigned = None
    for _ in range(iters):
        assigned = _assign_to(vecs, cents)
        sums = (
            assigned.join(vecs, "vec_id")
            .select("cell", F.posexplode("qe").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"))
        )
        newc = sums.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))), lambda t: t["s"]
            ).alias("new_qe")
        )
        cents = (
            cells.join(newc, "cell", "left")
            .join(
                cents.select("cell", F.col("c_qe").alias("prev_qe")), "cell", "left"
            )
            .select("cell", F.coalesce("new_qe", "prev_qe").alias("c_qe"))
            .withColumn(
                "c_norm2",
                F.aggregate(
                    "c_qe", F.lit(0).cast("long"), lambda acc, x: acc + x * x
                ),
            )
            # materialize the k tiny centroid rows and CUT the lineage:
            # without this every downstream consumer (next iteration,
            # serving join, per-cell counts) re-executes the whole
            # O(corpus×k) assign+sum pipeline — Catalyst does not
            # dedupe common subtrees across actions
            .localCheckpoint()
        )
    return cents, assigned


def ann_ivf_train_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the k-means trainer: run KMEANS_ITERS exact
    Lloyd's updates and emit the per-cell summary (membership count of
    the final assignment + the trained centroid's norm) — integers
    that pin every assignment and every centroid component."""
    vecs = _quantized(spark, sf_dir)
    cents, assigned = ivf_train_kmeans(spark, vecs)
    counts = assigned.groupBy("cell").agg(F.count("*").cast("long").alias("n_members"))
    return (
        cents.join(counts, "cell", "left")
        .select(
            F.col("cell").cast("long").alias("cell"),
            F.coalesce("n_members", F.lit(0).cast("long")).alias("n_members"),
            F.col("c_norm2").cast("long").alias("c_norm2"),
        )
        .orderBy("cell")
    )


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF ANN path against the exact brute-force
    top-k, per query — the quality gauge a training-data pipeline
    needs before trusting approximate neighbors at scale.  Pure
    composition: semi-join the exact result against the approximate
    one on (query, neighbor), count hits per query."""
    exact = sim_bruteforce_topk(spark, sf_dir).select("query_id", "neighbor_id")
    approx = ann_ivf_topk(spark, sf_dir).select(
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
    base = exact.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_exact")
    )
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


def _planes_sql(p: int) -> str:
    return "[" + ", ".join(str(s) for s in PLANES[p]) + "]"


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN CAST(list_sum(list_transform(range(1, {DIM + 1}), "
    f"i -> qe[i] * ({_planes_sql(p)})[i])) AS BIGINT) > 0 THEN {1 << p} ELSE 0 END)"
    for p in range(N_PLANES)
)

def _kmeans_iter_sql(i: int) -> str:
    """One unrolled Lloyd's iteration: assign against codebook c{i-1},
    sum member components per (cell, pos), reassemble, keep the
    previous centroid for empty cells."""
    prev, cur = f"c{i - 1}", f"c{i}"
    return f"""
        a{i} AS (
          SELECT vec_id, cell FROM (
            SELECT v.vec_id, c.cell,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                     CAST(list_sum(list_transform(range(1, {DIM + 1}),
                          j -> v.qe[j] * c.c_qe[j])) AS DOUBLE)
                     / (sqrt(CAST(c.c_norm2 AS DOUBLE)) * sqrt(CAST(v.norm2 AS DOUBLE)))
                     DESC, c.cell ASC) AS rk
            FROM qn v, {prev} c)
          WHERE rk = 1
        ),
        s{i} AS (
          SELECT a.cell, t.j AS pos, CAST(sum(v.qe[t.j]) AS BIGINT) AS s
          FROM a{i} a JOIN qn v USING (vec_id), range(1, {DIM + 1}) t(j)
          GROUP BY a.cell, t.j
        ),
        n{i} AS (SELECT cell, list(s ORDER BY pos) AS new_qe FROM s{i} GROUP BY cell),
        {cur} AS (
          SELECT cl.cell,
                 coalesce(n.new_qe, c.c_qe) AS c_qe,
                 CAST(list_sum(list_transform(coalesce(n.new_qe, c.c_qe),
                      x -> x * x)) AS BIGINT) AS c_norm2
          FROM cells cl
          LEFT JOIN n{i} n ON n.cell = cl.cell
          LEFT JOIN {prev} c ON c.cell = cl.cell
        )"""


def _ivf_serve_sql(prelude: str, cents: str) -> str:
    """DuckDB twin of `_ivf_serve`, parameterized by the centroid CTE —
    generated from one template for both the seed and trained codebooks
    so the two oracles can never drift from each other."""
    return f"""
        WITH {prelude},
        scored AS (
          SELECT v.vec_id, v.qe, v.norm2, c.cell,
                 CAST(list_sum(list_transform(range(1, {DIM + 1}),
                      i -> v.qe[i] * c.c_qe[i])) AS DOUBLE)
                 / (sqrt(CAST(c.c_norm2 AS DOUBLE)) * sqrt(CAST(v.norm2 AS DOUBLE))) AS c_cos
          FROM qn v CROSS JOIN {cents} c
        ),
        assign AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                        ORDER BY c_cos DESC, cell) AS crank
            FROM scored
          ) WHERE crank = 1
        ),
        qscored AS (
          SELECT q2.vec_id AS query_id, q2.qe AS q_qe, q2.norm2 AS q_norm2, c.cell,
                 CAST(list_sum(list_transform(range(1, {DIM + 1}),
                      i -> q2.qe[i] * c.c_qe[i])) AS DOUBLE)
                 / (sqrt(CAST(c.c_norm2 AS DOUBLE)) * sqrt(CAST(q2.norm2 AS DOUBLE))) AS p_cos
          FROM qn q2 CROSS JOIN {cents} c
          WHERE q2.vec_id < {N_QUERIES}
        ),
        probes AS (
          SELECT query_id, q_qe, q_norm2, cell FROM (
            SELECT query_id, q_qe, q_norm2, cell,
                   row_number() OVER (PARTITION BY query_id
                        ORDER BY p_cos DESC, cell) AS prank
            FROM qscored
          ) WHERE prank <= {N_PROBE}
        ),
        cands AS (
          SELECT DISTINCT p.query_id, v.vec_id AS neighbor_id,
                 CAST(list_sum(list_transform(range(1, {DIM + 1}),
                      i -> p.q_qe[i] * v.qe[i])) AS DOUBLE)
                 / (sqrt(CAST(p.q_norm2 AS DOUBLE)) * sqrt(CAST(v.norm2 AS DOUBLE))) AS cosine
          FROM probes p
          JOIN (SELECT qn.*, a.cell FROM qn JOIN assign a USING (vec_id)) v
            ON v.cell = p.cell AND v.vec_id <> p.query_id
        ),
        ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
          FROM cands
        )
        SELECT * FROM ranked WHERE rank <= {TOP_K} ORDER BY query_id, rank
    """


_KMEANS_SQL = f"""
        WITH {_QUANT_SQL},
        cells AS (SELECT CAST(range AS INT) AS cell FROM range(0, {N_CELLS})),
        c0 AS (
          SELECT CAST(vec_id - {N_QUERIES} AS INT) AS cell,
                 qe AS c_qe, norm2 AS c_norm2
          FROM qn WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CELLS}
        ),{",".join(_kmeans_iter_sql(i) for i in range(1, KMEANS_ITERS + 1))}
        SELECT CAST(cl.cell AS BIGINT) AS cell,
               CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_members,
               c{KMEANS_ITERS}.c_norm2 AS c_norm2
        FROM cells cl
        LEFT JOIN (SELECT cell, count(*) AS n FROM a{KMEANS_ITERS} GROUP BY cell) cnt
               ON cnt.cell = cl.cell
        JOIN c{KMEANS_ITERS} ON c{KMEANS_ITERS}.cell = cl.cell
        ORDER BY cell
"""


ORACLE_SQL = {
    "ann_ivf_train_cells": _KMEANS_SQL,
    "sim_bruteforce_topk": f"""
        WITH {_QUANT_SQL},
        pairs AS (
          SELECT q2.vec_id AS query_id, v.vec_id AS neighbor_id,
                 CAST(list_sum(list_transform(range(1, {DIM + 1}),
                      i -> q2.qe[i] * v.qe[i])) AS DOUBLE)
                 / (sqrt(CAST(q2.norm2 AS DOUBLE)) * sqrt(CAST(v.norm2 AS DOUBLE))) AS cosine
          FROM qn q2 JOIN qn v ON v.vec_id <> q2.vec_id
          WHERE q2.vec_id < {N_QUERIES}
        ),
        ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
          FROM pairs
        )
        SELECT * FROM ranked WHERE rank <= {TOP_K} ORDER BY query_id, rank
    """,
    "ann_lsh_buckets": f"""
        WITH {_QUANT_SQL}
        SELECT vec_id, label, CAST({_BUCKET_SQL} AS BIGINT) AS bucket
        FROM qn ORDER BY vec_id
    """,
    "ann_lsh_topk": f"""
        WITH {_QUANT_SQL},
        b AS (
          SELECT vec_id, qe, norm2, CAST({_BUCKET_SQL} AS BIGINT) AS bucket FROM qn
        ),
        pairs AS (
          SELECT q2.vec_id AS query_id, v.vec_id AS neighbor_id,
                 CAST(list_sum(list_transform(range(1, {DIM + 1}),
                      i -> q2.qe[i] * v.qe[i])) AS DOUBLE)
                 / (sqrt(CAST(q2.norm2 AS DOUBLE)) * sqrt(CAST(v.norm2 AS DOUBLE))) AS cosine
          FROM b q2 JOIN b v ON v.bucket = q2.bucket AND v.vec_id <> q2.vec_id
          WHERE q2.vec_id < {N_QUERIES}
        ),
        ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
          FROM pairs
        )
        SELECT * FROM ranked WHERE rank <= {TOP_K} ORDER BY query_id, rank
    """,
    "ann_ivf_topk": _ivf_serve_sql(
        f"""{_QUANT_SQL},
        cents AS (
          SELECT vec_id - {N_QUERIES} AS cell, qe AS c_qe, norm2 AS c_norm2
          FROM qn WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CELLS}
        )""",
        "cents",
    ),
    "ann_ivf_trained_topk": _ivf_serve_sql(
        f"""{_QUANT_SQL},
        cells AS (SELECT CAST(range AS INT) AS cell FROM range(0, {N_CELLS})),
        c0 AS (
          SELECT CAST(vec_id - {N_QUERIES} AS INT) AS cell,
                 qe AS c_qe, norm2 AS c_norm2
          FROM qn WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CELLS}
        ),{",".join(_kmeans_iter_sql(i) for i in range(1, KMEANS_ITERS + 1))}""",
        f"c{KMEANS_ITERS}",
    ),
    "dedup_embedding_cosine": f"""
        WITH {_QUANT_SQL},
        pert AS (
          SELECT vec_id + 200000 AS vec_id, label,
                 list_concat([qe[1] + 1], qe[2:]) AS qe
          FROM qn WHERE vec_id % 9 = 0
        ),
        aug AS (
          SELECT vec_id, label, qe, norm2 FROM qn
          UNION ALL
          SELECT vec_id + 100000 AS vec_id, label, qe, norm2
          FROM qn WHERE vec_id % 13 = 0
          UNION ALL
          SELECT vec_id, label, qe,
                 CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS norm2
          FROM pert
        ),
        b AS (
          SELECT vec_id, qe, norm2, CAST({_BUCKET_SQL} AS BIGINT) AS bucket FROM aug
        ),
        pairs AS (
          SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
                 CAST(list_sum(list_transform(range(1, {DIM + 1}),
                      i -> x.qe[i] * y.qe[i])) AS DOUBLE)
                 / (sqrt(CAST(x.norm2 AS DOUBLE)) * sqrt(CAST(y.norm2 AS DOUBLE))) AS cosine
          FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        )
        SELECT vec_a, vec_b, cosine FROM pairs
        WHERE cosine >= {NEAR_DUP_COS} ORDER BY vec_a, vec_b
    """,
}

# composed twin: DuckDB allows WITH inside a parenthesized subquery, so
# the recall oracle wraps the two existing oracles verbatim — one
# source of truth for the exact and approximate definitions
ORACLE_SQL["ann_recall_eval"] = f"""
    WITH exact AS (
      SELECT query_id, neighbor_id FROM ({ORACLE_SQL["sim_bruteforce_topk"]}) e
    ),
    approx AS (
      SELECT query_id, neighbor_id FROM ({ORACLE_SQL["ann_ivf_topk"]}) a
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

QUERIES = {
    "sim_bruteforce_topk": sim_bruteforce_topk,
    "ann_lsh_buckets": ann_lsh_buckets,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_trained_topk": ann_ivf_trained_topk,
    "ann_ivf_train_cells": ann_ivf_train_cells,
    "ann_recall_eval": ann_recall_eval,
    "dedup_embedding_cosine": dedup_embedding_cosine,
}
