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


def _planes_sql(p: int) -> str:
    return "[" + ", ".join(str(s) for s in PLANES[p]) + "]"


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN CAST(list_sum(list_transform(range(1, {DIM + 1}), "
    f"i -> qe[i] * ({_planes_sql(p)})[i])) AS BIGINT) > 0 THEN {1 << p} ELSE 0 END)"
    for p in range(N_PLANES)
)

ORACLE_SQL = {
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
}

QUERIES = {
    "sim_bruteforce_topk": sim_bruteforce_topk,
    "ann_lsh_buckets": ann_lsh_buckets,
    "ann_lsh_topk": ann_lsh_topk,
}
