"""SQ8 scalar quantization: int8 embedding compression + integer ADC
serving.

The second standard vector-compression scheme next to product
quantization (`operators/pq.py`): per-DIMENSION affine quantization of
each coordinate to one byte.  4× smaller than float32 (64 B vs 256 B
per vector here), trivially trainable (one min/max pass), and the
decoder is two integer ops — the format FAISS ships as
``ScalarQuantizer(QT_8bit)`` and the common first rung before IVF-PQ.
Reference relevance: the embedding path replaces the reference's
pairwise fuzzy text compare (util/scrape/content_cleaner.py:8-24) at
corpus scale; compression is what lets 10^10 vectors sit in a serving
tier at all.

Same exactness discipline as pq.py: everything after the shared
float→fixed-point ingest (`similarity._quantized`, floor(x·1000))
is INTEGER arithmetic —

* train: per-dimension (min, max) over the corpus — one posexplode +
  64-group aggregate (O(N·DIM) skinny rows, map-side combined);
* encode: ``code_d = (x_d − min_d)·255 div (max_d − min_d)`` ∈ [0,255],
  row-local over the broadcast 64-entry parameter arrays;
* decode: ``recon_d = min_d + code_d·(max_d − min_d) div 255``;
* serve:  ADC L2 distance ``Σ (q_d − recon_d)²`` — all-long, so the
  top-k order is hash-stable with no IEEE drift, ranked by the
  two-phase salted window (no task sees a whole query's candidates).

The 64-row parameter table is collected to the driver and re-entered
as ONE parsed SQL array literal (the `similarity._planes_lit` lesson:
py4j-walking nested lits costs seconds; bounded-by-DIM driver values
are the documented exception to no-driver-data, like graph.py's
scalar n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_scraper_spark.functions.topk import salted_topk
from llm_scraper_spark.operators.similarity import (
    DIM,
    N_QUERIES,
    TOP_K,
    _quantized,
    _QUANT_SQL,
)

SQ_LEVELS = 255      # byte range
TOPK_SALTS = 8


def sq8_train(vecs: DataFrame) -> DataFrame:
    """Per-dimension (d, mn, mx) over the fixed-point corpus — the
    whole SQ8 "model" is 64 rows."""
    return (
        vecs.select(F.posexplode("qe").alias("d", "x"))
        .groupBy("d")
        .agg(F.min("x").cast("long").alias("mn"),
             F.max("x").cast("long").alias("mx"))
    )


def _param_arrays(stats_rows) -> tuple[str, str]:
    """(mn_array_sql, mx_array_sql) literals from collected train rows
    — DIM-bounded driver values, one parsed SQL string each."""
    by_d = {r["d"]: (r["mn"], r["mx"]) for r in stats_rows}
    mn = "array(" + ",".join(f"{by_d[d][0]}L" for d in range(DIM)) + ")"
    mx = "array(" + ",".join(f"{by_d[d][1]}L" for d in range(DIM)) + ")"
    return mn, mx


def sq8_encode(vecs: DataFrame, mn_sql: str, mx_sql: str) -> DataFrame:
    """Row-local encode + decode: (vec_id, codes, recon).  Degenerate
    dimensions (mx == mn) encode to 0 and reconstruct to mn."""
    rng = f"zip_with({mx_sql}, {mn_sql}, (a, b) -> a - b)"
    codes = (
        f"zip_with(zip_with(qe, {mn_sql}, (x, m) -> x - m), {rng},"
        f" (c, r) -> if(r = 0, 0L, least({SQ_LEVELS}L,"
        f" greatest(0L, c * {SQ_LEVELS}L div r))))"
    )
    return vecs.selectExpr("vec_id", "qe", f"{codes} AS codes").selectExpr(
        "vec_id",
        "qe",
        "codes",
        f"zip_with(zip_with(codes, {rng}, (c, r) -> c * r div {SQ_LEVELS}L),"
        f" {mn_sql}, (s, m) -> s + m) AS recon",
    )


def _trained(spark: SparkSession, sf_dir: str):
    vecs = _quantized(spark, sf_dir)
    mn_sql, mx_sql = _param_arrays(sq8_train(vecs).collect())
    return vecs, sq8_encode(vecs, mn_sql, mx_sql)


def sq8_train_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: the 64-row trained parameter table."""
    return sq8_train(_quantized(spark, sf_dir)).selectExpr(
        "cast(d as bigint) AS d", "mn", "mx"
    ).orderBy("d")


def sq8_recon_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: corpus-total squared reconstruction error — the
    quantizer's quality gauge, 1 row, integer-exact."""
    _, enc = _trained(spark, sf_dir)
    return enc.selectExpr(
        "aggregate(zip_with(qe, recon, (x, r) -> (x - r) * (x - r)),"
        " 0L, (acc, e) -> acc + e) AS err"
    ).agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum("err").cast("long").alias("total_err_units"),
    )


def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: per-query top-k by integer ADC L2 distance between
    the full-precision query and the corpus's RECONSTRUCTED vectors —
    the serving path scans only the compressed codes."""
    vecs, enc = _trained(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("q_qe")
    )
    scored = (
        enc.select("vec_id", "recon")
        .join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .selectExpr(
            "query_id",
            "vec_id AS neighbor_id",
            "aggregate(zip_with(q_qe, recon, (q, r) -> (q - r) * (q - r)),"
            " 0L, (acc, e) -> acc + e) AS dist_units",
        )
    )
    return salted_topk(
        scored,
        "query_id",
        [F.asc("dist_units"), F.asc("neighbor_id")],
        TOP_K,
        "neighbor_id",
        TOPK_SALTS,
    )


# --------------------------------------------------------------- twins
#: exploded-form twin: stats per d, recon per (vec, d), ADC distance
#: per (query, vec) — same integers, relational spelling.
_SQ8_CTES = f"""
  dims AS (
    SELECT vec_id,
           generate_subscripts(qe, 1) - 1 AS d,
           unnest(qe) AS x
    FROM qn),
  stats AS (
    SELECT d, CAST(min(x) AS BIGINT) AS mn, CAST(max(x) AS BIGINT) AS mx
    FROM dims GROUP BY d),
  recon AS (
    SELECT dims.vec_id, dims.d, dims.x,
           CASE WHEN mx = mn THEN mn
                ELSE mn + (least({SQ_LEVELS}, greatest(0,
                       (x - mn) * {SQ_LEVELS} // (mx - mn)))
                     * (mx - mn)) // {SQ_LEVELS}
           END AS r
    FROM dims JOIN stats ON dims.d = stats.d)
"""

ORACLE_SQL = {
    "sq8_train_params": f"""
        WITH {_QUANT_SQL},
        {_SQ8_CTES}
        SELECT CAST(d AS BIGINT) AS d, mn, mx FROM stats ORDER BY d
    """,
    "sq8_recon_error": f"""
        WITH {_QUANT_SQL},
        {_SQ8_CTES}
        SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
               CAST(sum((x - r) * (x - r)) AS BIGINT) AS total_err_units
        FROM recon
    """,
    "ann_sq8_topk": f"""
        WITH {_QUANT_SQL},
        {_SQ8_CTES},
        qd AS (
          SELECT vec_id AS query_id, d, x AS qx
          FROM dims WHERE vec_id < {N_QUERIES}),
        dist AS (
          SELECT qd.query_id, recon.vec_id AS neighbor_id,
                 CAST(sum((qd.qx - recon.r) * (qd.qx - recon.r)) AS BIGINT)
                   AS dist_units
          FROM qd JOIN recon ON qd.d = recon.d
          WHERE recon.vec_id <> qd.query_id
          GROUP BY qd.query_id, recon.vec_id),
        ranked AS (
          SELECT query_id, neighbor_id, dist_units,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY dist_units, neighbor_id) AS BIGINT) AS rank
          FROM dist)
        SELECT * FROM ranked WHERE rank <= {TOP_K} ORDER BY query_id, rank
    """,
}

QUERIES = {
    "sq8_train_params": sq8_train_params,
    "sq8_recon_error": sq8_recon_error,
    "ann_sq8_topk": ann_sq8_topk,
}
