"""HyperBall-style harmonic centrality over the link graph with
k-minimum-values (KMV) neighborhood sketches.

Harmonic centrality — H(v) = Σ_{u≠v} 1/d(u,v) — is the metric the
public webgraph rankings actually publish for hosts and pages, and the
canonical way to compute it at 10^10-node scale is Boldi & Vigna's
HyperBall: iterate "my ball sketch ∪= my in-neighbors' ball sketches"
with a fixed-size mergeable cardinality sketch per node, reading off
|B_t(v)| − |B_{t−1}(v)| per radius.  The reference never analyses its
link structure at all (the KG in server/scripts/util/db.py:207-469 is
write-only); this is the scale path for that gap.

Engineering twist vs the paper: the registers here are **KMV sketches
(the k smallest 56-bit md5 hashes of ball members) instead of HLL
registers**.  KMV's merge is plain relational algebra — union, then
keep the k smallest distinct hashes per node (one window) — and its
estimator ((k−1)·2^60 div h_k, exact count below k) is integer
division, so the ENTIRE algorithm — sketches, per-radius estimates,
the fixed-point harmonic sum — is bit-identical in Spark and the
unrolled-CTE DuckDB twin.  The driver gate hash-matches the actual
sketch state, not a tolerance band; estimator QUALITY is asserted
separately against an exact pure-Python BFS (tests/test_centrality.py).

Scale shape per iteration (T=4 radii): the edge join moves k=32 hashes
per edge (exactly the register-bank traffic HyperBall ships), the
k-min keep is one window over (node, hash) rows — k·V rows of state,
never the ball itself — and lineage is cut with an eager
localCheckpoint per radius (the estimate read + next-radius read
branch the plan, the `hits_scores` lesson).  Ball state per node is
32 longs regardless of ball size: the whole point at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_scraper_spark.operators.graph import PR_FANOUT

KMV_K = 32           # sketch size: k smallest hashes (rsd ≈ 1/√(k−1) ≈ 18%)
HC_T = 4             # radii (ball hops) evaluated
HC_SCALE = 1_000_000  # fixed-point denominator of the harmonic sum
HASH_BITS = 56       # md5-derived hash width: (k−1)·2^56 ≈ 2.2e18 < 2^63


def _hash_space() -> int:
    return 1 << HASH_BITS


def kmv_harmonic(docs: DataFrame, iters: int = HC_T) -> DataFrame:
    """(doc_id) → (doc_id, ball_est, harmonic_units) over the
    deterministic page graph (dst = (vid·31+j) mod n, j = 1..fanout —
    the same synthetic edge map every graph operator here uses; a
    production run feeds real (src, dst) edges).

    ``ball_est`` is the KMV estimate of |B_T(v)| (nodes reaching v in
    ≤ T hops); ``harmonic_units`` is Σ_t max(0, est_t − est_{t−1}) ·
    SCALE div t in units of 1/HC_SCALE."""
    from pyspark.sql import Window

    idx = docs.select(
        "doc_id",
        (F.row_number().over(Window.orderBy("doc_id")) - 1)
        .cast("long")
        .alias("vid"),
    )
    n = idx.count()  # scalar graph size (construction-only, as PageRank)
    if n == 0:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, ball_est long, harmonic_units long"
        )
    edges = idx.select(
        F.col("vid").alias("src"),
        F.explode(
            F.array(
                *[
                    (F.col("vid") * 31 + F.lit(j)) % n
                    for j in range(1, PR_FANOUT + 1)
                ]
            )
        ).alias("dst"),
    ).localCheckpoint(eager=True)
    # 56-bit member hash; ball-of-v state rows are (v, h)
    sk = idx.selectExpr(
        "vid AS v",
        "cast(conv(substr(md5(concat('hc:', vid)), 1, 14), 16, 10)"
        " as bigint) AS h",
    ).localCheckpoint(eager=True)
    kwin = Window.partitionBy("v").orderBy("h")

    def estimates(s: DataFrame, t: int) -> DataFrame:
        return s.groupBy("v").agg(
            F.count("*").cast("long").alias("nh"),
            F.max("h").alias("hk"),
        ).selectExpr(
            "v",
            f"cast({t} as long) AS t",
            f"if(nh < {KMV_K}, nh,"
            f" {(KMV_K - 1) * _hash_space()}L div hk) AS est",
        )
    ests = [estimates(sk, 0)]
    for t in range(1, iters + 1):
        moved = edges.join(sk, edges.src == sk.v).select(
            F.col("dst").alias("v"), "h"
        )
        sk = (
            sk.unionByName(moved)
            .distinct()  # same hash via many paths → one row
            .withColumn("rk", F.row_number().over(kwin))
            .filter(F.col("rk") <= KMV_K)
            .select("v", "h")
            .localCheckpoint(eager=True)  # cut the branched lineage
        )
        ests.append(estimates(sk, t))
    allest = ests[0]
    for e in ests[1:]:
        allest = allest.unionByName(e)
    twin = Window.partitionBy("v").orderBy("t")
    harm = (
        allest.withColumn("prev", F.lag("est", 1, None).over(twin))
        .filter(F.col("t") >= 1)
        .selectExpr(
            "v",
            "est",
            "t",
            f"greatest(0L, est - prev) * {HC_SCALE}L div t AS hterm",
        )
        .groupBy("v")
        .agg(
            F.max(F.when(F.col("t") == iters, F.col("est"))).alias(
                "ball_est"
            ),
            F.sum("hterm").cast("long").alias("harmonic_units"),
        )
    )
    return idx.join(harm, idx.vid == harm.v).select(
        "doc_id",
        F.col("ball_est").cast("long").alias("ball_est"),
        "harmonic_units",
    )


def harmonic_centrality_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: top-20 pages by KMV-HyperBall harmonic centrality,
    deterministic tie-break on doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return (
        kmv_harmonic(docs)
        .orderBy(F.desc("harmonic_units"), "doc_id")
        .limit(20)
    )


# ------------------------------------------------------------ DuckDB twin
def _kmv_iter_sql(t: int) -> str:
    """One unrolled sketch-propagation radius (MATERIALIZED: each
    sk{t} feeds both est{t} and sk{t+1} — the HITS twin lesson)."""
    return f"""
    sk{t} AS MATERIALIZED (
      SELECT v, h FROM (
        SELECT v, h, row_number() OVER (PARTITION BY v ORDER BY h) AS rk
        FROM (
          SELECT DISTINCT v, h FROM (
            SELECT e.dst AS v, s.h FROM e JOIN sk{t - 1} s ON e.src = s.v
            UNION ALL
            SELECT v, h FROM sk{t - 1}
          )
        )
      ) WHERE rk <= {KMV_K}),
    est{t} AS (
      SELECT v, CAST({t} AS BIGINT) AS t,
             CASE WHEN count(*) < {KMV_K} THEN CAST(count(*) AS BIGINT)
                  ELSE {(KMV_K - 1) * _hash_space()} // max(h) END AS est
      FROM sk{t} GROUP BY v)"""


ORACLE_SQL = {
    "harmonic_centrality_topk": f"""
        WITH nn AS (SELECT count(*) AS n FROM documents),
        idx AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS vid
          FROM documents),
        e AS (
          SELECT vid AS src, (vid * 31 + j) % (SELECT n FROM nn) AS dst
          FROM idx CROSS JOIN (VALUES {", ".join(f"({j})" for j in range(1, PR_FANOUT + 1))}) AS t(j)),
        sk0 AS MATERIALIZED (
          SELECT vid AS v,
                 CAST(concat('0x', substr(md5('hc:' || vid), 1, 14))
                      AS BIGINT) AS h
          FROM idx),
        est0 AS (
          SELECT v, CAST(0 AS BIGINT) AS t,
                 CAST(count(*) AS BIGINT) AS est
          FROM sk0 GROUP BY v),
        {",".join(_kmv_iter_sql(t) for t in range(1, HC_T + 1))},
        allest AS (
          {" UNION ALL ".join(f"SELECT * FROM est{t}" for t in range(0, HC_T + 1))}
        ),
        lagged AS (
          SELECT v, t, est,
                 lag(est) OVER (PARTITION BY v ORDER BY t) AS prev
          FROM allest),
        harm AS (
          SELECT v,
                 max(CASE WHEN t = {HC_T} THEN est END) AS ball_est,
                 CAST(sum(greatest(0, est - prev) * {HC_SCALE} // t)
                      AS BIGINT) AS harmonic_units
          FROM lagged WHERE t >= 1 GROUP BY v)
        SELECT idx.doc_id,
               CAST(harm.ball_est AS BIGINT) AS ball_est,
               harm.harmonic_units
        FROM harm JOIN idx ON harm.v = idx.vid
        ORDER BY harmonic_units DESC, doc_id LIMIT 20
    """,
}

QUERIES = {
    "harmonic_centrality_topk": harmonic_centrality_topk,
}
