"""Count-Min sketch heavy hitters — the mergeable frequency sketch.

The crawl loop needs per-host traffic accounting at every round
(politeness budgets, hot-host detection, abuse throttling), but an
exact per-host count at 10^10 URLs is a full shuffle of the frontier
per round.  The Count-Min sketch (Cormode–Muthukrishnan, J.Alg '05)
answers point frequency queries with a FIXED-SIZE state table —
D×W counters regardless of corpus size — that is *additive*: sketches
built per partition / per round / per shard merge by cell-wise sum,
exactly like the HLL++ distinct sketch (`approx_distinct_gate`) and
the KMV ball sketches (`harmonic_centrality_topk`) already in the
suite.  Guarantee: estimate ≥ true count always (one-sided), and
estimate ≤ true + εN with probability 1−δ for W = ⌈e/ε⌉, D = ⌈ln 1/δ⌉.

The reference counts per-host work implicitly (one SLURM task per
batch file, server/scripts/batch.py:19-23) and keeps no frequency
state at all; this is the scale path for that gap.

Determinism/twin: row-d hash = first 15 hex chars of
md5('cms' ‖ d ‖ ':' ‖ key) → 60-bit long mod W (the repo's shared
hex→long idiom, dedup.py:13) — both engines agree bit-for-bit, so the
sketch table, the point estimates, and the heavy-hitter cut are all
hash-exact cross-engine.  No floats anywhere.

Scale shape: building the sketch is one groupBy over D×|items| skinny
(d, cell) rows into AT MOST D·W output rows (hash partial aggregation
collapses map-side, so the shuffle is bounded by D·W per partition —
constant); the candidate estimate join touches D rows per candidate
against the ≤D·W-row sketch (broadcast — the sketch is constant-size
BY CONSTRUCTION, the always-correct broadcast).  The exact counts
computed alongside in the driver gate are the sandbox-scale
self-check; a production run keeps only the sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CMS_D = 4          # hash rows (δ = e^-4 ≈ 1.8%)
CMS_W = 64         # counters per row — small on purpose so collisions
                   # (and the one-sided overestimate) actually occur at
                   # sandbox SF; production would size W = e/ε
HH_PCT = 2         # heavy hitter = estimated share ≥ 2% of the stream

#: synthetic hot-host family: every 3rd key hits the hot host site0,
#: the rest spread over 40 host buckets — a ~35% hot key, the skew a
#: real frontier shows.  Parameterized by the id column: the CMS
#: stream keys on user_id, the shuffle-skew audit
#: (relational.shuffle_skew_report) on doc_id — ONE definition.
def hot_host_spark(col: str) -> str:
    return (
        f"if({col} % 3 = 0, 'site0',"
        f" concat('site', cast({col} % 40 as string)))"
    )


def hot_host_duck(col: str) -> str:
    return (
        f"CASE WHEN {col} % 3 = 0 THEN 'site0'"
        f" ELSE 'site' || CAST({col} % 40 AS VARCHAR) END"
    )


_HOST_SPARK = hot_host_spark("user_id")
_HOST_DUCK = hot_host_duck("user_id")


def _cell(d: int, key: str = "key") -> str:
    """SQL expr: CMS cell index of `key` in hash row d (0-based)."""
    return (
        f"cast(conv(substr(md5(concat('cms', '{d}', ':', {key})), 1, 15),"
        f" 16, 10) as bigint) % {CMS_W}"
    )


def cms_build(items: DataFrame, key: str = "key") -> DataFrame:
    """Build the Count-Min sketch table ``(d, cell, cnt)`` from an item
    frame (one row per occurrence).  ≤ D·W rows out, additive across
    shards: cms_build(a ∪ b) == cell-wise sum of cms_build(a) and
    cms_build(b)."""
    rows = items.selectExpr(
        f"stack({CMS_D}, "
        + ", ".join(f"{d}, {_cell(d, key)}" for d in range(CMS_D))
        + ") AS (d, cell)"
    )
    return rows.groupBy("d", "cell").agg(
        F.count("*").cast("long").alias("cnt")
    )


def cms_estimate(sketch: DataFrame, candidates: DataFrame,
                 key: str = "key") -> DataFrame:
    """Point-estimate every candidate key against the sketch:
    min over the D rows of the candidate's cell counter.  The sketch
    is ≤ D·W rows — broadcast by construction."""
    probes = candidates.selectExpr(
        key,
        f"stack({CMS_D}, "
        + ", ".join(f"{d}, {_cell(d, key)}" for d in range(CMS_D))
        + ") AS (d, cell)",
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "cell"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_cnt"))
    )


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: hosts whose CMS-estimated share of the event
    stream is ≥ HH_PCT percent, with the exact count alongside (the
    one-sided guarantee cms_cnt ≥ exact_cnt is thus driver-checked on
    every row).  Candidates are the distinct hosts — bounded here; at
    10^10 URLs candidates come from a prior round's survivors."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        f"{_HOST_SPARK} AS key"
    )
    n = ev.count()  # scalar stream size (drives the % threshold)
    sketch = cms_build(ev)
    exact = ev.groupBy("key").agg(
        F.count("*").cast("long").alias("exact_cnt")
    )
    est = cms_estimate(sketch, exact.select("key"))
    return (
        exact.join(est, "key")
        .filter(F.col("cms_cnt") * 100 >= F.lit(HH_PCT * n))
        .select(
            F.col("key").alias("host"),
            "exact_cnt",
            "cms_cnt",
            (F.col("cms_cnt") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.desc("cms_cnt"), "host")
    )


# ----------------------------------------------------- KMV set sketch
KMV_K = 64          # sketch size: k minimum hash values per set
H56 = 1 << 56       # hash space: 56-bit md5 prefixes — 14 hex chars, not
                    # the repo's usual 15, so (K−1)·H56 ≈ 4.5e18 stays
                    # inside int64 with no decimal promotion
EVAL_SCALE = 1_000_000

#: the two crawl-round URL sets from the snapshots universe (same
#: predicates as operators/snapshots.py) — their exact intersection /
#: union are known, which is what makes the estimate self-checkable.
_SET_A_PRED = "doc_id % 10 <> 9"
_SET_B_PRED = "doc_id % 10 <> 0"


def kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) set-operation sketch (Beyer et al.,
    SIGMOD '07): estimate |A∪B| and |A∩B| of two URL sets from two
    64-hash sketches — the third mergeable-sketch family next to
    HLL++ (cardinality) and Count-Min (frequency), and the one that
    supports INTERSECTION, which neither of those can.  Protocol: the
    union sketch U = k smallest hashes of A∪B (computable purely by
    merging the two per-set sketches); distinct-union estimate
    ``(k−1)·2⁵⁶ div max(U)``; Jaccard estimate = fraction of U present
    in BOTH per-set sketches (exact for members of U: a union-k-min
    that belongs to A is necessarily one of A's k smallest).  All
    integer — both engines agree bit-for-bit, and the driver gate
    carries the EXACT union/intersection alongside so the estimate's
    error is auditable on every run (same self-check discipline as
    `approx_distinct_gate`).

    Scale shape: each per-set sketch is a global top-k on the hash —
    TakeOrdered, K·partitions candidates, no full sort — and every
    downstream join touches only the ≤2K sketch rows (broadcast by
    construction)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = "cast(conv(substr(md5(cast(doc_id as string)), 1, 14), 16, 10) as bigint)"
    a = docs.filter(_SET_A_PRED).selectExpr(f"{h} AS h")
    b = docs.filter(_SET_B_PRED).selectExpr(f"{h} AS h")
    ka = a.orderBy("h").limit(KMV_K).withColumn("in_a", F.lit(1))
    kb = b.orderBy("h").limit(KMV_K).withColumn("in_b", F.lit(1))
    union_sketch = (
        ka.select("h")
        .unionByName(kb.select("h"))
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
    )
    marked = (
        union_sketch.join(F.broadcast(ka.select("h", "in_a")), "h", "left")
        .join(F.broadcast(kb.select("h", "in_b")), "h", "left")
        .agg(
            F.max("h").alias("kth"),
            F.count("*").cast("long").alias("n_u"),
            F.sum(
                F.expr("if(in_a IS NOT NULL AND in_b IS NOT NULL, 1L, 0L)")
            ).alias("n_both"),
        )
    )
    exact = (
        a.select("h").intersect(b.select("h"))
        .agg(F.count("*").cast("long").alias("exact_inter"))
        .crossJoin(
            a.select("h").union(b.select("h")).distinct()
            .agg(F.count("*").cast("long").alias("exact_union"))
        )
    )
    # non-full union sketch (|A∪B| < K): the sketch IS the whole union,
    # so the order-statistic extrapolation is badly biased — return the
    # exact values the sketch already holds (n_u distinct union hashes,
    # n_both shared) and divide Jaccard by the true sketch size
    return marked.crossJoin(F.broadcast(exact)).selectExpr(
        "n_both",
        f"if(n_u < {KMV_K}, n_u,"
        f" cast(({KMV_K} - 1) * {H56}L div kth as bigint)) AS est_union",
        f"n_both * {EVAL_SCALE}L div greatest(n_u, 1L) AS jaccard_units",
        f"if(n_u < {KMV_K}, n_both,"
        f" cast((({KMV_K} - 1) * {H56}L div kth) * n_both div {KMV_K}"
        " as bigint)) AS est_inter",
        "exact_union",
        "exact_inter",
    )


def _cell_duck(d: int, key: str = "key") -> str:
    return (
        f"CAST('0x' || substr(md5('cms' || '{d}' || ':' || {key}), 1, 15)"
        f" AS BIGINT) % {CMS_W}"
    )


ORACLE_SQL = {
    "cms_heavy_hitters": f"""
        WITH ev AS (
          SELECT {_HOST_DUCK} AS key
          FROM events),
        nn AS (SELECT count(*) AS n FROM ev),
        cells AS (
          SELECT t.d,
                 CASE {" ".join(f"WHEN t.d = {d} THEN {_cell_duck(d)}" for d in range(CMS_D))} END AS cell
          FROM ev CROSS JOIN (VALUES {", ".join(f"({d})" for d in range(CMS_D))}) AS t(d)),
        sketch AS (
          SELECT d, cell, CAST(count(*) AS BIGINT) AS cnt
          FROM cells GROUP BY d, cell),
        exact AS (
          SELECT key, CAST(count(*) AS BIGINT) AS exact_cnt
          FROM ev GROUP BY key),
        probes AS (
          SELECT exact.key, t.d,
                 CASE {" ".join(f"WHEN t.d = {d} THEN {_cell_duck(d, 'exact.key')}" for d in range(CMS_D))} END AS cell
          FROM exact CROSS JOIN (VALUES {", ".join(f"({d})" for d in range(CMS_D))}) AS t(d)),
        est AS (
          SELECT p.key,
                 CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS cms_cnt
          FROM probes p LEFT JOIN sketch s
            ON p.d = s.d AND p.cell = s.cell
          GROUP BY p.key)
        SELECT exact.key AS host, exact_cnt, cms_cnt,
               cms_cnt - exact_cnt AS overcount
        FROM exact JOIN est ON exact.key = est.key
        WHERE cms_cnt * 100 >= {HH_PCT} * (SELECT n FROM nn)
        ORDER BY cms_cnt DESC, host
    """,
}

ORACLE_SQL["kmv_intersection"] = f"""
    WITH a AS (
      SELECT DISTINCT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
             1, 14) AS BIGINT) AS h
      FROM documents WHERE {_SET_A_PRED}),
    b AS (
      SELECT DISTINCT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
             1, 14) AS BIGINT) AS h
      FROM documents WHERE {_SET_B_PRED}),
    ka AS (SELECT h FROM a ORDER BY h LIMIT {KMV_K}),
    kb AS (SELECT h FROM b ORDER BY h LIMIT {KMV_K}),
    u AS (
      SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
      ORDER BY h LIMIT {KMV_K}),
    m AS (
      SELECT max(u.h) AS kth,
             CAST(count(*) AS BIGINT) AS n_u,
             CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM ka WHERE ka.h = u.h)
                            AND EXISTS (SELECT 1 FROM kb WHERE kb.h = u.h)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_both
      FROM u),
    ex AS (
      SELECT
        (SELECT count(*) FROM (SELECT h FROM a INTERSECT SELECT h FROM b))
          AS exact_inter,
        (SELECT count(*) FROM (SELECT h FROM a UNION SELECT h FROM b))
          AS exact_union)
    SELECT n_both,
           CAST(CASE WHEN n_u < {KMV_K} THEN n_u
                     ELSE ({KMV_K} - 1) * {H56} // kth END AS BIGINT)
             AS est_union,
           n_both * {EVAL_SCALE} // greatest(n_u, 1) AS jaccard_units,
           CAST(CASE WHEN n_u < {KMV_K} THEN n_both
                     ELSE (({KMV_K} - 1) * {H56} // kth) * n_both // {KMV_K}
                END AS BIGINT) AS est_inter,
           CAST(exact_union AS BIGINT) AS exact_union,
           CAST(exact_inter AS BIGINT) AS exact_inter
    FROM m CROSS JOIN ex
"""

QUERIES = {
    "cms_heavy_hitters": cms_heavy_hitters,
    "kmv_intersection": kmv_intersection,
}
