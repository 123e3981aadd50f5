"""Similarity search over the embeddings table — brute-force cosine
top-k baseline and an LSH (random-hyperplane) bucketed ANN scale path.

Cross-engine determinism: embeddings are quantized to integers
(floor(x*1000)) so dot products and norms are *exact* integer sums
(associative — partition order can't change them); the final cosine is
a single IEEE division/sqrt on identical integers, identical in Spark
and DuckDB.  Hyperplane signs are derived once in Python from md5 and
embedded as literals in both the Spark plan and the oracle SQL.

Scale path (100 TB): brute force is O(queries × corpus) — fine for a
broadcast query set, quadratic for all-pairs.  The LSH variant is
banded multi-table hyperplane LSH: N_BANDS independent tables, each
keyed by an ADAPTIVE number of sign bits — k = clamp(bitlen(ceil(n /
TARGET_BUCKET) - 1), MIN_BITS, N_PLANES) where n is the corpus row
count, so the expected bucket occupancy stays ≈TARGET_BUCKET at every
corpus size: a fixed-width key either starves recall (16 bits over a
500-vector test corpus → all-singleton buckets → zero candidates) or
goes quadratic (8 bits over 10^12 vectors → corpus/256 per bucket).
n comes from parquet footer metadata (no scan; a lakehouse table
serves it from manifest stats), and the identical integer formula
runs in the DuckDB twin, so both engines always pick the same k.
Candidates are the union of per-band bucket equi-joins, and every
(band, bucket) is capped at MAX_BUCKET members before any join
(window count on the join key itself, no extra shuffle) so a
degenerate bucket can never go quadratic even at the k = N_PLANES
ceiling — the same hot-bucket guard the minhash/simhash text paths
use (dedup.py MAX_BUCKET).  An IVF variant swaps the bucket key for a
centroid id — same join shape.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

DIM = 64
N_PLANES = 16   # MAX sign bits per band (the key width at huge corpora)
N_BANDS = 4     # independent LSH tables (bands)
#: Target mean bucket occupancy: the adaptive key width k is the
#: smallest bit count whose 2^k buckets hold ≈ this many vectors each
#: (clamped to [MIN_BITS, N_PLANES]).  Kept at half MAX_BUCKET so a
#: typical bucket sits well under the hot-bucket cap.
TARGET_BUCKET = 32
MIN_BITS = 4
TOP_K = 3
N_QUERIES = 10  # vec_id < 10 are the query vectors
N_CELLS = 8     # IVF coarse cells (centroids)
N_PROBE = 2     # IVF cells probed per query
NEAR_DUP_COS = 0.95
#: Hot-bucket cap, same rationale as dedup.MAX_BUCKET: a (band,
#: bucket) with B vectors yields O(B²) candidate pairs; buckets larger
#: than this are dropped from the candidate join, bounding per-bucket
#: work at O(cap²) even on a degenerate (all-zeros / boilerplate
#: embedding) shard.
MAX_BUCKET = 64
#: SemDeDup within-cluster near-dup threshold (cosine).
SEMDEDUP_COS = 0.95


def _plane_signs() -> list[list[int]]:
    """N_BANDS × N_PLANES deterministic ±1 hyperplanes from md5 — one
    source of truth for both engines (embedded as literals in SQL)."""
    planes = []
    for p in range(N_BANDS * N_PLANES):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"plane:{p}:{d}".encode()).digest()[0]
            row.append(1 if h & 1 else -1)
        planes.append(row)
    return planes


PLANES = _plane_signs()

#: the planes literal as a reusable Column, built lazily ONCE per
#: process.  Two lessons baked in: (1) the nested 64×64 literal must
#: be a single Catalyst node (see _band_keys docstring), and (2) it
#: must enter the JVM as ONE parsed SQL string — F.lit() on a nested
#: Python list walks py4j element-by-element (~3-6 s per call, paid on
#: EVERY query invocation since each builds a fresh expression), while
#: F.expr("array(array(...),...)") ships one 10 KB string and parses
#: JVM-side in ~20 ms.  Column objects are unresolved expression
#: trees, so one cached instance is safely shared across DataFrames
#: and sessions in the same JVM.
_PLANES_LIT_CACHE: list = []


def _planes_lit():
    if not _PLANES_LIT_CACHE:
        sql = "array(" + ",".join(
            "array(" + ",".join(str(v) for v in row) + ")" for row in PLANES
        ) + ")"
        _PLANES_LIT_CACHE.append(F.expr(sql))
    return _PLANES_LIT_CACHE[0]


def _corpus_n(spark: SparkSession, sf_dir: str) -> int:
    """Embeddings row count from parquet footer metadata — no scan, no
    job.  (At lakehouse scale this is a manifest/stats lookup.)  Falls
    back to a Spark count for multi-file layouts."""
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    except Exception:
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()


def _adaptive_bits(n: int) -> int:
    """Bucket-key width for an n-row corpus: smallest k with
    2^k ≥ ceil(n / TARGET_BUCKET), clamped to [MIN_BITS, N_PLANES].
    Integer-only (bit_length), mirrored exactly by the twin's
    ``length(bin(m - 1))`` — see the kbits CTE in _PLANE_CTES."""
    m = (n + TARGET_BUCKET - 1) // TARGET_BUCKET
    if m <= 1:
        return MIN_BITS
    return min(N_PLANES, max(MIN_BITS, (m - 1).bit_length()))


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


def _band_keys(k_bits: int):
    """Array of all N_BANDS bucket keys (``k_bits`` sign bits each)
    over column ``qe`` — one corpus scan computes every band.  Only
    the low ``k_bits`` planes of each band's N_PLANES-plane block are
    evaluated (the adaptive width — computing then masking the full
    key would waste N_BANDS × (N_PLANES - k) dot products per vector).

    Expression-size discipline: the 64 hyperplanes enter the plan as a
    SINGLE nested-array literal (one Catalyst node), and the per-plane
    dot products are higher-order functions over index sequences — the
    first cut inlined one 64-element literal array per plane (4096-node
    trees) and Catalyst analysis alone cost ~20 s per query."""
    planes_lit = _planes_lit()
    bits = F.lit([1 << j for j in range(N_PLANES)])
    return F.transform(
        F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
        lambda b: F.aggregate(
            F.sequence(F.lit(0), F.lit(k_bits - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: acc
            + F.when(
                F.aggregate(
                    F.zip_with(
                        F.col("qe"),
                        F.element_at(planes_lit, b * N_PLANES + j + 1),
                        lambda x, s: x * s.cast("long"),
                    ),
                    F.lit(0).cast("long"),
                    lambda a2, x: a2 + x,
                )
                > 0,
                F.element_at(bits, j + 1).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
    )


def _capped_band_rows(vecs: DataFrame, k_bits: int) -> DataFrame:
    """(vec_id, band, bkey) rows for all N_BANDS tables, with every
    (band, bkey) bucket larger than MAX_BUCKET dropped.  The window
    count partitions on the same key the candidate join shuffles on,
    so the cap adds no extra shuffle; persisted because both self-join
    sides (or the query and corpus sides) re-read it."""
    bands = vecs.select(
        "vec_id", F.posexplode(_band_keys(k_bits)).alias("band", "bkey")
    ).select("vec_id", F.col("band").cast("long").alias("band"), "bkey")
    return (
        bands.withColumn(
            "bsz", F.count("*").over(Window.partitionBy("band", "bkey"))
        )
        .filter(F.col("bsz") <= MAX_BUCKET)
        .drop("bsz")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH index table: N_BANDS band keys of adaptive-width
    sign bits per vector — integer projections, JVM-side, no UDF.  This
    is the materialized index `ann_lsh_topk` probes (pre-cap)."""
    vecs = _quantized(spark, sf_dir)
    k = _adaptive_bits(_corpus_n(spark, sf_dir))
    return (
        vecs.select("vec_id", "label", F.posexplode(_band_keys(k)).alias("band", "bucket"))
        .select("vec_id", "label", F.col("band").cast("long").alias("band"), "bucket")
        .orderBy("vec_id", "band")
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via banded multi-table LSH: candidates are the union
    over N_BANDS tables of the query's bucket-mates (capped buckets
    dropped), then exact cosine rank within the candidate set.  Every
    join is an equi-join on (band, bkey), so cost scales with capped
    bucket occupancy — never corpus²."""
    vecs = _quantized(spark, sf_dir)
    banded = _capped_band_rows(vecs, _adaptive_bits(_corpus_n(spark, sf_dir)))
    qb = banded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band", "bkey"
    )
    pairs = (
        banded.join(
            F.broadcast(qb),
            ["band", "bkey"],
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()  # a neighbor may share several bands with the query
    )
    queries = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qe").alias("q_qe"),
        F.col("norm2").alias("q_norm2"),
    )
    scored = (
        pairs.join(vecs, pairs.neighbor_id == vecs.vec_id)
        .join(F.broadcast(queries), "query_id")
    )
    dot = _dot("q_qe", "qe")
    cos = dot.cast("double") / (
        F.sqrt(F.col("q_norm2").cast("double")) * F.sqrt(F.col("norm2").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", cos.alias("cosine"))
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


def _augmented_vecs(vecs: DataFrame) -> DataFrame:
    """Corpus ∪ deterministic near-dup copies — exact copies for
    vec_id%13==0 (+100000), one-component-perturbed for vec_id%9==0
    (+200000).  The synthetic corpus has no natural near-dups, so both
    embedding-dedup operators plant these to have real work to do; the
    recipe is mirrored verbatim by the shared ``_AUG_SQL`` twin CTE."""
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
    return vecs.unionByName(exact).unionByName(perturbed)


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: corpus ∪ deterministic
    copies (exact for vec_id%13==0, tiny-perturbed for vec_id%9==0),
    blocked by banded multi-table hyperplane LSH (N_BANDS × N_PLANES
    sign bits, capped buckets), exact cosine ≥ NEAR_DUP_COS on the
    distinct candidate pairs.  A true near-dup (cosine → 1) agrees on
    essentially every plane, so it collides in every uncapped band; the
    all-pairs cosine join is never materialized, and no single bucket
    can exceed MAX_BUCKET members — the blocked replacement for the
    reference's row-local fuzzy compare (content_cleaner.py:8-24) at
    corpus scale."""
    vecs = _quantized(spark, sf_dir)
    # persisted: read by the band-row builder and by both pair-side
    # join-backs below (one short row per vector)
    aug = _augmented_vecs(vecs).persist(StorageLevel.MEMORY_AND_DISK)
    # key width from the BASE corpus count (the twin's kbits CTE reads
    # count(embeddings) too): the dup-augmented set is a constant
    # ≤1.2× inflation, which never moves the clamped bit width
    banded = _capped_band_rows(aug, _adaptive_bits(_corpus_n(spark, sf_dir)))
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b")
        )
        .distinct()  # a pair may collide in several bands
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
        cand.join(aug.alias("x"), F.col("vec_a") == F.col("x.vec_id"))
        .join(aug.alias("y"), F.col("vec_b") == F.col("y.vec_id"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_COS)
        .orderBy("vec_a", "vec_b")
    )


def semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): semantic dedup by
    k-means clustering + within-cluster pairwise cosine.  The exact
    integer Lloyd's trainer (`ivf_train_kmeans`, trained on the base
    corpus — production trains on a sample) produces the codebook; the
    dup-augmented corpus (`_augmented_vecs`) is assigned to cells by
    the same broadcast argmax-cosine as IVF serving; within each cell,
    a vector is DROPPED when any lower-id cell-mate has cosine ≥
    SEMDEDUP_COS (the paper keeps one representative per semantic
    group; lowest-id is the deterministic choice, disclosed).

    Scale shape: training is the k-means plan (O(corpus×k) broadcast
    assigns); the dedup join is a cell equi-join — per-cell cost
    O(c²·DIM) in-row integer dots, where production picks k ∝ n so the
    mean cell size c stays constant (the paper uses k = 11k cells for
    LAION-440M).  k is pinned to N_CELLS here so the unrolled DuckDB
    twin stays fixed-size; the cell key is the only shuffle key.
    Replaces nothing in the reference (row-local fuzzy compare,
    content_cleaner.py:8-24, can't see across documents) — this is the
    corpus-scale semantic analog."""
    vecs = _quantized(spark, sf_dir)
    cents, _ = ivf_train_kmeans(spark, vecs)
    aug = _augmented_vecs(vecs)
    # (vec_id, cell, qe, norm2) — read by both sides of the pair join
    # and the final kept projection
    m = (
        aug.join(_assign_to(aug, cents), "vec_id")
        .select("vec_id", "cell", "qe", "norm2")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dot = F.aggregate(
        F.zip_with(F.col("x.qe"), F.col("y.qe"), lambda a_, b_: a_ * b_),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )
    cos = dot.cast("double") / (
        F.sqrt(F.col("x.norm2").cast("double")) * F.sqrt(F.col("y.norm2").cast("double"))
    )
    dropped = (
        m.alias("x")
        .join(
            m.alias("y"),
            (F.col("x.cell") == F.col("y.cell"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .filter(cos >= SEMDEDUP_COS)
        .select(F.col("y.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        m.join(dropped.withColumn("_d", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            F.when(F.col("_d").isNull(), 1).otherwise(0).cast("long").alias("kept"),
        )
        .orderBy("vec_id")
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


#: The 64 hyperplanes as ONE SQL list-of-lists literal — referenced a
#: single time per query (the first cut inlined one 64-int list per
#: plane per band branch: ~300 KB of SQL the parser chewed on).
_PLANES_SQL_LIT = (
    "[" + ", ".join("[" + ", ".join(str(s) for s in row) + "]" for row in PLANES) + "]"
)

#: DuckDB twin of one element of `_band_keys()`: the adaptive-width
#: (``kb.k``-bit) key for band ``b.band`` over ``s.qe``, planes taken
#: from ``pl.P`` — low k planes of the band's N_PLANES-plane block,
#: exactly as the Spark side iterates.
_BKEY_SQL = (
    f"CAST(list_sum(list_transform(range(1, kb.k + 1), j -> "
    f"CASE WHEN CAST(list_sum(list_transform(range(1, {DIM + 1}), "
    f"i -> s.qe[i] * pl.P[b.band * {N_PLANES} + j][i])) AS BIGINT) > 0 "
    f"THEN CAST(1 AS BIGINT) << (j - 1) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
)

#: kbits mirrors `_adaptive_bits` integer-for-integer:
#: length(bin(m - 1)) == (m - 1).bit_length() for m > 1 (verified for
#: every SF plus 10^6/10^12 synthetic counts in tests).
_PLANE_CTES = f"""
        planes AS (SELECT {_PLANES_SQL_LIT} AS P),
        bandids AS (SELECT CAST(unnest(range(0, {N_BANDS})) AS BIGINT) AS band),
        kbits AS (
          SELECT CASE WHEN m <= 1 THEN {MIN_BITS}
                      ELSE least({N_PLANES}, greatest({MIN_BITS}, length(bin(m - 1))))
                 END AS k
          FROM (SELECT (count(*) + {TARGET_BUCKET - 1}) // {TARGET_BUCKET} AS m
                FROM embeddings))"""


def _banded_sql(src: str) -> str:
    """DuckDB twin of `_capped_band_rows` over CTE ``src`` — emits the
    ``bands_all`` (pre-cap) and ``bands`` (capped) CTE bodies."""
    return f"""
        {_PLANE_CTES},
        bands_all AS (
          SELECT s.vec_id, b.band, {_BKEY_SQL} AS bkey
          FROM {src} s CROSS JOIN planes pl CROSS JOIN bandids b CROSS JOIN kbits kb
        ),
        bands AS (
          SELECT vec_id, band, bkey FROM (
            SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bsz
            FROM bands_all
          ) WHERE bsz <= {MAX_BUCKET}
        )"""

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


#: fixed-point scale for per-dimension centroid sufficient statistics
CENTROID_SCALE = 1_000_000


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding corpus, kept as sufficient
    statistics (per-dimension fixed-point SUM + member count) rather
    than a divided mean — the same integer-sum-centroid discipline as
    the k-means trainer above: sums of int64 are order-independent, so
    a 1000-executor aggregation and a single-threaded oracle agree
    bit-for-bit, where a float mean would drift with partition order.

    Scale shape: posexplode is row-local (64 rows out per vector, no
    shuffle), then ONE partial+final hash aggregation on the compound
    key (label, dim) — cardinality |labels|×64, tiny regardless of
    corpus size.  Downstream consumers divide sum_fp/n_vecs at the
    edge (or feed the sums straight into a merge, which means two
    corpus shards' centroids combine by addition — the property that
    makes this the 100 TB-friendly form)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return centroid_stats(emb).orderBy("label", "dim")


def centroid_stats(emb_df: DataFrame) -> DataFrame:
    """Core kernel: (label, embedding) → (label, dim, sum_fp, n_vecs).
    Additive across disjoint shards (tested in tests/test_r3_ops.py)."""
    ex = emb_df.select(
        F.col("label").cast("long").alias("label"),
        F.posexplode("embedding").alias("dim", "val"),
    )
    return ex.groupBy("label", F.col("dim").cast("long").alias("dim")).agg(
        F.sum(
            F.floor(F.col("val").cast("double") * F.lit(float(CENTROID_SCALE)))
            .cast("long")
        ).alias("sum_fp"),
        F.count("*").cast("long").alias("n_vecs"),
    )


#: twin of `_augmented_vecs` — shared by the embedding-cosine and
#: SemDeDup oracles so the planted-dup recipe can never drift
_AUG_SQL = """
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
        )
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
        WITH {_QUANT_SQL},
        {_PLANE_CTES}
        SELECT s.vec_id, s.label, b.band, {_BKEY_SQL} AS bucket
        FROM qn s CROSS JOIN planes pl CROSS JOIN bandids b CROSS JOIN kbits kb
        ORDER BY vec_id, band
    """,
    "ann_lsh_topk": f"""
        WITH {_QUANT_SQL},
        {_banded_sql("qn")},
        cand AS (
          SELECT DISTINCT q2.vec_id AS query_id, v.vec_id AS neighbor_id
          FROM bands q2 JOIN bands v
            ON v.band = q2.band AND v.bkey = q2.bkey AND v.vec_id <> q2.vec_id
          WHERE q2.vec_id < {N_QUERIES}
        ),
        scored AS (
          SELECT c.query_id, c.neighbor_id,
                 CAST(list_sum(list_transform(range(1, {DIM + 1}),
                      i -> q2.qe[i] * v.qe[i])) AS DOUBLE)
                 / (sqrt(CAST(q2.norm2 AS DOUBLE)) * sqrt(CAST(v.norm2 AS DOUBLE))) AS cosine
          FROM cand c
          JOIN qn q2 ON q2.vec_id = c.query_id
          JOIN qn v ON v.vec_id = c.neighbor_id
        ),
        ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
          FROM scored
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
        {_AUG_SQL},
        {_banded_sql("aug")},
        cand AS (
          SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
          FROM bands x JOIN bands y
            ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id
        ),
        pairs AS (
          SELECT c.vec_a, c.vec_b,
                 CAST(list_sum(list_transform(range(1, {DIM + 1}),
                      i -> x.qe[i] * y.qe[i])) AS DOUBLE)
                 / (sqrt(CAST(x.norm2 AS DOUBLE)) * sqrt(CAST(y.norm2 AS DOUBLE))) AS cosine
          FROM cand c
          JOIN aug x ON x.vec_id = c.vec_a
          JOIN aug y ON y.vec_id = c.vec_b
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

ORACLE_SQL["semdedup"] = f"""
    WITH {_QUANT_SQL},
    cells AS (SELECT CAST(range AS INT) AS cell FROM range(0, {N_CELLS})),
    c0 AS (
      SELECT CAST(vec_id - {N_QUERIES} AS INT) AS cell,
             qe AS c_qe, norm2 AS c_norm2
      FROM qn WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CELLS}
    ),{",".join(_kmeans_iter_sql(i) for i in range(1, KMEANS_ITERS + 1))},
    {_AUG_SQL},
    scored AS (
      SELECT v.vec_id, c.cell,
             CAST(list_sum(list_transform(range(1, {DIM + 1}),
                  i -> v.qe[i] * c.c_qe[i])) AS DOUBLE)
             / (sqrt(CAST(c.c_norm2 AS DOUBLE)) * sqrt(CAST(v.norm2 AS DOUBLE))) AS c_cos
      FROM aug v CROSS JOIN c{KMEANS_ITERS} c
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                    ORDER BY c_cos DESC, cell) AS crank
        FROM scored
      ) WHERE crank = 1
    ),
    mem AS (
      SELECT a.vec_id, a.cell, v.qe, v.norm2
      FROM assign a JOIN aug v USING (vec_id)
    ),
    dropped AS (
      SELECT DISTINCT y.vec_id
      FROM mem x JOIN mem y ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE CAST(list_sum(list_transform(range(1, {DIM + 1}),
                 i -> x.qe[i] * y.qe[i])) AS DOUBLE)
            / (sqrt(CAST(x.norm2 AS DOUBLE)) * sqrt(CAST(y.norm2 AS DOUBLE)))
            >= {SEMDEDUP_COS}
    )
    SELECT m.vec_id, CAST(m.cell AS BIGINT) AS cell,
           CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM mem m LEFT JOIN dropped d ON d.vec_id = m.vec_id
    ORDER BY m.vec_id
"""

ORACLE_SQL["embedding_label_centroids"] = f"""
    WITH ex AS (
      SELECT label,
             unnest(range(0, len(embedding))) AS dim,
             unnest(embedding) AS val
      FROM embeddings
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(dim AS BIGINT) AS dim,
           CAST(sum(CAST(floor(CAST(val AS DOUBLE) * {CENTROID_SCALE}.0)
                    AS BIGINT)) AS BIGINT) AS sum_fp,
           CAST(count(*) AS BIGINT) AS n_vecs
    FROM ex GROUP BY label, dim ORDER BY label, dim
"""

QUERIES = {
    "sim_bruteforce_topk": sim_bruteforce_topk,
    "embedding_label_centroids": embedding_label_centroids,
    "ann_lsh_buckets": ann_lsh_buckets,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_trained_topk": ann_ivf_trained_topk,
    "ann_ivf_train_cells": ann_ivf_train_cells,
    "ann_recall_eval": ann_recall_eval,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "semdedup": semdedup,
}
