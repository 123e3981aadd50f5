"""Deduplication suite for training-data pipelines — exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

The reference's only dedup is Python ``set()`` on URLs/triplets
(extract_product_urls.py:57; db.py:448) and a row-local fuzzy field
dedup (content_cleaner.py:8-24); a 100 TB corpus needs document-level
dedup, so these are first-class operators here.

Cross-engine determinism tricks (all verified against DuckDB):
- shingle minhashes are *lexicographic mins of md5 hex strings* —
  md5 is identical everywhere, no numeric-hash divergence;
- simhash token hashes are 60-bit ints via
  ``conv(substr(md5(w),1,15),16,10)`` (Spark) ==
  ``CAST('0x'||substr(md5(w),1,15) AS BIGINT)`` (DuckDB);
- jaccard/cosine ratios are single divisions of exact integers.

Because the driver's synthetic corpus has no natural duplicates, each
query first *augments* the corpus with deterministic near/exact copies
(same CTE in Spark and in the oracle SQL), so a correct implementation
provably finds them (non-empty output), and a broken one can't pass.

Scale notes (100 TB): exact dedup is a hash-shuffle on the 16-byte
fingerprint (not the text). MinHash-LSH shuffles (band, bucket-key)
pairs — linear in corpus size; candidate verification touches only
bucket collisions. The exhaustive pair-join variants (ngram_jaccard)
exist as the small-data oracle baseline; LSH is the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_MINHASH = 8          # 8 minhash fns → 4 LSH bands × 2 rows
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 60      # 4 bands × 15 bits
HAMMING_MAX = 6
#: Hot-bucket cap: a band bucket with B docs yields O(B²) candidate
#: pairs, and boilerplate-heavy shards produce degenerate buckets that
#: go quadratic.  Buckets larger than this are dropped from the LSH
#: candidate join (their members are boilerplate; identical ones still
#: dedup via the exact fingerprint path) — standard super-shingle
#: practice, and the cap bounds per-bucket work at O(cap²).
MAX_BUCKET = 64


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ deterministic exact copies (doc_id%17==0, +2e6) ∪
    near copies with a 2-word tail (doc_id%10==0, +1e6)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    near = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" nearly duplicated")).alias("text"),
        )
    )
    exact = d.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    return d.unionByName(near).unionByName(exact)

_AUG_SQL = """
  aug AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text || ' nearly duplicated' AS text
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 17 = 0
  )
"""


def _shingles(aug: DataFrame) -> DataFrame:
    """Distinct 3-word shingles per doc — JVM-side array ops (no UDF).

    Docs with fewer than 3 words get their whole text as the single
    shingle (not an empty set, which would silently exempt tiny docs
    from near-dup detection forever — Jaccard on the singleton is 1.0
    for equal tiny docs, 0 otherwise)."""
    w = F.split(F.col("text"), " ")
    sh = F.when(
        F.size(w) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
            ),
        ),
    ).otherwise(F.array(F.col("text")))
    # persisted: minhash signatures, size counts, and the candidate
    # intersection all re-read the shingle set — without caching the
    # explode+distinct shuffle runs 3-4× per query (measured 24s → 9s
    # at sf0.01).  MEMORY_AND_DISK: shingles ≈ 3× corpus tokens, which
    # at 100 TB spills rather than OOMs.
    from pyspark.storagelevel import StorageLevel

    return (
        aug.select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

_SHINGLES_SQL = """
  shingles AS (
    SELECT DISTINCT doc_id, shingle FROM (
      SELECT doc_id,
             unnest(CASE WHEN len(ws) >= 3
                    THEN list_transform(range(1, len(ws) - 1),
                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                    ELSE [text] END) AS shingle
      FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM aug)
    )
  )
"""


# ------------------------------------------------------------------ exact
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the md5 fingerprint; keeper = min
    doc_id.  At scale this shuffles 16-byte digests, never documents."""
    aug = _augmented(spark, sf_dir)
    return (
        aug.groupBy(F.md5(F.col("text")).alias("fingerprint"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("keeper_doc_id")
    )


# ---------------------------------------------------------------- minhash
def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup: shingle → 8 minhashes → 4 band
    keys → bucket self-join → exact-Jaccard verification of candidates.

    Shuffle cost is O(docs × bands), never O(docs²); verification
    joins only bucket collisions; degenerate (boilerplate) buckets are
    capped at MAX_BUCKET members before the self-join — the window
    count partitions on the same (band, bkey) key the join shuffles
    on, so the cap adds no extra shuffle — the 100 TB-safe plan.

    UNSORTED: internal consumers (dedup_clusters) repartition by their
    own keys immediately, so the driver-gate global sort lives only in
    the public ``dedup_minhash_lsh`` wrapper.

    Cache lifetime: the persists below are not explicitly unpersisted —
    Spark's CacheManager keys entries by canonicalized logical plan, so
    repeated invocations of the same query over the same sf_dir REUSE
    one entry (growth is bounded by distinct (query, input) pairs, not
    call count); entries release on session stop or LRU pressure.
    """
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    sh = _shingles(_augmented(spark, sf_dir))
    # persisted for the same reason as the simhash signature table: the
    # band union (4 branches) self-joined (×2 sides) would re-run the
    # shingle-hash aggregate 8× otherwise; one short row per doc.
    # expression-construction discipline (same lesson as the planes
    # literal in similarity.py): per-hash Column chains cost one py4j
    # round-trip per operator (~3-5 ms each, ~1 s of pure driver-side
    # build time per invocation at 8 hashes × 4 bands) — each hash is
    # ONE F.expr string instead, and the 4 band projections are a
    # single posexplode over an array (which also collapses the
    # 4-branch union into one scan of the signature table)
    minh = (
        sh.groupBy("doc_id")
        .agg(
            *[
                F.expr(f"min(md5(concat(shingle, '#{b}'))) AS mh{b}")
                for b in range(N_MINHASH)
            ]
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    band_keys = ", ".join(
        f"md5(concat_ws('|', mh{2 * b}, mh{2 * b + 1}))"
        for b in range(N_MINHASH // 2)
    )
    bands = minh.select(
        "doc_id",
        F.posexplode(F.expr(f"array({band_keys})")).alias("band", "bkey"),
    )
    bands = (
        bands.withColumn(
            "bsz", F.count("*").over(Window.partitionBy("band", "bkey"))
        )
        .filter(F.col("bsz") <= MAX_BUCKET)
        .drop("bsz")
        # both self-join sides read the capped band table; persist so
        # the window count runs once (4 short rows per doc)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_inter")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for `_minhash_pairs` — adds the deterministic
    output order the oracle compare expects."""
    return _minhash_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


# ------------------------------------------------------ incremental dedup
#: deterministic new-shard construction for the incremental query:
#: near-copies get this tail appended (high-but-not-1.0 Jaccard)
INC_NEAR_ID = 3_000_000
INC_EXACT_ID = 4_000_000


def _mh_bands(sh: DataFrame) -> DataFrame:
    """shingles → (doc_id, band, bkey) LSH band rows, UNCAPPED — the
    same signature/band construction as `_minhash_pairs` (kept in
    lockstep with it and with the oracle band CTEs)."""
    minh = sh.groupBy("doc_id").agg(
        *[
            F.expr(f"min(md5(concat(shingle, '#{b}'))) AS mh{b}")
            for b in range(N_MINHASH)
        ]
    )
    band_keys = ", ".join(
        f"md5(concat_ws('|', mh{2 * b}, mh{2 * b + 1}))"
        for b in range(N_MINHASH // 2)
    )
    return minh.select(
        "doc_id",
        F.posexplode(F.expr(f"array({band_keys})")).alias("band", "bkey"),
    )


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a NEW crawl shard against the EXISTING
    corpus — the daily-ingestion pattern at 100 TB, where re-LSHing
    the whole corpus per shard is off the table: the corpus keeps a
    persisted MinHash band index (here rebuilt from the split, since
    the sandbox has no state store; the band construction is exactly
    `_minhash_pairs`'s, so a materialized index is a drop-in), and
    only the new shard is shingled+hashed, probed against the index
    with a (band, bkey) equi-join, and exact-Jaccard-verified on the
    collisions.  Cost per shard: O(shard) hashing + O(collisions)
    verification — independent of corpus size except through bucket
    occupancy, which the shared MAX_BUCKET hot-bucket cap bounds.

    Deterministic fixture: existing = doc_id % 10 != 0; the new shard
    is the % 10 == 0 docs (true novelty) ∪ near-copies (% 11 == 0,
    2-word tail) ∪ exact copies (% 13 == 0) of existing docs, so a
    correct join provably reports each planted dup and a broken one
    can't pass.  Output: (batch_doc, corpus_doc, jaccard) per
    detected duplicate."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    existing = d.filter(F.col("doc_id") % 10 != 0)
    batch = (
        d.filter(F.col("doc_id") % 10 == 0)
        .unionByName(
            existing.filter(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + INC_NEAR_ID).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" incremental shard tail")).alias(
                    "text"
                ),
            )
        )
        .unionByName(
            existing.filter(F.col("doc_id") % 13 == 0).select(
                (F.col("doc_id") + INC_EXACT_ID).alias("doc_id"), "text"
            )
        )
    )
    esh = _shingles(existing)
    bsh = _shingles(batch)
    from pyspark.sql import Window

    # one shared hot-bucket cap over index ∪ probe rows: the window
    # partitions on the same (band, bkey) the probe join shuffles on,
    # so the cap adds no extra shuffle (same discipline as
    # _minhash_pairs / similarity._capped_band_rows)
    tagged = (
        _mh_bands(esh)
        .withColumn("side", F.lit(0))
        .unionByName(_mh_bands(bsh).withColumn("side", F.lit(1)))
        .withColumn("bsz", F.count("*").over(Window.partitionBy("band", "bkey")))
        .filter(F.col("bsz") <= MAX_BUCKET)
        .drop("bsz")
    )
    from pyspark.storagelevel import StorageLevel

    tagged = tagged.persist(StorageLevel.MEMORY_AND_DISK)
    cand = (
        tagged.filter(F.col("side") == 1)
        .select(F.col("doc_id").alias("batch_doc"), "band", "bkey")
        .join(
            tagged.filter(F.col("side") == 0).select(
                F.col("doc_id").alias("corpus_doc"), "band", "bkey"
            ),
            ["band", "bkey"],
        )
        .select("batch_doc", "corpus_doc")
        .distinct()
    )
    esz = esh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    bsz = bsh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(bsh.alias("sb"), F.col("batch_doc") == F.col("sb.doc_id"))
        .join(
            esh.alias("sa"),
            (F.col("corpus_doc") == F.col("sa.doc_id"))
            & (F.col("sb.shingle") == F.col("sa.shingle")),
        )
        .groupBy("batch_doc", "corpus_doc")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(bsz.alias("zb"), F.col("batch_doc") == F.col("zb.doc_id"))
        .join(esz.alias("za"), F.col("corpus_doc") == F.col("za.doc_id"))
        .select(
            "batch_doc",
            "corpus_doc",
            (
                F.col("n_inter").cast("double")
                / (F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_inter")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("batch_doc", "corpus_doc")
    )


# ------------------------------------------------------------ ngram jaccard
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive n-gram Jaccard via the shared-shingle join (the
    small-data baseline LSH is validated against)."""
    sh = _shingles(_augmented(spark, sf_dir))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_inter")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------- LSH quality
EVAL_SCALE = 1_000_000


def dedup_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision of the banded MinHash-LSH pair detector
    against exhaustive n-gram Jaccard ground truth — the dedup twin of
    `similarity.ann_recall_eval`: before trusting LSH at 100 TB
    (where the exhaustive join is impossible) the pipeline quantifies
    what the banding misses at a scale where truth is computable.
    Pure composition of two existing queries; fixed-point percentages
    (both engines divide the same longs).  Precision is 1.0 by
    construction — candidates are exact-Jaccard-verified — so the row
    doubles as a regression tripwire on that invariant."""
    from pyspark.storagelevel import StorageLevel

    # both pair lists are skinny (two longs) and consumed twice each
    # (count + membership join) — persist so the heavy upstream
    # pipelines run once, not per-aggregate
    truth = (
        dedup_ngram_jaccard(spark, sf_dir)
        .select("doc_a", "doc_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    lsh = (
        _minhash_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # n_hit via LEFT SEMI — exactly the twin's EXISTS: a truth pair
    # counts once however many times the LSH side ever emitted it (a
    # plain left join would inflate the count on duplicate pair rows
    # and silently break the cross-engine gate)
    n_hit = (
        truth.join(lsh, ["doc_a", "doc_b"], "left_semi")
        .agg(F.count("*").cast("long").alias("n_hit"))
    )
    flagged = (
        truth.agg(F.count("*").cast("long").alias("n_true"))
        .crossJoin(F.broadcast(n_hit))
    )
    return (
        flagged
        .crossJoin(F.broadcast(lsh.agg(F.count("*").cast("long").alias("n_lsh"))))
        .selectExpr(
            "n_true",
            "n_lsh",
            "n_hit",
            f"if(n_true = 0, {EVAL_SCALE}L,"
            f" n_hit * {EVAL_SCALE}L div n_true) AS recall_units",
            f"if(n_lsh = 0, {EVAL_SCALE}L,"
            f" n_hit * {EVAL_SCALE}L div n_lsh) AS precision_units",
        )
    )


# ---------------------------------------------------------------- simhash
#: 15-bit accumulator lanes: lane-group g holds bits {g, g+15, g+30,
#: g+45} of the token hash, each already spaced 15 bits apart, so ONE
#: ``(h >> g) & _LANE_MASK`` extracts all four — no per-bit when/case.
_LANE_SPACING = 15
_LANE_GROUPS = 15
_LANE_MASK = (1) | (1 << 15) | (1 << 30) | (1 << 45)


def _simhash_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit simhash per doc, entirely JVM-side.

    Plan shape matters at scale.  Naive simhash explodes 60 bit-rows
    per token (docs × tokens × 60 rows through a shuffle); the first
    cut here used 60 ±1 columns + 60 ``sum()`` aggregates, which was
    47% of the whole headline suite.  This version exploits
    ``c_b = 2·s_b − n`` (each token adds ±1, so the signed majority
    sum is recoverable from the *set-bit count* ``s_b`` and the token
    count ``n``) and packs the 60 set-bit counters into 15 longs with
    four 15-bit lanes each: per (doc, token) row the work is one
    shift+mask per lane group (30 bit-ops, no branches), and the hash
    aggregate carries 15 longs + 1 count instead of 60 wide sums —
    map-side partial agg still shrinks the shuffle to one row per doc
    per map partition.  Lanes overflow only past 2^15−1 = 32767
    distinct tokens in one document; corpora with longer docs raise
    ``_LANE_SPACING`` to 20 (3 lanes × 20 groups) — same code path.

    Majority rule ``c_b > 0`` becomes ``2·s_b > n`` (exact, including
    the tie case: c_b = 0 ⇔ 2·s_b = n ⇒ bit 0 in both forms).
    Tokens are deduped on their 60-bit hash (not the string) so the
    distinct shuffles 8-byte keys; the DuckDB twin dedups on the same
    hash expression, keeping both engines in lockstep."""
    aug = _augmented(spark, sf_dir)
    h = F.expr("cast(conv(substr(md5(w),1,15),16,10) as bigint)")
    toks = (
        aug.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .select("doc_id", h.alias("h"))
        .distinct()
    )
    # string-built expressions throughout (the py4j round-trip lesson —
    # see _minhash_pairs): the 15 lane projections, 16 aggregates, and
    # the 60-term majority unpack below are each ONE parsed SQL string
    # instead of hundreds of Column-operator calls (~2 s of driver-side
    # build time per invocation, gone)
    agg = (
        toks.selectExpr(
            "doc_id",
            *[
                f"shiftright(h, {g}) & {_LANE_MASK} AS l{g}"
                for g in range(_LANE_GROUPS)
            ],
        )
        .groupBy("doc_id")
        .agg(
            F.expr("count(*) AS n"),
            *[F.expr(f"sum(l{g}) AS s{g}") for g in range(_LANE_GROUPS)],
        )
    )
    lane_max = (1 << _LANE_SPACING) - 1
    packed = F.expr(
        " + ".join(
            f"if((shiftright(s{b % _LANE_GROUPS}, {_LANE_SPACING * (b // _LANE_GROUPS)})"
            f" & {lane_max}) * 2 > n, {1 << b}L, 0L)"
            for b in range(SIMHASH_BITS)
        )
    )
    # persisted: the banded pair join reads the signature table from
    # EIGHT plan branches (4 band projections × 2 self-join sides), and
    # Catalyst does not dedupe common subtrees across a union — without
    # the persist the whole token-aggregate pipeline re-executes per
    # branch (measured 8-10 s of redundant work at sf0.1).  One 16-byte
    # row per doc: tiny at any scale.
    from pyspark.storagelevel import StorageLevel

    return (
        agg.select("doc_id", packed.alias("simhash"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc simhash values (the signature table)."""
    return _simhash_col(spark, sf_dir).orderBy("doc_id")


def banded_hamming_pairs(sig: DataFrame) -> DataFrame:
    """Shared 60-bit banded-Hamming pair join over any signature table
    ``(doc_id, simhash)`` — 4×15-bit band bucket join, then hamming
    ≤ HAMMING_MAX verification via bit_count(xor).  Used by the text
    path (``dedup_simhash_pairs``) and the image path
    (operators/imagededup.py) — one join plan, two signature sources.

    A pair sharing k band buckets comes out of the banded self-join k
    times; instead of a multi-million-row ``distinct()`` shuffle, each
    joined row is kept only when its band is the FIRST matching band —
    decidable row-locally from the two signatures already in the row
    (band j matches ⇔ ``((sh_a ^ sh_b) >> 15j) & 0x7FFF = 0``), so the
    dedup is a codegen filter with zero shuffle.  The hamming cut is
    applied in the same filter, before anything else moves.  Degenerate
    band buckets are capped at MAX_BUCKET docs (window count on the
    join key itself), bounding per-bucket pair work on
    boilerplate-heavy shards; each doc carries a 4-bit ``capmask`` of
    its capped bands so the first-match rule skips capped bands (a pair
    whose first matching bucket was capped is still emitted exactly
    once, by its first *surviving* matching band — the set semantics
    the DuckDB twin expresses with DISTINCT over capped bands)."""
    from pyspark.sql import Window

    # one posexplode over the 4 derived keys replaces the 4-branch
    # union (band = pos), and every expression is a single parsed SQL
    # string (the py4j round-trip lesson — see _minhash_pairs)
    band_keys = ", ".join(
        f"shiftright(simhash, {band * 15}) & {(1 << 15) - 1}"
        for band in range(4)
    )
    bands = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(F.expr(f"array({band_keys})")).alias("band", "bkey"),
    )
    # re-pivot to one row per doc carrying the 4-bit capped-band mask,
    # then re-derive the band rows from it (bkey is a pure function of
    # simhash) — cheaper than joining the mask back onto band rows
    sig2 = (
        bands.withColumn(
            "bsz", F.count("*").over(Window.partitionBy("band", "bkey"))
        )
        .groupBy("doc_id")
        .agg(
            F.expr("max(simhash) AS simhash"),
            F.expr(f"sum(if(bsz > {MAX_BUCKET}, shiftleft(1, band), 0)) AS capmask"),
        )
    )
    # persisted like the signature table: referenced by both self-join
    # sides below; one short row per doc
    from pyspark.storagelevel import StorageLevel

    sig2 = sig2.persist(StorageLevel.MEMORY_AND_DISK)
    bands = sig2.select(
        "doc_id",
        "simhash",
        "capmask",
        F.posexplode(F.expr(f"array({band_keys})")).alias("band", "bkey"),
    ).filter(F.expr("(shiftright(capmask, band) & 1) = 0"))
    joined = bands.alias("a").join(
        bands.alias("b"),
        F.expr("a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id"),
    )
    # keep the row iff no UNCAPPED band EARLIER than this row's band
    # also matches: for every j < band, the xor's 15-bit slice j is
    # nonzero OR bucket j was capped (both docs share bucket j when
    # slice j is zero, so either side's capmask bit is authoritative)
    xor_sql = "(a.simhash ^ b.simhash)"
    first_match = " AND ".join(
        f"(a.band <= {j}"
        f" OR (shiftright({xor_sql}, {j * 15}) & {(1 << 15) - 1}) != 0"
        f" OR (shiftright(a.capmask, {j}) & 1) = 1)"
        for j in range(3)
    )
    return (
        joined.filter(F.expr(first_match))
        .selectExpr(
            "a.doc_id AS doc_a",
            "b.doc_id AS doc_b",
            f"cast(bit_count{xor_sql} as bigint) AS hamming",
        )
        .filter(F.expr(f"hamming <= {HAMMING_MAX}"))
        .orderBy("doc_a", "doc_b")
    )


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over the text corpus — the shared banded
    join (``banded_hamming_pairs``) over the token-majority signature."""
    return banded_hamming_pairs(_simhash_col(spark, sf_dir))


def banded_hamming_probe(index: DataFrame, probe: DataFrame) -> DataFrame:
    """Incremental twin of `banded_hamming_pairs`: probe a NEW shard's
    signatures against an existing corpus's band index instead of
    re-pairing the whole corpus — the per-round ingestion pattern
    (`dedup_incremental` is the MinHash analog).  Both inputs are
    ``(doc_id, simhash)``; output is ``(probe_doc, index_doc,
    hamming)`` for every cross near-dup within HAMMING_MAX.

    Cost per shard: O(shard) signature banding + O(collisions)
    verification — independent of corpus size except through bucket
    occupancy, which the shared MAX_BUCKET cap bounds.  The hot-bucket
    cap is computed over index ∪ probe band rows (the window
    partitions on the same (band, bkey) the probe join shuffles on —
    no extra shuffle), and the per-pair dedup is the same row-local
    first-surviving-matching-band rule as the self-join variant: when
    xor slice j is zero both docs share bucket j, so either side's
    capmask bit is authoritative."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    band_keys = ", ".join(
        f"shiftright(simhash, {band * 15}) & {(1 << 15) - 1}"
        for band in range(4)
    )
    tagged = (
        index.select("doc_id", "simhash").withColumn("side", F.lit(0))
        .unionByName(
            probe.select("doc_id", "simhash").withColumn("side", F.lit(1))
        )
    )
    bands = tagged.select(
        "doc_id",
        "simhash",
        "side",
        F.posexplode(F.expr(f"array({band_keys})")).alias("band", "bkey"),
    )
    sig2 = (
        bands.withColumn(
            "bsz", F.count("*").over(Window.partitionBy("band", "bkey"))
        )
        .groupBy("doc_id", "side")
        .agg(
            F.expr("max(simhash) AS simhash"),
            F.expr(
                f"sum(if(bsz > {MAX_BUCKET}, shiftleft(1, band), 0))"
                " AS capmask"
            ),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bands2 = sig2.select(
        "doc_id",
        "simhash",
        "side",
        "capmask",
        F.posexplode(F.expr(f"array({band_keys})")).alias("band", "bkey"),
    ).filter(F.expr("(shiftright(capmask, band) & 1) = 0"))
    joined = (
        bands2.filter(F.col("side") == 1)
        .alias("a")
        .join(
            bands2.filter(F.col("side") == 0).alias("b"),
            F.expr("a.band = b.band AND a.bkey = b.bkey"),
        )
    )
    xor_sql = "(a.simhash ^ b.simhash)"
    first_match = " AND ".join(
        f"(a.band <= {j}"
        f" OR (shiftright({xor_sql}, {j * 15}) & {(1 << 15) - 1}) != 0"
        f" OR (shiftright(a.capmask, {j}) & 1) = 1)"
        for j in range(3)
    )
    return (
        joined.filter(F.expr(first_match))
        .selectExpr(
            "a.doc_id AS probe_doc",
            "b.doc_id AS index_doc",
            f"cast(bit_count{xor_sql} as bigint) AS hamming",
        )
        .filter(F.expr(f"hamming <= {HAMMING_MAX}"))
        .orderBy("probe_doc", "index_doc")
    )


# --------------------------------------------------- connected components
def _star_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 50
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    O(log² n)-round algorithm that closes components of ANY diameter,
    used as the fallback when hash-min's diameter-bounded propagation
    hits its iteration cap on an adversarially long dup chain.

    Per round, two edge rewrites, each one groupBy + join (O(edges)):
    - large-star(u): every neighbor v > u re-attaches to
      m = min(Γ(u) ∪ {u});
    - small-star(u): every neighbor v < u, and u itself, re-attach
      to m.
    Both preserve connectivity (old neighbors stay linked through m),
    strictly shrink the potential Σ labels, and their fixpoint is a
    set of stars centered at each component's minimum vertex.  Edges
    stay canonically (larger, smaller); ``localCheckpoint`` cuts the
    per-round lineage like the hash-min loop does.

    Returns (vertex, component) with component = min vertex id.
    """
    verts = (
        pairs.select(F.col(src).alias("vertex"))
        .unionByName(pairs.select(F.col(dst).alias("vertex")))
        .distinct()
        .localCheckpoint()
    )
    edges = (
        pairs.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("w"),
        )
        .filter(F.col("u") != F.col("w"))
        .distinct()
        .localCheckpoint()
    )

    def _mins(e: DataFrame) -> DataFrame:
        """m(u) = min(Γ(u) ∪ {u}) over the symmetric neighborhood."""
        nb = e.unionByName(e.select(F.col("w").alias("u"), F.col("u").alias("w")))
        m = nb.groupBy("u").agg(F.min("w").alias("mw")).select(
            "u", F.least(F.col("mw"), F.col("u")).alias("m")
        )
        return nb, m

    for _ in range(max_iter):
        # large-star: (v, m_u) for v ∈ Γ(u), v > u
        nb, m = _mins(edges)
        edges2 = (
            nb.filter(F.col("w") > F.col("u"))
            .join(m, "u")
            .select(F.col("w").alias("u"), F.col("m").alias("w"))
            .filter(F.col("u") != F.col("w"))
            .distinct()
            .localCheckpoint()
        )
        # small-star: (v, m_u) for v ∈ Γ(u), v < u, plus (u, m_u)
        nb2, m2 = _mins(edges2)
        smaller = (
            nb2.filter(F.col("w") < F.col("u"))
            .join(m2, "u")
            .select(F.col("w").alias("u"), F.col("m").alias("w"))
        )
        self_att = m2.select("u", F.col("m").alias("w"))
        new_edges = (
            smaller.unionByName(self_att)
            .filter(F.col("u") != F.col("w"))
            .distinct()
            .localCheckpoint()
        )
        same = (
            new_edges.count() == edges.count()
            and new_edges.join(edges, ["u", "w"], "left_anti").isEmpty()
        )
        edges = new_edges
        if same:
            break
    else:
        raise RuntimeError(
            f"_star_components did not converge in {max_iter} rounds"
        )
    star = edges.select(F.col("u").alias("vertex"), F.col("w").alias("component"))
    return (
        verts.join(star, "vertex", "left")
        .select(
            "vertex",
            F.coalesce(F.col("component"), F.col("vertex")).alias("component"),
        )
    )


def connected_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 25
) -> DataFrame:
    """Connected components over an undirected pair table via iterative
    min-label propagation: every vertex starts labelled with itself and
    repeatedly takes the minimum label among itself and its neighbours
    until a fixpoint (≤ graph diameter iterations; near-dup clusters
    are dense, so typically 2-3).

    Scale shape: each iteration is one shuffle join (labels ⋈ edges on
    the destination) + one min-aggregate — O(edges) per round, never
    materializing components.  Edges are repartitioned by join key once
    and persisted so every round reuses the same exchange;
    ``localCheckpoint`` truncates the otherwise exponentially growing
    lineage each round (on a real cluster use a reliable
    ``checkpoint()`` dir instead — localCheckpoint pins executors).
    This is the hash-min algorithm — rounds ≤ diameter, cheapest on
    the dense, shallow components near-dup pairs produce; if a
    component's diameter exceeds ``max_iter`` the loop hands off to
    `_star_components` (large-star/small-star, O(log² n) rounds at
    any diameter) instead of raising or returning split labels.

    Returns (vertex, component) with component = min vertex id reached.
    """
    from pyspark.storagelevel import StorageLevel

    fwd = pairs.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    edges = (
        fwd.unionByName(
            fwd.select(F.col("e_dst").alias("e_src"), F.col("e_src").alias("e_dst"))
        )
        .repartition("e_dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("e_src").alias("vertex"))
        .distinct()
        .select("vertex", F.col("vertex").alias("component"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.e_dst == labels.vertex)
            .groupBy("e_src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.vertex == nbr_min.e_src, "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()  # truncate lineage; also materializes
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # Returning here would silently hand back SPLIT components
        # (labels one hop short of the fixpoint) — wrong canonical ids
        # with no signal.  A component diameter over max_iter means
        # hash-min is the wrong tool: fall back to large-star/
        # small-star, which converges in O(log² n) rounds regardless
        # of diameter.
        return _star_components(pairs, src, dst)
    return labels


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: MinHash-LSH verified pairs grouped into
    connected components, canonical id = min doc_id per component.

    This is the step a real training-data pipeline runs after pair
    generation — pairwise output alone can't answer "keep one doc per
    duplicate group" when dups chain (A~B, B~C but A≁C directly); the
    component, not the pair, is the dedup unit.  The reference's
    set()-based URL dedup (extract_product_urls.py:57) has no analog —
    this is the scale-path extension."""
    from pyspark.sql import Window

    pairs = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components(pairs)
    return (
        cc.select(
            F.col("vertex").alias("doc_id"), F.col("component").alias("cluster_id")
        )
        .withColumn(
            "cluster_size",
            F.count("*").over(Window.partitionBy("cluster_id")).cast("long"),
        )
        .orderBy("cluster_id", "doc_id")
    )


ORACLE_SQL = {
    "dedup_exact": f"""
        WITH {_AUG_SQL}
        SELECT md5(text) AS fingerprint,
               min(doc_id) AS keeper_doc_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM aug GROUP BY md5(text) HAVING count(*) > 1
        ORDER BY keeper_doc_id
    """,
    "dedup_minhash_lsh": f"""
        WITH {_AUG_SQL}, {_SHINGLES_SQL},
        minh AS (
          SELECT doc_id,
                 {", ".join(f"min(md5(shingle || '#{b}')) AS mh{b}" for b in range(N_MINHASH))}
          FROM shingles GROUP BY doc_id
        ),
        bands_all AS (
          {" UNION ALL ".join(
              f"SELECT doc_id, {band} AS band, md5(mh{2*band} || '|' || mh{2*band+1}) AS bkey FROM minh"
              for band in range(N_MINHASH // 2)
          )}
        ),
        bands AS (
          SELECT doc_id, band, bkey FROM (
            SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bsz
            FROM bands_all
          ) WHERE bsz <= {MAX_BUCKET}
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
        inter AS (
          SELECT c.doc_a, c.doc_b, count(*) AS n_inter
          FROM cand c
          JOIN shingles sa ON sa.doc_id = c.doc_a
          JOIN shingles sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
          GROUP BY c.doc_a, c.doc_b
        )
        SELECT i.doc_a, i.doc_b,
               CAST(i.n_inter AS DOUBLE) / CAST(za.n_sh + zb.n_sh - i.n_inter AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sizes za ON za.doc_id = i.doc_a
        JOIN sizes zb ON zb.doc_id = i.doc_b
        WHERE CAST(i.n_inter AS DOUBLE) / CAST(za.n_sh + zb.n_sh - i.n_inter AS DOUBLE) >= {JACCARD_THRESHOLD}
        ORDER BY doc_a, doc_b
    """,
    "dedup_ngram_jaccard": f"""
        WITH {_AUG_SQL}, {_SHINGLES_SQL},
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
          FROM shingles a JOIN shingles b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT i.doc_a, i.doc_b,
               CAST(i.n_inter AS DOUBLE) / CAST(za.n_sh + zb.n_sh - i.n_inter AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sizes za ON za.doc_id = i.doc_a
        JOIN sizes zb ON zb.doc_id = i.doc_b
        WHERE CAST(i.n_inter AS DOUBLE) / CAST(za.n_sh + zb.n_sh - i.n_inter AS DOUBLE) >= {JACCARD_THRESHOLD}
        ORDER BY doc_a, doc_b
    """,
    # same LSH chain as dedup_minhash_lsh, then component closure via a
    # recursive CTE (min label over the transitive closure == the
    # hash-min fixpoint the Spark loop converges to)
    "dedup_clusters": f"""
        WITH RECURSIVE {_AUG_SQL}, {_SHINGLES_SQL},
        minh AS (
          SELECT doc_id,
                 {", ".join(f"min(md5(shingle || '#{b}')) AS mh{b}" for b in range(N_MINHASH))}
          FROM shingles GROUP BY doc_id
        ),
        bands_all AS (
          {" UNION ALL ".join(
              f"SELECT doc_id, {band} AS band, md5(mh{2*band} || '|' || mh{2*band+1}) AS bkey FROM minh"
              for band in range(N_MINHASH // 2)
          )}
        ),
        bands AS (
          SELECT doc_id, band, bkey FROM (
            SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bsz
            FROM bands_all
          ) WHERE bsz <= {MAX_BUCKET}
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
        inter AS (
          SELECT c.doc_a, c.doc_b, count(*) AS n_inter
          FROM cand c
          JOIN shingles sa ON sa.doc_id = c.doc_a
          JOIN shingles sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
          GROUP BY c.doc_a, c.doc_b
        ),
        pairs AS (
          SELECT i.doc_a, i.doc_b
          FROM inter i
          JOIN sizes za ON za.doc_id = i.doc_a
          JOIN sizes zb ON zb.doc_id = i.doc_b
          WHERE CAST(i.n_inter AS DOUBLE) / CAST(za.n_sh + zb.n_sh - i.n_inter AS DOUBLE) >= {JACCARD_THRESHOLD}
        ),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL
          SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        reach AS (
          SELECT src AS v, src AS label FROM edges
          UNION
          SELECT e.dst AS v, r.label FROM reach r JOIN edges e ON e.src = r.v
        ),
        comp AS (SELECT v AS doc_id, min(label) AS cluster_id FROM reach GROUP BY v)
        SELECT doc_id, cluster_id,
               CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
        FROM comp ORDER BY cluster_id, doc_id
    """,
    "dedup_simhash": f"""
        WITH {_AUG_SQL},
        toks AS (
          SELECT DISTINCT doc_id,
                 CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
          FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM aug
          ) WHERE w <> ''
        ),
        bits AS (
          SELECT doc_id, h, unnest(range(0, {SIMHASH_BITS})) AS bit
          FROM toks
        ),
        contrib AS (
          SELECT doc_id, bit,
                 sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS c
          FROM bits GROUP BY doc_id, bit
        )
        SELECT doc_id,
               CAST(sum(CASE WHEN c > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
        FROM contrib GROUP BY doc_id ORDER BY doc_id
    """,
    "dedup_simhash_pairs": f"""
        WITH {_AUG_SQL},
        toks AS (
          SELECT DISTINCT doc_id,
                 CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
          FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM aug
          ) WHERE w <> ''
        ),
        bits AS (
          SELECT doc_id, h, unnest(range(0, {SIMHASH_BITS})) AS bit
          FROM toks
        ),
        contrib AS (
          SELECT doc_id, bit,
                 sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS c
          FROM bits GROUP BY doc_id, bit
        ),
        sig AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN c > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
          FROM contrib GROUP BY doc_id
        ),
        bands_all AS (
          {" UNION ALL ".join(
              f"SELECT doc_id, simhash, {band} AS band, (simhash >> {band * 15}) & {(1 << 15) - 1} AS bkey FROM sig"
              for band in range(4)
          )}
        ),
        bands AS (
          SELECT doc_id, simhash, band, bkey FROM (
            SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bsz
            FROM bands_all
          ) WHERE bsz <= {MAX_BUCKET}
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          a.simhash AS sh_a, b.simhash AS sh_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {HAMMING_MAX}
        ORDER BY doc_a, doc_b
    """,
}

def _sh_sql(src: str, name: str) -> str:
    """Parameterized DuckDB twin of `_shingles` over CTE ``src``."""
    return f"""
        {name} AS (
          SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   unnest(CASE WHEN len(ws) >= 3
                          THEN list_transform(range(1, len(ws) - 1),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                          ELSE [text] END) AS shingle
            FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM {src})
          )
        )"""


def _bands_sql(shname: str, name: str) -> str:
    """Parameterized DuckDB twin of `_mh_bands` over shingle CTE
    ``shname`` (uncapped — the shared cap is applied by the caller)."""
    mh = ", ".join(
        f"min(md5(shingle || '#{b}')) AS mh{b}" for b in range(N_MINHASH)
    )
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {band} AS band, "
        f"md5(mh{2 * band} || '|' || mh{2 * band + 1}) AS bkey FROM {name}_mh"
        for band in range(N_MINHASH // 2)
    )
    return f"""
        {name}_mh AS (SELECT doc_id, {mh} FROM {shname} GROUP BY doc_id),
        {name} AS ({unions})"""


ORACLE_SQL["dedup_incremental"] = f"""
    WITH existing AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
    batch AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + {INC_NEAR_ID} AS doc_id,
             text || ' incremental shard tail' AS text
      FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 11 = 0
      UNION ALL
      SELECT doc_id + {INC_EXACT_ID} AS doc_id, text
      FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 13 = 0
    ),
    {_sh_sql("existing", "esh")},
    {_sh_sql("batch", "bsh")},
    {_bands_sql("esh", "ebands")},
    {_bands_sql("bsh", "bbands")},
    allb AS (
      SELECT doc_id, band, bkey, 0 AS side FROM ebands
      UNION ALL
      SELECT doc_id, band, bkey, 1 AS side FROM bbands
    ),
    capped AS (
      SELECT doc_id, band, bkey, side FROM (
        SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bsz FROM allb
      ) WHERE bsz <= {MAX_BUCKET}
    ),
    cand AS (
      SELECT DISTINCT b.doc_id AS batch_doc, a.doc_id AS corpus_doc
      FROM capped b JOIN capped a
        ON a.band = b.band AND a.bkey = b.bkey AND b.side = 1 AND a.side = 0
    ),
    esz AS (SELECT doc_id, count(*) AS n_sh FROM esh GROUP BY doc_id),
    bsz AS (SELECT doc_id, count(*) AS n_sh FROM bsh GROUP BY doc_id),
    inter AS (
      SELECT c.batch_doc, c.corpus_doc, count(*) AS n_inter
      FROM cand c
      JOIN bsh sb ON sb.doc_id = c.batch_doc
      JOIN esh sa ON sa.doc_id = c.corpus_doc AND sa.shingle = sb.shingle
      GROUP BY c.batch_doc, c.corpus_doc
    )
    SELECT i.batch_doc, i.corpus_doc,
           CAST(i.n_inter AS DOUBLE) / CAST(za.n_sh + zb.n_sh - i.n_inter AS DOUBLE)
             AS jaccard
    FROM inter i
    JOIN bsz zb ON zb.doc_id = i.batch_doc
    JOIN esz za ON za.doc_id = i.corpus_doc
    WHERE CAST(i.n_inter AS DOUBLE) / CAST(za.n_sh + zb.n_sh - i.n_inter AS DOUBLE)
          >= {JACCARD_THRESHOLD}
    ORDER BY batch_doc, corpus_doc
"""

ORACLE_SQL["dedup_lsh_eval"] = f"""
    WITH truth AS MATERIALIZED (
      SELECT doc_a, doc_b FROM ({ORACLE_SQL["dedup_ngram_jaccard"]})),
    lsh AS MATERIALIZED (
      SELECT doc_a, doc_b FROM ({ORACLE_SQL["dedup_minhash_lsh"]})),
    h AS (
      SELECT count(*) AS n_hit FROM truth
      WHERE EXISTS (SELECT 1 FROM lsh
                    WHERE lsh.doc_a = truth.doc_a
                      AND lsh.doc_b = truth.doc_b)),
    t AS (SELECT count(*) AS n_true FROM truth),
    l AS (SELECT count(*) AS n_lsh FROM lsh)
    SELECT CAST(n_true AS BIGINT) AS n_true,
           CAST(n_lsh AS BIGINT) AS n_lsh,
           CAST(n_hit AS BIGINT) AS n_hit,
           CAST(CASE WHEN n_true = 0 THEN {EVAL_SCALE}
                ELSE n_hit * {EVAL_SCALE} // n_true END AS BIGINT)
             AS recall_units,
           CAST(CASE WHEN n_lsh = 0 THEN {EVAL_SCALE}
                ELSE n_hit * {EVAL_SCALE} // n_lsh END AS BIGINT)
             AS precision_units
    FROM t CROSS JOIN l CROSS JOIN h
"""

QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_lsh_eval": dedup_lsh_eval,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_incremental": dedup_incremental,
    "dedup_clusters": dedup_clusters,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_pairs": dedup_simhash_pairs,
}
