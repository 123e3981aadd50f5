"""Image near-duplicate detection: average-hash (aHash) signatures +
the shared capped banded-Hamming pair join from operators/dedup.py.

Reference analog: the reference stores one image per product page and
re-analyzes it every crawl (analysis/image_analysis.py:19-124 classify,
util/media/media_downloader.py:9-63 fetch) — at 100 TB the same logo /
product shot appears across millions of pages, and a vision-language
training set needs those collapsed.  aHash is the classic perceptual
fingerprint: downsample to a fixed grid of grayscale pixels, threshold
each pixel on the grid mean, pack the bits.  Near-identical images
(recompression, ±brightness, small crops) land within a few Hamming
bits of each other, so the SAME banded LSH join that serves text
simhash (`dedup.banded_hamming_pairs` — 4×15-bit bands, MAX_BUCKET hot
-bucket cap, row-local first-matching-band dedup) serves images: one
join plan, two signature sources.

Layering (each piece independently testable, production path real):

- `ahash_from_pixels(df)` — the production kernel: ``(doc_id,
  pixels: array<bigint>)`` → ``(doc_id, simhash)``.  Pure JVM codegen
  (``aggregate`` for the grid sum + 60 shift/compare terms), no Python
  in the hot path; brightness-invariant by construction (mean
  threshold), property-tested.
- `pixels_from_payload(df)` — payload → pixel grid.  PIL when
  importable (real decode + resize to the 10×6 grid, Arrow-batched
  mapInPandas, same capability dispatch as multimodal.real_decode);
  absent PIL this raises, and the synthetic corpus below never calls
  it.
- `_image_frame` / `_synthetic_pixels` — the deterministic test corpus
  this container can verify end-to-end: per doc a 60-pixel grid chained
  from md5, with planted exact copies (doc_id%17==0 → +2e6, identical
  grid) and near copies (doc_id%10==0 → +1e6, one pixel brightened by
  13) mirroring the text `_augmented` plant exactly — so recall
  assertions carry over.  The DuckDB twin rebuilds the same grid from
  the same md5 chain; no blobs move in either engine.

Scale: signatures are row-local (zero shuffle); the pair join shuffles
one 8-byte band key + 16-byte signature row per doc per band and is
bounded by the MAX_BUCKET cap — the identical plan already audited for
text simhash at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_scraper_spark.operators.dedup import (
    HAMMING_MAX,
    MAX_BUCKET,
    SIMHASH_BITS,
    banded_hamming_pairs,
    banded_hamming_probe,
)

try:  # real decoder path — absent in this container (see multimodal)
    from PIL import Image

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

#: aHash grid: 10×6 = 60 pixels, one per signature bit, so the 4×15-bit
#: banding of `banded_hamming_pairs` applies unchanged.
GRID_W, GRID_H = 10, 6
N_PIXELS = GRID_W * GRID_H
assert N_PIXELS == SIMHASH_BITS
#: brightness delta applied to pixel 0 of each planted near copy
NEAR_DELTA = 13


# ------------------------------------------------------- production kernel
def ahash_from_pixels(px: DataFrame) -> DataFrame:
    """``(doc_id, pixels: array<bigint> of length 60)`` → ``(doc_id,
    simhash)``: bit i set ⇔ pixel i is above the grid mean.

    ``p_i > mean`` is evaluated as ``p_i · 60 > Σp`` — integer-exact,
    no division, so both engines agree bit-for-bit.  Entirely JVM
    codegen: one ``aggregate`` for the grid sum, then 60 compare/shift
    terms in a single parsed SQL string (the py4j round-trip lesson —
    see dedup._simhash_col).  Adding a constant c to every pixel adds
    60c to both sides, so the hash is brightness-invariant (tested)."""
    packed = " + ".join(
        f"if(element_at(pixels, {i + 1}) * {N_PIXELS} > s, {1 << i}L, 0L)"
        for i in range(N_PIXELS)
    )
    return px.selectExpr(
        "doc_id", "pixels", "aggregate(pixels, 0L, (acc, x) -> acc + x) AS s"
    ).selectExpr("doc_id", f"({packed}) AS simhash")


_PIXELS_SCHEMA = "doc_id bigint, pixels array<bigint>"


def pixels_from_payload(payload_df: DataFrame) -> DataFrame:
    """Real-image path: ``(doc_id, payload: binary)`` → the 10×6
    grayscale grid, PIL decode + resize inside an Arrow-batched
    mapInPandas (same capability dispatch as multimodal.real_decode).
    Raises when PIL is absent — the synthetic corpus never calls this;
    a cluster with PIL runs it unchanged."""
    if not HAVE_PIL:
        raise RuntimeError(
            "pixels_from_payload requires PIL; use the synthetic grid "
            "(imagededup._synthetic_pixels) in containers without it"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        def grid(b) -> list[int]:
            im = Image.open(io.BytesIO(bytes(b))).convert("L")
            im = im.resize((GRID_W, GRID_H))
            return [int(v) for v in im.getdata()]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "pixels": [grid(b) for b in pdf["payload"]],
                }
            )

    return payload_df.mapInPandas(kernel, _PIXELS_SCHEMA)


# ---------------------------------------------------- synthetic test corpus
def _image_frame(docs: DataFrame) -> DataFrame:
    """Deterministic image-corpus plant, mirroring dedup._augmented:
    every doc is an original (base_id = doc_id); doc_id%17==0 also
    appears as an exact copy at +2e6 (identical grid); doc_id%10==0
    also appears as a near copy at +1e6 (pixel 0 brightened by
    NEAR_DELTA — a recompression-scale perturbation)."""
    base = docs.select(
        "doc_id",
        F.col("doc_id").alias("base_id"),
        F.lit(0).cast("bigint").alias("delta"),
    )
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.col("doc_id").alias("base_id"),
        F.lit(NEAR_DELTA).cast("bigint").alias("delta"),
    )
    exact = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.col("doc_id").alias("base_id"),
        F.lit(0).cast("bigint").alias("delta"),
    )
    return base.unionByName(near).unionByName(exact)


def _px_exprs() -> list[str]:
    """The 60 grid-pixel SQL expressions over the four md5 hex columns
    h0..h3 (15 pixels per md5: hex chars 2k+1..2k+2 → byte value).
    Pixel 0 carries the near-copy brightness delta."""
    out = []
    for i in range(N_PIXELS):
        g, k = divmod(i, 15)
        px = f"cast(conv(substr(h{g}, {2 * k + 1}, 2), 16, 10) as bigint)"
        if i == 0:
            px = f"(({px} + delta) % 256)"
        out.append(px)
    return out


def _pixels_from_frame(frame: DataFrame) -> DataFrame:
    """``(doc_id, base_id, delta, seed)`` → ``(doc_id, pixels)``: the
    grid is chained from md5('<seed>:<base_id>:<g>') so the DuckDB
    twin rebuilds it exactly; all row-local codegen, zero shuffle."""
    hexed = frame.selectExpr(
        "doc_id",
        "delta",
        *[
            f"md5(concat(seed, ':', base_id, ':{g}')) AS h{g}"
            for g in range(4)
        ],
    )
    return hexed.selectExpr(
        "doc_id", f"array({', '.join(_px_exprs())}) AS pixels"
    )


def _synthetic_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pixels) for the planted synthetic corpus."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return _pixels_from_frame(
        _image_frame(docs).withColumn("seed", F.lit("img"))
    )


def image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image aHash signature table (doc_id, simhash)."""
    return ahash_from_pixels(_synthetic_pixels(spark, sf_dir)).orderBy("doc_id")


def image_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs: the shared capped banded-Hamming join over
    the aHash signature table — exact copies surface at hamming 0, the
    planted brightness perturbation within a few bits."""
    sig = ahash_from_pixels(_synthetic_pixels(spark, sf_dir))
    return banded_hamming_pairs(sig)


# ------------------------------------------------------ incremental dedup
#: id offset for the shard's truly-novel images (fresh md5 chain)
NOVEL_ID = 3_000_000


def image_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental image dedup of a NEW crawl shard against the
    EXISTING image corpus — the media pipeline is append-per-round
    (reference: util/media/media_downloader.py:9-63 fetches per crawl
    round), so per-round probing is the real production shape:
    re-pairing the whole corpus per shard is off the table at 100 TB.
    The corpus keeps its aHash band index (rebuilt from the split
    here, as `dedup_incremental` does — a materialized index is a
    drop-in); only the new shard is hashed and probed via
    `dedup.banded_hamming_probe`'s capped (band, bkey) equi-join.

    Deterministic fixture mirroring `dedup_incremental`: corpus = the
    original images; shard = near copies (doc_id%10==0, pixel-0
    brightened), exact copies (doc_id%17==0, identical grid), and
    truly-novel images (doc_id%7==0, an unrelated md5 chain) that a
    correct probe must NOT match.  Output: (batch_doc, corpus_doc,
    hamming) per detected cross duplicate."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.select(
        "doc_id",
        F.col("doc_id").alias("base_id"),
        F.lit(0).cast("bigint").alias("delta"),
        F.lit("img").alias("seed"),
    )
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.col("doc_id").alias("base_id"),
        F.lit(NEAR_DELTA).cast("bigint").alias("delta"),
        F.lit("img").alias("seed"),
    )
    exact = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.col("doc_id").alias("base_id"),
        F.lit(0).cast("bigint").alias("delta"),
        F.lit("img").alias("seed"),
    )
    novel = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + NOVEL_ID).alias("doc_id"),
        F.col("doc_id").alias("base_id"),
        F.lit(0).cast("bigint").alias("delta"),
        F.lit("new").alias("seed"),
    )
    shard = near.unionByName(exact).unionByName(novel)
    sig_c = ahash_from_pixels(_pixels_from_frame(corpus))
    sig_s = ahash_from_pixels(_pixels_from_frame(shard))
    return banded_hamming_probe(sig_c, sig_s).selectExpr(
        "probe_doc AS batch_doc", "index_doc AS corpus_doc", "hamming"
    )


# ------------------------------------------------------------ DuckDB twins
_HEX_SQL = ", ".join(
    f"md5('img:' || base_id || ':{g}') AS h{g}" for g in range(4)
)


def _duck_px(i: int) -> str:
    g, k = divmod(i, 15)
    px = f"CAST(concat('0x', substr(h{g}, {2 * k + 1}, 2)) AS BIGINT)"
    if i == 0:
        px = f"(({px} + delta) % 256)"
    return f"{px} AS p{i}"


_SIG_SQL = f"""
  imgs AS (
    SELECT doc_id, doc_id AS base_id, CAST(0 AS BIGINT) AS delta FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, doc_id AS base_id,
           CAST({NEAR_DELTA} AS BIGINT) AS delta
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id, doc_id AS base_id,
           CAST(0 AS BIGINT) AS delta
    FROM documents WHERE doc_id % 17 = 0
  ),
  hexed AS (SELECT doc_id, delta, {_HEX_SQL} FROM imgs),
  px AS (
    SELECT doc_id, {", ".join(_duck_px(i) for i in range(N_PIXELS))}
    FROM hexed
  ),
  summed AS (
    SELECT *, {" + ".join(f"p{i}" for i in range(N_PIXELS))} AS s FROM px
  ),
  sig AS (
    SELECT doc_id,
           CAST({" + ".join(
               f"CASE WHEN p{i} * {N_PIXELS} > s"
               f" THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END"
               for i in range(N_PIXELS)
           )} AS BIGINT) AS simhash
    FROM summed
  )
"""

ORACLE_SQL = {
    "image_ahash": f"""
        WITH {_SIG_SQL}
        SELECT doc_id, simhash FROM sig ORDER BY doc_id
    """,
    # same capped-band set semantics as the text simhash twin: capped
    # band rows dropped up front, DISTINCT over surviving band matches
    "image_dedup_pairs": f"""
        WITH {_SIG_SQL},
        bands_all AS (
          {" UNION ALL ".join(
              f"SELECT doc_id, simhash, {band} AS band,"
              f" (simhash >> {band * 15}) & {(1 << 15) - 1} AS bkey FROM sig"
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

_INC_HEX_SQL = ", ".join(
    f"md5(seed || ':' || base_id || ':{g}') AS h{g}" for g in range(4)
)

ORACLE_SQL["image_dedup_incremental"] = f"""
    WITH imgs AS (
      SELECT doc_id, doc_id AS base_id, CAST(0 AS BIGINT) AS delta,
             'img' AS seed, 0 AS side
      FROM documents
      UNION ALL
      SELECT doc_id + 1000000, doc_id, CAST({NEAR_DELTA} AS BIGINT),
             'img', 1
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 2000000, doc_id, CAST(0 AS BIGINT), 'img', 1
      FROM documents WHERE doc_id % 17 = 0
      UNION ALL
      SELECT doc_id + {NOVEL_ID}, doc_id, CAST(0 AS BIGINT), 'new', 1
      FROM documents WHERE doc_id % 7 = 0
    ),
    hexed AS (SELECT doc_id, side, delta, {_INC_HEX_SQL} FROM imgs),
    px AS (
      SELECT doc_id, side, {", ".join(_duck_px(i) for i in range(N_PIXELS))}
      FROM hexed
    ),
    summed AS (
      SELECT *, {" + ".join(f"p{i}" for i in range(N_PIXELS))} AS s FROM px
    ),
    sig AS (
      SELECT doc_id, side,
             CAST({" + ".join(
                 f"CASE WHEN p{i} * {N_PIXELS} > s"
                 f" THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END"
                 for i in range(N_PIXELS)
             )} AS BIGINT) AS simhash
      FROM summed
    ),
    bands_all AS (
      {" UNION ALL ".join(
          f"SELECT doc_id, side, simhash, {band} AS band,"
          f" (simhash >> {band * 15}) & {(1 << 15) - 1} AS bkey FROM sig"
          for band in range(4)
      )}
    ),
    bands AS (
      SELECT doc_id, side, simhash, band, bkey FROM (
        SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bsz
        FROM bands_all
      ) WHERE bsz <= {MAX_BUCKET}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS batch_doc, b.doc_id AS corpus_doc,
                      a.simhash AS sh_a, b.simhash AS sh_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey
       AND a.side = 1 AND b.side = 0
    )
    SELECT batch_doc, corpus_doc,
           CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {HAMMING_MAX}
    ORDER BY batch_doc, corpus_doc
"""

QUERIES = {
    "image_ahash": image_ahash,
    "image_dedup_pairs": image_dedup_pairs,
    "image_dedup_incremental": image_dedup_incremental,
}
