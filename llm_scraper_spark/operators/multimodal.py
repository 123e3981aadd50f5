"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode/feature-extract as Arrow-batched kernels.

Reference analog: media download + whisper transcription
(util/media/media_downloader.py:9-63 ffmpeg fetch, :44-46 transcribe;
base64 data-URL decode at :15-24) and image LLM analysis
(analysis/image_analysis.py:19-124).  In this container the image/
audio libraries do not exist, so the *decode* is a deterministic stub
(or a PIL path gated behind an import-try raising NotImplementedError),
while the Spark-side plumbing — binary column, schema, mapInPandas
batch shape, partition flow — is real and tested.

The synthetic payload is ``unhex(md5(text))`` (16 bytes), so the DuckDB
oracle can reproduce every derived metadata value from the md5 hex
string without touching blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # real decoder path — absent in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the synthetic binary payload column (kind='image')."""
    return docs.select(
        "doc_id",
        F.unhex(F.md5(F.col("text"))).alias("payload"),
        F.lit("image").alias("media_kind"),
    )


def _decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary payload → typed metadata.

    Deterministic fake decode: dimensions/channels derived from payload
    bytes.  A real decoder drops in here unchanged (same batch shape):
    ``Image.open(io.BytesIO(b))`` → (width, height, mode).
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": [len(b) for b in payloads],
                "width": [64 + b[0] for b in payloads],
                "height": [64 + b[1] for b in payloads],
                "channels": [1 + b[2] % 3 for b in payloads],
            }
        )


def real_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The genuine decoder path — requires PIL, absent here by design."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL; this container ships none — "
            "use _decode_stub (same mapInPandas contract)"
        )
    raise NotImplementedError("wire PIL decode here on a cluster with PIL")


_DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, channels bigint"
)


def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → binary payload → mapInPandas decode-stub metadata."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        with_payload(docs)
        .repartition(8, "doc_id")  # stands in for media-locality partitioning
        .mapInPandas(_decode_stub, _DECODE_SCHEMA)
        .orderBy("doc_id")
    )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling analog: deterministic 'frame offsets' every
    ~N bytes of the payload — posexplode of a JVM-computed sequence
    (plumbing for ffmpeg frame extraction)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_frames = (F.col("n_chars") % 4) + 1
    return (
        docs.select(
            "doc_id", F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")
        )
        .withColumn("frame_offset_ms", F.col("frame_idx") * 1000)
        .orderBy("doc_id", "frame_idx")
    )


ORACLE_SQL = {
    "mm_decode_stub": """
        SELECT doc_id,
               CAST(16 AS BIGINT) AS n_bytes,
               CAST(64 + CAST(concat('0x', substr(md5(text), 1, 2)) AS INT) AS BIGINT) AS width,
               CAST(64 + CAST(concat('0x', substr(md5(text), 3, 2)) AS INT) AS BIGINT) AS height,
               CAST(1 + CAST(concat('0x', substr(md5(text), 5, 2)) AS INT) % 3 AS BIGINT) AS channels
        FROM documents ORDER BY doc_id
    """,
    "mm_frame_sample": """
        SELECT doc_id,
               CAST(unnest(range(0, (n_chars % 4) + 1)) AS BIGINT) AS frame_idx,
               CAST(unnest(range(0, (n_chars % 4) + 1)) * 1000 AS BIGINT) AS frame_offset_ms
        FROM documents ORDER BY doc_id, frame_idx
    """,
}

QUERIES = {
    "mm_decode_stub": mm_decode_stub,
    "mm_frame_sample": mm_frame_sample,
}
