"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode/feature-extract as Arrow-batched kernels.

Reference analog: media download + whisper transcription
(util/media/media_downloader.py:9-63 ffmpeg fetch, :44-46 transcribe;
base64 data-URL decode at :15-24) and image LLM analysis
(analysis/image_analysis.py:19-124).  The decode kernel dispatches by
capability: PIL when importable (full codec coverage), else a
pure-stdlib header decoder for PNG/BMP/PPM (real metadata from real
bytes, no image library), with `_decode_stub` only for the synthetic
md5-payload corpus whose blobs are not images.  Full pixel transforms
(resize, transcode) still require PIL/ffmpeg on the cluster; the
Spark-side plumbing — binary column, schema, mapInPandas batch shape,
partition flow — is identical for all three kernels and tested.

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

try:  # real transcription path — whisper model + ffmpeg decode
    # (media_downloader.py:44-46); absent in this container, dispatched
    # exactly like the PIL branch above so a cluster that ships both
    # gets real transcripts with zero code change
    import shutil as _shutil

    import whisper  # noqa: F401

    HAVE_WHISPER = _shutil.which("ffmpeg") is not None
except ImportError:
    HAVE_WHISPER = False


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


def _parse_header(b: bytes) -> tuple[int, int, int]:
    """Pure-stdlib image metadata decode for the formats whose headers
    carry it directly: PNG (IHDR), BMP (BITMAPINFOHEADER), PPM/PGM.
    Returns (width, height, channels); raises ValueError on formats
    that need a full codec (JPEG entropy-coded dims, video, …)."""
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) < 26:  # magic + IHDR length/type + 13-byte IHDR body
            raise ValueError("unsupported media format (truncated PNG header)")
        if b[12:16] != b"IHDR":  # the spec requires IHDR first; a file
            # with another chunk there would have its bytes misread as
            # width/height — reject, don't emit garbage metadata
            raise ValueError("unsupported media format (PNG without leading IHDR)")
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        color_type = b[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        if channels is None:
            raise ValueError(
                f"unsupported media format (PNG color type {color_type})"
            )
        return w, h, channels
    if b[:2] == b"BM":
        if len(b) < 30:
            raise ValueError("unsupported media format (truncated BMP header)")
        dib = int.from_bytes(b[14:18], "little")
        if dib < 40:  # BITMAPCOREHEADER (12) stores 16-bit dims at a
            # different offset — only the >=40-byte INFOHEADER family
            # has the int32 fields this parser reads
            raise ValueError(
                f"unsupported media format (BMP DIB header size {dib})"
            )
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = abs(int.from_bytes(b[22:26], "little", signed=True))
        bpp = int.from_bytes(b[28:30], "little")
        return w, h, max(1, bpp // 8)
    if b[:2] in (b"P6", b"P5"):
        fields: list[int] = []
        i = 2
        while len(fields) < 2 and i < len(b):
            while i < len(b) and b[i : i + 1].isspace():
                i += 1
            if b[i : i + 1] == b"#":  # comment line
                while i < len(b) and b[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(b) and not b[j : j + 1].isspace():
                j += 1
            fields.append(int(b[i:j]))
            i = j
        if len(fields) < 2:
            raise ValueError("unsupported media format (truncated PPM header)")
        w, h = fields
        return w, h, 3 if b[:2] == b"P6" else 1
    raise ValueError(f"unsupported media format (magic {b[:4]!r})")


def real_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The genuine decoder path, same mapInPandas contract as the stub:
    PIL when importable (full codec coverage — JPEG and friends),
    otherwise the pure-stdlib header decoder (PNG/BMP/PPM metadata
    without any image library).  Payloads must be real image bytes —
    the synthetic md5 corpus goes through `_decode_stub`; `decode_media`
    below picks the right kernel."""
    import io

    def one(b) -> tuple[int, int, int, int]:
        b = bytes(b)  # materialize the Arrow buffer ONCE per payload
        if HAVE_PIL:
            try:
                im = Image.open(io.BytesIO(b))
                return len(b), im.width, im.height, len(im.getbands())
            except ValueError:
                raise
            except Exception as exc:  # PIL UnidentifiedImageError etc.
                raise ValueError(
                    f"unsupported media format (magic {b[:4]!r}): {exc}"
                ) from exc
        w, h, c = _parse_header(b)
        return len(b), w, h, c

    for pdf in batches:
        decoded = [one(b) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": [d[0] for d in decoded],
                "width": [d[1] for d in decoded],
                "height": [d[2] for d in decoded],
                "channels": [d[3] for d in decoded],
            }
        )


_DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, channels bigint"
)


def decode_media(with_payload_df: DataFrame, real: bool | None = None) -> DataFrame:
    """Production decode surface: (doc_id, payload) → typed metadata,
    one mapInPandas pass over media-locality partitions.  ``real=None``
    dispatches on the payload contract: the real decoder whenever a
    codec path exists for real image bytes (PIL, or the stdlib header
    parser), the stub only when the caller explicitly opts into the
    synthetic corpus (``real=False`` — what `mm_decode_stub` does,
    since md5 payloads are not decodable images)."""
    kernel = _decode_stub if real is False else real_decode
    return with_payload_df.mapInPandas(kernel, _DECODE_SCHEMA)


def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → binary payload → mapInPandas decode metadata.
    ``real=False``: the synthetic md5 payloads are not decodable
    images, so this driver gate pins the stub kernel; `decode_media`
    with real payloads is the production path (tested end-to-end on
    crafted PNG/BMP/PPM bytes in tests/test_streaming_multimodal.py)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        decode_media(
            with_payload(docs).repartition(8, "doc_id"),  # media-locality partitioning
            real=False,
        )
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


# ---------------------------------------------------- video transcription
#: 16-word stand-in vocabulary; word j of a stub transcript is indexed
#: by payload byte j+1 (= md5 hex pair j+1 of the doc text), so the
#: oracle twin reproduces it from the hex string
_TRANSCRIPT_VOCAB = (
    "sensor device camera privacy data audio video firmware "
    "cloud local consent vendor model energy motion usage"
).split()
_TRANSCRIPT_WORDS = 6


def _transcribe_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary payload → deterministic stand-in
    transcript (pure function of the payload bytes, reproducible on
    any cluster — the same contract as `_decode_stub`)."""
    for pdf in batches:
        texts = [
            " ".join(
                _TRANSCRIPT_VOCAB[bytes(b)[j + 1] % 16]
                for j in range(_TRANSCRIPT_WORDS)
            )
            for b in pdf["payload"]
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "transcript": texts,
                "n_chars": [len(t) for t in texts],
            }
        )


def _transcribe_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The genuine path, same mapInPandas contract as the stub: ffmpeg
    demux + whisper transcription (media_downloader.py:44-46).  The
    model loads once per python worker (function attribute), payloads
    spool through a temp file because whisper's API takes a path."""
    import tempfile

    if getattr(_transcribe_real, "_model", None) is None:
        _transcribe_real._model = whisper.load_model("base")
    model = _transcribe_real._model
    for pdf in batches:
        texts = []
        for b in pdf["payload"]:
            with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
                f.write(bytes(b))
                f.flush()
                texts.append(str(model.transcribe(f.name)["text"]).strip())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "transcript": texts,
                "n_chars": [len(t) for t in texts],
            }
        )


_TRANSCRIBE_SCHEMA = "doc_id bigint, transcript string, n_chars bigint"


def transcribe_media(
    with_payload_df: DataFrame, real: bool | None = None
) -> DataFrame:
    """Production transcription surface, the video analog of
    `decode_media`: (doc_id, payload) → transcript, one mapInPandas
    pass.  ``real=None`` dispatches on capability: whisper+ffmpeg when
    the cluster ships them, the deterministic stand-in otherwise (the
    branch taken is recorded in CODEC_COVERAGE.json by the test
    suite).  ``real=True`` demands the genuine path and fails loudly
    where it cannot run — never a silent stand-in masquerading as a
    real transcript."""
    if real is True and not HAVE_WHISPER:
        raise RuntimeError(
            "real transcription requested but whisper/ffmpeg are not "
            "available on this cluster"
        )
    use_real = real if real is not None else HAVE_WHISPER
    kernel = _transcribe_real if use_real else _transcribe_stub
    return with_payload_df.mapInPandas(kernel, _TRANSCRIBE_SCHEMA)


def mm_transcribe_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → binary payload → stand-in transcripts.
    ``real=False`` pins the stub kernel: the synthetic md5 payloads
    are not demuxable videos, so this gate key checks the Spark-side
    plumbing (schema, batch shape, partitioning) while the whisper
    branch is exercised by the capability-dispatch tests."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return transcribe_media(
        with_payload(docs).repartition(8, "doc_id"), real=False
    ).orderBy("doc_id")


def mm_dataurl_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18: base64 data-URL decode (media_downloader.py:15-24 — split
    the ``data:<mime>;base64,<payload>`` URL on the first comma, mime
    from the header, extension from the mime, b64-decode the payload).
    The data-URL column is synthesized deterministically from the doc
    text (same CTE in the DuckDB twin); decode runs entirely JVM-side
    (``unbase64``), payload identity is checked via its hex string."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mime = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("image/jpeg"))
        .otherwise(F.lit("video/mp4"))
    )
    du = docs.select(
        "doc_id",
        F.concat(
            F.lit("data:"), mime, F.lit(";base64,"),
            F.base64(F.unhex(F.md5(F.col("text")))),
        ).alias("data_url"),
    )
    header = F.substring_index(F.col("data_url"), ",", 1)
    b64 = F.substring_index(F.col("data_url"), ",", -1)
    mime_type = F.substring_index(F.substring_index(header, ":", -1), ";", 1)
    payload = F.unbase64(b64)
    return (
        du.select(
            "doc_id",
            mime_type.alias("mime_type"),
            F.substring_index(mime_type, "/", -1).alias("extension"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.hex(payload).alias("payload_hex"),
        )
        .orderBy("doc_id")
    )


#: deterministic classify thresholds over the stub decode metadata
#: (image_analysis.py:15 CLASSIFICATIONS; decision order matches the
#: reference: UNRENDERED is checked first, then LOGO, else DETAILED)
_UNRENDERED_MAX_PIXELS = 128 * 128


def _classification_col():
    width = 64 + F.expr("cast(conv(substr(md5(text),1,2),16,10) as int)")
    height = 64 + F.expr("cast(conv(substr(md5(text),3,2),16,10) as int)")
    channels = 1 + F.expr("cast(conv(substr(md5(text),5,2),16,10) as int)") % 3
    return (
        F.when(width * height < _UNRENDERED_MAX_PIXELS, F.lit("UNRENDERED"))
        .when(channels == 1, F.lit("LOGO"))
        .otherwise(F.lit("DETAILED"))
    )


def mm_image_gate_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image classify gate → entity path: classify every payload as
    UNRENDERED / LOGO / DETAILED (image_analysis.py:19-124), and ONLY
    DETAILED images flow into entity extraction
    (scrape_eccomerce.py:222-229 image→entities branch; the doc text
    stands in for the image summary, distinct words for the extracted
    entity set, as in a11_entity_union).  Output: per classification,
    the gated doc count and the number of distinct entities the gate
    let through (0 for UNRENDERED/LOGO — the whole point of the gate)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select("doc_id", "text", _classification_col().alias("classification"))
    n_docs = base.groupBy("classification").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    ents = (
        base.filter(F.col("classification") == "DETAILED")
        .select(
            "classification", F.explode(F.split(F.col("text"), " ")).alias("entity")
        )
        .filter(F.col("entity") != "")
        .groupBy("classification")
        .agg(F.countDistinct("entity").cast("long").alias("n_entities"))
    )
    return (
        n_docs.join(ents, "classification", "left")
        .select(
            "classification",
            "n_docs",
            F.coalesce(F.col("n_entities"), F.lit(0).cast("long")).alias(
                "n_entities"
            ),
        )
        .orderBy("classification")
    )


# -------------------------------------------------------- MIME sniffing
#: magic-byte prefixes (hex) → MIME type, the content-sniffing table a
#: media ingest runs BEFORE any decoder is trusted with the bytes (the
#: reference trusts the URL suffix instead — media_downloader.py:9-63
#: saves whatever arrives as .jpg): the wire lies about content types,
#: magic bytes do not.
MAGIC_TABLE = [
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("474946383961", "image/gif"),
    ("52494646", "audio/x-riff"),
    ("25504446", "application/pdf"),
    ("504B0304", "application/zip"),
    ("3C21444F43", "text/html"),
]


def sniff_mime_col(payload: str = "payload") -> str:
    """SQL expression: MIME type of a BINARY payload column by magic
    bytes — longest-prefix-first CASE over hex(substring(payload)),
    octet-stream fallback.  Row-local codegen; the gate a multimodal
    pipeline applies before routing bytes to a decoder."""
    arms = "\n".join(
        f"WHEN substr(hex(substring({payload}, 1, 8)), 1, {len(h)})"
        f" = '{h}' THEN '{m}'"
        for h, m in MAGIC_TABLE
    )
    return f"CASE {arms} ELSE 'application/octet-stream' END"


def mime_sniff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus media-type census over synthesized binary payloads
    (magic family = doc_id % 8 — one family deliberately junk so the
    octet-stream fallback is exercised; body = md5-derived bytes):
    per sniffed MIME type, count + total payload bytes.  The payload
    is a REAL binary column on the Spark side; the twin computes the
    identical answer in hex-string space."""
    magics = [h for h, _ in MAGIC_TABLE] + ["00DEAD"]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = (
        "unhex(concat(element_at(array("
        + ", ".join(f"'{h}'" for h in magics)
        + "), cast(doc_id % 8 + 1 as int)), md5(text)))"
    )
    return (
        docs.selectExpr(f"{payload} AS payload")
        .selectExpr(
            f"{sniff_mime_col()} AS mime",
            "cast(octet_length(payload) as bigint) AS nbytes",
        )
        .groupBy("mime")
        .agg(
            F.count("*").cast("long").alias("n_payloads"),
            F.sum("nbytes").cast("long").alias("total_bytes"),
        )
        .orderBy("mime")
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
    "mm_dataurl_decode": """
        WITH du AS (
          SELECT doc_id,
                 'data:' ||
                 CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                      WHEN doc_id % 3 = 1 THEN 'image/jpeg'
                      ELSE 'video/mp4' END ||
                 ';base64,' || to_base64(unhex(md5(text))) AS data_url
          FROM documents
        )
        SELECT doc_id,
               split_part(split_part(split_part(data_url, ',', 1), ':', 2), ';', 1) AS mime_type,
               split_part(split_part(split_part(split_part(data_url, ',', 1), ':', 2), ';', 1), '/', 2) AS extension,
               CAST(octet_length(from_base64(split_part(data_url, ',', 2))) AS BIGINT) AS n_bytes,
               hex(from_base64(split_part(data_url, ',', 2))) AS payload_hex
        FROM du ORDER BY doc_id
    """,
    "mm_image_gate_entities": """
        WITH base AS (
          SELECT doc_id, text,
                 CASE WHEN (64 + CAST(concat('0x', substr(md5(text), 1, 2)) AS INT))
                         * (64 + CAST(concat('0x', substr(md5(text), 3, 2)) AS INT))
                         < 16384 THEN 'UNRENDERED'
                      WHEN 1 + CAST(concat('0x', substr(md5(text), 5, 2)) AS INT) % 3 = 1
                        THEN 'LOGO'
                      ELSE 'DETAILED' END AS classification
          FROM documents
        ),
        n_docs AS (
          SELECT classification, CAST(count(*) AS BIGINT) AS n_docs
          FROM base GROUP BY classification
        ),
        ents AS (
          SELECT classification,
                 CAST(count(DISTINCT entity) AS BIGINT) AS n_entities
          FROM (
            SELECT classification, unnest(string_split(text, ' ')) AS entity
            FROM base WHERE classification = 'DETAILED'
          ) WHERE entity <> ''
          GROUP BY classification
        )
        SELECT d.classification, d.n_docs,
               coalesce(e.n_entities, CAST(0 AS BIGINT)) AS n_entities
        FROM n_docs d LEFT JOIN ents e ON d.classification = e.classification
        ORDER BY d.classification
    """,
}


# stub transcript twin: payload byte j+1 is md5-hex pair j+1 of the
# doc text, and word j indexes the vocabulary by that byte % 16 — i.e.
# by the LOW NIBBLE, hex char 2j+4
ORACLE_SQL["mm_transcribe_stub"] = (
    "WITH t AS (SELECT doc_id, concat_ws(' ', "
    + ", ".join(
        "list_value("
        + ", ".join(f"'{w}'" for w in _TRANSCRIPT_VOCAB)
        + f")[CAST(concat('0x', substr(md5(text), {2 * j + 4}, 1)) AS INT) + 1]"
        for j in range(_TRANSCRIPT_WORDS)
    )
    + ") AS transcript FROM documents) "
    "SELECT doc_id, transcript, "
    "CAST(strlen(transcript) AS BIGINT) AS n_chars FROM t ORDER BY doc_id"
)


ORACLE_SQL["mime_sniff_summary"] = """
    WITH hexed AS (
      SELECT (list_value('89504E47', 'FFD8FF', '474946383961', '52494646', '25504446', '504B0304', '3C21444F43', '00DEAD')[CAST(doc_id % 8 + 1 AS INT)]) || upper(md5(text))
               AS h
      FROM documents
    ),
    sniffed AS (
      SELECT CASE
             WHEN substr(h, 1, 8) = '89504E47' THEN 'image/png'
             WHEN substr(h, 1, 6) = 'FFD8FF' THEN 'image/jpeg'
             WHEN substr(h, 1, 12) = '474946383961' THEN 'image/gif'
             WHEN substr(h, 1, 8) = '52494646' THEN 'audio/x-riff'
             WHEN substr(h, 1, 8) = '25504446' THEN 'application/pdf'
             WHEN substr(h, 1, 8) = '504B0304' THEN 'application/zip'
             WHEN substr(h, 1, 10) = '3C21444F43' THEN 'text/html'
             ELSE 'application/octet-stream' END AS mime,
             CAST(strlen(h) // 2 AS BIGINT) AS nbytes
      FROM hexed
    )
    SELECT mime, CAST(count(*) AS BIGINT) AS n_payloads,
           CAST(sum(nbytes) AS BIGINT) AS total_bytes
    FROM sniffed GROUP BY mime ORDER BY mime
"""

QUERIES = {
    "mime_sniff_summary": mime_sniff_summary,
    "mm_decode_stub": mm_decode_stub,
    "mm_transcribe_stub": mm_transcribe_stub,
    "mm_frame_sample": mm_frame_sample,
    "mm_dataurl_decode": mm_dataurl_decode,
    "mm_image_gate_entities": mm_image_gate_entities,
}
