"""Structured Streaming + multimodal plumbing vs DuckDB oracles."""

import pytest

from llm_scraper_spark.operators import multimodal
from llm_scraper_spark.streaming import jobs
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(jobs.QUERIES))
def test_streaming_matches_oracle(spark, name):
    assert_matches(jobs.QUERIES[name](spark, SF_DIR), jobs.ORACLE_SQL[name], SF_DIR, name)


@pytest.mark.parametrize("name", sorted(multimodal.QUERIES))
def test_multimodal_matches_oracle(spark, name):
    assert_matches(
        multimodal.QUERIES[name](spark, SF_DIR),
        multimodal.ORACLE_SQL[name],
        SF_DIR,
        name,
    )


def _png(w: int, h: int, rgb=(10, 20, 30)) -> bytes:
    """A complete, valid RGB PNG built with stdlib zlib only."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(rgb) * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _bmp(w: int, h: int) -> bytes:
    """A complete 24-bit BMP."""
    import struct

    row = (b"\x7f\x7f\x7f" * w + b"\x00" * 3)[: (w * 3 + 3) // 4 * 4]
    pixels = row * h
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
        + pixels
    )


def _ppm(w: int, h: int) -> bytes:
    return f"P6\n{w} {h}\n255\n".encode() + b"\x01\x02\x03" * (w * h)


def test_real_decode_end_to_end(spark):
    """`decode_media` (real kernel) must extract true dimensions and
    channel counts from genuine PNG/BMP/PPM bytes through the full
    mapInPandas pipeline — no image library required."""
    rows = [(1, _png(5, 7), "image"), (2, _bmp(9, 4), "image"), (3, _ppm(2, 3), "image")]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_kind string"
    )
    got = {
        r["doc_id"]: (r["width"], r["height"], r["channels"])
        for r in multimodal.decode_media(df).collect()
    }
    assert got == {1: (5, 7, 3), 2: (9, 4, 3), 3: (2, 3, 3)}


def test_real_decode_rejects_non_image_bytes(spark):
    df = spark.createDataFrame(
        [(1, b"\x00\x01\x02\x03not-an-image", "image")],
        "doc_id long, payload binary, media_kind string",
    )
    with pytest.raises(Exception, match="unsupported media format"):
        multimodal.decode_media(df).collect()


@pytest.mark.parametrize(
    "payload",
    [
        # valid PNG magic but first chunk is not IHDR: fixed-offset
        # reads would return garbage dims — must reject instead
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rsRGB" + b"\x00" * 13,
        # truncated PNG: magic only
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00",
        # BITMAPCOREHEADER BMP (DIB size 12): dims live at other
        # offsets/widths than the INFOHEADER parser reads
        b"BM" + (134).to_bytes(4, "little") + b"\x00" * 4
        + (26).to_bytes(4, "little") + (12).to_bytes(4, "little")
        + (9).to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + b"\x7f" * 108,  # pixels — the file is well-formed, just a
        # CORE-header variant this parser doesn't speak
    ],
    ids=["png-no-ihdr", "png-truncated", "bmp-coreheader"],
)
def test_header_parser_rejects_malformed(payload):
    """_parse_header must raise, never emit garbage metadata, on
    structurally broken files that pass the magic-bytes check."""
    with pytest.raises(ValueError, match="unsupported media format"):
        multimodal._parse_header(payload)


def test_decode_dispatch(spark):
    """real=False pins the synthetic-corpus stub; default dispatch uses
    the real kernel (PIL path when importable, header parser here)."""
    df = spark.createDataFrame(
        [(1, _png(6, 2), "image")], "doc_id long, payload binary, media_kind string"
    )
    real = multimodal.decode_media(df).collect()[0]
    assert (real["width"], real["height"]) == (6, 2)
    stub = multimodal.decode_media(df, real=False).collect()[0]
    # the stub derives fake dims from payload bytes — byte 0 of a PNG
    # is 0x89, so width = 64 + 137
    assert stub["width"] == 64 + 0x89


def test_image_gate_matches_python_oracle(spark):
    """UNRENDERED/LOGO/DETAILED gate + gated entity union vs a pure-
    Python md5 classifier (image_analysis.py:19-124 decision order)."""
    import hashlib

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    counts: dict[str, int] = {}
    ents: set[str] = set()
    for text in t.column("text").to_pylist():
        h = hashlib.md5(text.encode()).hexdigest()
        w, hg, ch = 64 + int(h[0:2], 16), 64 + int(h[2:4], 16), 1 + int(h[4:6], 16) % 3
        if w * hg < multimodal._UNRENDERED_MAX_PIXELS:
            cls = "UNRENDERED"
        elif ch == 1:
            cls = "LOGO"
        else:
            cls = "DETAILED"
        counts[cls] = counts.get(cls, 0) + 1
        if cls == "DETAILED":
            ents.update(w for w in text.split(" ") if w)
    got = {
        r["classification"]: (r["n_docs"], r["n_entities"])
        for r in multimodal.mm_image_gate_entities(spark, SF_DIR).collect()
    }
    want = {
        c: (n, len(ents) if c == "DETAILED" else 0) for c, n in counts.items()
    }
    assert got == want
    assert "DETAILED" in got and got["DETAILED"][1] > 0
    # the gate actually gates: non-DETAILED classes pass zero entities
    assert all(v[1] == 0 for c, v in got.items() if c != "DETAILED")


def test_view_purchase_join_multibatch_watermark_eviction(spark, tmp_path):
    """Feed the stream-stream join ≥3 file-source micro-batches of
    time-ordered events: the result must equal the batch oracle AND
    the 2-hour watermark must actually EVICT join state as event time
    advances (the piece that bounds state on an unbounded stream —
    reference analog: bounded retry/visited state,
    extract_product_urls.py:12,39-41)."""
    import time
    import uuid

    from pyspark.sql import functions as F

    from tests.oracle_check import _normalize, duck_run

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut1 = lo + (hi - lo) / 3
    cut2 = lo + 2 * (hi - lo) / 3
    src = tmp_path / "vp_src"
    src.mkdir()
    parts = [
        ev.filter(F.col("ts") < cut1),
        ev.filter((F.col("ts") >= cut1) & (F.col("ts") < cut2)),
        ev.filter(F.col("ts") >= cut2),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(str(src / f"b{i}"))
        time.sleep(1.1)  # file source orders batches by modification time
    flat = src / "flat"
    flat.mkdir()
    import os

    for i in range(3):
        for f in sorted((src / f"b{i}").glob("*.parquet")):
            os.link(f, flat / f"{i}_{f.name}")

    stream = (
        spark.readStream.schema(jobs.EVENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(flat))
    )
    name = "vpj_" + uuid.uuid4().hex[:8]
    q = (
        jobs.view_purchase_join_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(progress) >= 3, "expected one micro-batch per input file"
    removed = sum(
        op.get("numRowsRemoved", 0) for p in progress for op in p["stateOperators"]
    )
    final_state = sum(op["numRowsTotal"] for op in progress[-1]["stateOperators"])
    total_in = sum(p["numInputRows"] for p in progress)
    assert removed > 0, "watermark never evicted any join state"
    assert final_state < total_in, "join state grew to the full input"

    got = _normalize(
        spark.table(name)
        .groupBy("user_id", "buy_id")
        .agg(F.count("*").cast("long").alias("n_views_2h"))
        .orderBy("user_id", "buy_id")
        .toPandas()
    )
    want = _normalize(duck_run(jobs.ORACLE_SQL["stream_view_purchase_join"], SF_DIR))
    assert len(got) == len(want)
    assert all(got[c].tolist() == want[c].tolist() for c in got.columns)


def test_sessionize_state_carries_across_batches(spark, tmp_path):
    """Split events at a time boundary into two files, process one file
    per micro-batch: open sessions must carry through state and the
    final (latest-update-per-session) result must equal the
    batch-global oracle."""
    import os
    import time

    from pyspark.sql import functions as F

    from tests.oracle_check import _normalize, duck_run

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = tmp_path / "stream_src"
    src.mkdir()
    ev.filter(F.col("ts") < "2024-01-15").coalesce(1).write.parquet(
        str(src / "batch1")
    )
    time.sleep(1.1)  # file source orders batches by modification time
    ev.filter(F.col("ts") >= "2024-01-15").coalesce(1).write.parquet(
        str(src / "batch2")
    )
    files = sorted(
        str(p) for b in ("batch1", "batch2") for p in (src / b).glob("*.parquet")
    )
    flat = src / "flat"
    flat.mkdir()
    for f in files:
        os.link(f, flat / os.path.basename(f))

    stream = (
        spark.readStream.schema(jobs.EVENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(flat))
    )
    updates = jobs._drain_to_memory(
        jobs.sessionize_stream(stream), output_mode="update"
    )
    assert updates.count() > 0
    # keep the latest update per session (n_events grows monotonically)
    latest = (
        updates.groupBy("user_id", "session_id")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.max("n_events").alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )
    want = _normalize(duck_run(jobs.ORACLE_SQL["stream_sessionize"], SF_DIR))
    got = _normalize(latest.toPandas())
    assert got.equals(want) or (
        len(got) == len(want)
        and all(got[c].tolist() == want[c].tolist() for c in got.columns)
    )


def test_mime_sniff_matches_oracle_and_families(spark):
    from llm_scraper_spark.operators.multimodal import (
        MAGIC_TABLE,
        ORACLE_SQL,
        QUERIES,
    )
    from tests.oracle_check import assert_matches

    sf = "/root/testdata/sf0.001"
    df = QUERIES["mime_sniff_summary"](spark, sf)
    assert_matches(df, ORACLE_SQL["mime_sniff_summary"], sf, "mime_sniff_summary")
    rows = {r["mime"]: r for r in df.collect()}
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    # all 8 planted families (7 magics + the junk fallback) must appear
    # and account for every payload
    assert set(rows) == {m for _, m in MAGIC_TABLE} | {
        "application/octet-stream"
    }
    assert sum(r["n_payloads"] for r in rows.values()) == n_docs
    # magic prefix + 16 md5 bytes: per-mime byte totals are exact
    for (hexmagic, mime) in MAGIC_TABLE:
        r = rows[mime]
        assert r["total_bytes"] == r["n_payloads"] * (len(hexmagic) // 2 + 16)


def test_rate_limit_state_carries_across_batches(spark, tmp_path):
    """Three file-source micro-batches split at time boundaries: the
    bucket level must carry through state so the final appended ledger
    equals the one-shot batch fold (crawlsched.token_bucket_fold) on
    the same events."""
    import os
    import time

    from pyspark.sql import functions as F

    from llm_scraper_spark.operators.crawlsched import (
        N_SITES,
        TB_SLOT_S,
        token_bucket_fold,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    cuts = ("2024-01-10", "2024-01-20")
    parts = [
        ev.filter(F.col("ts") < cuts[0]),
        ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.filter(F.col("ts") >= cuts[1]),
    ]
    src = tmp_path / "rl_src"
    src.mkdir()
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(str(src / f"b{i}"))
        time.sleep(1.1)  # file source orders batches by mtime
    flat = src / "flat"
    flat.mkdir()
    for i in range(3):
        for f in (src / f"b{i}").glob("*.parquet"):
            os.link(f, flat / f"{i}_{f.name}")

    stream = (
        spark.readStream.schema(jobs.EVENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(flat))
    )
    got = jobs._drain_to_memory(
        jobs.rate_limit_stream(stream), output_mode="append"
    )
    expect = token_bucket_fold(
        ev.selectExpr(
            f"user_id % {N_SITES} AS host",
            f"cast(floor(unix_timestamp(ts) / {TB_SLOT_S}) as long) AS slot",
        )
        .groupBy("host", "slot")
        .agg(F.count("*").cast("long").alias("arrivals"))
    )
    g = {(r.host, r.slot): (r.arrivals, r.admitted, r.dropped, r.tokens_after)
         for r in got.collect()}
    e = {(r.host, r.slot): (r.arrivals, r.admitted, r.dropped, r.tokens_after)
         for r in expect.collect()}
    assert g == e
    assert len(g) > 0
