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


def test_real_decode_is_gated(spark):
    with pytest.raises(NotImplementedError):
        next(multimodal.real_decode(iter([])))


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
        jobs.sessionize_stream(stream), spark, output_mode="update"
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
