"""Structured Streaming analogs of the reference's streaming-shaped
behaviors (SURVEY.md §2.9).

The reference processes SLURM-array micro-batches with in-memory seen
sets (extract_product_urls.py:12,39-41; batch.py:7); here the same
state discipline runs as real Structured Streaming jobs: file-source
micro-batches, stateful dropDuplicates (the streaming seen-set), and
watermarked tumbling windows (the politeness/crawl-delay analog).

Each job is exposed both as a long-running stream builder and as a
batch-equivalent ``run_*_available_now`` that drains the source with
Trigger.AvailableNow into a memory sink and returns the result
DataFrame — which is what the driver's queries() contract needs, and
also how a backfill over historic parquet would run on a cluster.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the file source requires a directory; expose the events parquet
    # file through a temp dir of symlinks (testdata is read-only)
    stream_dir = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(stream_dir, "events.parquet"),
    )
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(stream_dir)
    )


def windowed_counts_stream(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows with a 1-hour watermark: per-window,
    per-type counts + decimal-exact value sums."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stateful_dedup_stream(events: DataFrame) -> DataFrame:
    """Streaming seen-set: first event per (user_id, event_type) passes;
    downstream counts distinct users per type — the crawl seen-set
    discipline on a stream."""
    return (
        events.dropDuplicates(["user_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def _drain_to_memory(df: DataFrame, spark: SparkSession) -> DataFrame:
    name = "mem_" + uuid.uuid4().hex[:12]
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_windowed_counts_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain_to_memory(
        windowed_counts_stream(_events_stream(spark, sf_dir)), spark
    ).orderBy("window_start", "event_type")


def run_stateful_dedup_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain_to_memory(
        stateful_dedup_stream(_events_stream(spark, sf_dir)), spark
    ).orderBy("event_type")


ORACLE_SQL = {
    "stream_windowed_counts": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    "stream_stateful_dedup": """
        SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type
    """,
}

QUERIES = {
    "stream_windowed_counts": run_windowed_counts_available_now,
    "stream_stateful_dedup": run_stateful_dedup_available_now,
}
