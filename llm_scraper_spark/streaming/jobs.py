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

import atexit
import os
import shutil
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


#: one symlink dir per distinct sf_dir for the process lifetime —
#: repeated drains reuse it instead of leaking a temp dir per call
_STREAM_DIRS: dict[str, str] = {}


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the file source requires a directory; expose the events parquet
    # file through a (cached, session-lifetime) dir of symlinks
    # (testdata is read-only)
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    stream_dir = _STREAM_DIRS.get(src)
    if stream_dir is None or not os.path.isdir(stream_dir):
        stream_dir = tempfile.mkdtemp(prefix="events_stream_")
        # best-effort removal at interpreter exit so repeated bench /
        # gate processes don't accumulate symlink dirs on the host
        atexit.register(shutil.rmtree, stream_dir, ignore_errors=True)
        os.symlink(src, os.path.join(stream_dir, "events.parquet"))
        _STREAM_DIRS[src] = stream_dir
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(stream_dir)
    )


def _clamped_session(spark: SparkSession, state_partitions: int = 8) -> SparkSession:
    """An isolated session (shared SparkContext, own SQLConf) with the
    shuffle/state partition count clamped for a stream drain.

    Stateful streaming ops create one state-store instance (RocksDB/
    HDFS dir + a python worker for applyInPandasWithState) PER shuffle
    partition PER micro-batch — fixed cost that dwarfs the work when
    the key space is small (measured 11.6 s → 1.6 s at 32 → 8
    partitions on the sf0.01 events table).  Clamping a CLONE instead
    of the caller's session means a concurrent query planned during
    the drain keeps its full shuffle width — mutating the shared conf
    here used to silently narrow it.  A production deployment sizes
    this to active-key cardinality / executor count."""
    clone = spark.newSession()
    prev = int(clone.conf.get("spark.sql.shuffle.partitions"))
    clone.conf.set(
        "spark.sql.shuffle.partitions", str(min(prev, state_partitions))
    )
    return clone


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


SESSION_GAP_HOURS = 6

_SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)
# carry-over across micro-batches: tail of the last (still-open) session
_SESSION_STATE = T.StructType(
    [
        T.StructField("last_ts", T.LongType()),       # epoch micros
        T.StructField("session_id", T.LongType()),
        T.StructField("session_start", T.LongType()),  # epoch micros
        T.StructField("n_events", T.LongType()),
    ]
)


def _sessionize_fn(key, pdf_iter, state):
    """applyInPandasWithState kernel: per-user gap sessionization.

    Emits every session touched by this batch (update semantics: an
    open session is re-emitted extended in later batches; downstream
    keeps the latest row per (user_id, session_id)).  With an
    AvailableNow single-batch drain this yields the exact full
    sessionization — the oracle twin is the classic gaps-and-islands
    SQL.  Counts/timestamps only in the output, so the cross-engine
    compare is value-exact."""
    import pandas as pd

    (user_id,) = key
    gap_us = SESSION_GAP_HOURS * 3600 * 1_000_000
    batch = pd.concat(list(pdf_iter))
    if batch.empty:
        return
    # normalize to epoch micros regardless of the Arrow batch's
    # datetime unit (ns under pandas<2 semantics, us under pandas 2)
    ts_ns = batch["ts"].values.astype("datetime64[ns]").astype("int64")
    ts_us = pd.Series(ts_ns // 1000).sort_values().reset_index(drop=True)

    if state.exists:
        last_ts, sess_id, sess_start, n_events = state.get
        # late-data policy: an event older than the state's last seen
        # timestamp would rewind last_ts and falsely split/merge
        # sessions; drop strictly-late events (the stateful analog of a
        # watermark — equal timestamps still fold into the open session)
        ts_us = ts_us[ts_us >= last_ts]
        if ts_us.empty:
            return
    else:
        last_ts, sess_id, sess_start, n_events = None, 0, None, 0

    out_rows = []
    for t in ts_us:
        if last_ts is None or t - last_ts > gap_us:
            if sess_start is not None:
                out_rows.append((sess_id, sess_start, last_ts, n_events))
            sess_id += 1
            sess_start, n_events = t, 0
        n_events += 1
        last_ts = t
    out_rows.append((sess_id, sess_start, last_ts, n_events))  # open tail
    state.update((int(last_ts), int(sess_id), int(sess_start), int(n_events)))

    yield pd.DataFrame(
        {
            "user_id": [int(user_id)] * len(out_rows),
            "session_id": [r[0] for r in out_rows],
            "session_start": pd.to_datetime([r[1] for r in out_rows], unit="us"),
            "session_end": pd.to_datetime([r[2] for r in out_rows], unit="us"),
            "n_events": [r[3] for r in out_rows],
        }
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    sessionization with a 6-hour inactivity gap — the streaming form
    of the reference's per-host 'session' of paginated fetches
    (extract_product_urls.py:121-133 pagination loop with sleeps).
    Arrow-batched per group; state is the open-session tail only, so
    memory is O(active users), not O(events)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessionize_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    s2 = _clamped_session(spark)
    return _drain_to_memory(
        sessionize_stream(_events_stream(s2, sf_dir)),
        output_mode="update",
    ).orderBy("user_id", "session_id")


def _drain_to_memory(
    df: DataFrame,
    output_mode: str = "complete",
) -> DataFrame:
    """AvailableNow drain into a memory sink — runs in whatever session
    ``df`` was built against (the run_* wrappers build their streams on
    a `_clamped_session` clone, so the drain never mutates the caller's
    conf), and reads the sink table back from that same session."""
    sess = df.sparkSession
    name = "mem_" + uuid.uuid4().hex[:12]
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sess.table(name)


def run_windowed_counts_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    s2 = _clamped_session(spark)
    return _drain_to_memory(
        windowed_counts_stream(_events_stream(s2, sf_dir))
    ).orderBy("window_start", "event_type")


def run_stateful_dedup_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    s2 = _clamped_session(spark)
    return _drain_to_memory(
        stateful_dedup_stream(_events_stream(s2, sf_dir))
    ).orderBy("event_type")


# ------------------------------------------------------ token bucket
_RATE_OUT = T.StructType(
    [
        T.StructField("host", T.LongType()),
        T.StructField("slot", T.LongType()),
        T.StructField("arrivals", T.LongType()),
        T.StructField("admitted", T.LongType()),
        T.StructField("dropped", T.LongType()),
        T.StructField("tokens_after", T.LongType()),
    ]
)
#: carry across micro-batches: (tokens left, last folded slot)
_RATE_STATE = T.StructType(
    [
        T.StructField("tokens", T.LongType()),
        T.StructField("last_slot", T.LongType()),
    ]
)


def _rate_limit_fn(key, pdf_iter, state):
    """applyInPandasWithState kernel: the per-host token-bucket fold of
    operators/crawlsched.token_bucket_fold, with the bucket level and
    last slot carried across micro-batches.  Late-data policy mirrors
    the sessionize kernel: a slot ≤ the state's last folded slot would
    rewind the bucket, so strictly-late slots drop (slot-granularity
    watermark).  A single-batch AvailableNow drain therefore equals
    the batch fold exactly — which is what the driver gate compares
    against the recursive-CTE oracle."""
    import pandas as pd

    from llm_scraper_spark.operators.crawlsched import (
        TB_CAP,
        TB_REFILL,
        TB_SLOT_S,
    )

    (host,) = key
    batch = pd.concat(list(pdf_iter))
    if batch.empty:
        return
    ts_ns = batch["ts"].values.astype("datetime64[ns]").astype("int64")
    slots = pd.Series(ts_ns // (TB_SLOT_S * 1_000_000_000))
    counts = slots.value_counts().sort_index()

    if state.exists:
        tokens, last_slot = state.get
        counts = counts[counts.index > last_slot]
        if counts.empty:
            return
    else:
        tokens, last_slot = TB_CAP, None

    rows = []
    for slot, arr in counts.items():
        if last_slot is not None:
            tokens = min(TB_CAP, tokens + (slot - last_slot) * TB_REFILL)
        adm = min(int(arr), tokens)
        tokens -= adm
        rows.append((host, int(slot), int(arr), adm, int(arr) - adm, tokens))
        last_slot = slot
    state.update((int(tokens), int(last_slot)))
    yield pd.DataFrame(
        rows,
        columns=[
            "host", "slot", "arrivals", "admitted", "dropped",
            "tokens_after",
        ],
    )


def rate_limit_stream(events: DataFrame) -> DataFrame:
    """Streaming per-host token-bucket admission — the live form of
    the crawl politeness ledger (crawlsched.rate_limit_admission):
    state is two longs per host, O(active hosts) total."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from llm_scraper_spark.operators.crawlsched import N_SITES

    keyed = events.selectExpr(f"user_id % {N_SITES} AS host", "ts")
    return keyed.groupBy("host").applyInPandasWithState(
        _rate_limit_fn,
        outputStructType=_RATE_OUT,
        stateStructType=_RATE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_rate_limit_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    s2 = _clamped_session(spark)
    return _drain_to_memory(
        rate_limit_stream(_events_stream(s2, sf_dir)),
        output_mode="append",
    ).orderBy("host", "slot")


def view_purchase_join_stream(events: DataFrame) -> DataFrame:
    """Stream-stream inner join with a time-range condition: each
    purchase matches the same user's views in the preceding 2 hours.
    Both sides carry a 2-hour watermark, which is what BOUNDS the join
    state (views older than the watermark can never match a future
    purchase and are evicted) — the piece a batch self-join doesn't
    need but an unbounded stream cannot run without.  Inner-join rows
    emit as soon as they match (append mode), so an AvailableNow drain
    surfaces every pair; the per-purchase rollup runs as a batch agg
    over the drained sink."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("buy_ts"), F.col("event_id").alias("buy_id"))
        .withWatermark("buy_ts", "2 hours")
    )
    return purchases.join(
        views,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("view_ts") >= F.col("buy_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("view_ts") <= F.col("buy_ts")),
        "inner",
    ).select("user_id", "buy_id", "buy_ts", "view_id")


def run_view_purchase_join_available_now(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    s2 = _clamped_session(spark)
    pairs = _drain_to_memory(
        view_purchase_join_stream(_events_stream(s2, sf_dir)),
        output_mode="append",
    )
    return (
        pairs.groupBy("user_id", "buy_id")
        .agg(F.count("*").cast("long").alias("n_views_2h"))
        .orderBy("user_id", "buy_id")
    )


ORACLE_SQL = {
    "stream_view_purchase_join": """
        SELECT p.user_id AS user_id, p.event_id AS buy_id,
               CAST(count(*) AS BIGINT) AS n_views_2h
        FROM events p JOIN events v
          ON v.user_id = p.user_id AND v.event_type = 'view'
         AND v.ts >= p.ts - INTERVAL 2 HOUR AND v.ts <= p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY 1, 2 ORDER BY user_id, buy_id
    """,
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
    "stream_sessionize": """
        WITH ordered AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 6 HOUR
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), numbered AS (
          SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM ordered
        )
        SELECT user_id,
               CAST(session_id AS BIGINT) AS session_id,
               min(ts) AS session_start,
               max(ts) AS session_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM numbered GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
}

from llm_scraper_spark.operators import crawlsched as _crawlsched

#: the streaming drain must equal the batch fold, so the oracle IS the
#: batch operator's recursive-CTE twin — one recurrence, three forms
#: (pandas stream kernel, applyInPandas batch fold, SQL recursion)
ORACLE_SQL["stream_rate_limit"] = _crawlsched.ORACLE_SQL["rate_limit_admission"]

QUERIES = {
    "stream_rate_limit": run_rate_limit_available_now,
    "stream_view_purchase_join": run_view_purchase_join_available_now,
    "stream_windowed_counts": run_windowed_counts_available_now,
    "stream_stateful_dedup": run_stateful_dedup_available_now,
    "stream_sessionize": run_sessionize_available_now,
}
