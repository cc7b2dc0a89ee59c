"""Structured Streaming surface.

The reference is batch-only (SURVEY §2.9); its closest analogue is the
sequential ingest loop (IngestFiles.java:257-280), which our frontier round
loop already re-expresses as deterministic micro-batches. This module adds
the genuinely streaming operators a crawl/training pipeline needs when the
input is an unbounded feed:

- ``hourly_counts_stream``: file-source micro-batches → event-time window
  aggregation with a watermark for late data;
- ``sessionize_stream``: custom stateful operator via
  ``applyInPandasWithState`` (30-min inactivity sessionization — the
  streaming twin of queries.events_sessions);
- ``ingest_documents_stream``: documents feed → canonicalize → append to a
  sorted-key table, i.e. the streaming version of the crawl ingest edge.

All entry points take explicit schemas (file streams cannot infer) and run
with ``trigger(availableNow=True)`` in tests so results are deterministic
and comparable against the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

DOCS_SCHEMA = "doc_id string, url string, crawl_date string, mime_type string"


def read_events_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def hourly_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Event-time hourly counts per type; the watermark bounds state and
    admits late rows up to the delay (append output emits only finalized
    windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "value_cents")
    )


SESSION_STATE_SCHEMA = "last_ts long, n_events long, n_sessions long"
SESSION_OUT_SCHEMA = "user_id long, n_sessions long, n_events long"
GAP_US = 1_800_000_000  # 30 min


def _sessionize(key, pdfs, state):
    """applyInPandasWithState handler: per-user running (last_ts, events,
    sessions) with a 30-min inactivity gap."""
    import pandas as pd  # noqa: PLC0415

    if state.exists:
        last_ts, n_events, n_sessions = state.get
    else:
        last_ts, n_events, n_sessions = None, 0, 0
    ts_all = []
    for pdf in pdfs:
        ts_all.append(pd.to_datetime(pdf["ts"]).astype("int64") // 1000)  # µs
    if ts_all:
        ts = pd.concat(ts_all).sort_values()
        for t in ts:
            if last_ts is None or t - last_ts > GAP_US:
                n_sessions += 1
            last_ts = int(t)
            n_events += 1
    state.update((last_ts, n_events, n_sessions))
    yield pd.DataFrame({"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]})


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    session counts with 30-min inactivity gap, update-mode output."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def ingest_documents_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming crawl-ingest edge: canonicalize incoming documents and key
    them for the sorted Iceberg-style table (url_key, url_hash appended)."""
    from warcbase_spark.frontier.crawl import canonicalize_candidates

    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)
    return canonicalize_candidates(docs, "url")


def run_available_now(stream_df: DataFrame, checkpoint: str, query_name: str):
    """Drain all available input into an in-memory table (deterministic
    batch-equivalent run of the streaming plan)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update" if query_name.startswith("sess") else "append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
