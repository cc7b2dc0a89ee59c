"""Structured Streaming tests: the streaming plans must reproduce their
batch twins on the same (drained) input."""

import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from warcbase_spark.streaming.events_stream import (
    hourly_counts_stream,
    ingest_documents_stream,
    read_events_stream,
    run_available_now,
    sessionize_stream,
)

SRC = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture()
def events_dir(tmp_path):
    # split the batch table into two "arriving" files
    t = pq.read_table(SRC)
    half = t.num_rows // 2
    d = tmp_path / "events_in"
    d.mkdir()
    pq.write_table(t.slice(0, half), str(d / "part-0.parquet"))
    pq.write_table(t.slice(half), str(d / "part-1.parquet"))
    yield str(d)
    shutil.rmtree(str(d), ignore_errors=True)


def test_hourly_counts_stream_matches_batch(spark, events_dir, tmp_path):
    stream = hourly_counts_stream(read_events_stream(spark, events_dir), watermark="0 seconds")
    q = run_available_now(stream, str(tmp_path / "ck1"), "hourly")
    q.awaitTermination(300)
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["value_cents"])
        for r in spark.sql("SELECT * FROM hourly").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("v"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "v")
    )
    want = {(r["hour"], r["event_type"]): (r["n"], r["v"]) for r in batch.collect()}
    # append mode + availableNow emits only watermark-closed windows; with a
    # 0s watermark all but the last window close. Every emitted window must
    # match the batch result exactly, and most windows must have been emitted.
    assert got
    for k, v in got.items():
        assert want[k] == v, k
    assert len(got) >= len(want) - 2


def test_sessionize_stream_matches_batch_sessionization(spark, events_dir, tmp_path):
    stream = sessionize_stream(read_events_stream(spark, events_dir))
    q = run_available_now(stream, str(tmp_path / "ck2"), "sess")
    q.awaitTermination(300)
    # update mode: last row per user wins (memory sink keeps all updates;
    # take the max n_events per user = final state)
    rows = spark.sql(
        "SELECT user_id, max_by(n_sessions, n_events) AS s, max(n_events) AS e "
        "FROM sess GROUP BY user_id"
    ).collect()
    got = {r["user_id"]: (r["s"], r["e"]) for r in rows}

    from pyspark.sql import Window

    e = spark.read.parquet(events_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    gap = micros(F.col("ts")) - micros(F.lag(F.col("ts")).over(w))
    batch = (
        e.withColumn("new_s", F.when(F.lag("ts").over(w).isNull() | (gap > 1_800_000_000), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("s"), F.count(F.lit(1)).alias("e"))
    )
    want = {r["user_id"]: (r["s"], r["e"]) for r in batch.collect()}
    assert got == want


def test_ingest_documents_stream_canonicalizes(spark, tmp_path, corpus_dir):
    import pyarrow.parquet as pq2

    t = pq2.read_table(f"{corpus_dir}/documents.parquet", columns=["doc_id", "url", "crawl_date", "mime_type"])
    d = tmp_path / "docs_in"
    d.mkdir()
    pq2.write_table(t.slice(0, 100), str(d / "p0.parquet"))
    stream = ingest_documents_stream(spark, str(d))
    q = run_available_now(stream, str(tmp_path / "ck3"), "ingest")
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM ingest").collect()
    assert len(rows) == 100
    from warcbase_spark.functions.urls import url_to_key

    for r in rows[:20]:
        assert r["url_key"] == url_to_key(r["url"])
