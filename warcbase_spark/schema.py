"""Schema definitions for the engine's tables.

The primary input shape is fixed by the spec's ``input_hint``: an
Iceberg/Parquet table of interleaved text + media documents,

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

plus companion columns mirroring the reference's ArchiveRecord model
(reference: warcbase-core/.../spark/archive/io/ArchiveRecord.scala:3-19).
The per-row invariant every content-preserving transform must uphold is
span-sequence equality on ``(kind, text, media_ref, offset-order)``.
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'text' | 'link' | 'media'
        T.StructField("text", T.StringType(), True),  # visible/anchor text; null for media
        T.StructField("media_ref", T.StringType(), True),  # target url for link/media; null for text
        T.StructField("offset", T.IntegerType(), False),  # strictly increasing document order
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),  # ArchiveRecord.getUrl
        T.StructField("crawl_date", T.StringType(), True),  # YYYYMMDD, reference keeps dates as strings
        T.StructField("mime_type", T.StringType(), True),  # ArchiveRecord.getMimeType
        T.StructField("domain", T.StringType(), True),  # ArchiveRecord.getDomain
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
        # opaque multimodal payload (image/audio/video bytes); metadata typed separately
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("payload_meta", T.StructType(
            [
                T.StructField("media_type", T.StringType(), True),
                T.StructField("width", T.IntegerType(), True),
                T.StructField("height", T.IntegerType(), True),
                T.StructField("duration_ms", T.IntegerType(), True),
            ]
        ), True),
    ]
)

SEEDS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),  # raw, un-canonicalized
        T.StructField("priority", T.IntegerType(), False),
    ]
)

POLITENESS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),  # '*' row = default budget
        T.StructField("budget", T.IntegerType(), False),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("path_prefix", T.StringType(), False),
    ]
)

# Frontier state tables (checkpointed per round)
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url_key", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("discovered_round", T.IntegerType(), False),
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_key", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("first_round", T.IntegerType(), False),
    ]
)

SCHEDULE_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("seq", T.IntegerType(), False),  # deterministic global position in round
        T.StructField("url_key", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("records", T.LongType(), False),
        T.StructField("html_pages", T.LongType(), False),
        T.StructField("links", T.LongType(), False),
        T.StructField("dedup_hits", T.LongType(), False),
        T.StructField("bloom_hits", T.LongType(), False),
        T.StructField("scheduled", T.LongType(), False),
        T.StructField("spilled", T.LongType(), False),
        T.StructField("robots_blocked", T.LongType(), False),
        T.StructField("invalid_urls", T.LongType(), False),
    ]
)
