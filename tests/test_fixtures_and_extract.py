"""Golden-count fixture tests + span invariant — models the reference's
fixture assertions (300 ARC records / 664 links, ArcTest.scala:42-71)."""

import json

from pyspark.sql import functions as F

from warcbase_spark.operators import filters
from warcbase_spark.operators.extract import (
    extract_links,
    span_signature,
    visible_text,
)


def test_golden_counts(corpus, corpus_dir, spark):
    with open(f"{corpus_dir}/golden.json") as f:
        golden = json.load(f)
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    assert docs.count() == golden["n_docs"]
    assert docs.filter(F.col("mime_type") == "text/html").count() == golden["html_docs"]
    assert extract_links(docs).count() == golden["total_link_spans"]


def test_span_order_strictly_increasing(spark, corpus_dir):
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    bad = docs.filter(
        ~F.forall(
            F.zip_with(
                F.col("spans"),
                F.slice(F.col("spans"), 2, 1 << 20),
                lambda a, b: b.getField("offset") > a.getField("offset"),
            ),
            lambda x: x,
        )
    )
    assert bad.count() == 0


def test_span_signature_invariant_under_projection(spark, corpus_dir):
    """Content-preserving transforms keep the (kind, text, media_ref, order)
    sequence — the per-row invariant from the input_hint."""
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    before = span_signature(docs)
    # a content-preserving transform: filter + column add/drop
    transformed = docs.withColumn("extra", F.lit(1)).drop("payload")
    after = span_signature(transformed)
    assert before.exceptAll(after).count() == 0
    assert after.exceptAll(before).count() == 0


def test_visible_text_order(spark, corpus, corpus_dir):
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    got = {r["doc_id"]: r["text"] for r in visible_text(docs).collect()}
    for d in corpus.documents[:50]:
        expected = " ".join(s["text"] for s in d["spans"] if s["kind"] == "text")
        assert got[d["doc_id"]] == expected


def test_filter_dsl_partitions(spark, corpus_dir):
    """keep/discard pairs partition the input exactly (ArcTest.scala:57-64
    16/284-style assertion)."""
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    n = docs.count()
    pat = [r"http://hot0\.example\.org/.*"]
    kept = filters.keep_url_patterns(docs, pat).count()
    dropped = filters.discard_url_patterns(docs, pat).count()
    assert kept + dropped == n
    assert kept > 0

    valid = filters.keep_valid_pages(docs)
    assert valid.count() > 0
    assert valid.filter(F.col("url").endswith("robots.txt")).count() == 0

    imgs = filters.keep_images(docs)
    assert imgs.count() == docs.filter(F.col("mime_type").contains("image/")).count()

    d1 = filters.keep_date(docs, "2024").count()
    assert d1 == n  # all fixture dates are 2024
    m = filters.keep_date(docs, "202401").count()
    assert 0 < m < n


def test_mime_sniff_magic_bytes(spark):
    """X12 heuristic: real binary signatures (PNG/JPEG/GIF/PDF/ZIP/gzip),
    html tag sniff, plain fallback — all JVM Column ops."""
    import pytest
    from pyspark.sql import functions as F

    from warcbase_spark.functions.matchbox import detect_mime_magic, detect_mime_tika

    cases = [
        ("png", b"\x89PNG\r\n\x1a\n" + b"rest", "image/png"),
        ("jpg", b"\xff\xd8\xff\xe0\x00\x10JFIF", "image/jpeg"),
        ("gif", b"GIF89a-data", "image/gif"),
        ("pdf", b"%PDF-1.7 blah", "application/pdf"),
        ("zip", b"PK\x03\x04abc", "application/zip"),
        ("gz", b"\x1f\x8b\x08rest", "application/gzip"),
        ("html", b"  <!DOCTYPE html><html>", "text/html"),
        ("html2", b"<HTML><body>x</body>", "text/html"),
        ("txt", b"just words here", "text/plain"),
        ("bmp", b"BM\x9e\x01\x00\x00", "image/bmp"),
        ("ico", b"\x00\x00\x01\x00\x02\x00", "image/x-icon"),
        ("tiff_le", b"II*\x00rest", "image/tiff"),
        ("tiff_be", b"MM\x00*rest", "image/tiff"),
        ("webp", b"RIFF\x10\x00\x00\x00WEBPVP8 ", "image/webp"),
        ("wav", b"RIFF\x10\x00\x00\x00WAVEfmt ", "audio/x-wav"),
        ("avi", b"RIFF\x10\x00\x00\x00AVI LIST", "video/x-msvideo"),
        ("mp3_id3", b"ID3\x04\x00rest", "audio/mpeg"),
        ("mp3_raw", b"\xff\xfb\x90\x00rest", "audio/mpeg"),
        ("ogg", b"OggS\x00\x02", "application/ogg"),
        ("flac", b"fLaC\x00\x00\x00\x22", "audio/x-flac"),
        ("mp4", b"\x00\x00\x00\x18ftypmp42", "video/mp4"),
        # ftyp box length exactly 0x00000100 is legal MP4 (many compatible
        # brands) and shares ICO's 4-byte prefix — must be mp4, not x-icon
        ("mp4_len100", b"\x00\x00\x01\x00ftypisom" + b"\x00" * 248, "video/mp4"),
        ("webm", b"\x1a\x45\xdf\xa3\x01\x00", "video/webm"),
        ("sevenz", b"7z\xbc\xaf\x27\x1c\x00\x04", "application/x-7z-compressed"),
        # invalid UTF-8, no magic match (BMP/WebP/MP3/truncated payloads are
        # routine in real archives): must FALL BACK, never throw — the
        # decode()-based sniff raised MALFORMED_CHARACTER_CODING here
        ("bad_utf8", b"\xff\xfe\x00\x01\x80\x9f garbage", "text/plain"),
        ("bad_utf8_2", b"\x81\x9f\xc0\xc1\xfe\xff\xf5", "text/plain"),
    ]
    df = spark.createDataFrame(
        [(n, bytearray(b)) for n, b, _ in cases], "name string, payload binary"
    )
    got = {r["name"]: r["mime"] for r in df.select("name", detect_mime_magic(F.col("payload")).alias("mime")).collect()}
    for n, _b, want in cases:
        assert got[n] == want, n

    with pytest.raises(NotImplementedError):
        detect_mime_tika(F.col("payload"))

    plan = df.select(detect_mime_magic(F.col("payload")))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
