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
