"""Span extraction — the engine's replacement for HTML parsing.

The reference parses HTML at query time with Jsoup
(ExtractLinks.scala:37-61, ExtractImageLinks.scala:36-54, RemoveHTML.scala).
Our input table pre-materializes document structure as interleaved spans
(kind ∈ {text, link, media}), so extraction is a pure Column pipeline:
``explode`` + filter on ``kind`` — no parser, no Python, full
WholeStageCodegen, and the filter on kind prunes before the shuffle.

Corpora that arrive as RAW HTML enter through ``spans_from_html`` (an
Arrow-vectorized parse — functions/htmlparse.py — run ONCE at ingest);
every downstream operator then stays on the parsed-span fast path instead
of re-parsing HTML per query the way the reference does.

Per-row invariant: ``spans`` ordered by ``offset`` carries the exact
(kind, text, media_ref, order) sequence of the source document; these
operators only project/filter it, never reorder it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spans_from_html(
    docs: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Raw-HTML ingestion: parse ``html_col`` into the interleaved span
    model (relative refs resolved against ``url_col``), drop the raw HTML.
    One Arrow UDF pass at ingest — the write side of the Iceberg/Parquet
    documents table; everything downstream is Column-only."""
    from warcbase_spark.functions.htmlparse import html_to_spans_udf

    return docs.withColumn(
        "spans", html_to_spans_udf(F.col(url_col), F.col(html_col))
    ).drop(html_col)


def exploded_spans(docs: DataFrame, kinds: list[str] | None = None) -> DataFrame:
    """One row per span, document columns retained. Column-prunable: ask for
    specific doc columns *before* calling at scale."""
    df = docs.select(
        "doc_id", "url", "crawl_date", "mime_type", "domain", F.explode("spans").alias("span")
    )
    if kinds:
        df = df.filter(F.col("span.kind").isin(kinds))
    return df.select(
        "doc_id",
        "url",
        "crawl_date",
        "mime_type",
        "domain",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def extract_links(docs: DataFrame) -> DataFrame:
    """(src_url, dst_url, anchor) triples in document order — the reference's
    ExtractLinks tuple shape (ExtractLinks.scala:37-61). Duplicates retained
    (anchor-text analytics needs them, InvertAnchorText.java:88-90);
    the scheduler dedups separately."""
    return exploded_spans(docs, ["link"]).select(
        F.col("url").alias("src_url"),
        F.col("media_ref").alias("dst_url"),
        F.col("text").alias("anchor"),
        "crawl_date",
        "doc_id",
        "offset",
    )


def extract_image_links(docs: DataFrame) -> DataFrame:
    """(src_url, image_url) — reference ExtractImageLinks.scala:36-54."""
    return exploded_spans(docs, ["media"]).select(
        F.col("url").alias("src_url"),
        F.col("media_ref").alias("image_url"),
        "doc_id",
        "offset",
    )


def visible_text(docs: DataFrame) -> DataFrame:
    """Document visible text: concat of text spans in offset order —
    reference RemoveHTML.scala:23-31 (newlines → single spaces).
    array_sort on (offset) then array_join: no shuffle, per-row only."""
    return docs.select(
        "doc_id",
        "url",
        "crawl_date",
        "domain",
        F.array_join(
            F.transform(
                F.array_sort(
                    F.filter("spans", lambda s: s.getField("kind") == "text"),
                    lambda a, b: a.getField("offset") - b.getField("offset"),
                ),
                lambda s: s.getField("text"),
            ),
            " ",
        ).alias("text"),
    )


def span_signature(docs: DataFrame) -> DataFrame:
    """Canonical per-row span-sequence signature for invariant checks:
    md5 over the ordered (kind, text, media_ref) triples."""
    ordered = F.array_sort(
        F.col("spans"), lambda a, b: a.getField("offset") - b.getField("offset")
    )
    sig = F.md5(
        F.array_join(
            F.transform(
                ordered,
                lambda s: F.concat_ws(
                    "\x1f",
                    s.getField("kind"),
                    F.coalesce(s.getField("text"), F.lit("\x00")),
                    F.coalesce(s.getField("media_ref"), F.lit("\x00")),
                ),
            ),
            "\x1e",
        )
    )
    return docs.select("doc_id", sig.alias("span_sig"))
