"""HTML extraction parity with the reference's jsoup-backed matchbox UDFs.

Vectors lifted from ExtractLinksTest.scala:25-43, ExtractImageLinksTest.
scala:25-41; golden-count roundtrip over the fixtures corpus plays the role
of ArcTest.scala:66-71 (664 links over example.arc.gz)."""

import pytest
from pyspark.sql import functions as F

from warcbase_spark.fixtures import render_spans_html
from warcbase_spark.functions.htmlparse import (
    extract_image_links,
    extract_links,
    html_to_spans,
    remove_html,
)

FRAGMENT = (
    'Here is <a href="http://www.google.com">a search engine</a>.\n'
    'Here is <a href="http://www.twitter.com/">Twitter</a>.\n'
)


def test_extract_links_simple():
    got = extract_links("", FRAGMENT)
    assert len(got) == 2
    assert got[0][1] == "http://www.google.com" and got[0][2] == "a search engine"
    assert got[1][1] == "http://www.twitter.com/" and got[1][2] == "Twitter"


def test_extract_links_relative():
    frag = (
        'Here is <a href="http://www.google.com">a search engine</a>.\n'
        'Here is <a href="page.html">a relative URL</a>.\n'
    )
    got = extract_links("", frag, "http://www.foobar.org/index.html")
    assert len(got) == 2
    assert got[1][1] == "http://www.foobar.org/page.html"
    assert got[1][2] == "a relative URL"
    # no base → relative target unresolvable → dropped (jsoup abs:href == "")
    assert [t for (_s, t, _a) in extract_links("", frag)] == ["http://www.google.com"]


def test_extract_links_null_and_empty():
    assert extract_links(None, FRAGMENT) == []
    assert extract_links("", "") == []


def test_extract_image_links_simple():
    frag = (
        'Image here: <img src="http://foo.bar.com/pic.png"> and another '
        '<img src="http://baz.org/a/b/banner.jpg"/>'
    )
    got = extract_image_links("", frag)
    assert got == ["http://foo.bar.com/pic.png", "http://baz.org/a/b/banner.jpg"]


def test_extract_image_links_relative():
    frag = (
        'Image here: <img src="pic.png"> and another '
        '<img src="http://baz.org/a/b/banner.jpg"/> and <img src="../logo.gif"/>'
    )
    got = extract_image_links("http://foo.bar.com/a/page.html", frag)
    assert got == [
        "http://foo.bar.com/a/pic.png",
        "http://baz.org/a/b/banner.jpg",
        "http://foo.bar.com/logo.gif",
    ]
    # reference appends unconditionally: unresolvable relative → "" kept
    assert extract_image_links("", '<img src="pic.png">') == [""]


def test_remove_html_text_semantics():
    # jsoup .text(): inline adjacency preserved, whitespace collapsed
    assert remove_html(FRAGMENT) == "Here is a search engine. Here is Twitter."
    assert remove_html("<p>a</p><p>b</p>") == "a b"
    assert remove_html("<script>var x = '<p>no</p>';</script>hi") == "hi"
    assert remove_html("<style>.x{}</style>ok") == "ok"
    assert remove_html("A &amp; B &lt;tag&gt;") == "A & B <tag>"
    assert remove_html("") == ""
    assert remove_html(None) is None


def test_html_to_spans_structure():
    frag = (
        "<html><body><p>intro words</p>"
        '<a href="http://a.b/x.html">anchor text</a>'
        '<img src="/pic.png"><p>outro</p></body></html>'
    )
    spans = html_to_spans(frag, base="http://site.example.org/d/1.html")
    assert [s["kind"] for s in spans] == ["text", "link", "media", "text"]
    assert spans[0]["text"] == "intro words"
    assert spans[1] == {"kind": "link", "text": "anchor text",
                        "media_ref": "http://a.b/x.html", "offset": 1}
    assert spans[2]["media_ref"] == "http://site.example.org/pic.png"
    assert [s["offset"] for s in spans] == [0, 1, 2, 3]


def test_nested_anchor_autoclose():
    # jsoup auto-closes an open <a> when a new <a> starts
    frag = '<a href="http://a.b/1">one<a href="http://a.b/2">two</a>'
    got = extract_links("", frag)
    assert [(t, a) for (_s, t, a) in got] == [
        ("http://a.b/1", "one"),
        ("http://a.b/2", "two"),
    ]


def test_corpus_roundtrip_golden(corpus):
    """render→parse roundtrip over the whole fixtures corpus: every doc's
    span sequence must come back exactly (kind, text, media_ref, order) and
    the total link count must match the corpus golden count — the ArcTest
    'assert(links.size == 664)' analogue."""
    total_links = 0
    for d in corpus.documents:
        html = render_spans_html(d["spans"])
        got = html_to_spans(html, base=d["url"])
        want = [
            {"kind": s["kind"] if s["kind"] != "media" else "media",
             "text": s["text"], "media_ref": s["media_ref"], "offset": i}
            for i, s in enumerate(d["spans"])
        ]
        got_cmp = [
            {"kind": "media" if g["kind"] == "media" else g["kind"],
             "text": g["text"], "media_ref": g["media_ref"], "offset": g["offset"]}
            for g in got
        ]
        assert got_cmp == want, d["doc_id"]
        total_links += sum(1 for g in got if g["kind"] == "link")
    assert total_links == corpus.golden["total_link_spans"]


def test_udfs_vectorized_and_correct(spark):
    from warcbase_spark.functions.htmlparse import (
        extract_image_links_udf,
        extract_links_udf,
        remove_html_udf,
    )

    rows = [
        ("http://s.example.org/d/1.html",
         '<p>hello</p><a href="r/2.html">rel</a><img src="/i/1.png">'),
        ("http://s.example.org/d/2.html", None),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = df.select(
        "url",
        extract_links_udf("url", "html").alias("links"),
        extract_image_links_udf("url", "html").alias("imgs"),
        remove_html_udf("html").alias("txt"),
    ).collect()
    r = {row["url"]: row for row in out}
    got = r["http://s.example.org/d/1.html"]
    assert [(x["target"], x["anchor"]) for x in got["links"]] == [
        ("http://s.example.org/d/r/2.html", "rel")
    ]
    assert got["imgs"] == ["http://s.example.org/i/1.png"]
    assert got["txt"] == "hello rel"
    null_row = r["http://s.example.org/d/2.html"]
    assert null_row["links"] is None and null_row["imgs"] is None and null_row["txt"] is None

    plan = df.select(extract_links_udf("url", "html"))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_remove_boilerplate_blocks():
    """X10 heuristic: nav/footer link farms and short chrome drop; article
    paragraphs survive; document order preserved."""
    from warcbase_spark.functions.htmlparse import remove_boilerplate

    page = (
        "<html><body>"
        '<div><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact us</a></div>'
        "<p>This is the first real paragraph of the article with plenty of words in it.</p>"
        "<p>Short chrome.</p>"
        '<p>The second paragraph also carries substantial content and even an '
        '<a href="/ref">inline reference</a> without tipping the link density over.</p>'
        '<div><a href="/tos">Terms</a> <a href="/privacy">Privacy</a></div>'
        "</body></html>"
    )
    got = remove_boilerplate(page)
    assert got == (
        "This is the first real paragraph of the article with plenty of words in it. "
        "The second paragraph also carries substantial content and even an "
        "inline reference without tipping the link density over."
    )
    assert remove_boilerplate(None) is None
    assert remove_boilerplate("") == ""
    # all-anchor page → everything is boilerplate
    assert remove_boilerplate('<p><a href="/a">one two three four five six seven eight nine ten</a></p>') == ""


def test_raw_html_ingestion_end_to_end(spark, corpus):
    """Raw-HTML corpus → spans_from_html → the existing span operators:
    the VERDICT-r1 'user arrives with raw HTML' path. extract_links over
    the ingested spans must equal the ground-truth link spans."""
    from warcbase_spark.operators.extract import extract_links, spans_from_html

    docs = corpus.documents[:40]
    rows = [
        (d["doc_id"], d["url"], d["crawl_date"], d["mime_type"], d["domain"],
         render_spans_html(d["spans"]))
        for d in docs
    ]
    raw = spark.createDataFrame(
        rows,
        "doc_id string, url string, crawl_date string, mime_type string, "
        "domain string, html string",
    )
    ingested = spans_from_html(raw)
    got = {
        (r["doc_id"], r["offset"]): (r["dst_url"], r["anchor"])
        for r in extract_links(ingested).collect()
    }
    want = {
        (d["doc_id"], i): (s["media_ref"], s["text"])
        for d in docs
        for i, s in enumerate(d["spans"])
        if s["kind"] == "link"
    }
    assert got == want


def test_extract_links_udf_null_src_matches_scalar(spark):
    """UDF and scalar paths must agree on null src: the scalar (and the
    reference, ExtractLinks.scala `if (src == null) return output`) returns
    an EMPTY list — the UDF used to substitute "" and emit rows (ADVICE r2)."""
    from pyspark.sql import functions as F

    from warcbase_spark.functions.htmlparse import extract_links, extract_links_udf

    html = '<a href="http://t.example.org/x">anchor</a>'
    assert extract_links(None, html) == []
    df = spark.createDataFrame(
        [(0, None, html), (1, "http://s.example.org/", html), (2, None, None)],
        "i int, src string, html string",
    )
    rows = df.select(
        "i", extract_links_udf(F.col("src"), F.col("html")).alias("links")
    ).collect()
    got = {r["i"]: r["links"] for r in rows}
    assert got[0] == []  # null src, html present → [] (scalar parity)
    assert len(got[1]) == 1
    assert got[2] is None  # null html stays null
