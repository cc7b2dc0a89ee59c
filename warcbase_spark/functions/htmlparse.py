"""HTML → links / image-links / text / spans extraction.

Reimplements the reference's jsoup-backed matchbox UDFs
(warcbase-core/src/main/scala/org/warcbase/spark/matchbox/
ExtractLinks.scala:37-61, ExtractImageLinks.scala:36-54,
RemoveHTML.scala:23-31) on the Python stdlib ``html.parser`` — zero external
dependencies, lenient on malformed markup — exposed to Spark as
Arrow-vectorized pandas UDFs (never per-row Python UDFs).

Pinned reference semantics (vectors: ExtractLinksTest.scala:25-43,
ExtractImageLinksTest.scala:25-41):

- ``extract_links(src, html, base="")`` → [(src, target, anchor_text)] for
  every ``a[href]`` element; target = href resolved to absolute (against
  ``base`` when non-empty). Unresolvable targets (relative href, no base)
  are DROPPED — jsoup's ``abs:href`` returns "" and the reference keeps
  only non-empty targets.
- ``extract_image_links(src, html)`` → [target] for every ``img[src]``,
  resolved against the page url ``src``. Unlike links, the reference
  appends the target WITHOUT an emptiness check (ExtractImageLinks.
  scala:47-50), so unresolvable image refs surface as "" — mirrored here.
- ``remove_html(html)`` → visible text, whitespace-normalized (jsoup
  ``.text()`` collapses runs and trims; script/style contents are data
  nodes, not text, and are excluded).

Beyond the reference, ``html_to_spans(html, base)`` parses a page into this
engine's span model — array<struct<kind,text,media_ref,offset>> with
kind ∈ {text, link, media} in document order — so a raw-HTML corpus can be
ingested into the same interleaved-span ``documents`` shape every other
operator consumes (the span invariant: (kind, text, media_ref, order)).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WS_RE = re.compile(r"\s+")
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")

# tags whose text content is data, not visible text (jsoup DataNode)
_DATA_TAGS = {"script", "style"}
# tag boundaries that split text runs into separate spans
_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "section",
    "article", "header", "footer", "nav", "body", "html", "head", "title",
    "form", "hr",
}


def _norm_ws(s: str) -> str:
    return _WS_RE.sub(" ", s).strip()


def _abs_url(href: str, base: str) -> str:
    """jsoup ``absUrl`` analogue: already-absolute hrefs pass through;
    relative hrefs resolve against ``base`` (RFC 3986 via urljoin) or map to
    "" when there is no base — the caller decides whether "" survives."""
    if href is None:
        return ""
    href = href.strip()
    if _SCHEME_RE.match(href):
        return href
    if not base:
        return ""
    try:
        return urljoin(base, href)
    except ValueError:
        return ""


class _Extractor(HTMLParser):
    """Single-pass event collector: text runs, a[href] anchors (with their
    visible text), img[src] refs — in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        # events: ("text", run) | ("link", href, anchor_text) | ("img", src)
        self.events: list[tuple] = []
        # raw character stream for .text() parity: inline adjacency is
        # preserved ("engine</a>." → "engine."), block boundaries separate
        self.fulltext: list[str] = []
        self._text: list[str] = []
        self._anchor_href: str | None = None
        self._anchor_text: list[str] = []
        self._suppress = 0  # inside script/style

    # -- helpers ----------------------------------------------------------
    def _flush_text(self) -> None:
        if self._text:
            run = _norm_ws("".join(self._text))
            self._text = []
            if run:
                self.events.append(("text", run))

    def _close_anchor(self) -> None:
        if self._anchor_href is not None:
            self.events.append(
                ("link", self._anchor_href, _norm_ws("".join(self._anchor_text)))
            )
        self._anchor_href = None
        self._anchor_text = []

    # -- parser callbacks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _DATA_TAGS:
            self._suppress += 1
            return
        a = dict(attrs)
        if tag == "a":
            # jsoup auto-closes an open <a> when a new one starts
            self._flush_text()
            self._close_anchor()
            if "href" in a:  # a[href] selector: attribute present (even "")
                self._anchor_href = a["href"] or ""
        elif tag == "img":
            self._flush_text()
            if "src" in a:
                self.events.append(("img", a["src"] or ""))
        elif tag in _BLOCK_TAGS:
            self._flush_text()
            self.fulltext.append("\n")
            self.events.append(("blocksep",))

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag in _DATA_TAGS:  # self-closing script — nothing suppressed
            self._suppress -= 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _DATA_TAGS:
            self._suppress = max(0, self._suppress - 1)
            return
        if tag == "a":
            self._flush_text()
            self._close_anchor()
        elif tag in _BLOCK_TAGS:
            self._flush_text()
            self.fulltext.append("\n")
            self.events.append(("blocksep",))

    def handle_data(self, data: str) -> None:
        if self._suppress:
            return
        self.fulltext.append(data)
        if self._anchor_href is not None:
            self._anchor_text.append(data)
        else:
            self._text.append(data)

    def close(self) -> None:  # finalize trailing buffers
        super().close()
        self._flush_text()
        self._close_anchor()


def _parse_events(html: str) -> list[tuple]:
    if not html:
        return []
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # stdlib parser is lenient; treat a hard parser failure as "no
        # extractable content" rather than poisoning the whole batch
        return p.events
    return p.events


# ---------------------------------------------------------------------------
# Reference-parity scalar functions
# ---------------------------------------------------------------------------

def extract_links(src: str | None, html: str | None, base: str = "") -> list[tuple[str, str, str]]:
    """(source, target, anchor_text) per a[href]; empty targets dropped.
    Reference: ExtractLinks.scala:37-61 (returns empty on null src/empty html)."""
    if src is None or not html:
        return []
    out = []
    for ev in _parse_events(html):
        if ev[0] == "link":
            target = _abs_url(ev[1], base)
            if target:
                out.append((src, target, ev[2]))
    return out


def extract_image_links(src: str | None, html: str | None) -> list[str]:
    """img[src] targets resolved against the page url. The reference appends
    the resolved target unconditionally (ExtractImageLinks.scala:47-50), so
    unresolvable relative refs surface as "" — mirrored for parity."""
    if not html:
        return []
    return [_abs_url(ev[1], src or "") for ev in _parse_events(html) if ev[0] == "img"]


def remove_html(html: str | None) -> str | None:
    """Visible text, whitespace-normalized (RemoveHTML.scala:23-31 =
    jsoup ``.text()``: inline adjacency preserved — "engine</a>." →
    "engine." — block boundaries become single spaces)."""
    if html is None:
        return None
    if not html:
        return ""
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return _norm_ws("".join(p.fulltext))


def remove_boilerplate(
    html: str | None, min_words: int = 10, max_link_density: float = 0.34
) -> str | None:
    """X10 Boilerpipe analogue, lib-free: block-level main-content
    extraction using boilerpipe's two strongest signals (Kohlschütter et
    al., WSDM 2010 — NumWordsRulesClassifier): a block survives iff it has
    ≥ min_words words AND its link density (words inside anchors / total
    words) < max_link_density. Nav menus / footer link farms are all-anchor
    blocks (density 1.0) and short chrome is under the word floor; article
    paragraphs pass. Returns the surviving blocks' text in document order.
    """
    if html is None:
        return None
    blocks: list[list[tuple]] = [[]]
    for ev in _parse_events(html):
        if ev[0] == "blocksep":
            if blocks[-1]:
                blocks.append([])
        else:
            blocks[-1].append(ev)
    kept: list[str] = []
    for block in blocks:
        words: list[str] = []
        link_words = 0
        for ev in block:
            if ev[0] == "text":
                words.extend(ev[1].split())
            elif ev[0] == "link" and ev[2]:
                w = ev[2].split()
                words.extend(w)
                link_words += len(w)
        if len(words) >= min_words and link_words / len(words) < max_link_density:
            kept.append(" ".join(words))
    return " ".join(kept)


def html_to_spans(html: str | None, base: str = "") -> list[dict]:
    """Parse a raw-HTML page into the engine's interleaved span model.

    kind='text' (visible text runs, block-segmented), kind='link'
    (text=anchor text, media_ref=absolute target; unresolvable targets are
    dropped like ExtractLinks), kind='media' (img[src] resolved against
    ``base``; kept even when "" only if resolvable — media spans with an
    empty ref carry no information in the span model, so they are dropped
    here; ``extract_image_links`` keeps the reference's "" behavior).
    Offsets are 0-based document order.
    """
    if html is None:
        return []
    spans: list[dict] = []
    for ev in _parse_events(html):
        off = len(spans)
        if ev[0] == "text":
            spans.append({"kind": "text", "text": ev[1], "media_ref": None, "offset": off})
        elif ev[0] == "link":
            target = _abs_url(ev[1], base)
            if target:
                spans.append({"kind": "link", "text": ev[2], "media_ref": target, "offset": off})
        elif ev[0] == "img":
            target = _abs_url(ev[1], base)
            if target:
                spans.append({"kind": "media", "text": None, "media_ref": target, "offset": off})
    return spans


# ---------------------------------------------------------------------------
# Arrow-vectorized Spark surface
# ---------------------------------------------------------------------------

_LINKS_TYPE = T.ArrayType(
    T.StructType(
        [T.StructField("target", T.StringType()), T.StructField("anchor", T.StringType())]
    )
)
_SPANS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)
_STRINGS_TYPE = T.ArrayType(T.StringType())


@F.pandas_udf(_LINKS_TYPE)
def extract_links_udf(src: pd.Series, html: pd.Series) -> pd.Series:
    """a[href] per page, resolved against the page url as base (the common
    archive case: every page knows its own fetch url)."""
    # null src → empty list, matching the scalar's null-src guard (and the
    # reference's `if (src == null) return output`, ExtractLinks.scala) —
    # the UDF and scalar paths must agree on every input
    return pd.Series(
        [
            None
            if h is None
            else (
                []
                if s is None
                else [
                    {"target": t, "anchor": a}
                    for (_s, t, a) in extract_links(s, h, base=s or "")
                ]
            )
            for s, h in zip(src, html)
        ],
        index=html.index,
        dtype=object,
    )


@F.pandas_udf(_STRINGS_TYPE)
def extract_image_links_udf(src: pd.Series, html: pd.Series) -> pd.Series:
    return pd.Series(
        [None if h is None else extract_image_links(s, h) for s, h in zip(src, html)],
        index=html.index,
        dtype=object,
    )


@F.pandas_udf(T.StringType())
def remove_html_udf(html: pd.Series) -> pd.Series:
    return html.map(remove_html, na_action="ignore")


@F.pandas_udf(T.StringType())
def remove_boilerplate_udf(html: pd.Series) -> pd.Series:
    return html.map(remove_boilerplate, na_action="ignore")


@F.pandas_udf(_SPANS_TYPE)
def html_to_spans_udf(src: pd.Series, html: pd.Series) -> pd.Series:
    return pd.Series(
        [None if h is None else html_to_spans(h, base=s or "") for s, h in zip(src, html)],
        index=html.index,
        dtype=object,
    )
