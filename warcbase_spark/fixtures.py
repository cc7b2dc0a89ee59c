"""Deterministic synthetic web corpus (seed=42, order-stable).

Plays the role of the reference's bundled test archives
(warcbase-core/src/test/resources/arc/example.arc.gz → 300 records,
warc/example.warc.gz → 299 responses / 664 links; golden counts in
ArcTest.scala:42-71) at parameterizable scale, in the interleaved-span
shape fixed by the spec's input_hint:

    documents(doc_id, url, crawl_date, mime_type, domain,
              spans: array<struct<kind, text, media_ref, offset>>, ...)

Design knobs mirror FIXTURES.md: links/doc ≈ 2.2 Zipf-ish, ~70% of link
targets are intra-corpus (URL-seen hits), a couple of hot hosts hold ~20%
of URLs each (to exercise salted politeness partitioning), and a slice of
URLs appear in deliberately messy-but-equivalent forms (case, :80 port,
dot-segments) to exercise the canonicalizer.

Generation is pure Python + pyarrow (no Spark needed), so unit tests and
the reference simulator share byte-identical inputs with the Spark jobs.
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

WORDS = (
    "the quick brown fox jumps over lazy dog crawl frontier spark shuffle "
    "partition bloom filter queue host budget link anchor media page web "
    "archive record scan join group sort merge hash key value text span"
).split()

EXT_HOSTS = [f"ext{k}.example.net" for k in range(8)]


@dataclass
class WebCorpus:
    documents: list[dict] = field(default_factory=list)
    seeds: list[dict] = field(default_factory=list)
    politeness: list[dict] = field(default_factory=list)
    robots: list[dict] = field(default_factory=list)
    golden: dict = field(default_factory=dict)


def _host_for(i: int, n_hosts: int, rng: random.Random) -> str:
    # two hot hosts hold ~20% of docs each; rest uniform over the tail
    r = rng.random()
    if r < 0.20:
        return "hot0.example.org"
    if r < 0.40:
        return "hot1.example.org"
    return f"site{rng.randrange(2, n_hosts)}.example.org"


def _mess_up(url: str, rng: random.Random) -> str:
    """Equivalent-but-messy form: canonicalizes back to the clean url."""
    choice = rng.randrange(4)
    scheme, rest = url.split("://", 1)
    host, _, path = rest.partition("/")
    if choice == 0:
        return f"{scheme.upper()}://{host.upper()}/{path}"
    if choice == 1:
        return f"{scheme}://{host}:80/{path}"
    if choice == 2:
        return f"{scheme}://{host}/./{path}"
    return f"{scheme}://{host}/x/../{path}"


def make_web_corpus(
    n_docs: int = 500,
    n_hosts: int = 20,
    seed: int = 42,
    seed_every: int = 25,
    messy_frac: float = 0.15,
) -> WebCorpus:
    rng = random.Random(seed)
    c = WebCorpus()

    urls = []
    hosts = []
    for i in range(n_docs):
        h = _host_for(i, n_hosts, rng)
        hosts.append(h)
        urls.append(f"http://{h}/p/{i}.html")

    total_links = 0
    internal_links = 0
    html_docs = 0
    for i in range(n_docs):
        # mime: ~80% html, rest images/plain (reference MIME histogram shape,
        # WacWarcLoaderTest.java:94-103)
        m = rng.random()
        if m < 0.80:
            mime = "text/html"
            html_docs += 1
        elif m < 0.90:
            mime = "image/gif"
        elif m < 0.95:
            mime = "image/jpeg"
        else:
            mime = "text/plain"

        crawl_date = f"2024{1 + (i % 3):02d}{1 + (i % 28):02d}"  # YYYYMMDD string

        spans = []
        off = 0
        n_text = 1 + rng.randrange(3)
        n_links = 0
        if mime == "text/html":
            # Zipf-ish links/doc, mean ≈ 2.2 (664/300, ArcTest.scala:70)
            z = rng.random()
            n_links = 0 if z < 0.25 else (1 if z < 0.50 else (2 if z < 0.70 else rng.randrange(3, 9)))
        n_media = rng.randrange(3) if mime == "text/html" else 0

        parts = (["text"] * n_text) + (["link"] * n_links) + (["media"] * n_media)
        rng.shuffle(parts)
        for kind in parts:
            if kind == "text":
                words = " ".join(rng.choice(WORDS) for _ in range(4 + rng.randrange(12)))
                spans.append({"kind": "text", "text": words, "media_ref": None, "offset": off})
            elif kind == "link":
                total_links += 1
                if rng.random() < 0.70:
                    internal_links += 1
                    tgt = urls[rng.randrange(n_docs)]
                else:
                    eh = rng.choice(EXT_HOSTS)
                    tgt = f"http://{eh}/x/{rng.randrange(10_000)}.html"
                r = rng.random()
                if r < 0.03:
                    tgt = f"http://{hosts[i]}/robots.txt"
                elif r < 0.08:
                    tgt = f"http://{hosts[i]}/blocked/{rng.randrange(1000)}.html"
                if rng.random() < messy_frac:
                    tgt = _mess_up(tgt, rng)
                anchor = " ".join(rng.choice(WORDS) for _ in range(1 + rng.randrange(3)))
                spans.append({"kind": "link", "text": anchor, "media_ref": tgt, "offset": off})
            else:
                ref = f"http://{rng.choice(hosts)}/img/{rng.randrange(5000)}.png"
                spans.append({"kind": "media", "text": None, "media_ref": ref, "offset": off})
            off += 1

        payload = None
        payload_meta = None
        if mime.startswith("image/"):
            payload = bytes([(i * 31 + k) % 256 for k in range(64)])
            payload_meta = {
                "media_type": mime,
                "width": 10 + (i % 90),
                "height": 10 + (i % 60),
                "duration_ms": None,
            }

        c.documents.append(
            {
                "doc_id": f"doc-{i:06d}",
                "url": urls[i] if rng.random() > messy_frac else _mess_up(urls[i], rng),
                "crawl_date": crawl_date,
                "mime_type": mime,
                "domain": hosts[i],
                "spans": spans,
                "payload": payload,
                "payload_meta": payload_meta,
            }
        )

    for i in range(0, n_docs, seed_every):
        c.seeds.append({"url": urls[i], "priority": i % 3})

    c.politeness = [
        {"host": "hot0.example.org", "budget": 4},
        {"host": "hot1.example.org", "budget": 4},
        {"host": "*", "budget": 2},
    ]
    c.robots = [
        {"host": h, "path_prefix": "/blocked/"}
        for h in ["hot0.example.org", "hot1.example.org"]
        + [f"site{j}.example.org" for j in range(2, min(n_hosts, 8))]
    ]

    c.golden = {
        "n_docs": n_docs,
        "html_docs": html_docs,
        "total_link_spans": total_links,
        "internal_links": internal_links,
        "n_seeds": len(c.seeds),
    }
    return c


def render_spans_html(spans: list[dict]) -> str:
    """Render a span sequence to an HTML page (text→<p>, link→<a>,
    media→<img>) — the inverse of functions.htmlparse.html_to_spans for
    well-formed corpora. Used to exercise the HTML parser against ground
    truth: html_to_spans(render_spans_html(spans)) must reproduce the span
    sequence exactly (the north rule's (kind, text, media_ref, order)
    invariant)."""
    import html as _html

    parts = ["<html><body>"]
    for s in spans:
        if s["kind"] == "text":
            parts.append(f"<p>{_html.escape(s['text'])}</p>")
        elif s["kind"] == "link":
            parts.append(
                f'<a href="{_html.escape(s["media_ref"], quote=True)}">{_html.escape(s["text"])}</a>'
            )
        else:
            parts.append(f'<img src="{_html.escape(s["media_ref"], quote=True)}">')
    parts.append("</body></html>")
    return "".join(parts)


# ---------------------------------------------------------------------------
# Parquet writers (pyarrow; identical bytes for Spark jobs, tests, simulator)
# ---------------------------------------------------------------------------

_SPAN_PA = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

_DOCS_PA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("url", pa.string()),
        ("crawl_date", pa.string()),
        ("mime_type", pa.string()),
        ("domain", pa.string()),
        ("spans", pa.list_(_SPAN_PA)),
        ("payload", pa.binary()),
        (
            "payload_meta",
            pa.struct(
                [
                    ("media_type", pa.string()),
                    ("width", pa.int32()),
                    ("height", pa.int32()),
                    ("duration_ms", pa.int32()),
                ]
            ),
        ),
    ]
)


def write_corpus(c: WebCorpus, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(c.documents, schema=_DOCS_PA), f"{out_dir}/documents.parquet")
    pq.write_table(
        pa.Table.from_pylist(c.seeds, schema=pa.schema([("url", pa.string()), ("priority", pa.int32())])),
        f"{out_dir}/seeds.parquet",
    )
    pq.write_table(
        pa.Table.from_pylist(c.politeness, schema=pa.schema([("host", pa.string()), ("budget", pa.int32())])),
        f"{out_dir}/politeness.parquet",
    )
    pq.write_table(
        pa.Table.from_pylist(c.robots, schema=pa.schema([("host", pa.string()), ("path_prefix", pa.string())])),
        f"{out_dir}/robots.parquet",
    )
    with open(f"{out_dir}/golden.json", "w") as f:
        json.dump(c.golden, f, indent=2, sort_keys=True)


def ensure_corpus(out_dir: str, n_docs: int = 500, **kw) -> str:
    """Idempotently materialize a corpus of the given size."""
    marker = f"{out_dir}/golden.json"
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f).get("n_docs") == n_docs:
                return out_dir
    write_corpus(make_web_corpus(n_docs=n_docs, **kw), out_dir)
    return out_dir
