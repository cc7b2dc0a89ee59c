"""Pure-Python reference crawl simulator — the parity oracle.

Implements the crawl-ordering semantics pinned in SURVEY §7.1 (derived from
the reference's global URL sort UrlMappingBuilder.java:72, per-page
sorted-dedup ExtractLinksWac.java:174-189, membership gate :159,177 and
robots drop RecordRDD.scala:58) with zero Spark: plain dicts/sorts over the
fixtures corpus. Shares the exact canonicalizer with the engine
(warcbase_spark.functions.urls), so any divergence between this and
FrontierCrawl is a real ordering/dedup bug, not a canonicalization skew.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from warcbase_spark.fixtures import WebCorpus
from warcbase_spark.functions.urls import host_of_key, url_to_key


@dataclass
class SimResult:
    # (round, seq, url_key, host, priority)
    schedule: list[tuple[int, int, str, str, int]] = field(default_factory=list)
    seen: dict[str, int] = field(default_factory=dict)  # url_key → first_round
    metrics: list[dict] = field(default_factory=list)


def _blocked(url_key: str, robots_rules: dict[str, list[str]]) -> bool:
    if url_key.endswith("/robots.txt"):
        return True
    host = host_of_key(url_key)
    slash = url_key.find("/")
    path = url_key[slash:] if slash >= 0 else "/"
    return any(path.startswith(p) for p in robots_rules.get(host, []))


def simulate(corpus: WebCorpus, max_rounds: int = 100) -> SimResult:
    res = SimResult()

    budgets = {r["host"]: r["budget"] for r in corpus.politeness if r["host"] != "*"}
    default_budget = next(r["budget"] for r in corpus.politeness if r["host"] == "*")
    robots_rules: dict[str, list[str]] = {}
    for r in corpus.robots:
        robots_rules.setdefault(r["host"], []).append(r["path_prefix"])

    # fetchable index: canonical key → outlink target urls (document order)
    doc_links: dict[str, list[str]] = {}
    doc_mime: dict[str, str] = {}
    for d in corpus.documents:
        k = url_to_key(d["url"])
        if k is None:
            continue
        doc_links[k] = [s["media_ref"] for s in d["spans"] if s["kind"] == "link"]
        doc_mime[k] = d["mime_type"]

    # frontier: url_key → (priority, discovered_round)
    frontier: dict[str, tuple[int, int]] = {}
    for s in corpus.seeds:
        k = url_to_key(s["url"])
        if k is None or _blocked(k, robots_rules):
            continue
        prev = frontier.get(k)
        pr = s["priority"]
        frontier[k] = (max(pr, prev[0]) if prev else pr, 0)

    for rnd in range(max_rounds):
        if not frontier:
            break
        # politeness schedule: per host, top-budget by (priority desc, key asc)
        by_host: dict[str, list[tuple[str, int]]] = {}
        for k, (pr, _dr) in frontier.items():
            by_host.setdefault(host_of_key(k), []).append((k, pr))
        scheduled: list[tuple[str, str, int]] = []  # (key, host, priority)
        spilled: dict[str, tuple[int, int]] = {}
        for host, items in by_host.items():
            items.sort(key=lambda t: (-t[1], t[0]))
            b = budgets.get(host, default_budget)
            for k, pr in items[:b]:
                scheduled.append((k, host, pr))
            for k, pr in items[b:]:
                spilled[k] = (pr + 1, frontier[k][1])
        scheduled.sort(key=lambda t: (-t[2], t[0]))  # global (priority desc, key asc)

        m = {"round": rnd, "scheduled": len(scheduled), "spilled": len(spilled),
             "records": 0, "html_pages": 0, "links": 0, "dedup_hits": 0,
             "robots_blocked": 0, "invalid_urls": 0}
        for seq, (k, host, pr) in enumerate(scheduled, start=1):
            res.schedule.append((rnd, seq, k, host, pr))
            res.seen[k] = rnd

        # fetch + extract
        new_cand: dict[str, int] = {}  # key → max priority (always 0 here)
        for k, _host, _pr in scheduled:
            if k not in doc_links:
                continue
            m["records"] += 1
            if doc_mime[k] in ("text/html", "application/xhtml+xml"):
                m["html_pages"] += 1
            for tgt in doc_links[k]:
                m["links"] += 1
                ck = url_to_key(tgt)
                if ck is None:
                    m["invalid_urls"] += 1
                    continue
                if _blocked(ck, robots_rules):
                    m["robots_blocked"] += 1
                    continue
                new_cand[ck] = 0

        fresh = {k: v for k, v in new_cand.items() if k not in res.seen}
        m["dedup_hits"] = len(new_cand) - len(fresh)
        res.metrics.append(m)

        # merge spill + fresh (max priority, min discovered_round)
        nxt: dict[str, tuple[int, int]] = dict(spilled)
        for k in fresh:
            if k in nxt:
                nxt[k] = (max(nxt[k][0], 0), min(nxt[k][1], rnd + 1))
            else:
                nxt[k] = (0, rnd + 1)
        frontier = nxt

    return res
