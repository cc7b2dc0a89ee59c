"""Opt-in larger-scale crawl parity check (not part of the default pytest
suite for runtime reasons): Spark crawl vs the pure-Python reference
simulator on a freshly generated corpus.

Usage: python scripts/parity_check.py [n_docs] [n_hosts] [seed_every]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    seed_every = int(sys.argv[3]) if len(sys.argv) > 3 else 60

    from warcbase_spark.fixtures import make_web_corpus, write_corpus
    from warcbase_spark.frontier.crawl import FrontierCrawl
    from warcbase_spark.frontier.simulator import simulate
    from warcbase_spark.session import get_spark

    spark = get_spark(app_name="parity_check", master="local[16]", shuffle_partitions=16)
    base = f"/tmp/warcbase_parity_{n_docs}"
    shutil.rmtree(base, ignore_errors=True)
    corpus = make_web_corpus(n_docs, n_hosts=n_hosts, seed_every=seed_every)
    write_corpus(corpus, f"{base}/corpus")

    sim = simulate(corpus, max_rounds=100)
    fc = FrontierCrawl(spark, f"{base}/corpus", f"{base}/state", max_rounds=100)
    fc.run()

    got = sorted(
        (r["round"], r["seq"], r["url_key"], r["host"], r["priority"])
        for r in fc.schedule().collect()
    )
    if got != sorted(sim.schedule):
        print(f"FAIL schedule: spark={len(got)} sim={len(sim.schedule)}")
        return 1
    seen = {r["url_key"]: r["first_round"] for r in fc.url_seen().collect()}
    if seen != sim.seen:
        print("FAIL seen set")
        return 1
    print(f"PARITY OK: {n_docs} docs, {len(got)} scheduled, {len(seen)} seen")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
