"""Recrawl-after-TTL: unsee (tombstone deletes over the append-only seen
set) + recrawl (re-seed the frontier) — the deletion semantics the
reference gets implicitly from HBase row deletes, and the reason the
cuckoo filter mode exists."""

import shutil

import pytest
from pyspark.sql import functions as F

from warcbase_spark.frontier.crawl import FrontierCrawl

STATE = "/tmp/warcbase_spark_testfix/crawlstate_recrawl"


@pytest.fixture(scope="module")
def crawl(spark, corpus_dir):
    shutil.rmtree(STATE, ignore_errors=True)
    fc = FrontierCrawl(spark, corpus_dir, STATE, max_rounds=50, bloom_mode="cuckoo")
    fc.run()
    return fc


def test_unsee_removes_and_rediscovery_readds(spark, crawl):
    take = [r["url"] for r in crawl.schedule().orderBy("round", "seq").limit(3).collect()]
    n_before = crawl.url_seen().count()
    n_tomb = crawl.unsee(spark.createDataFrame([(u,) for u in take], "url string"))
    assert n_tomb == 3
    after = crawl.url_seen()
    assert after.count() == n_before - 3
    # idempotent: unseeing again changes nothing
    crawl.unsee(spark.createDataFrame([(u,) for u in take], "url string"))
    assert crawl.url_seen().count() == n_before - 3


def test_recrawl_fetches_again_exactly_once(spark, crawl):
    target = [r["url"] for r in crawl.schedule().orderBy("round", "seq").limit(2).collect()]
    urls = spark.createDataFrame([(u,) for u in target], "url string")
    last_before = crawl.load_manifest()["last_committed_round"]
    n_seen_before = crawl.url_seen().count()

    crawl.recrawl(urls)
    out = crawl.run()
    assert len(out) >= 1

    # the recrawled keys were scheduled ONCE more (they appear in a round
    # after the original crawl finished)
    sched = crawl.schedule().filter(F.col("round") > last_before)
    got = {r["url"] for r in sched.collect()}
    assert set(target) <= got
    # and are seen again, with a fresh first_round
    seen = crawl.url_seen()
    rows = {
        r["url_key"]: r["first_round"]
        for r in seen.join(
            sched.select("url_key").distinct(), "url_key", "left_semi"
        ).collect()
    }
    assert all(fr > last_before for fr in rows.values())
    # no runaway: total seen size returns to at least its pre-unsee count
    assert seen.count() >= n_seen_before
    # the re-fetch re-extracted links, but everything they point to is
    # still in the (tombstone-filtered) seen set → no second BFS wave
    m = crawl.metrics().filter(F.col("round") > last_before)
    assert m.count() == len(out)
