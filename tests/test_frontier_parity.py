"""Crawl-ordering + URL-seen parity vs the pure-Python reference simulator,
and exact resume-from-checkpoint (SURVEY §5 tiers 4-5)."""

import shutil

import pytest

from warcbase_spark.frontier.crawl import FrontierCrawl
from warcbase_spark.frontier.simulator import simulate

STATE = "/tmp/warcbase_spark_testfix/crawlstate"
STATE_RESUME = "/tmp/warcbase_spark_testfix/crawlstate_resume"


@pytest.fixture(scope="module")
def sim(corpus):
    return simulate(corpus, max_rounds=50)


@pytest.fixture(scope="module")
def crawl(spark, corpus_dir):
    shutil.rmtree(STATE, ignore_errors=True)
    fc = FrontierCrawl(spark, corpus_dir, STATE, max_rounds=50)
    fc.run()
    return fc


def test_schedule_parity(crawl, sim):
    got = sorted(
        (r["round"], r["seq"], r["url_key"], r["host"], r["priority"])
        for r in crawl.schedule().collect()
    )
    assert got == sorted(sim.schedule)


def test_url_seen_parity(crawl, sim):
    got = {r["url_key"]: r["first_round"] for r in crawl.url_seen().collect()}
    assert got == sim.seen


def test_metrics_parity(crawl, sim):
    keys = ["scheduled", "spilled", "records", "html_pages", "links",
            "dedup_hits", "robots_blocked", "invalid_urls"]
    got = {
        r["round"]: {k: r[k] for k in keys}
        for r in crawl.metrics().collect()
    }
    exp = {m["round"]: {k: m[k] for k in keys} for m in sim.metrics}
    assert got == exp


def test_resume_exactness(spark, corpus_dir, crawl, sim):
    """Kill after round 2, resume, final state identical (byte-identical
    seen set + schedule) — north rule's checkpoint requirement."""
    shutil.rmtree(STATE_RESUME, ignore_errors=True)
    fc1 = FrontierCrawl(spark, corpus_dir, STATE_RESUME, max_rounds=50)
    fc1.bootstrap()
    for r in range(3):
        fc1.run_round(r)  # simulated crash after round 2
    # fresh object = fresh process; bloom must rebuild from committed state
    fc2 = FrontierCrawl(spark, corpus_dir, STATE_RESUME, max_rounds=50)
    fc2.run()
    got_sched = sorted(
        (r["round"], r["seq"], r["url_key"]) for r in fc2.schedule().collect()
    )
    ref_sched = sorted(
        (r["round"], r["seq"], r["url_key"]) for r in crawl.schedule().collect()
    )
    assert got_sched == ref_sched
    got_seen = {r["url_key"]: r["first_round"] for r in fc2.url_seen().collect()}
    assert got_seen == sim.seen


@pytest.mark.parametrize("mode", ["sharded", "cogrouped", "cuckoo"])
def test_bloom_mode_parity(spark, corpus_dir, crawl, mode):
    """Every bloom mode is only a PREFILTER — the exact anti-join fixes any
    false positives — so the full crawl must be bit-identical across modes.
    'cogrouped' is the 10^10-key path (shard bitmaps never transit the
    driver); 'sharded' is the collected+broadcast numpy path."""
    state = f"/tmp/warcbase_spark_testfix/crawlstate_{mode}"
    shutil.rmtree(state, ignore_errors=True)
    fc = FrontierCrawl(spark, corpus_dir, state, max_rounds=50, bloom_mode=mode)
    fc.run()
    got = sorted(
        (r["round"], r["seq"], r["url_key"]) for r in fc.schedule().collect()
    )
    ref = sorted(
        (r["round"], r["seq"], r["url_key"]) for r in crawl.schedule().collect()
    )
    assert got == ref
    got_seen = {r["url_key"]: r["first_round"] for r in fc.url_seen().collect()}
    ref_seen = {r["url_key"]: r["first_round"] for r in crawl.url_seen().collect()}
    assert got_seen == ref_seen


def test_round_job_budget(spark, corpus_dir):
    """The observe()-metrics rework (VERDICT r1 #7): a round must run a
    bounded handful of Spark jobs (3 writes + bloom build + seq stamping +
    AQE stage materializations), never the ~10 extra count() actions the
    round-1 design paid. Job ids come from DAGScheduler's counter; the
    bound is generous because AQE materializes sub-jobs per exchange."""
    import shutil

    state = "/tmp/warcbase_spark_testfix/crawlstate_jobs"
    shutil.rmtree(state, ignore_errors=True)
    fc = FrontierCrawl(spark, corpus_dir, state, max_rounds=3)
    fc.bootstrap()
    fc.run_round(0)  # warm: docs_keyed derivation etc.

    def jobs() -> int:
        n = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        return n if isinstance(n, int) else n.get()

    before = jobs()
    fc.run_round(1)
    spent = jobs() - before
    # measured ~28 with AQE: 5 actions × their AQE stage-materialization
    # sub-jobs; each extra count() action would add ~3-5 AQE jobs, so a
    # return of the 10-count design trips this bound immediately
    assert spent <= 35, f"round used {spent} jobs — observe() metrics regressed?"


def test_seen_compaction_transparent(crawl):
    """Compaction must be invisible to readers: seen-from-base+deltas equals
    the union of ALL deltas, and the manifest names a real base snapshot."""
    import os

    m = crawl.load_manifest()
    assert m["seen_base_round"] >= 0
    assert os.path.exists(f"{crawl.state_dir}/seen_base/round={m['seen_base_round']:05d}")
    last = m["last_committed_round"]
    via_base = {(r["url_key"], r["first_round"]) for r in crawl._seen(last).collect()}
    all_deltas = crawl.spark.read.parquet(
        *[crawl._p("seen", r) for r in range(last + 1) if os.path.exists(crawl._p("seen", r))]
    )
    via_deltas = {(r["url_key"], r["first_round"]) for r in all_deltas.collect()}
    assert via_base == via_deltas


def test_legacy_manifest_seen_rows_reseed(spark, corpus_dir):
    """A manifest written before the seen_rows counter existed must be
    re-seeded from an exact count on the next commit — not reset to the
    current round's delta, which would undersize every later Bloom build
    (ADVICE r2). The committed counter must equal the true seen-set size."""
    import json
    import os

    state = "/tmp/warcbase_spark_testfix/crawlstate_legacy"
    shutil.rmtree(state, ignore_errors=True)
    fc = FrontierCrawl(spark, corpus_dir, state, max_rounds=50)
    fc.run(max_rounds=2)  # rounds 0..1 with the counter present

    mpath = os.path.join(state, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    del m["seen_rows"]  # simulate a pre-counter manifest
    with open(mpath, "w") as f:
        json.dump(m, f)

    fc.run(max_rounds=3)  # round 2 resumes from the legacy manifest
    with open(mpath) as f:
        m2 = json.load(f)
    assert m2["seen_rows"] == fc.url_seen().count()


def test_broadcast_gate_crawl_parity(spark, corpus_dir, crawl):
    """broadcast_row_limit=0 forces the shuffle-join fallbacks on BOTH gated
    joins (winner recovery in the scheduler, scheduled∩docs fetch): the
    whole crawl must be bit-identical to the broadcast-path crawl."""
    state = "/tmp/warcbase_spark_testfix/crawlstate_nobc"
    shutil.rmtree(state, ignore_errors=True)
    fc = FrontierCrawl(
        spark, corpus_dir, state, max_rounds=50,
        broadcast_row_limit=0, winner_broadcast_limit=0,
    )
    fc.run()
    got = sorted((r["round"], r["seq"], r["url_key"]) for r in fc.schedule().collect())
    ref = sorted((r["round"], r["seq"], r["url_key"]) for r in crawl.schedule().collect())
    assert got == ref
    assert {r["url_key"] for r in fc.url_seen().collect()} == {
        r["url_key"] for r in crawl.url_seen().collect()
    }


def test_seen_layout_bucketed_parity_and_resume(spark, corpus_dir, crawl):
    """seen_layout='bucketed' (the incremental partitioned+bucketed catalog
    table; each round commit rewrites ONLY the delta's bucket-partitions)
    must produce a bit-identical crawl to the default delta-dir layout,
    AND resume exactly across a simulated crash + fresh process (the
    in-memory catalog is gone; the table re-registers from its external
    path and replays the one uncommitted-marker delta idempotently)."""
    state = "/tmp/warcbase_spark_testfix/crawlstate_bucketed"
    shutil.rmtree(state, ignore_errors=True)
    fc = FrontierCrawl(
        spark, corpus_dir, state, max_rounds=50, seen_layout="bucketed", seen_buckets=8
    )
    fc.bootstrap()
    for r in range(3):
        fc.run_round(r)  # simulated crash after round 2
    # fresh object = fresh process: the catalog table must re-register from
    # the external path and catch up from the manifest marker
    spark.sql(f"DROP TABLE IF EXISTS {fc._seen_table}")
    fc2 = FrontierCrawl(
        spark, corpus_dir, state, max_rounds=50, seen_layout="bucketed", seen_buckets=8
    )
    fc2.run()
    got_sched = sorted(
        (r["round"], r["seq"], r["url_key"]) for r in fc2.schedule().collect()
    )
    ref_sched = sorted(
        (r["round"], r["seq"], r["url_key"]) for r in crawl.schedule().collect()
    )
    assert got_sched == ref_sched
    got_seen = {r["url_key"]: r["first_round"] for r in fc2.url_seen().collect()}
    ref_seen = {r["url_key"]: r["first_round"] for r in crawl.url_seen().collect()}
    assert got_seen == ref_seen
    # the bucketed table itself must hold exactly the seen set
    last = fc2.load_manifest()["last_committed_round"]
    tbl = {
        r["url_key"]: r["first_round"]
        for r in fc2._seen_bucketed_df(last).collect()
    }
    assert tbl == ref_seen
    # and preserve the one-file-per-bucket invariant after many upserts
    from warcbase_spark.operators.sinks import assert_one_file_per_bucket

    assert_one_file_per_bucket(spark, fc2._seen_table)
    spark.sql(f"DROP TABLE IF EXISTS {fc2._seen_table}")


def test_bucketed_marker_hygiene(spark, corpus_dir):
    """Review findings (r5): (a) non-round commits (recrawl's repair
    commit) must NOT advance seen_bucketed_round — the table never
    received those deltas; (b) resuming with a different seen_buckets
    must trigger a full rebuild (hash(key) % new_n would route keys to
    the wrong buckets of an old-n table)."""
    import os

    from pyspark.sql import functions as F

    state = "/tmp/warcbase_spark_testfix/crawlstate_bucketed_marker"
    shutil.rmtree(state, ignore_errors=True)
    fc = FrontierCrawl(
        spark, corpus_dir, state, max_rounds=50, seen_layout="bucketed", seen_buckets=8
    )
    fc.bootstrap()
    fc.run_round(0)
    fc.run_round(1)
    m = fc.load_manifest()
    assert m["seen_bucketed_round"] == 1
    assert m["seen_bucket_count"] == 8

    # (a) recrawl commits (tombstone + frontier swap) must preserve, not
    # advance, the marker — and unsee must apply the delete to the bucketed
    # table eagerly (per-bucket rewrite, not wait-for-compaction)
    # materialize the picked rows FIRST: limit(2) with no ORDER BY is not
    # stable across re-executions, and recrawl would re-run the lazy plan —
    # possibly tombstoning different keys than `doomed` asserts on
    picked = fc.schedule().select("url", "url_key").limit(2).collect()
    doomed = {r["url_key"] for r in picked}
    fc.recrawl(spark.createDataFrame([(r["url"],) for r in picked], "url string"))
    m2 = fc.load_manifest()
    assert m2["seen_bucketed_round"] == 1, "non-round commit advanced the bucketed marker"
    in_table = {
        r["url_key"]
        for r in spark.table(fc._seen_table).where(
            F.col("url_key").isin(list(doomed))
        ).collect()
    }
    assert in_table == set(), f"unsee left tombstoned keys in the bucketed table: {in_table}"

    # (b) bucket-count drift on resume → full rebuild under the new count
    spark.sql(f"DROP TABLE IF EXISTS {fc._seen_table}")
    fc16 = FrontierCrawl(
        spark, corpus_dir, state, max_rounds=50, seen_layout="bucketed", seen_buckets=16
    )
    nxt = fc16.load_manifest()["last_committed_round"] + 1
    fc16.run_round(nxt)
    pdirs = [
        d for d in os.listdir(fc16._seen_bucketed_path) if d.startswith("pbucket=")
    ]
    assert len(pdirs) > 8, f"table not rebuilt under the new bucket count: {pdirs}"
    assert fc16.load_manifest()["seen_bucket_count"] == 16
    # the rebuilt table still equals the delta-dir truth
    last = fc16.load_manifest()["last_committed_round"]
    tbl = {r["url_key"]: r["first_round"] for r in fc16._seen_bucketed_df(last).collect()}
    truth = {r["url_key"]: r["first_round"] for r in fc16._seen(last).collect()}
    assert tbl == truth
    spark.sql(f"DROP TABLE IF EXISTS {fc16._seen_table}")
