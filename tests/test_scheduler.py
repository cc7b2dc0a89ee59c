"""Politeness scheduler: budget enforcement, determinism, salt invariance."""

from pyspark.sql import functions as F

from warcbase_spark.operators.scheduler import schedule_round


def _mk_candidates(spark, n=500, hosts=5):
    return spark.range(n).select(
        F.concat(F.lit("org.h"), (F.col("id") % hosts), F.lit("/p/"), "id").alias("url_key"),
        F.concat(F.lit("http://h"), (F.col("id") % hosts), F.lit(".org/p/"), "id").alias("url"),
        F.concat(F.lit("h"), (F.col("id") % hosts), F.lit(".org")).alias("host"),
        F.xxhash64(F.concat(F.lit("k"), "id")).alias("url_hash"),
        (F.col("id") % 3).cast("int").alias("priority"),
        F.lit(0).alias("discovered_round"),
    )


def _mk_politeness(spark):
    return spark.createDataFrame(
        [("h0.org", 7), ("*", 3)], "host string, budget int"
    )


def test_budget_respected(spark):
    cand = _mk_candidates(spark)
    sched, spilled = schedule_round(cand, _mk_politeness(spark))
    per_host = {r["host"]: r["n"] for r in sched.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert per_host["h0.org"] <= 7
    for h, n in per_host.items():
        if h != "h0.org":
            assert n <= 3
    assert sched.count() + spilled.count() == cand.count()
    # spilled priorities aged by +1
    assert spilled.filter(F.col("priority") < 1).count() == 0


def test_deterministic_and_salt_invariant(spark):
    """Two-stage salted ranking must give the identical schedule as any
    other salt factor (the SURVEY §7.3 correctness trap)."""
    cand = _mk_candidates(spark, n=700, hosts=3)  # hot hosts
    pol = _mk_politeness(spark)
    a = [(r["seq"], r["url_key"]) for r in schedule_round(cand, pol, salt_k=1)[0].collect()]
    b = [(r["seq"], r["url_key"]) for r in schedule_round(cand, pol, salt_k=16)[0].collect()]
    c = [(r["seq"], r["url_key"]) for r in schedule_round(cand, pol, salt_k=64)[0].collect()]
    assert sorted(a) == sorted(b) == sorted(c)


def test_ordering_semantics(spark):
    """Within a host: (priority desc, url_key asc); seq follows the same
    global order (UrlMappingBuilder.java:72 sort parity)."""
    cand = _mk_candidates(spark, n=100, hosts=2)
    sched, _ = schedule_round(cand, _mk_politeness(spark))
    rows = sorted((r["seq"], r["priority"], r["url_key"]) for r in sched.collect())
    for (s1, p1, k1), (s2, p2, k2) in zip(rows, rows[1:]):
        assert (-p1, k1) < (-p2, k2)


def test_broadcast_gate_fallback_parity(spark):
    """Past broadcast_row_limit the winner join must degrade to a shuffle
    join (an unconditional Σ-budgets broadcast OOMs at 10^10-frontier
    rounds) with IDENTICAL output, and the physical plan must actually lose
    its broadcast exchange on the candidate⋈winners join."""
    cand = _mk_candidates(spark, 400, hosts=4)
    pol = spark.createDataFrame([("*", 50)], "host string, budget int")

    sched_b, spill_b = schedule_round(cand, pol)  # default: broadcast
    # Σ budgets = 200 winners > limit of 10 → shuffle-join fallback
    sched_s, spill_s = schedule_round(cand, pol, broadcast_row_limit=10)

    key = lambda rows: sorted((r["seq"], r["url_key"]) for r in rows)  # noqa: E731
    assert key(sched_b.collect()) == key(sched_s.collect())
    assert sorted(r["url_key"] for r in spill_b.collect()) == sorted(
        r["url_key"] for r in spill_s.collect()
    )

    plan_s = sched_s._jdf.queryExecution().executedPlan().toString()
    # the politeness-budget broadcast remains; the WINNER join must not be
    # broadcast — with a left join from a 6-col candidate side onto the
    # (url_key, seq) winner set, a surviving BroadcastHashJoin on url_key
    # would show seq on the broadcast side
    import re

    for m in re.finditer(r"BroadcastHashJoin \[url_key\S*", plan_s):
        raise AssertionError(f"winner join still broadcast: {m.group(0)}")


def test_broadcast_gate_shape_aware_high_ratio(spark):
    """r06 shape-aware gate: past broadcast_row_limit, a HIGH winner/
    candidate ratio (≥ BROADCAST_WINNER_RATIO) over CACHED candidates flips
    the winner join back to broadcast (the shuffle path re-shuffles nearly
    everything anyway — measured 2.3s vs 3.0-8.0s at 508k/700k), while a
    low ratio or an un-cached input keeps the shuffle fallback. Outputs
    must be identical either way (parity is pinned by
    test_broadcast_gate_fallback_parity)."""
    import re

    pol_all = spark.createDataFrame([("*", 50)], "host string, budget int")

    # cached + ratio 200/400 = 0.5 ≥ gate → broadcast despite limit=10
    cand = _mk_candidates(spark, 400, hosts=4).cache()
    cand.count()
    sched_hi, _ = schedule_round(cand, pol_all, broadcast_row_limit=10)
    plan_hi = sched_hi._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"BroadcastHashJoin \[url_key", plan_hi), "high-ratio winner join not broadcast"

    # cached + ratio 40/400 = 0.1 < gate → stays shuffle
    pol_low = spark.createDataFrame([("*", 10)], "host string, budget int")
    sched_lo, _ = schedule_round(cand, pol_low, broadcast_row_limit=10)
    plan_lo = sched_lo._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"BroadcastHashJoin \[url_key\S*", plan_lo):
        raise AssertionError(f"low-ratio winner join still broadcast: {m.group(0)}")
    cand.unpersist()


def test_newline_urls_through_politeness_and_robots(spark):
    """'\\n'-bearing raw URLs (r2 canonicalizer fix) must keep flowing
    through the HOST-keyed joins: politeness budgets and robots rules match
    the cleaned host, and robots still drops the disallowed path/robots.txt
    even when the raw URL carried a trailing newline."""
    from warcbase_spark.frontier.crawl import canonicalize_candidates
    from warcbase_spark.frontier.robots import apply_robots

    raw = spark.createDataFrame(
        [
            ("http://h0.org/keep\n",),
            ("http://h0.org/private/x\n",),  # disallowed prefix
            ("http://h0.org/robots.txt\n",),
            ("http://h1.org/also\nkeep",),  # embedded newline
        ],
        "url string",
    )
    cand = canonicalize_candidates(raw).withColumn("priority", F.lit(0))
    robots = spark.createDataFrame(
        [("h0.org", "/private")], "host string, path_prefix string"
    )
    kept = apply_robots(cand, robots)
    keys = sorted(r["url_key"] for r in kept.collect())
    assert keys == ["org.h0/keep", "org.h1/alsokeep"]

    pol = spark.createDataFrame([("h0.org", 5), ("*", 1)], "host string, budget int")
    sched, _ = schedule_round(kept, pol)
    hosts = {r["host"] for r in sched.collect()}
    assert hosts == {"h0.org", "h1.org"}  # both hosts matched their budget row
