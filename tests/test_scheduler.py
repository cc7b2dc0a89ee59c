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
