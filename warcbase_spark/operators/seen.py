"""Partitioned Bloom URL-seen structure.

Replaces the reference's memory-mapped FST URL dictionary shipped to every
node via DistributedCache (UrlMapping.java:43-105; cached at
ExtractLinksWac.java:443, probed ``fst.getID(url) != -1`` at :159,177).
Semantics are *exact-set membership*: the Bloom filter is only a prefilter —
every positive is verified with an exact anti-join against the seen table
(SURVEY §7.1.2), so false positives can never drop a URL.

Scale design (10^10 keys): the filter is SHARDED by ``h1 mod n_shards``.
Each executor builds only its shard (map-side, one bitmap per shard via
applyInPandas), so no single task ever materializes the whole filter. At
sandbox scale the shards are collected and broadcast for an Arrow-batched
vectorized probe; at 10^10 scale (total ≈ 12 GB at 1% fpp) the probe
switches to the cogrouped form (``probe_bloom_cogrouped``) where candidate
rows are routed to their shard's bitmap by the same hash — a shuffle on an
evenly-distributed hash, no broadcast of the full filter.

Hashing: double hashing idx_i = (h1 + i*h2) mod m_shard with h1 =
xxhash64(url_key), h2 = xxhash64(url_key, salt) — both computed JVM-side.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_bloom_hashes(df: DataFrame, key_col: str = "url_key") -> DataFrame:
    """Attach the two 64-bit hashes (JVM-side xxhash64, codegen'd)."""
    return df.withColumn("h1", F.xxhash64(F.col(key_col))).withColumn(
        "h2", F.xxhash64(F.col(key_col), F.lit("\x01"))
    )


@dataclass
class BloomParams:
    n_shards: int
    bits_per_shard: int
    k: int

    @classmethod
    def size(cls, n_expected: int, fpp: float = 0.01, n_shards: int = 32) -> "BloomParams":
        # power-of-two shard count so `mod n_shards` commutes with the
        # non-negative pmod-2^62 applied to the raw xxhash64 values
        n_shards = 1 << max(0, (n_shards - 1).bit_length())
        n_expected = max(n_expected, 1)
        m_total = int(-n_expected * math.log(fpp) / (math.log(2) ** 2)) + 8
        k = max(1, round(m_total / n_expected * math.log(2)))
        bits = max(64, (m_total // n_shards // 8 + 1) * 8)
        return cls(n_shards=n_shards, bits_per_shard=bits, k=k)


@dataclass
class ShardedBloom:
    params: BloomParams
    shards: dict[int, np.ndarray]  # shard id → uint8 bitmap

    def contains_vec(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        p = self.params
        shard = np.mod(h1, p.n_shards).astype(np.int64)
        out = np.ones(len(h1), dtype=bool)
        base = np.mod(h1 // p.n_shards, p.bits_per_shard)
        step = np.mod(h2, p.bits_per_shard)
        for sid in np.unique(shard):
            bm = self.shards.get(int(sid))
            mask = shard == sid
            if bm is None:
                out[mask] = False
                continue
            hit = np.ones(mask.sum(), dtype=bool)
            b, s = base[mask], step[mask]
            for i in range(p.k):
                idx = np.mod(b + i * s, p.bits_per_shard)
                hit &= (bm[idx >> 3] & (1 << (idx & 7).astype(np.uint8))) != 0
            out[mask] = hit
        return out


def _set_bits(bm: np.ndarray, h1: np.ndarray, h2: np.ndarray, p: BloomParams) -> None:
    base = np.mod(h1 // p.n_shards, p.bits_per_shard)
    step = np.mod(h2, p.bits_per_shard)
    for i in range(p.k):
        idx = np.mod(base + i * step, p.bits_per_shard)
        np.bitwise_or.at(bm, idx >> 3, (1 << (idx & 7)).astype(np.uint8))


def build_bloom_shards(df: DataFrame, params: BloomParams, key_col: str = "url_key") -> DataFrame:
    """Fully distributed build: hash JVM-side, route rows to their shard,
    build each shard's bitmap in one Arrow-batched task. Returns the
    (shard, bitmap) table WITHOUT collecting — the 10^10-key form, where the
    filter never transits the driver (pair with ``probe_bloom_cogrouped``).
    Shuffle volume = 16 bytes/key."""
    p = params

    def per_shard(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(p.bits_per_shard // 8, dtype=np.uint8)
        _set_bits(bm, pdf["h1"].to_numpy(np.int64), pdf["h2"].to_numpy(np.int64), p)
        return pd.DataFrame({"shard": [key[0]], "bitmap": [bm.tobytes()]})

    hashed = with_bloom_hashes(df.select(key_col), key_col)
    # non-negative hashes so python % semantics match everywhere
    hashed = hashed.select(
        F.pmod(F.col("h1"), F.lit(1 << 62)).alias("h1"),
        F.pmod(F.col("h2"), F.lit(1 << 62)).alias("h2"),
        F.pmod(F.col("h1"), F.lit(p.n_shards)).cast("int").alias("shard"),
    )
    return hashed.groupBy("shard").applyInPandas(per_shard, schema="shard int, bitmap binary")


def build_bloom(df: DataFrame, params: BloomParams, key_col: str = "url_key") -> ShardedBloom:
    """Broadcast-regime build: the distributed shard build, then collect the
    (small) per-shard bitmaps — collected volume = n_shards × bits_per_shard/8
    regardless of key count."""
    rows = build_bloom_shards(df, params, key_col).collect()
    return ShardedBloom(params, {r["shard"]: np.frombuffer(r["bitmap"], dtype=np.uint8).copy() for r in rows})


@dataclass
class CogroupedBloom:
    """A sharded Bloom filter kept as a DataFrame — never driver-held, never
    broadcast. ``shards`` is the (shard, bitmap) table from
    ``build_bloom_shards`` (or read back from parquet)."""
    params: BloomParams
    shards: DataFrame


def bloom_shards_df(spark: SparkSession, bloom: ShardedBloom) -> DataFrame:
    """The sharded filter as a (shard, bitmap) table. At sandbox scale this
    comes straight from the in-memory shards; at 10^10-key scale the build
    job writes it as parquet (n_shards small rows of bits/8 bytes each) and
    the probe reads it back — the filter never transits the driver."""
    rows = [(int(sid), bytearray(bm.tobytes())) for sid, bm in bloom.shards.items()]
    return spark.createDataFrame(rows, "shard int, bitmap binary")


def probe_bloom_cogrouped(
    df: DataFrame,
    shards: DataFrame,
    params: BloomParams,
    key_col: str = "url_key",
    out_col: str = "maybe_seen",
) -> DataFrame:
    """The 10^10-key probe: candidates are routed to their shard by
    ``h1 mod n_shards`` (an evenly-distributed hash — no skew) and cogrouped
    with that shard's bitmap row, so each task holds exactly ONE shard
    bitmap (total ≈ 12 GB at 1% fpp never materializes in one place, and
    nothing is broadcast). Same double-hash kernel as the broadcast probe —
    parity-tested in test_bloom.py."""
    p = params
    cols = df.columns
    hashed = with_bloom_hashes(df, key_col).select(
        *cols,
        F.pmod(F.col("h1"), F.lit(1 << 62)).alias("_h1"),
        F.pmod(F.col("h2"), F.lit(1 << 62)).alias("_h2"),
        F.pmod(F.col("h1"), F.lit(p.n_shards)).cast("int").alias("shard"),
    )

    out_schema = hashed.drop("_h1", "_h2").schema.add(out_col, "boolean")

    def probe(cands: pd.DataFrame, bm_rows: pd.DataFrame) -> pd.DataFrame:
        if cands.empty:
            return cands.drop(columns=["_h1", "_h2"]).assign(**{out_col: pd.Series(dtype=bool)})
        h1 = cands["_h1"].to_numpy(np.int64)
        h2 = cands["_h2"].to_numpy(np.int64)
        if bm_rows.empty:
            hit = np.zeros(len(cands), dtype=bool)  # shard absent → definitely fresh
        else:
            bm = np.frombuffer(bm_rows["bitmap"].iloc[0], dtype=np.uint8)
            base = np.mod(h1 // p.n_shards, p.bits_per_shard)
            step = np.mod(h2, p.bits_per_shard)
            hit = np.ones(len(cands), dtype=bool)
            for i in range(p.k):
                idx = np.mod(base + i * step, p.bits_per_shard)
                hit &= (bm[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
        out = cands.drop(columns=["_h1", "_h2"]).copy()
        out[out_col] = hit
        return out

    return (
        hashed.groupBy("shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(probe, out_schema)
        .drop("shard")
    )


def probe_bloom(
    spark: SparkSession, df: DataFrame, bloom: ShardedBloom, key_col: str = "url_key",
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Broadcast probe (sandbox/default): Arrow-vectorized membership test.
    Adds boolean ``out_col``. Hashes computed JVM-side; only the bitmap
    lookup runs in numpy."""
    bc = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def _probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        b = bc.value
        return pd.Series(
            b.contains_vec(h1.to_numpy(np.int64), h2.to_numpy(np.int64))
        )

    hashed = with_bloom_hashes(df, key_col)
    h1 = F.pmod(F.col("h1"), F.lit(1 << 62))
    h2 = F.pmod(F.col("h2"), F.lit(1 << 62))
    return hashed.withColumn(out_col, _probe(h1, h2)).drop("h1", "h2")


# ---------------------------------------------------------------------------
# Cuckoo filter (the north rule's named alternative to Bloom).
#
# Fan et al., "Cuckoo Filter: Practically Better Than Bloom" (CoNEXT 2014):
# b-slot buckets of f-bit fingerprints, two candidate buckets per item
# (i2 = i1 XOR hash(fp)), supporting DELETION — the operation Bloom can't do
# (a crawl that un-sees URLs, e.g. recrawl-after-TTL, needs it).
#
# Engineering variant: displacement ("kicking") is an inherently sequential
# pointer chase, so the build here is fully VECTORIZED 2-choice placement
# with a bucket-saturation fallback — items that fit neither bucket set a
# saturation bit on their secondary bucket, and lookups in a saturated
# bucket always answer "maybe" — so false negatives remain impossible (the
# exact anti-join verifies positives, same contract as the Bloom modes).
# At the sized load factor (0.7) saturation is rare, so fpp stays near the
# theoretical 2b/2^f ≈ 1.2e-4 for b=4, f=16.
# ---------------------------------------------------------------------------

@dataclass
class CuckooParams:
    n_shards: int
    buckets_per_shard: int  # power of two (i2 = i1 XOR h(fp) needs it)
    slots: int = 4
    fp_bits: int = 16

    def __post_init__(self) -> None:
        # Both must be powers of two: buckets for the XOR partner index,
        # n_shards so the JVM route pmod(raw_h1, n_shards) agrees with the
        # numpy route mod(pmod(raw_h1, 2^62), n_shards) — they coincide
        # exactly when n_shards divides 2^62. size() guarantees this; a
        # hand-built CuckooParams must too, else probe lookups silently
        # miss shards (false "fresh" answers).
        for f in ("n_shards", "buckets_per_shard"):
            v = getattr(self, f)
            if v <= 0 or (v & (v - 1)) != 0:
                raise ValueError(f"CuckooParams.{f} must be a power of two, got {v}")

    @classmethod
    def size(cls, n_expected: int, n_shards: int = 32, load: float = 0.7) -> "CuckooParams":
        n_shards = 1 << max(0, (n_shards - 1).bit_length())
        per_shard = max(1, n_expected // n_shards)
        m = 1 << max(3, (int(per_shard / (4 * load)) - 1).bit_length() + 1)
        return cls(n_shards=n_shards, buckets_per_shard=m)


def _cuckoo_parts(h1: np.ndarray, h2: np.ndarray, p: CuckooParams):
    """(shard, fp, i1, i2) from the two 64-bit hashes. fp is nonzero
    (0 marks an empty slot); i2 is derivable from (i1, fp) alone, which is
    what makes deletion and the saturation fallback work."""
    shard = np.mod(h1, p.n_shards).astype(np.int64)
    fp = (np.mod(h2, (1 << p.fp_bits) - 1) + 1).astype(np.uint16)
    m = p.buckets_per_shard
    i1 = np.mod(h1 // p.n_shards, m).astype(np.int64)
    i2 = np.bitwise_xor(i1, np.mod(fp.astype(np.int64) * 0x5BD1E995, m))
    return shard, fp, i1, i2


def _place(table: np.ndarray, sat: np.ndarray, fp: np.ndarray, idx: np.ndarray,
           spill_mask: np.ndarray) -> np.ndarray:
    """Vectorized bucket fill: for items (fp, idx) place into free slots of
    their bucket in one pass (lexsort → per-bucket rank → fancy index).
    Returns the mask of items that did NOT fit. ``spill_mask`` marks items
    already known to be in their LAST candidate bucket — those saturate."""
    order = np.lexsort((fp, idx))
    sidx, sfp = idx[order], fp[order]
    # rank of each item within its bucket group
    first = np.ones(len(sidx), dtype=bool)
    first[1:] = sidx[1:] != sidx[:-1]
    group_start = np.maximum.accumulate(np.where(first, np.arange(len(sidx)), 0))
    rank = np.arange(len(sidx)) - group_start
    occ = (table[sidx] != 0).sum(axis=1)  # pre-pass occupancy
    slot = occ + rank
    fits = slot < table.shape[1]
    table[sidx[fits], slot[fits]] = sfp[fits]
    overflow = np.zeros(len(fp), dtype=bool)
    overflow[order[~fits]] = True
    if spill_mask is not None:
        sat[idx[overflow & spill_mask]] = True
    return overflow


def _delete_one_copy(table: np.ndarray, fp: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Vectorized single-bucket delete pass: remove one stored copy of
    ``fp`` from bucket ``idx`` per request, serving duplicate requests for
    the same (bucket, fp) from distinct slots. Returns per-request success.

    Mechanics mirror ``_place``: lexsort groups identical (bucket, fp)
    requests, rank-within-group r claims the r-th matching slot of a
    PRE-PASS snapshot of the bucket, so the fancy-index zeroing is
    race-free and each stored copy is consumed at most once."""
    order = np.lexsort((fp, idx))
    sidx, sfp = idx[order], fp[order]
    first = np.ones(len(sidx), dtype=bool)
    first[1:] = (sidx[1:] != sidx[:-1]) | (sfp[1:] != sfp[:-1])
    group_start = np.maximum.accumulate(np.where(first, np.arange(len(sidx)), 0))
    rank = np.arange(len(sidx)) - group_start
    matches = table[sidx] == sfp[:, None]          # pre-pass snapshot
    succ = rank < matches.sum(axis=1)
    cum = np.cumsum(matches, axis=1)
    slot = np.argmax(cum == (rank + 1)[:, None], axis=1)
    table[sidx[succ], slot[succ]] = 0
    out = np.zeros(len(fp), dtype=bool)
    out[order[succ]] = True
    return out


@dataclass
class ShardedCuckoo:
    params: CuckooParams
    # shard id → (bucket table [m, slots] uint16, saturation bits [m] bool)
    shards: dict[int, tuple[np.ndarray, np.ndarray]]

    @classmethod
    def build(cls, h1: np.ndarray, h2: np.ndarray, params: CuckooParams) -> "ShardedCuckoo":
        p = params
        shard, fp, i1, i2 = _cuckoo_parts(h1, h2, p)
        shards: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for sid in np.unique(shard):
            mask = shard == sid
            table = np.zeros((p.buckets_per_shard, p.slots), dtype=np.uint16)
            sat = np.zeros(p.buckets_per_shard, dtype=bool)
            f, a, b = fp[mask], i1[mask], i2[mask]
            over = _place(table, sat, f, a, spill_mask=None)   # primary pass
            if over.any():                                      # secondary pass
                _place(table, sat, f[over], b[over],
                       spill_mask=np.ones(int(over.sum()), dtype=bool))
            shards[int(sid)] = (table, sat)
        return cls(p, shards)

    def contains_vec(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        p = self.params
        shard, fp, i1, i2 = _cuckoo_parts(h1, h2, p)
        out = np.zeros(len(h1), dtype=bool)
        for sid in np.unique(shard):
            entry = self.shards.get(int(sid))
            mask = shard == sid
            if entry is None:
                continue
            table, sat = entry
            f, a, b = fp[mask], i1[mask], i2[mask]
            hit = (
                (table[a] == f[:, None]).any(axis=1)
                | (table[b] == f[:, None]).any(axis=1)
                | sat[a] | sat[b]
            )
            out[mask] = hit
        return out

    def delete_vec(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Remove ONE stored copy of each item's fingerprint (the cuckoo
        capability Bloom lacks). Returns per-item success. Deletes are exact
        only while the touched buckets never saturated — a saturated bucket
        may have dropped the fingerprint at build time, so removal there is
        refused (stays conservatively 'maybe seen').

        Fully vectorized (no per-row Python): requests are grouped by
        (bucket, fp) with a lexsort, each group consumes up to its bucket's
        stored-copy count in the primary pass, and only the remainder falls
        through to the secondary bucket — the same try-i1-then-i2 order as
        the scalar definition. The one divergence from a strictly
        sequential scan: when two DIFFERENT requests share a fingerprint
        and one's secondary bucket is the other's primary, which of them
        claims the single stored copy can differ. Total copies removed is
        identical, and the miss direction is conservative (the unserved
        key stays 'maybe seen'; the exact anti-join still rules)."""
        p = self.params
        shard, fp, i1, i2 = _cuckoo_parts(h1, h2, p)
        ok = np.zeros(len(h1), dtype=bool)
        for sid in np.unique(shard):
            entry = self.shards.get(int(sid))
            if entry is None:
                continue
            table, sat = entry
            mask = shard == sid
            f = fp[mask].astype(table.dtype)
            a, b = i1[mask], i2[mask]
            valid = ~(sat[a] | sat[b])
            succ = np.zeros(int(mask.sum()), dtype=bool)
            if valid.any():
                s1 = _delete_one_copy(table, f[valid], a[valid])
                rem = ~s1
                if rem.any():
                    s2 = _delete_one_copy(table, f[valid][rem], b[valid][rem])
                    s1[np.nonzero(rem)[0][s2]] = True
                succ[valid] = s1
            ok[mask] = succ
        return ok


def _cuckoo_hashed(df: DataFrame, params: CuckooParams, key_col: str) -> DataFrame:
    """(h1, h2, shard) columns, all JVM-side, non-negative so python %
    semantics match; shard routing key = h1 mod n_shards (power of two,
    commutes with the pmod)."""
    return with_bloom_hashes(df.select(key_col), key_col).select(
        F.pmod(F.col("h1"), F.lit(1 << 62)).alias("h1"),
        F.pmod(F.col("h2"), F.lit(1 << 62)).alias("h2"),
        F.pmod(F.col("h1"), F.lit(params.n_shards)).cast("int").alias("shard"),
    )


def _cuckoo_shard_to_row(sid: int, table: np.ndarray, sat: np.ndarray) -> dict:
    return {"shard": sid, "table": table.tobytes(), "sat": np.packbits(sat).tobytes()}


def _cuckoo_row_to_shard(p: CuckooParams, table_bytes: bytes, sat_bytes: bytes):
    table = (
        np.frombuffer(table_bytes, dtype=np.uint16)
        .reshape(p.buckets_per_shard, p.slots)
        .copy()
    )
    sat = np.unpackbits(np.frombuffer(sat_bytes, dtype=np.uint8)).astype(bool)[
        : p.buckets_per_shard
    ]
    return table, sat


_CUCKOO_SHARD_SCHEMA = "shard int, table binary, sat binary"


def build_cuckoo_shards(df: DataFrame, params: CuckooParams, key_col: str = "url_key") -> DataFrame:
    """Fully distributed build, mirroring ``build_bloom_shards``: rows are
    routed to their shard by ``h1 mod n_shards`` and each shard's bucket
    table + saturation bits are built in ONE Arrow-batched task. Returns
    the (shard, table, sat) DataFrame WITHOUT collecting — at 10^10 keys
    the filter (≈ 2.9 GB/shard at 32 shards, f=16, load 0.7) never
    transits the driver; write it as parquet and probe cogrouped.
    Shuffle volume = 16 bytes/key. The vectorized 2-choice placement is a
    pure function of each shard's key SET (lexsort order), so the result
    is bit-identical to the collected build."""
    p = params

    def per_shard(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        built = ShardedCuckoo.build(
            pdf["h1"].to_numpy(np.int64), pdf["h2"].to_numpy(np.int64), p
        )
        table, sat = built.shards[key[0]]
        return pd.DataFrame([_cuckoo_shard_to_row(key[0], table, sat)])

    return (
        _cuckoo_hashed(df, p, key_col)
        .groupBy("shard")
        .applyInPandas(per_shard, schema=_CUCKOO_SHARD_SCHEMA)
    )


def build_cuckoo(df: DataFrame, params: CuckooParams, key_col: str = "url_key") -> ShardedCuckoo:
    """Broadcast-regime build: the distributed per-shard build, then
    collect only the (small, fixed-size) shard tables — collected volume =
    n_shards × (buckets × slots × 2 B + buckets/8 B) regardless of key
    count; the key set itself never transits the driver (that was the old
    ``toPandas()`` form, kept as ``build_cuckoo_collected`` for the parity
    test only)."""
    rows = build_cuckoo_shards(df, params, key_col).collect()
    return ShardedCuckoo(
        params,
        {
            int(r["shard"]): _cuckoo_row_to_shard(params, r["table"], r["sat"])
            for r in rows
        },
    )


def build_cuckoo_collected(df: DataFrame, params: CuckooParams, key_col: str = "url_key") -> ShardedCuckoo:
    """Single-process reference build (collects every (h1, h2) pair to the
    driver). NOT a scale path — exists to pin distributed-build parity in
    tests: ``build_cuckoo`` must produce bit-identical shard tables."""
    pdf = _cuckoo_hashed(df, params, key_col).toPandas()
    return ShardedCuckoo.build(
        pdf["h1"].to_numpy(np.int64), pdf["h2"].to_numpy(np.int64), params
    )


def probe_cuckoo_cogrouped(
    df: DataFrame,
    shards: DataFrame,
    params: CuckooParams,
    key_col: str = "url_key",
    out_col: str = "maybe_seen",
) -> DataFrame:
    """The 10^10-key probe, mirroring ``probe_bloom_cogrouped``: candidates
    are routed to their shard by the same hash and cogrouped with that
    shard's (table, sat) row — each task holds exactly ONE shard table and
    nothing is broadcast. Same lookup kernel as ``contains_vec``."""
    p = params
    cols = df.columns
    hashed = with_bloom_hashes(df, key_col).select(
        *cols,
        F.pmod(F.col("h1"), F.lit(1 << 62)).alias("_h1"),
        F.pmod(F.col("h2"), F.lit(1 << 62)).alias("_h2"),
        F.pmod(F.col("h1"), F.lit(p.n_shards)).cast("int").alias("shard"),
    )
    out_schema = hashed.drop("_h1", "_h2").schema.add(out_col, "boolean")

    def probe(cands: pd.DataFrame, shard_rows: pd.DataFrame) -> pd.DataFrame:
        if cands.empty:
            return cands.drop(columns=["_h1", "_h2"]).assign(**{out_col: pd.Series(dtype=bool)})
        h1 = cands["_h1"].to_numpy(np.int64)
        h2 = cands["_h2"].to_numpy(np.int64)
        if shard_rows.empty:
            hit = np.zeros(len(cands), dtype=bool)  # shard absent → definitely fresh
        else:
            sid = int(shard_rows["shard"].iloc[0])
            table, sat = _cuckoo_row_to_shard(
                p, shard_rows["table"].iloc[0], shard_rows["sat"].iloc[0]
            )
            hit = ShardedCuckoo(p, {sid: (table, sat)}).contains_vec(h1, h2)
        out = cands.drop(columns=["_h1", "_h2"]).copy()
        out[out_col] = hit
        return out

    return (
        hashed.groupBy("shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(probe, out_schema)
        .drop("shard")
    )


def delete_cuckoo_cogrouped(
    shards: DataFrame,
    deletes: DataFrame,
    params: CuckooParams,
    key_col: str = "url_key",
) -> DataFrame:
    """Distributed deletion: route delete-keys to their shard, cogroup with
    the shard's (table, sat) row, apply the vectorized ``delete_vec``
    kernel inside the task, and emit the UPDATED shard row — the filter
    stays a DataFrame end to end (write the result over the old shard
    table). Shards receiving no deletes pass through unchanged."""
    p = params

    def apply_deletes(del_rows: pd.DataFrame, shard_rows: pd.DataFrame) -> pd.DataFrame:
        if shard_rows.empty:
            return pd.DataFrame(columns=["shard", "table", "sat"])
        sid = int(shard_rows["shard"].iloc[0])
        table, sat = _cuckoo_row_to_shard(
            p, shard_rows["table"].iloc[0], shard_rows["sat"].iloc[0]
        )
        if not del_rows.empty:
            sub = ShardedCuckoo(p, {sid: (table, sat)})
            sub.delete_vec(
                del_rows["h1"].to_numpy(np.int64), del_rows["h2"].to_numpy(np.int64)
            )
        return pd.DataFrame([_cuckoo_shard_to_row(sid, table, sat)])

    return (
        _cuckoo_hashed(deletes, p, key_col)
        .groupBy("shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(apply_deletes, schema=_CUCKOO_SHARD_SCHEMA)
    )


def probe_cuckoo(
    spark: SparkSession, df: DataFrame, cuckoo: ShardedCuckoo, key_col: str = "url_key",
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Arrow-vectorized membership probe, same shape as ``probe_bloom``."""
    bc = spark.sparkContext.broadcast(cuckoo)

    @F.pandas_udf("boolean")
    def _probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        c = bc.value
        return pd.Series(c.contains_vec(h1.to_numpy(np.int64), h2.to_numpy(np.int64)))

    hashed = with_bloom_hashes(df, key_col)
    h1 = F.pmod(F.col("h1"), F.lit(1 << 62))
    h2 = F.pmod(F.col("h2"), F.lit(1 << 62))
    return hashed.withColumn(out_col, _probe(h1, h2)).drop("h1", "h2")


# ---------------------------------------------------------------------------
# JVM bloom path (default for the broadcast regime).
#
# Spark's bloom_filter_agg is a declarative aggregate: every task builds a
# partial filter over its partition and the partials OR-merge up the agg
# tree, so the build is as distributed as the sharded numpy variant. The
# probe (might_contain over a binary literal) is pure JVM — measured: the
# pandas-UDF probe chained after the canonicalize UDF doubled the Python
# worker pool (2 ArrowEvalPython nodes/stage → 2×cores processes) and
# oversubscribed the box, INVERTING 8→32-core scaling. numpy ShardedBloom
# remains the 10^10-key path where one filter exceeds a single buffer
# (probe_bloom_cogrouped routes rows to shard bitmaps by hash).
# ---------------------------------------------------------------------------

def build_bloom_jvm(df: DataFrame, n_expected: int, fpp: float = 0.01,
                    key_col: str = "url_key") -> bytes:
    """Distributed JVM build over xxhash64(key): ``DataFrameStatFunctions.
    bloomFilter`` aggregates per-partition sketches and merges them (same
    build topology as the sharded numpy variant), serialized to bytes so it
    rides the physical plan to every task."""
    hashed = df.select(F.xxhash64(F.col(key_col)).alias("h"))
    jbf = hashed._jdf.stat().bloomFilter("h", max(int(n_expected), 1), fpp)
    jvm = df.sparkSession._jvm
    bos = jvm.java.io.ByteArrayOutputStream()
    jbf.writeTo(bos)
    return bytes(bos.toByteArray())


def probe_bloom_jvm(df: DataFrame, bloom_bytes: bytes, key_col: str = "url_key",
                    out_col: str = "maybe_seen") -> DataFrame:
    """Membership test fully inside the JVM (BloomFilterMightContain — the
    expression Spark's own runtime-filter rewrite uses; public Spark source,
    sql/catalyst). No Python worker in the probe.

    Requires classic (non-Connect) PySpark 4.x: bridges through
    ``org.apache.spark.sql.classic.ExpressionUtils``, which is version-locked
    internals. Callers (``dedup_against_seen``) catch failures and fall back
    to the exact anti-join, so other deployments degrade, not crash."""
    from pyspark.sql.column import Column as PyCol

    jvm = df.sparkSession._jvm
    eu = jvm.org.apache.spark.sql.classic.ExpressionUtils
    lit_expr = eu.expression(F.lit(bytearray(bloom_bytes))._jc)
    key_expr = eu.expression(F.xxhash64(F.col(key_col))._jc)
    mc = jvm.org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        lit_expr, key_expr
    )
    return df.withColumn(out_col, PyCol(eu.column(mc)))


def dedup_against_seen(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame,
    bloom: "ShardedBloom | CogroupedBloom | ShardedCuckoo | bytes | None",
    key_col: str = "url_key",
    observation=None,
    cache_registry: "list[DataFrame] | None" = None,
) -> tuple[DataFrame, DataFrame]:
    """Exact URL-seen dedup with Bloom prefilter.

    Returns (fresh, bloom_stats_df). ``fresh`` = candidates whose key is NOT
    in seen. Bloom negatives skip the join entirely (the common case in a
    growing crawl); Bloom positives are verified with a left_anti join so
    false positives cannot drop URLs — exact semantics of the reference's
    ``fst.getID(url) != -1`` gate (ExtractLinksWac.java:159,177).

    ``observation``: optional pyspark.sql.Observation; when given, a
    ``bloom_hits`` metric (count of Bloom-positive rows) is attached to the
    probe pass so callers get the counter for free on their next action
    instead of paying a separate ``.count()`` job. Attached on EVERY path
    (0 when there is no bloom) so ``observation.get`` never blocks.
    ``cache_registry``: optional list the probe-pass cache is appended to,
    so the caller can unpersist exactly this round's intermediates (never
    ``spark.catalog.clearCache()``, which would drop caller-owned caches).
    """

    def _observe_zero(df: DataFrame) -> DataFrame:
        if observation is None:
            return df
        # null-safe: max() over ZERO rows is NULL, and a late-crawl round can
        # legitimately produce zero candidates — coalesce so Observation.get
        # yields 0, not None (callers int() the value)
        return df.observe(
            observation, F.coalesce(F.max(F.lit(0)), F.lit(0)).alias("bloom_hits")
        )

    if bloom is None:
        return (
            _observe_zero(candidates).join(seen.select(key_col), key_col, "left_anti"),
            candidates.limit(0),
        )

    # Materialize the probe ONCE: both output branches consume it, and an
    # uncached plan would re-run the whole canonicalize+probe lineage (all
    # Arrow UDF passes) per branch.
    if isinstance(bloom, (bytes, bytearray)):
        try:
            probed = probe_bloom_jvm(candidates, bloom, key_col)
        except Exception:
            # JVM bridge unavailable (Spark Connect, or the 'classic'
            # internals moved in a future Spark) → exact anti-join, which is
            # always correct, just without the prefilter speedup.
            return (
                _observe_zero(candidates).join(seen.select(key_col), key_col, "left_anti"),
                candidates.limit(0),
            )
    elif isinstance(bloom, CogroupedBloom):
        probed = probe_bloom_cogrouped(candidates, bloom.shards, bloom.params, key_col)
    elif isinstance(bloom, ShardedCuckoo):
        probed = probe_cuckoo(spark, candidates, bloom, key_col)
    else:
        probed = probe_bloom(spark, candidates, bloom, key_col)
    if observation is not None:
        probed = probed.observe(
            observation,
            F.coalesce(
                F.sum(F.col("maybe_seen").cast("long")), F.lit(0)
            ).alias("bloom_hits"),
        )
    probed = probed.cache()
    if cache_registry is not None:
        cache_registry.append(probed)
    definitely_fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    verified_fresh = maybe.join(seen.select(key_col), key_col, "left_anti")
    return definitely_fresh.unionByName(verified_fresh), maybe
