"""The frontier round loop — checkpointed, resumable, metric-instrumented.

Replaces the reference's HBase-backed crawl-management layer
(HBaseTableManager.java:85-100 row-at-a-time puts; IngestFiles.java:257-280
sequential ingest loop; FST membership gate ExtractLinksWac.java:159). Each
round is one deterministic micro-batch:

    frontier_r --politeness window--> schedule_r        (+ spill, priority+1)
    schedule_r --> seen += schedule_r                    (append-only delta)
    schedule_r ⋈ documents --> fetched docs
    fetched --explode link spans--> outlinks --canonicalize+hash-->
      --robots--> --batch dedup--> --Bloom prefilter + exact anti-join vs seen-->
      fresh candidates
    frontier_{r+1} = merge(spill, fresh)

Checkpoint protocol (Iceberg-snapshot semantics without the Iceberg jars,
which this image lacks): every table written for round r goes to its own
immutable ``<table>/round=r`` Parquet directory (append-only deltas for
``seen``; full next-frontier snapshots), and the round is COMMITTED only by
an atomic ``os.replace`` of ``manifest.json`` naming the last durable round.
A crash between data writes and the manifest swap leaves a dangling
uncommitted directory that the resumed run simply overwrites — exactly-once
without trusting ``_SUCCESS`` markers (SURVEY §7.3).

Metrics (counter parity with ExtractLinksWac.java:77-79,479-482 and
IngestFiles.java:68-71,277) are persisted per round in ``metrics/``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from warcbase_spark.frontier.robots import apply_robots
from warcbase_spark.functions.urls import canonical_cols
from warcbase_spark.operators.extract import extract_links
from warcbase_spark.operators.scheduler import schedule_round_combined
from warcbase_spark.operators.seen import (
    BloomParams,
    CogroupedBloom,
    CuckooParams,
    ShardedBloom,
    build_bloom,
    build_bloom_jvm,
    build_bloom_shards,
    build_cuckoo,
    dedup_against_seen,
)


def canonicalize_candidates(df: DataFrame, url_col: str = "url") -> DataFrame:
    """url → (url_key, host, url_hash); invalid URLs get null url_key.
    Canonicalization is the Arrow-vectorized UDF; host + hash derive from
    the key JVM-side/vectorized."""
    url_key, host = canonical_cols(F.col(url_col))
    return (
        df.withColumn("url_key", url_key)
        .withColumn("host", host)
        .withColumn("url_hash", F.xxhash64("url_key"))
    )


@dataclass
class RoundMetrics:
    round: int
    records: int = 0
    html_pages: int = 0
    links: int = 0
    dedup_hits: int = 0
    bloom_hits: int = 0
    scheduled: int = 0
    spilled: int = 0
    robots_blocked: int = 0
    invalid_urls: int = 0


class FrontierCrawl:
    """Drives the crawl over a documents corpus directory
    (documents/seeds/politeness/robots parquet, fixtures.py layout)."""

    def __init__(
        self,
        spark: SparkSession,
        corpus_dir: str,
        state_dir: str,
        max_rounds: int = 100,
        salt_k: int = 16,
        use_bloom: bool = True,
        bloom_fpp: float = 0.01,
        bloom_shards: int = 32,
        bloom_mode: str = "jvm",
        compact_every: int = 8,
        broadcast_row_limit: int = 2_000_000,
        winner_broadcast_limit: int | None = None,
        seen_layout: str = "deltas",
        seen_buckets: int = 32,
    ) -> None:
        self.spark = spark
        self.corpus_dir = corpus_dir
        self.state_dir = state_dir
        self.max_rounds = max_rounds
        self.salt_k = salt_k
        self.use_bloom = use_bloom
        self.bloom_fpp = bloom_fpp
        self.bloom_shards = bloom_shards
        self.compact_every = compact_every
        # fetch-side scheduled∩docs semi-join broadcast gate: an OOM guard
        # (10^10-frontier rounds can schedule millions of URLs); broadcast
        # stays right up to this limit because it spares the LARGE docs
        # table a shuffle
        self.broadcast_row_limit = broadcast_row_limit
        # scheduler winner-join gate: a measured perf crossover (see
        # scheduler.DEFAULT_BROADCAST_ROW_LIMIT) — the winner broadcast
        # build is driver-serial, so past ~100k winners the shuffle join is
        # both faster and the one that scales N→4N
        from warcbase_spark.operators.scheduler import DEFAULT_BROADCAST_ROW_LIMIT

        self.winner_broadcast_limit = (
            DEFAULT_BROADCAST_ROW_LIMIT
            if winner_broadcast_limit is None
            else winner_broadcast_limit
        )
        self.bloom_mode = bloom_mode  # "jvm" (bloom_filter_agg/might_contain,
        # zero Python in the probe), "sharded" (numpy ShardedBloom, collected
        # + broadcast), "cogrouped" (the 10^10-key path: the shard-bitmap
        # table never transits the driver — candidates are routed to their
        # shard's bitmap by hash and probed cogrouped), or "cuckoo"
        # (deletion-capable ShardedCuckoo, the north rule's named
        # alternative; broadcast probe)
        self._bloom: ShardedBloom | None = None
        # seen_layout: "deltas" (default — the gate anti-joins the
        # base+delta parquet dirs) or "bucketed" — the gate probes an
        # incrementally-maintained partitioned+bucketed catalog table
        # (sinks.upsert_bucketed_incremental): each round commit rewrites
        # ONLY the bucket-partitions the round's delta touches, and the
        # exact anti-join plans with NO Exchange and NO Sort on the seen
        # side (the amortized co-located layout for a set probed by every
        # round). The delta dirs stay the durable source of truth either
        # way — resume semantics are identical.
        if seen_layout not in ("deltas", "bucketed"):
            raise ValueError(f"seen_layout must be 'deltas' or 'bucketed', got {seen_layout!r}")
        self.seen_layout = seen_layout
        self.seen_buckets = seen_buckets
        import hashlib as _hashlib

        self._seen_table = "seen_bkt_" + _hashlib.md5(state_dir.encode()).hexdigest()[:8]
        os.makedirs(state_dir, exist_ok=True)

        self.politeness = spark.read.parquet(f"{corpus_dir}/politeness.parquet")
        self.robots = spark.read.parquet(f"{corpus_dir}/robots.parquet")

    # ---------------- state paths ----------------

    def _p(self, table: str, rnd: int) -> str:
        return f"{self.state_dir}/{table}/round={rnd:05d}"

    @property
    def _manifest_path(self) -> str:
        return f"{self.state_dir}/manifest.json"

    def _commit(
        self,
        rnd: int,
        frontier_rows: int,
        seen_base: int | None = None,
        scheduled_delta: int = 0,
        seen_rows_before: int | None = None,
        seen_bucketed_round: int | None = None,
    ) -> None:
        m = self.load_manifest() or {}
        if seen_base is None:
            seen_base = m.get("seen_base_round", -1)
        # running total of seen rows (per-round deltas are disjoint because
        # the seen gate never re-schedules a key) — sizes the Bloom build
        # without a count() job per round. A LEGACY manifest (predates the
        # counter) must be seeded from an exact count, not 0 — otherwise the
        # committed total undercounts forever and every later Bloom is sized
        # far below the true seen set (fpp blowout). run_round passes the
        # count it already took (jvm/cogrouped modes); otherwise count once
        # here — the field exists in every manifest written after this.
        if seen_rows_before is None:
            if "seen_rows" in m:
                seen_rows_before = m["seen_rows"]
            elif rnd > 0:
                seen_rows_before = self._seen(rnd - 1).count()
            else:
                seen_rows_before = 0
        seen_rows = seen_rows_before + scheduled_delta
        manifest = {
            "last_committed_round": rnd,
            "next_frontier_rows": frontier_rows,
            "seen_base_round": seen_base,
            "seen_rows": seen_rows,
        }
        if seen_bucketed_round is not None:
            # ONLY run_round passes this, after it actually synced the
            # bucketed table to this round; every other commit (recrawl,
            # stale-counter repair, bootstrap) preserves the existing
            # marker — stamping blindly here would claim deltas the table
            # never received (a permanent hole in the bucketed seen set)
            manifest["seen_bucketed_round"] = seen_bucketed_round
            manifest["seen_bucket_count"] = self.seen_buckets
        else:
            for k in ("seen_bucketed_round", "seen_bucket_count"):
                if k in m:
                    manifest[k] = m[k]
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path)  # the atomic commit point

    def load_manifest(self) -> dict | None:
        if not os.path.exists(self._manifest_path):
            return None
        with open(self._manifest_path) as f:
            return json.load(f)

    # ---------------- derived inputs ----------------

    def _docs_keyed(self) -> DataFrame:
        """Documents with canonical url_key — the fetchable index. Derived
        once and persisted (at cluster scale this is the Iceberg documents
        table's sort key, computed at ingest)."""
        path = f"{self.state_dir}/docs_keyed"
        if not os.path.exists(path):
            docs = self.spark.read.parquet(f"{self.corpus_dir}/documents.parquet")
            canonicalize_candidates(docs, "url").write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def _seen(self, upto_round: int) -> DataFrame:
        """Seen set = compacted base (≤ seen_base_round) + per-round deltas
        after it, minus recrawl tombstones. Append-only Iceberg-style deltas
        with periodic compaction (``compact_every``) so a 10k-round crawl
        reads O(compact_every) files, not 10k delta dirs.

        Tombstones (written by ``unsee``) carry the round they were issued
        at; a seen row dies iff its ``first_round`` ≤ the key's latest
        tombstone round — so a key re-discovered AFTER its tombstone is
        seen again, and re-applying old tombstones over a compacted base is
        idempotent."""
        m = self.load_manifest() or {}
        base_round = m.get("seen_base_round", -1)
        paths = []
        if base_round >= 0 and base_round <= upto_round:
            paths.append(f"{self.state_dir}/seen_base/round={base_round:05d}")
            start = base_round + 1
        else:
            start = 0
        paths += [
            self._p("seen", r)
            for r in range(start, upto_round + 1)
            if os.path.exists(self._p("seen", r))
        ]
        if not paths:
            return self.spark.createDataFrame([], "url_key string, url_hash long, first_round int")
        seen = self.spark.read.parquet(*paths)
        return self._apply_tombstones(seen)

    def _apply_tombstones(self, seen: DataFrame) -> DataFrame:
        tomb_dirs = self._tombstone_dirs()
        if tomb_dirs:
            tomb = (
                self.spark.read.parquet(*tomb_dirs)
                .groupBy("url_key")
                .agg(F.max("ts_round").alias("ts_round"))
            )
            # gate the hint on the on-disk byte size (free driver-side
            # stat — no count job): typical TTL batches broadcast; a mass
            # recrawl's tombstone set shuffle-joins instead of OOMing
            # (AQE is off inside rounds, so no runtime fallback exists)
            if self._dir_bytes(tomb_dirs) < 64 << 20:
                tomb = F.broadcast(tomb)
            seen = (
                seen.join(tomb, "url_key", "left")
                .filter(F.col("ts_round").isNull() | (F.col("first_round") > F.col("ts_round")))
                .drop("ts_round")
            )
        return seen

    # ---------------- bucketed seen layout ----------------

    @property
    def _seen_bucketed_path(self) -> str:
        return f"{self.state_dir}/seen_bucketed"

    def _rebuild_seen_bucketed(self, upto_round: int) -> None:
        from warcbase_spark.operators.sinks import write_bucketed_incremental_init

        write_bucketed_incremental_init(
            self._seen(upto_round),
            self._seen_table,
            self._seen_bucketed_path,
            key="url_key",
            n_buckets=self.seen_buckets,
        )

    def _sync_seen_bucketed(self, rnd: int) -> None:
        """Bring the incremental bucketed table up to round ``rnd``. The
        manifest's ``seen_bucketed_round`` names the last delta REFLECTED at
        commit time; the upsert is idempotent (delta keys replace existing
        rows), so re-applying round ``rnd`` after a crash-resume converges.
        A missing table dir (first run / layout switch) triggers one full
        build; afterwards each round costs only its affected buckets."""
        from warcbase_spark.operators.sinks import (
            register_bucketed_incremental,
            upsert_bucketed_incremental,
        )

        m = self.load_manifest() or {}
        sbr = m.get("seen_bucketed_round")
        if (
            sbr is None
            or not os.path.isdir(self._seen_bucketed_path)
            # bucket-count drift: a resume with a different seen_buckets
            # would re-declare the old files under a new bucket spec —
            # hash(key) % new_n routes keys to the wrong buckets and the
            # gate silently re-crawls seen URLs. Rebuild under the current
            # count instead (the delta dirs are the durable truth).
            or m.get("seen_bucket_count") != self.seen_buckets
        ):
            self._rebuild_seen_bucketed(rnd)
            return
        if not self.spark.catalog.tableExists(self._seen_table):
            register_bucketed_incremental(
                self.spark,
                self._seen_table,
                self._seen_bucketed_path,
                "url_key STRING, url_hash BIGINT, first_round INT",
                key="url_key",
                n_buckets=self.seen_buckets,
            )
        for r in range(sbr + 1, rnd + 1):
            if os.path.exists(self._p("seen", r)):
                delta = self.spark.read.parquet(self._p("seen", r))
                upsert_bucketed_incremental(
                    self.spark, self._seen_table, delta,
                    key="url_key", n_buckets=self.seen_buckets,
                )

    def _seen_bucketed_df(self, upto_round: int) -> DataFrame:
        """The seen set served from the bucketed table: same rows as
        ``_seen(upto_round)``, but the scan is catalog-bucketed — the gate's
        exact anti-join plans Exchange-free and Sort-free on this side."""
        seen = (
            self.spark.table(self._seen_table)
            .where(F.col("first_round") <= upto_round)
            .drop("pbucket")
        )
        return self._apply_tombstones(seen)

    def _tombstone_dirs(self, upto_round: int | None = None) -> list[str]:
        root = f"{self.state_dir}/tombstones"
        if not os.path.isdir(root):
            return []
        dirs = sorted(f"{root}/{d}" for d in os.listdir(root) if d.startswith("round="))
        if upto_round is not None:
            dirs = [d for d in dirs if int(d.rsplit("=", 1)[1]) <= upto_round]
        return dirs

    @staticmethod
    def _dir_bytes(dirs: list[str]) -> int:
        total = 0
        for d in dirs:
            for name in os.listdir(d):
                try:
                    total += os.path.getsize(os.path.join(d, name))
                except OSError:
                    pass
        return total

    def _maybe_compact_seen(self, rnd: int) -> int | None:
        """Rewrite the full seen set (base + deltas ≤ rnd) into one sorted
        snapshot; becomes effective atomically via the manifest's
        seen_base_round. Sorted by url_key → Parquet min/max prune point
        lookups (the HBase-rowkey-scan analogue)."""
        if self.compact_every <= 0 or (rnd + 1) % self.compact_every != 0:
            return None
        out = f"{self.state_dir}/seen_base/round={rnd:05d}"
        self._seen(rnd).sortWithinPartitions("url_key").write.mode("overwrite").parquet(out)
        return rnd

    def _rebuild_bloom(self, upto_round: int, expected_extra: int = 0) -> ShardedBloom | None:
        if not self.use_bloom:
            return None
        seen = self._seen(upto_round)
        n = seen.count() + expected_extra
        params = BloomParams.size(max(n * 4, 4096), self.bloom_fpp, self.bloom_shards)
        return build_bloom(seen, params) if n else ShardedBloom(params, {})

    # ---------------- round 0 bootstrap ----------------

    def bootstrap(self) -> None:
        seeds = self.spark.read.parquet(f"{self.corpus_dir}/seeds.parquet")
        cand = canonicalize_candidates(seeds, "url").filter(F.col("url_key").isNotNull())
        cand = apply_robots(cand, self.robots)
        frontier = (
            cand.groupBy("url_key")
            .agg(
                F.min("url").alias("url"),
                F.first("host").alias("host"),
                F.first("url_hash").alias("url_hash"),
                F.max("priority").alias("priority"),
                F.lit(0).alias("discovered_round"),
            )
        )
        frontier.write.mode("overwrite").parquet(self._p("frontier", 0))
        self._commit(-1, frontier.count())

    # ---------------- one round ----------------

    def run_round(self, rnd: int) -> RoundMetrics:
        """One crawl round in THREE Spark actions (plus the tiny metrics
        write): schedule write, seen-delta write, and the frontier write that
        streams fetch→extract→canonicalize→robots→dedup→merge end-to-end.
        Every counter is an ``observe()`` metric riding those passes — the
        round-1 design ran ~10 extra ``.count()`` jobs per round, which at a
        10k-round crawl is the dominant scheduler overhead.

        AQE is disabled for the round's actions (restored after): the round's
        stage graph is FIXED and its skew is handled explicitly (politeness
        salting, static shuffle partitioning), so AQE's per-exchange
        materialization only adds driver-serial sub-jobs — measured 16% of
        round wall-clock at local[4] (BENCH.md A/B), repeated every round.
        AQE stays on session-wide for ad-hoc analytics."""
        spark = self.spark
        aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            return self._run_round_inner(rnd)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)

    def _run_round_inner(self, rnd: int) -> RoundMetrics:
        spark = self.spark
        m = RoundMetrics(round=rnd)
        frontier = spark.read.parquet(self._p("frontier", rnd))
        to_unpersist: list[DataFrame] = []

        # one-pass politeness output: single winner broadcast; scheduled and
        # spilled are filters over the same cached frame (at cluster scale
        # this frame is written once, partitioned by the scheduled flag)
        obs_round = Observation()
        joined = (
            schedule_round_combined(
                frontier, self.politeness, self.salt_k,
                cache_registry=to_unpersist,
                broadcast_row_limit=self.winner_broadcast_limit,
            )
            .observe(
                obs_round,
                F.count(F.lit(1)).alias("n_frontier_rows"),
                F.count("seq").alias("n_scheduled"),
            )
            .cache()
        )
        to_unpersist.append(joined)
        scheduled = joined.filter(F.col("seq").isNotNull())
        spilled = (
            joined.filter(F.col("seq").isNull())
            .drop("seq")
            .withColumn("priority", F.col("priority") + F.lit(1))
        )

        # action 1 — schedule write; materializes the cache, fires obs_round.
        # Written with NATURAL partitioning: Σ budgets can be millions of
        # rows per round at 10^10-frontier scale (scheduler.py docstring), so
        # a coalesce(1) here would funnel the whole round's schedule through
        # ONE task — a serialization point on the hot path (VERDICT r2 #2).
        (
            scheduled.select(
                F.lit(rnd).alias("round"), "seq", "url_key", "url", "host",
                "priority",
            )
            .write.mode("overwrite").parquet(self._p("schedule", rnd))
        )
        m.scheduled = int(obs_round.get["n_scheduled"])
        m.spilled = int(obs_round.get["n_frontier_rows"]) - m.scheduled

        # action 2 — seen delta write (reads the joined cache)
        (
            scheduled.select("url_key", "url_hash", F.lit(rnd).alias("first_round"))
            .write.mode("overwrite").parquet(self._p("seen", rnd))
        )

        # fetch: scheduled ∩ corpus (semi-join on the sorted key). The
        # scheduled-key set is broadcast ONLY while it fits (m.scheduled is
        # already known from obs_round — free); a 10^10-frontier round with
        # millions of winners would OOM an unconditional broadcast, so past
        # the gate it degrades to a shuffle semi-join on url_key.
        docs = self._docs_keyed()
        sched_keys = scheduled.select("url_key")
        if m.scheduled <= self.broadcast_row_limit:
            sched_keys = F.broadcast(sched_keys)
        obs_fetch = Observation()
        fetched = docs.join(sched_keys, "url_key", "left_semi").observe(
            obs_fetch,
            F.count(F.lit(1)).alias("records"),
            F.coalesce(
                F.sum(
                    F.col("mime_type")
                    .isin("text/html", "application/xhtml+xml")
                    .cast("long")
                ),
                F.lit(0),
            ).alias("html_pages"),
        )

        links = extract_links(fetched.drop("url_key", "host", "url_hash"))

        obs_cand = Observation()
        cand = canonicalize_candidates(
            links.select(F.col("dst_url").alias("url")), "url"
        ).observe(
            obs_cand,
            F.count(F.lit(1)).alias("links"),
            F.coalesce(F.sum(F.col("url_key").isNull().cast("long")), F.lit(0)).alias(
                "invalid"
            ),
        )
        cand = cand.filter(F.col("url_key").isNotNull())
        obs_robots = Observation()
        cand = apply_robots(cand, self.robots).observe(
            obs_robots, F.count(F.lit(1)).alias("after_robots")
        )

        # batch-level dedup (per-page + cross-page within the round)
        obs_uniq = Observation()
        cand = (
            cand.groupBy("url_key")
            .agg(
                F.min("url").alias("url"),
                F.first("host").alias("host"),
                F.first("url_hash").alias("url_hash"),
            )
            .withColumn("priority", F.lit(0))
            .withColumn("discovered_round", F.lit(rnd + 1))
            .observe(obs_uniq, F.count(F.lit(1)).alias("unique"))
        )

        # URL-seen gate: Bloom prefilter + exact anti-join (incl. this round)
        if self.seen_layout == "bucketed":
            self._sync_seen_bucketed(rnd)
            seen = self._seen_bucketed_df(rnd)
        else:
            seen = self._seen(rnd)
        seen_rows_before: int | None = None  # legacy-manifest seed for _commit

        def _n_seen_pre() -> int:
            # Sizing comes from the manifest's running seen_rows counter
            # (deltas are disjoint by the seen gate itself), not a per-round
            # count() job; legacy manifests count once and pass the result
            # through to _commit so the committed counter is re-seeded
            # correctly (not reset to this round's delta).
            nonlocal seen_rows_before
            mft = self.load_manifest() or {}
            n = mft.get("seen_rows")
            if n is None:  # legacy manifest — count once
                n = self._seen(rnd - 1).count() if rnd > 0 else 0
                seen_rows_before = n
            return n

        if not self.use_bloom:
            bloom = None
        elif self.bloom_mode == "jvm":
            # stateless per-round build: one distributed partial-agg pass
            # over the committed seen deltas (checkpoint-friendly — resume
            # needs no filter state)
            n_seen = _n_seen_pre() + m.scheduled
            bloom = build_bloom_jvm(seen, max(n_seen * 2, 4096), self.bloom_fpp)
        elif self.bloom_mode == "cogrouped":
            # stateless per-round distributed build, same sizing source as
            # the jvm mode; the (shard, bitmap) table stays executor-side
            # end-to-end (build agg → shuffle-on-shard cogroup probe)
            n_seen = _n_seen_pre() + m.scheduled
            params = BloomParams.size(
                max(n_seen * 2, 4096), self.bloom_fpp, self.bloom_shards
            )
            bloom = CogroupedBloom(params, build_bloom_shards(seen, params))
        elif self.bloom_mode == "cuckoo":
            # the north rule's named alternative: deletion-capable filter
            # (recrawl-after-TTL un-sees URLs); stateless per-round build,
            # same sizing source as the jvm mode
            n_seen = _n_seen_pre() + m.scheduled
            bloom = build_cuckoo(seen, CuckooParams.size(max(n_seen * 2, 4096), self.bloom_shards))
        else:
            if self._bloom is None:
                self._bloom = self._rebuild_bloom(rnd - 1, expected_extra=m.scheduled)
            if self._bloom is not None:
                newly = build_bloom(scheduled.select("url_key"), self._bloom.params)
                self._bloom = _merge_blooms(self._bloom, newly)
            bloom = self._bloom
        obs_dedup = Observation()
        fresh, _maybe = dedup_against_seen(
            spark, cand, seen, bloom,
            observation=obs_dedup, cache_registry=to_unpersist,
        )
        obs_fresh = Observation()
        fresh = fresh.observe(obs_fresh, F.count(F.lit(1)).alias("n_fresh"))

        # next frontier = merge(spill, fresh); key-level merge keeps max
        # priority and the earliest discovery round
        obs_frontier = Observation()
        merged = (
            spilled.select("url_key", "url", "host", "url_hash", "priority", "discovered_round")
            .unionByName(fresh.select("url_key", "url", "host", "url_hash", "priority", "discovered_round"))
            .groupBy("url_key")
            .agg(
                F.min("url").alias("url"),
                F.first("host").alias("host"),
                F.first("url_hash").alias("url_hash"),
                F.max("priority").alias("priority"),
                F.min("discovered_round").alias("discovered_round"),
            )
            .observe(obs_frontier, F.count(F.lit(1)).alias("n_frontier"))
        )
        # action 3 — frontier write; the whole chain above streams through
        # it once, firing obs_fetch/obs_cand/obs_robots/obs_uniq/obs_dedup/
        # obs_fresh/obs_frontier
        merged.write.mode("overwrite").parquet(self._p("frontier", rnd + 1))

        m.records = int(obs_fetch.get["records"])
        m.html_pages = int(obs_fetch.get["html_pages"])
        m.links = int(obs_cand.get["links"])
        m.invalid_urls = int(obs_cand.get["invalid"])
        m.robots_blocked = (
            m.links - m.invalid_urls - int(obs_robots.get["after_robots"])
        )
        m.dedup_hits = int(obs_uniq.get["unique"]) - int(obs_fresh.get["n_fresh"])
        m.bloom_hits = int(obs_dedup.get["bloom_hits"] or 0)
        n_frontier = int(obs_frontier.get["n_frontier"])

        spark.createDataFrame([vars(m)]).coalesce(1).write.mode("overwrite").parquet(
            self._p("metrics", rnd)
        )
        new_base = self._maybe_compact_seen(rnd)
        if new_base is not None and self.seen_layout == "bucketed":
            # compaction prunes consumed tombstone dirs below — rebuild the
            # bucketed table first so tombstoned rows are physically gone
            # from it (read-side filtering can no longer hide them once the
            # dirs are pruned); compaction is already a full-rewrite event
            self._rebuild_seen_bucketed(rnd)
        elif new_base is not None and os.path.isdir(self._seen_bucketed_path):
            # compacting under the DELTAS layout while a bucketed table dir
            # exists from earlier bucketed rounds: the pruned tombstones are
            # about to become invisible to _apply_tombstones, so the stale
            # derived table could resurrect dead rows on a later layout
            # switch. Delete it — it's a derived layout; the next bucketed
            # run rebuilds from the delta dirs (the durable truth).
            import shutil as _shutil

            _shutil.rmtree(self._seen_bucketed_path, ignore_errors=True)
            # also drop the in-session catalog entry: a registered table
            # pointing at a deleted location errors/misleads later
            # same-session spark.table()/tableExists calls
            spark.sql(f"DROP TABLE IF EXISTS {self._seen_table}")
        self._commit(
            rnd,
            n_frontier,
            seen_base=new_base,
            scheduled_delta=m.scheduled,
            seen_rows_before=seen_rows_before,
            seen_bucketed_round=rnd if self.seen_layout == "bucketed" else None,
        )
        if new_base is not None:
            # tombstones ≤ the committed base round are fully reflected in
            # the base snapshot (and idempotent against any later delta:
            # first_round > ts_round keeps re-discovered keys) — prune them
            # AFTER the manifest commit so a crash before it cannot lose
            # deletes. Without pruning, every consumed tombstone dir is
            # re-read/re-joined on every round forever.
            import shutil as _shutil

            for d in self._tombstone_dirs(upto_round=new_base):
                _shutil.rmtree(d, ignore_errors=True)
        # unpersist exactly this round's intermediates (winner set, joined,
        # probe pass) — never clearCache(), which would drop caller-owned
        # caches in the shared session
        for df in to_unpersist:
            df.unpersist()
        return m

    # ---------------- full runs ----------------

    def run(self, max_rounds: int | None = None) -> list[RoundMetrics]:
        """Run (or resume) to completion. Resumption reads the manifest and
        continues from the first uncommitted round; the Bloom filter is
        rebuilt from the committed seen deltas (deterministic)."""
        max_rounds = max_rounds if max_rounds is not None else self.max_rounds
        manifest = self.load_manifest()
        if manifest is None:
            self.bootstrap()
            manifest = self.load_manifest()
        start = manifest["last_committed_round"] + 1
        if start > 0 and self.use_bloom and self.bloom_mode not in ("jvm", "cogrouped", "cuckoo"):
            self._bloom = self._rebuild_bloom(start - 1)
        out: list[RoundMetrics] = []
        rnd = start
        while rnd < max_rounds:
            self._heal_frontier(rnd)  # finish an interrupted recrawl swap
            if not os.path.exists(self._p("frontier", rnd)):
                break
            if self.load_manifest()["next_frontier_rows"] == 0:
                # recrawl's swap→commit crash window: the swapped-in
                # frontier dir exists but _commit never refreshed the
                # manifest, so next_frontier_rows is the stale 0 of a
                # finished crawl. Trust the directory, not the counter:
                # recount once and refresh the manifest before deciding.
                # (Counting only on the ==0 path keeps the hot loop free
                # of an extra count() job per round.)
                n = self.spark.read.parquet(self._p("frontier", rnd)).count()
                if n == 0:
                    break
                m = self.load_manifest()
                last = m["last_committed_round"]
                # legacy manifests (no seen_rows): the correct total is
                # count(_seen(last)) — _commit's own fallback counts
                # _seen(last-1), which drops the last round's delta and
                # would undersize every later bloom (same guard as
                # recrawl() above)
                srb = m.get("seen_rows")
                if srb is None:
                    srb = self._seen(last).count() if last >= 0 else 0
                self._commit(last, n, scheduled_delta=0, seen_rows_before=srb)
            out.append(self.run_round(rnd))
            rnd += 1
        return out

    # ---------------- result accessors ----------------

    def _round_paths(self, table: str) -> list[str]:
        """Explicit committed leaf dirs — passing leaves (not a glob/basePath)
        keeps Spark from inferring a `round` partition column that would
        collide with the embedded data column."""
        last = self.load_manifest()["last_committed_round"]
        return [self._p(table, r) for r in range(last + 1) if os.path.exists(self._p(table, r))]

    def schedule(self) -> DataFrame:
        return self.spark.read.parquet(*self._round_paths("schedule"))

    def url_seen(self) -> DataFrame:
        last = self.load_manifest()["last_committed_round"]
        return self._seen(last)

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(*self._round_paths("metrics"))

    # ---------------- recrawl (the deletion story) ----------------

    def unsee(self, urls: DataFrame, url_col: str = "url") -> int:
        """Delete URLs from the seen set (recrawl-after-TTL — the HBase
        layer's implicit delete, HBaseTableManager row deletes). Writes a
        TOMBSTONE delta honored by ``_seen``: the key's seen rows with
        ``first_round`` ≤ the tombstone round die; a later re-discovery
        re-adds it. Idempotent (max-tombstone-round wins); the manifest's
        seen_rows counter becomes an upper bound, which only oversizes the
        Bloom/cuckoo build (correctness lives in the exact anti-join).
        Returns the number of tombstoned keys."""
        last = (self.load_manifest() or {}).get("last_committed_round", -1)
        keys = (
            canonicalize_candidates(urls, url_col)
            .filter(F.col("url_key").isNotNull())
            .select("url_key")
            .distinct()
            .withColumn("ts_round", F.lit(last))
            .cache()
        )
        n = keys.count()  # THIS call's key count, not the dir's running total
        try:
            out = f"{self.state_dir}/tombstones/round={last:05d}"
            # append, not overwrite: two unsee() calls in the same round must
            # both survive (duplicate keys are harmless — max ts_round wins)
            keys.write.mode("append").parquet(out)
            m_bkts = (self.load_manifest() or {}).get("seen_bucket_count")
            if (
                self.seen_layout == "bucketed"
                and os.path.isdir(self._seen_bucketed_path)
                and m_bkts == self.seen_buckets  # drift → next sync rebuilds anyway
            ):
                # apply the delete to the bucketed layout eagerly (per-bucket
                # rewrite) — every current row of these keys has
                # first_round <= last, so dropping the keys outright equals the
                # tombstone rule; a later re-discovery re-upserts with a newer
                # first_round that the read-side filter keeps. The tombstone
                # dirs remain the durable truth: a crash between the append
                # above and this delete is covered by _apply_tombstones, and
                # re-running unsee re-deletes (no-op). Without this, deleted
                # rows linger (read-filtered) until the compaction rebuild.
                from warcbase_spark.operators.sinks import (
                    delete_bucketed_incremental,
                    register_bucketed_incremental,
                )

                if not self.spark.catalog.tableExists(self._seen_table):
                    register_bucketed_incremental(
                        self.spark, self._seen_table, self._seen_bucketed_path,
                        "url_key STRING, url_hash BIGINT, first_round INT",
                        key="url_key", n_buckets=self.seen_buckets,
                    )
                delete_bucketed_incremental(
                    self.spark, self._seen_table, keys.select("url_key"),
                    key="url_key", n_buckets=self.seen_buckets,
                )
        finally:
            keys.unpersist()
        return n

    def recrawl(self, urls: DataFrame, url_col: str = "url", priority: int = 0) -> None:
        """Schedule URLs for a fresh fetch: tombstone their seen rows and
        seed them into the next frontier round (merging with any pending
        frontier). ``run()`` then picks them up like newly discovered
        URLs — they flow through politeness, dedup (now fresh), fetch and
        extraction exactly once more. Robots rules apply exactly as on
        every other frontier entry path (bootstrap seeds, extracted
        links); on a never-crawled state dir the normal bootstrap runs
        first so the corpus seeds are not silently dropped.

        Crash-recovery contract: tombstones are durably appended FIRST, so
        a crash before the frontier swap leaves keys unseen but not yet
        re-seeded — re-invoking ``recrawl`` with the same URLs repairs
        this (``unsee`` is idempotent, max-tombstone-round wins). A crash
        after the swap but before ``_commit`` leaves the manifest's
        ``next_frontier_rows`` stale; ``run()`` detects that (frontier dir
        present but counter 0), recounts, and refreshes the manifest."""
        if self.load_manifest() is None:
            self.bootstrap()
        self.unsee(urls, url_col)
        m = self.load_manifest() or {}
        last = m.get("last_committed_round", -1)
        nxt = last + 1
        cand = apply_robots(
            canonicalize_candidates(urls, url_col).filter(F.col("url_key").isNotNull()),
            self.robots,
        )
        cand = cand.groupBy("url_key").agg(
            F.min(url_col).alias("url"),
            F.first("host").alias("host"),
            F.first("url_hash").alias("url_hash"),
            F.lit(priority).alias("priority"),
            F.lit(nxt).alias("discovered_round"),
        )
        pending_path = self._p("frontier", nxt)
        if os.path.exists(pending_path):
            pending = self.spark.read.parquet(pending_path)
            cand = (
                pending.unionByName(cand)
                .groupBy("url_key")
                .agg(
                    F.min("url").alias("url"),
                    F.first("host").alias("host"),
                    F.first("url_hash").alias("url_hash"),
                    F.max("priority").alias("priority"),
                    F.min("discovered_round").alias("discovered_round"),
                )
            )
        # checkpoint-protocol-preserving swap: the merged frontier is fully
        # written to a sibling dir first, then swapped in with two metadata
        # ops — overwriting in place would delete the committed frontier
        # BEFORE the slow Spark write completes, so a crash mid-write
        # leaves a partial/absent frontier the manifest still points at.
        # The tiny rmtree→rename window is covered by _heal_frontier.
        import shutil as _shutil

        new = pending_path + ".new"
        _shutil.rmtree(new, ignore_errors=True)
        cand.write.mode("overwrite").parquet(new)
        n = self.spark.read.parquet(new).count()
        if os.path.exists(pending_path):
            _shutil.rmtree(pending_path)
        os.rename(new, pending_path)
        # legacy manifests: the correct pre-recrawl seen total is
        # count(_seen(last)) — NOT _commit's default count(_seen(last-1)),
        # which assumes the current round's delta arrives via
        # scheduled_delta (recrawl adds none)
        srb = m.get("seen_rows")
        if srb is None:
            srb = self._seen(last).count() if last >= 0 else 0
        self._commit(last, n, scheduled_delta=0, seen_rows_before=srb)

    def _heal_frontier(self, rnd: int) -> None:
        """Finish an interrupted ``recrawl`` swap: frontier dir missing but
        its fully-written ``.new`` sibling present → rename it in."""
        path = self._p("frontier", rnd)
        if not os.path.exists(path) and os.path.exists(path + ".new"):
            os.rename(path + ".new", path)


def _merge_blooms(a: ShardedBloom, b: ShardedBloom) -> ShardedBloom:
    shards = dict(a.shards)
    for sid, bm in b.shards.items():
        shards[sid] = (shards[sid] | bm) if sid in shards else bm
    return ShardedBloom(a.params, shards)
