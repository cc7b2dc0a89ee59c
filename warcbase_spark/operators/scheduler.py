"""Per-host politeness priority queue (deterministic, skew-resistant).

The reference has no scheduler — its HBase ingest is a sequential loop
(IngestFiles.java:257-280) and its per-page ordering artifact is the global
URL sort used for FST construction (UrlMappingBuilder.java:72, 1-reducer
funnel at UrlMappingMapReduceBuilder.java:254). This operator supplies the
north rule's scheduler with those ordering semantics:

    within a round, rank candidates by (priority DESC, url_key ASC);
    schedule at most ``budget(host)`` per host; the rest spill to the next
    round with priority+1.

Skew: hot hosts (a wikipedia-like domain) would funnel one window
partition. The rank runs in TWO stages — stage 1 partitions by
(host, salt) where salt = pmod(xxhash64(url), K) and keeps only the top
``budget`` rows per salted partition (a provable superset of the final
top-budget, since a row's global in-host rank bounds its in-salt rank);
stage 2 re-ranks the ≤ K×budget survivors per host. Stage 1 bounds any
single task's window to ~|host|/K rows; stage 2's input is tiny by
construction. AQE skew-join handling remains on as a backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALT_K = 16


def add_global_seq(
    df: DataFrame,
    order: list,
    out_col: str = "seq",
    total_out: "list[int] | None" = None,
) -> DataFrame:
    """Deterministic global 1-based sequence by ``order`` WITHOUT a
    single-task window: range-partition + sort on the key, stamp
    ``monotonically_increasing_id`` (= partition_id<<33 | row-in-partition,
    so it encodes the global order), then add the collected cumulative
    per-partition counts as an array-literal lookup. One wide shuffle, one
    tiny counts job, no second window shuffle, no join — a global
    ``Window.orderBy`` would funnel every row into one task.

    Requires the order to be a strict total order (here url_key is unique
    within a round), so the result is independent of partition boundaries.

    The ranged intermediate is localCheckpoint'ed, not cache()'d:
    range-boundary sampling (and AQE coalescing) are not stable across
    re-evaluations, so the counts pass and the final pass must see the SAME
    physical row placement. A cache can be silently evicted and recomputed
    with different boundaries → wrong/duplicate seq values; a checkpoint
    truncates lineage so recomputation is impossible (on executor loss the
    job fails loudly and retries rather than mis-stamping). On a real
    cluster the durable variant is a checkpoint dir / parquet round-trip —
    the production crawl loop already persists rounds to parquet.

    ``WARC_SEQ_PERSIST`` selects the strategy (``checkpoint`` default,
    ``checkpoint_eager``, ``cache``) — A/B'd equal within measurement noise
    on this box (BENCH.md); ``cache`` trades the eviction-recompute
    guarantee for deserialized in-memory reads and is only for profiling.
    """
    import os as _os

    ranged = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    _mode = _os.environ.get("WARC_SEQ_PERSIST", "checkpoint")
    if _mode == "cache":
        ranged = ranged.cache()
    elif _mode == "checkpoint_eager":
        ranged = ranged.localCheckpoint(eager=True)
    else:
        # eager=False: the checkpoint is MARKED now and the blocks persist
        # during the first action (the counts job below) — one pass instead
        # of eager's separate materialization job, same recompute-proofness
        ranged = ranged.localCheckpoint(eager=False)
    pid = F.shiftright("_mid", 33).cast("int")
    counts = {
        r["_pid"]: r["count"]
        for r in ranged.groupBy(pid.alias("_pid")).count().collect()
    }
    n_parts = (max(counts) + 1) if counts else 1
    offsets, acc = [], 0
    for p in range(n_parts):
        offsets.append(acc)
        acc += counts.get(p, 0)
    if total_out is not None:
        # the exact row count falls out of the counts job for free — callers
        # (schedule_round) use it to size-gate the winner broadcast
        total_out.append(acc)
    off = F.get(F.array(*[F.lit(o) for o in offsets]), pid)
    local = F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
    return ranged.withColumn(out_col, (off + local + 1).cast("int")).drop("_mid")


def with_budgets(candidates: DataFrame, politeness: DataFrame) -> DataFrame:
    """Attach per-host budget; '*' row is the default. Politeness is a small
    dimension table → broadcast join, no shuffle of the candidate side; the
    single default value is collected to the driver and folded as a literal
    (a 1-row cross join costs a BroadcastNestedLoopJoin pass over every
    candidate — measured 12s/700k rows)."""
    default_rows = politeness.filter(F.col("host") == "*").select("budget").collect()
    default_budget = default_rows[0]["budget"] if default_rows else 1
    per_host = politeness.filter(F.col("host") != "*")
    return (
        candidates.join(F.broadcast(per_host), "host", "left")
        .withColumn("budget", F.coalesce("budget", F.lit(default_budget)))
    )


# Winner-join broadcast ceiling — a measured PERF crossover, not just an
# OOM guard. A/B on this box (schedule_round_combined end-to-end, AQE off,
# best-of-2): 206k winners/4M candidates → shuffle wins at 4 cores (7.2s vs
# 11.2s) and scales 0.79 vs 0.35 N→4N (the broadcast build is
# driver-SERIAL — a pure Amdahl term); 508k/1M @32 cores → tie (4.1s vs
# 4.2s); 827k/16M @32 cores → shuffle 3× (6.5s vs 20.0s). Broadcast only
# wins when the winner set is small enough that skipping the candidate
# shuffle beats the serial broadcast build — below ~100k rows.
DEFAULT_BROADCAST_ROW_LIMIT = 100_000

# Shape-aware second gate (r06, closing the VERDICT-r5 crossover finding):
# the row limit alone mispredicts HIGH-SCHEDULABILITY rounds — when most
# candidates are winners, the shuffle path re-shuffles nearly everything
# anyway, so skipping the candidate shuffle wins even for large winner
# sets. Measured on this box: 508k winners / 700k candidates (73%
# schedulable, the bench shape) broadcast 2.25-2.8s vs shuffle 3.0-8.0s
# best-of-3; the r5 Zipf stress measured broadcast 1.6× at 1.16M winners /
# 70% schedulable; while 206k/4M and 827k/16M (≈5% schedulable) stay
# shuffle wins. So: past the row limit, broadcast iff winners ≥
# RATIO × candidates AND under the hard byte-safety cap. The ratio probe
# needs a candidate count, which is only cheap when the caller has already
# materialized the candidates — both the bench round and the crawl loop
# cache them — so it runs only against a persisted input.
BROADCAST_WINNER_RATIO = 0.5
BROADCAST_HARD_CAP_ROWS = 4_000_000


def schedule_round_combined(
    candidates: DataFrame,
    politeness: DataFrame,
    salt_k: int = DEFAULT_SALT_K,
    with_seq: bool = True,
    cache_registry: "list[DataFrame] | None" = None,
    broadcast_row_limit: int = DEFAULT_BROADCAST_ROW_LIMIT,
) -> DataFrame:
    """One-pass variant: candidate columns + nullable ``seq`` (non-null =
    scheduled this round). Consuming THIS frame once — e.g. a single
    partitioned write, with counts taken via ``observe()`` — costs exactly
    one winner-broadcast build and one streaming pass over the candidates;
    materializing `scheduled` and `spilled` as separate queries builds the
    broadcast twice (measured ~10s serial per round at 1M winners)."""
    scheduled, _ = schedule_round(
        candidates, politeness, salt_k, with_seq, _combined=True,
        cache_registry=cache_registry, broadcast_row_limit=broadcast_row_limit,
    )
    return scheduled


def schedule_round(
    candidates: DataFrame,
    politeness: DataFrame,
    salt_k: int = DEFAULT_SALT_K,
    with_seq: bool = True,
    _combined: bool = False,
    cache_registry: "list[DataFrame] | None" = None,
    broadcast_row_limit: int = DEFAULT_BROADCAST_ROW_LIMIT,
) -> tuple[DataFrame, DataFrame]:
    """Returns (scheduled, spilled).

    candidates: (url_key, url, host, url_hash, priority [, ...]).
    scheduled keeps candidate columns + ``seq`` (deterministic global
    position within the round). spilled = unscheduled, priority+1.
    """
    order = [F.desc("priority"), F.asc("url_key")]

    # The rank runs on a NARROW projection: the windows shuffle and sort
    # only (url_key, host, priority) — never the full frontier row (url,
    # hashes, payload columns). Wide rows would make the window shuffle
    # memory-bandwidth-bound; full rows are recovered at the end with a
    # broadcast join of the (Σ budgets)-sized winner set.
    narrow = candidates.select("url_key", "host", "priority")
    c = with_budgets(narrow, politeness)

    # stage 1: salted partial rank — bounds window size on hot hosts
    salt = F.pmod(F.xxhash64("url_key", F.lit("\x02")), F.lit(salt_k))
    w1 = Window.partitionBy("host", "salt").orderBy(*order)
    survivors = (
        c.withColumn("salt", salt)
        .withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= F.col("budget"))
        .drop("rn1", "salt")
    )

    # stage 2: exact per-host rank over the ≤ salt_k×budget survivors
    w2 = Window.partitionBy("host").orderBy(*order)
    winners = (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= F.col("budget"))
        .select("url_key", "host", "priority")
    )

    n_winners: int | None = None
    if with_seq:
        # deterministic global sequence — parity artifact; range-partitioned
        # rank, never a single-task global window (Σ budgets can be millions
        # of rows per round at 10^10-frontier scale). Its counts job yields
        # the exact winner count as a side effect — free broadcast gate.
        tot: list[int] = []
        winners = add_global_seq(winners, order, total_out=tot).select("url_key", "seq")
        n_winners = tot[0]
    else:
        winners = winners.select("url_key", F.lit(0).alias("seq"))
    winners = winners.cache()
    if cache_registry is not None:
        cache_registry.append(winners)

    # winner set is Σ budgets rows — ONE left join over the full-width
    # candidates covers both outputs (matched → scheduled, unmatched →
    # spilled). Broadcast while the winner set fits (the common case: it's
    # bounded by Σ budgets, so candidates are never shuffled); at
    # 10^10-frontier scale Σ budgets can reach millions of hosts × budget
    # rows, where an unconditional broadcast OOMs the driver — past
    # ``broadcast_row_limit`` the join degrades to a shuffle join on
    # url_key instead (VERDICT r2 #4). When the count is unknown
    # (with_seq=False), broadcast only if the caller's limit is not 0.
    # NOT cached: callers cache/materialize candidates, so each side is a
    # streaming map-side join over that cache — caching `joined` would
    # re-write every wide row to the block store for no saved work.
    small = (n_winners is None and broadcast_row_limit > 0) or (
        n_winners is not None and n_winners <= broadcast_row_limit
    )
    if (
        not small
        and n_winners is not None
        and broadcast_row_limit > 0
        and n_winners <= BROADCAST_HARD_CAP_ROWS
        and candidates.storageLevel.useMemory
    ):
        # shape-aware gate (see BROADCAST_WINNER_RATIO above): the count is
        # one cheap job over the caller's candidate cache
        n_cand = candidates.count()
        small = n_cand > 0 and n_winners >= BROADCAST_WINNER_RATIO * n_cand
    # fallback pins shuffle_hash (not just "no broadcast hint"): the
    # planner's size estimate of the cached winner set could still choose a
    # broadcast that the gate just ruled out, and hash beats sort-merge when
    # one side (winners) is the smaller of two large inputs
    right = F.broadcast(winners) if small else winners.hint("shuffle_hash")
    joined = candidates.join(right, "url_key", "left")
    if _combined:
        return joined, joined.limit(0)
    scheduled = joined.filter(F.col("seq").isNotNull())
    if not with_seq:
        scheduled = scheduled.drop("seq")
    spilled = (
        joined.filter(F.col("seq").isNull())
        .drop("seq")
        .withColumn("priority", F.col("priority") + F.lit(1))
    )
    return scheduled, spilled
