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


def with_budgets(candidates: DataFrame, politeness: DataFrame) -> DataFrame:
    """Attach per-host budget; '*' row is the default. Politeness is a small
    dimension table → broadcast join, no shuffle of the candidate side."""
    default_budget = politeness.filter(F.col("host") == "*").select(
        F.col("budget").alias("default_budget")
    )
    per_host = politeness.filter(F.col("host") != "*")
    return (
        candidates.join(F.broadcast(per_host), "host", "left")
        .join(F.broadcast(default_budget))  # 1-row cross join
        .withColumn("budget", F.coalesce("budget", "default_budget"))
        .drop("default_budget")
    )


def schedule_round(
    candidates: DataFrame,
    politeness: DataFrame,
    salt_k: int = DEFAULT_SALT_K,
    with_seq: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Returns (scheduled, spilled).

    candidates: (url_key, url, host, url_hash, priority [, ...]).
    scheduled keeps candidate columns + ``seq`` (deterministic global
    position within the round). spilled = unscheduled, priority+1.
    """
    order = [F.desc("priority"), F.asc("url_key")]
    c = with_budgets(candidates, politeness)

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
    ranked = survivors.withColumn("rn", F.row_number().over(w2))
    scheduled = ranked.filter(F.col("rn") <= F.col("budget")).drop("rn", "budget")

    spilled = (
        candidates.join(scheduled.select("url_key"), "url_key", "left_anti")
        .withColumn("priority", F.col("priority") + F.lit(1))
    )

    if with_seq:
        # deterministic global sequence — parity artifact; a single-task
        # window over the (small: Σ budgets) scheduled set, not over input
        wg = Window.orderBy(*order)
        scheduled = scheduled.withColumn("seq", F.row_number().over(wg))
    return scheduled, spilled
