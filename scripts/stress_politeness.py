"""Opt-in politeness-window stress run (VERDICT r2 #9): schedule_round at
10M+ candidates over a ~1M-host politeness table — realistic 10^10-frontier
per-round cardinalities scaled to one box — to empirically confirm

1. the salted two-stage rank survives hot-host skew at volume (no single
   window task holds a hot host's full candidate set),
2. the winner-set size gate: Σ budgets here exceeds the default
   broadcast_row_limit, so the output join must take the shuffle fallback —
   and produce EXACTLY the schedule the (forced) broadcast path produces.

Usage:  python scripts/stress_politeness.py [n_candidates] [n_hosts]
Defaults 10_000_000 / 1_000_000. Prints one JSON line; paste into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from warcbase_spark.operators.scheduler import schedule_round  # noqa: E402
from warcbase_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="stress_politeness", master=f"local[{cpus}]")

    # 10% of candidates on two hot hosts, the rest spread over n_hosts
    hot = F.col("id") % 10 == 0
    host = F.when(
        hot, F.concat(F.lit("hot"), (F.col("id") % 2).cast("string"), F.lit(".org"))
    ).otherwise(
        F.concat(F.lit("h"), (F.pmod(F.col("id") * 2654435761, F.lit(n_hosts))).cast("string"), F.lit(".org"))
    )
    cand = (
        spark.range(n)
        .select(
            F.concat(F.lit("org."), host, F.lit("/p/"), F.col("id").cast("string")).alias("url_key"),
            F.concat(F.lit("http://"), host, F.lit("/p/"), F.col("id").cast("string")).alias("url"),
            host.alias("host"),
            F.xxhash64("id").alias("url_hash"),
            (F.col("id") % 3).cast("int").alias("priority"),
        )
        .localCheckpoint(eager=True)  # freeze the input so both modes see identical rows
    )

    # ~1M-host politeness dimension: every 3rd host gets an explicit budget
    pol = (
        spark.range(0, n_hosts, 3)
        .select(
            F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".org")).alias("host"),
            F.lit(4).alias("budget"),
        )
        .unionByName(
            spark.createDataFrame(
                [("hot0.org", 50_000), ("hot1.org", 50_000), ("*", 3)],
                "host string, budget int",
            )
        )
    )

    out: dict = {"n_candidates": n, "n_hosts": n_hosts, "cpus": cpus}
    sample = None
    for mode, limit in (("shuffle_fallback", 1), ("broadcast", 1 << 40)):
        t0 = time.monotonic()
        sched, spilled = schedule_round(cand, pol, broadcast_row_limit=limit)
        n_sched = sched.count()
        dt = time.monotonic() - t0
        # parity witness: the full (seq, url_key) schedule for a sampled
        # host subset (hot host + a few tail hosts)
        probe = sched.filter(
            F.col("host").isin("hot0.org", "h3.org", "h999999.org", "h500001.org")
        )
        got = sorted((r["seq"], r["url_key"]) for r in probe.collect())
        out[mode] = {"sec": round(dt, 2), "n_scheduled": n_sched,
                     "scheduled_per_sec": round(n_sched / dt, 1)}
        if sample is None:
            sample = got
        else:
            out["sampled_parity"] = sample == got
    print(json.dumps(out))


if __name__ == "__main__":
    main()
